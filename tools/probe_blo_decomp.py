"""On-chip decomposition of the fused BLO sweep pipeline at the flagship
(128 taxa x 16384 patterns, GTR+G4): stage timings for
(a) megakernel directed CLVs, (b) + per-edge sumtables,
(c) + fused Newton, (d) the full _blo_sweep.

Informs where the next sweep optimization should go (the Newton
iterations are no longer the bound after the fused Newton kernel).
Staged flush prints to tools/probe_blo_decomp.out.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

OUT = open("/root/repo/tools/probe_blo_decomp.out", "w")


def p(*a):
    print(*a, file=OUT, flush=True)
    print(*a, flush=True)


def bench(tag, fn, brl, iters=20):
    @jax.jit
    def many(brl0):
        def body(i, acc):
            return acc + fn(brl0 * (1.0 + 1e-7 * i))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    many(brl).block_until_ready()
    p(f"  {tag}: compile+first {time.perf_counter()-t0:.1f}s")
    many(brl * 1.00005).block_until_ready()
    dt = float("inf")
    for k in range(5):
        t0 = time.perf_counter()
        many(brl * (1.0001 + 1e-5 * k)).block_until_ready()
        dt = min(dt, time.perf_counter() - t0)
    p(f"  {tag}: {dt/iters*1e3:.2f} ms")
    return dt / iters


def main():
    from __graft_entry__ import _example
    from pllmod_tpu.optimize import blo as blo_mod
    from pllmod_tpu.ops import engine as engine_mod
    from pllmod_tpu.ops import pallas_clv, pallas_deriv

    p("platform:", jax.devices()[0].platform)
    part, tree = _example(n_taxa=128, n_sites=16384, seed=3)
    part = part.cache_eigen()
    trav = blo_mod.DirectedTraversal(tree)
    fargs = blo_mod._fused_args(part, trav)
    assert fargs.get("fused_newton") is True
    idx8, fe1, fe2 = fargs["fused_idx"]
    ns = fargs["fused_nslots"]
    eref6 = fargs["eref6"]
    split = engine_mod.use_split_clv(part)
    p("split mode:", split)
    edge_ref = jnp.asarray(trav.edge_ref)
    mask = jnp.asarray(trav.edge_mask)
    brl = jnp.asarray(np.clip(tree.lengths, 1e-6, 100.0), jnp.float32)
    eigen = part.eigen()
    lnB = pallas_deriv.invar_log_plane(part)

    def dirclvs(b):
        P12 = pallas_clv.fused_p12(part, b, fe1, fe2)
        clvs, scalers = pallas_clv.update_partials_fused(
            part, None, idx8, fe1, fe2, ns, P12=P12, split=split)
        s = (clvs[0] if isinstance(clvs, tuple) else clvs)
        return s.astype(jnp.float32).ravel()[0] + scalers.ravel()[0]

    def through_st(b):
        P12 = pallas_clv.fused_p12(part, b, fe1, fe2)
        clvs, scalers = pallas_clv.update_partials_fused(
            part, None, idx8, fe1, fe2, ns, P12=P12, split=split)
        st, sc = pallas_deriv.edge_sumtables_pallas(
            part, clvs, scalers, eref6, split=split is True)
        return st.ravel()[0] + sc.ravel()[0].astype(jnp.float32)

    def through_newton(b):
        st, sc, eig, lnb = blo_mod._deriv_pipeline_fast(
            part, b, (idx8, fe1, fe2), ns, False, eref6)
        t_all, lnl0 = pallas_deriv.newton_edges_pallas(
            part, st, sc, b, 1e-6, 100.0, 1e-6, 10, eig, lnb)
        return t_all.ravel()[0] + lnl0.ravel()[0]

    def full_sweep(b):
        nb, l0 = blo_mod._blo_sweep(
            part, (), (), edge_ref, mask, b,
            jnp.asarray(1e-6, jnp.float32), jnp.asarray(100.0, jnp.float32),
            jnp.asarray(1e-6, jnp.float32), 0, **fargs)
        return nb.ravel()[0] + l0

    p("=== fused BLO pipeline decomposition (flagship) ===")
    a = bench("directed CLVs (megakernel)", dirclvs, brl)
    bt = bench("+ edge sumtables", through_st, brl)
    c = bench("+ fused Newton(10)", through_newton, brl)
    d = bench("full _blo_sweep", full_sweep, brl)
    p(f"stages: dirclvs={a*1e3:.2f}  st={1e3*(bt-a):.2f}  "
      f"newton={1e3*(c-bt):.2f}  sweep-overhead={1e3*(d-c):.2f} ms")
    p("DONE")


if __name__ == "__main__":
    main()
