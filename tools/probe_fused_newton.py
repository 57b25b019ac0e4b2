"""On-chip probe: fused per-edge Newton BLO kernel vs the iterative
sweep (minimize_newton_multi re-reading sumtables per iteration).

Measures marginal ms per _blo_sweep at the flagship (128 taxa x 16384
patterns, GTR+G4) with PLLMOD_FUSED_NEWTON on/off, and end-to-end
optimize_branch_lengths logL parity between the two modes.

Run on the TPU (default axon platform), in background with a long
timeout; staged flush prints to tools/probe_fused_newton.out.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

OUT = open("/root/repo/tools/probe_fused_newton.out", "w")


def p(*a):
    print(*a, file=OUT, flush=True)
    print(*a, flush=True)


def main():
    from __graft_entry__ import _example
    from pllmod_tpu.optimize import blo as blo_mod
    from pllmod_tpu.ops import engine as engine_mod

    p("platform:", jax.devices()[0].platform)
    n_taxa, n_sites = 128, 16384
    part, tree = _example(n_taxa=n_taxa, n_sites=n_sites, seed=3)
    part = part.cache_eigen()
    trav = blo_mod.DirectedTraversal(tree)
    edge_ref = jnp.asarray(trav.edge_ref)
    mask = jnp.asarray(trav.edge_mask)
    dt32 = jnp.float32
    brl = jnp.asarray(np.clip(tree.lengths, 1e-6, 100.0), dt32)
    args = (jnp.asarray(1e-6, dt32), jnp.asarray(100.0, dt32),
            jnp.asarray(1e-6, dt32))
    iters = 20

    def time_mode(flag):
        os.environ["PLLMOD_FUSED_NEWTON"] = flag
        fargs = blo_mod._fused_args(part, trav)
        assert "eref6" in fargs
        assert fargs["fused_newton"] is (flag == "1")

        @jax.jit
        def many(brl0):
            def body(i, carry):
                acc, b = carry
                nb, l0 = blo_mod._blo_sweep(
                    part, (), (), edge_ref, mask, b * (1.0 + 1e-7 * i),
                    *args, 0, **fargs)
                return (acc + l0, 0.5 * (b + nb))
            return jax.lax.fori_loop(0, iters, body,
                                     (jnp.float32(0.0), brl0))

        t0 = time.perf_counter()
        acc, nb = many(brl)
        acc.block_until_ready()
        p(f"  mode={flag} compile+first: {time.perf_counter()-t0:.1f}s")
        many(brl * 1.00005)[0].block_until_ready()
        dt = float("inf")
        for k in range(5):
            t0 = time.perf_counter()
            a, nbk = many(brl * (1.0001 + 1e-5 * k))
            a.block_until_ready()
            dt = min(dt, time.perf_counter() - t0)
        p(f"  mode={flag}: {dt/iters*1e3:.2f} ms/sweep "
          f"(acc={float(a):.3f})")
        return dt / iters, np.asarray(nbk)

    p("=== _blo_sweep marginal time (10 Newton iters/sweep) ===")
    ms_it, nb_it = time_mode("0")
    ms_fn, nb_fn = time_mode("1")
    m = trav.edge_mask
    rel = np.max(np.abs(nb_fn - nb_it)[m] /
                 np.maximum(np.abs(nb_it), 1e-4)[m])
    p(f"sweep speedup: {ms_it/ms_fn:.2f}x; "
      f"max rel brlens dev fused-vs-iter: {rel:.2e}")

    p("=== end-to-end optimize_branch_lengths parity ===")
    for flag in ("0", "1"):
        os.environ["PLLMOD_FUSED_NEWTON"] = flag
        t = tree.copy()
        t0 = time.perf_counter()
        _, lnl = blo_mod.optimize_branch_lengths(part, t, max_sweeps=32,
                                                 tolerance=1e-6)
        p(f"  mode={flag}: logL={lnl:.6f}  wall={time.perf_counter()-t0:.1f}s")
    p("DONE")


if __name__ == "__main__":
    main()
