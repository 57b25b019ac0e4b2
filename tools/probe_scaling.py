"""On-chip scaling probe: full-tree logL (resident/fused megakernel) and
one fused BLO sweep at growing taxon counts, GTR+G4 f32.

Checks that the production kernels hold their per-node rates as the
step count grows (the megakernel is a serial per-node chain; the
resident kernel additionally bounds live slots). Staged flush prints to
tools/probe_scaling.out.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

OUT = open("/root/repo/tools/probe_scaling.out", "w")


def p(*a):
    print(*a, file=OUT, flush=True)
    print(*a, flush=True)


def bench(fn, brl, iters=20):
    @jax.jit
    def many(brl0):
        def body(i, acc):
            return acc + fn(brl0 * (1.0 + 1e-7 * i))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    many(brl).block_until_ready()
    many(brl * 1.00005).block_until_ready()
    dt = float("inf")
    for k in range(4):
        t0 = time.perf_counter()
        many(brl * (1.0001 + 1e-5 * k)).block_until_ready()
        dt = min(dt, time.perf_counter() - t0)
    return dt / iters


def main():
    from __graft_entry__ import _example
    from pllmod_tpu.optimize import blo as blo_mod
    from pllmod_tpu.ops import engine

    p("platform:", jax.devices()[0].platform)
    for n_taxa, n_sites in ((128, 4096), (256, 4096), (512, 4096)):
        part, tree = _example(n_taxa=n_taxa, n_sites=n_sites, seed=3)
        part = part.cache_eigen()
        brl = jnp.asarray(np.clip(tree.lengths, 1e-6, 100.0), jnp.float32)

        ev = engine.compile_fast_eval(part, tree)

        def one(b, ev=ev, part=part):
            return ev(part, b)

        t0 = time.perf_counter()
        ms_lnl = bench(one, brl) * 1e3
        n_inner = n_taxa - 2
        rate = n_inner * part.n_patterns_padded / (ms_lnl * 1e-3)
        p(f"{n_taxa} taxa x {n_sites}: logL {ms_lnl:.2f} ms/eval "
          f"= {rate:.3e} updates/s  (setup {time.perf_counter()-t0:.0f}s)")

        trav = blo_mod.DirectedTraversal(tree)
        fargs = blo_mod._fused_args(part, trav)
        edge_ref = jnp.asarray(trav.edge_ref)
        mask = jnp.asarray(trav.edge_mask)
        args = (jnp.asarray(1e-6, jnp.float32),
                jnp.asarray(100.0, jnp.float32),
                jnp.asarray(1e-6, jnp.float32))

        def sweep(b):
            nb, l0 = blo_mod._blo_sweep(part, (), (), edge_ref, mask, b,
                                        *args, 0, **fargs)
            return nb.ravel()[0] + l0

        t0 = time.perf_counter()
        ms_sw = bench(sweep, brl) * 1e3
        p(f"{n_taxa} taxa x {n_sites}: BLO sweep {ms_sw:.2f} ms "
          f"(newton={fargs.get('fused_newton')}) "
          f"(setup {time.perf_counter()-t0:.0f}s)")
    p("DONE")


if __name__ == "__main__":
    main()
