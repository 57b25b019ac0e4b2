"""TPU bench: full-tree logL + ALL-edge analytic derivatives (BASELINE §3).

One "evaluation" = directed CLVs for every (node, direction) [the fused
megakernel over the 3(n-2)-row directed op table] + batched sumtables for
every edge + (logL, dlogL/dt, d2logL/dt2) for every edge — i.e. everything
a Newton BLO sweep needs before its first step. The reference computes
this edge-by-edge (pll_update_sumtable + pll_compute_likelihood_derivatives
per edge, pll_optimize.c:1462-1475); here it is one batched evaluation.

Also times a full _blo_sweep (the above + 10 bracketed Newton iterations).

Writes staged progress to /tmp/bench_derivs.log (flush per CLAUDE.md).
Run on the TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_derivatives.py
"""
import sys
import time

import numpy as np


def main(out=None):
    out = out or open("/tmp/bench_derivs.log", "w")

    def log(*a):
        print(*a, file=out, flush=True)
        print(*a, flush=True)

    import jax
    import jax.numpy as jnp
    from pllmod_tpu.ops import derivatives as deriv_mod
    from pllmod_tpu.optimize import blo as blo_mod
    from __graft_entry__ import _example

    n_taxa = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_sites = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    partition, tree = _example(n_taxa=n_taxa, n_sites=n_sites, seed=3)
    partition = partition.cache_eigen()
    brlens = jnp.asarray(tree.lengths, partition.dtype)
    log("device:", jax.devices()[0].platform, "taxa:", n_taxa,
        "patterns:", partition.n_patterns_padded)

    trav = blo_mod.DirectedTraversal(tree)
    levels, offsets, edge_ref, n_slots = trav.schedule()
    fargs = blo_mod._fused_args(partition, trav)
    if fargs:
        edge_ref = jnp.asarray(trav.edge_ref)  # fused keeps original slots
        log("path: fused megakernel (directed table)")
    else:
        log("path: level-batched XLA")
    edge_mask = jnp.asarray(trav.edge_mask)
    n_edges = int(trav.edge_mask.sum())
    fused = None if not fargs else (
        fargs["fused_idx"][0], fargs["fused_idx"][1], fargs["fused_idx"][2],
        fargs["fused_nslots"], fargs["fused_interp"])

    def eval_all_derivs(brl):
        """logL + (df, ddf) for every edge — one number summarizing all."""
        live = jnp.argmax(edge_mask)
        if fargs:
            from pllmod_tpu.ops import pallas_deriv
            st, sc, eigen, lnB = blo_mod._deriv_pipeline_fast(
                partition, brl, fargs["fused_idx"], fargs["fused_nslots"],
                fargs["fused_interp"], fargs["eref6"])
            lnl, df, ddf = pallas_deriv.edge_derivatives_pallas(
                partition, st, sc, brl, eigen, lnB, fargs["fused_interp"])
        else:
            P = partition.prob_matrices(brl)
            clvs, scalers = blo_mod._directed_clvs(
                partition, P, levels, offsets, n_slots, fused)
            eigen = partition.eigen()
            st, sc = blo_mod._edge_sumtables(partition, clvs, scalers,
                                             edge_ref, eigen)
            lnl, df, ddf = deriv_mod.edge_derivatives_batch(
                partition, st, sc, brl, eigen)
        return lnl[live] + 1e-12 * (jnp.sum(df) + jnp.sum(ddf))

    iters = 20

    def time_many(one, tag, it=iters):
        @jax.jit
        def many(brl0):
            def body(i, acc):
                return acc + one(brl0 * (1.0 + 1e-7 * i))
            return jax.lax.fori_loop(0, it, body, 0.0)

        t0 = time.perf_counter()
        r = many(brlens)
        r.block_until_ready()
        log(tag, f"compile+run1: {time.perf_counter()-t0:.1f}s  val={r}")
        many(brlens * 1.00005).block_until_ready()   # first-exec warmup
        best = float("inf")
        for k in range(5):
            t0 = time.perf_counter()
            many(brlens * (1.0001 + 1e-5 * k)).block_until_ready()
            dt = time.perf_counter() - t0
            best = min(best, dt)
            log(tag, f"  rep {k}: {dt*1000/it:.3f} ms/eval")
        return best / it

    dt = time_many(eval_all_derivs, "logL+all-edge-derivs")
    log(f"logL+derivs (all {n_edges} edges): {dt*1000:.3f} ms/eval "
        f"= {1.0/dt:.1f} evals/s "
        f"= {n_edges/dt:.3e} edge-derivative evals/s")

    # full BLO sweep (the above + 10 Newton iterations on every edge)
    def one_sweep(brl):
        new_brl, lnl0 = blo_mod._blo_sweep(
            partition, levels, offsets, edge_ref, edge_mask, brl,
            jnp.asarray(1e-4, partition.dtype),
            jnp.asarray(100.0, partition.dtype),
            jnp.asarray(1e-6, partition.dtype), n_slots, **fargs)
        return lnl0 + jnp.sum(new_brl) * 1e-12

    dt2 = time_many(one_sweep, "blo-sweep", it=10)
    log(f"full BLO sweep (directed CLVs + sumtables + 10 Newton iters, "
        f"{n_edges} edges): {dt2*1000:.3f} ms/sweep = {1.0/dt2:.1f} sweeps/s")


if __name__ == "__main__":
    sys.exit(main())
