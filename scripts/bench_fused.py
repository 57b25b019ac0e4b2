"""TPU micro-bench: fused whole-traversal kernel vs per-level pallas path.

Writes progress to /tmp/bench_fused.log (flush=True per CLAUDE.md traps).
"""
import json
import sys
import time

import numpy as np


def main(out=sys.stdout):
    import jax
    import jax.numpy as jnp
    from pllmod_tpu.ops import engine, pallas_clv
    from __graft_entry__ import _example

    def log(*a):
        print(*a, file=out, flush=True)

    n_taxa, n_sites = 128, 16384
    partition, tree = _example(n_taxa=n_taxa, n_sites=n_sites, seed=3)
    partition = partition.cache_eigen()
    brlens = jnp.asarray(tree.lengths, partition.dtype)
    log("device:", jax.devices()[0].platform)

    levels, offsets, ri, n_slots = engine.compile_schedule(partition, tree)
    idx8, e1, e2, rif, n_slots_f = pallas_clv.compile_fused(partition, tree)
    iters = 10

    def time_many(one, tag):
        @jax.jit
        def many(brl0):
            def body(i, acc):
                return acc + one(brl0 * (1.0 + 1e-7 * i))
            return jax.lax.fori_loop(0, iters, body, 0.0)

        t0 = time.perf_counter()
        r = many(brlens)
        r.block_until_ready()
        log(tag, "compile+run1:", time.perf_counter() - t0, "lnl", r)
        many(brlens * 1.00005).block_until_ready()
        best = 1e9
        for k in range(3):
            t0 = time.perf_counter()
            many(brlens * (1.0001 + 1e-5 * k)).block_until_ready()
            dt = time.perf_counter() - t0
            best = min(best, dt)
            log(tag, f"iter {k}: {dt*1000:.2f} ms total, "
                     f"{dt*1000/iters:.3f} ms/eval")
        n_inner = n_taxa - 2
        rate = n_inner * partition.n_patterns_padded * iters / best
        log(tag, f"best {best*1000/iters:.3f} ms/eval = {rate:.3e} updates/s")
        return rate

    def one_fused(brl):
        return pallas_clv.loglikelihood_fused(
            partition, idx8, brl, e1, e2, rif, n_slots_f)

    def one_old(brl):
        return pallas_clv.loglikelihood_pallas(
            partition, levels, brl, offsets, ri, n_slots)

    # correctness cross-check first (one eval each)
    lf = float(one_fused(brlens))
    lo = float(one_old(brlens))
    log("logL fused", lf, "old", lo, "diff", abs(lf - lo))

    r_fused = time_many(one_fused, "fused")
    r_old = time_many(one_old, "old")
    log(json.dumps({"fused": r_fused, "old": r_old,
                    "speedup": r_fused / r_old}))


if __name__ == "__main__":
    with open("/tmp/bench_fused.log", "w") as f:
        main(f)
