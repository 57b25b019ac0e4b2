"""On-chip probe: memory-bounded O(n log n) whole-tree BLO (round-5
item 1). Stages:

  smoke  — 60 taxa x 2048: bounded vs full-buffer driver parity on-chip
  mid    — 1024 taxa x 16384: sweeps + wall (full-buffer infeasible x
           memory? it fits; cross-check against chunked is too slow)
  north  — 10k taxa x 100k: the capacity frontier. Simulated data,
           perturbed lengths, monotone sweep trace, ms/sweep.

Usage: python tools/probe_blo_bounded.py [smoke|mid|north] >> out 2>&1
Writes progress with flush=True (remote compiles can take minutes).
"""
import sys
import time

import numpy as np


def p(*a):
    print(*a, flush=True)


def _setup(n_taxa, n_sites, seed=0, sim=True):
    import os
    import jax.numpy as jnp
    from tests import reference_impl as ref
    from pllmod_tpu.ops.partition import create_partition
    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    tree = ref.random_binary_tree(rng, n_taxa, min_len=0.02, max_len=0.4)
    cache = f"/tmp/blo_bounded_{n_taxa}x{n_sites}_s{seed}.npz"
    ascii4 = np.frombuffer(b"ACGT", np.uint8)
    if sim and os.path.exists(cache):
        dat = np.load(cache)
        codes = np.ascontiguousarray(dat["codes"])
        blob = ascii4[codes].tobytes()       # ONE conversion pass
        S = codes.shape[1]
        seqs = [blob[i * S:(i + 1) * S].decode("ascii")
                for i in range(codes.shape[0])]
        tree.lengths = dat["lengths"]
    elif sim:
        seqs = ref.simulated_sequences(rng, tree, n_sites)
        lut = np.zeros(256, np.int8)
        lut[ascii4] = np.arange(4)
        codes = np.stack([lut[np.frombuffer(s.encode(), np.uint8)]
                          for s in seqs])
        np.savez_compressed(cache, codes=codes, lengths=tree.lengths)
    else:
        seqs = ref.random_sequences(rng, n_taxa, n_sites)
    p(f"data {n_taxa}x{n_sites} built in {time.perf_counter()-t0:.0f}s")
    t0 = time.perf_counter()
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.9,
                            dtype=jnp.float32, pattern_pad=256)
    part = part.cache_eigen()
    p(f"partition: {part.n_patterns} patterns "
      f"({time.perf_counter()-t0:.0f}s)")
    # perturb away from the generating lengths
    tree.lengths = np.clip(tree.lengths * 2.5 + 0.03, 1e-4, 10.0)
    return part, tree


def _trace_driver(part, tree, **kw):
    """Run the bounded driver sweep-by-sweep, tracing lnl0 + wall."""
    import jax.numpy as jnp
    from pllmod_tpu.optimize import blo_bounded as bb
    from pllmod_tpu.optimize.blo import _edge_colors
    from pllmod_tpu.ops import engine as engine_mod, pallas_deriv
    from pllmod_tpu.common import (MIN_BRANCH_LEN, MAX_BRANCH_LEN,
                                  TOL_BRANCH_LEN)
    t0 = time.perf_counter()
    sched = bb.BoundedSweepSchedule(tree, **kw)
    p(f"schedule: rows={sched.n_rows} emits={sched.n_emits} "
      f"slots={sched.n_slots} segs={sched.seg_ops.shape[0]} "
      f"({time.perf_counter()-t0:.1f}s)")
    t0 = time.perf_counter()
    tabs = sched.compile_tables(part)
    idx8_s, e1_s, e2_s, eref_s, eids_s, em_s, n_slots_k = tabs
    p(f"tables: {time.perf_counter()-t0:.1f}s")
    split = engine_mod.use_split_clv(part)
    fused_newton = pallas_deriv.newton_fits_vmem(part)
    p(f"split={split} fused_newton={fused_newton}")
    dtype = part.dtype
    brl = jnp.asarray(np.clip(tree.lengths, MIN_BRANCH_LEN,
                              MAX_BRANCH_LEN).astype(np.float32))
    args = (jnp.asarray(MIN_BRANCH_LEN, dtype),
            jnp.asarray(MAX_BRANCH_LEN, dtype),
            jnp.asarray(TOL_BRANCH_LEN, dtype))
    cmasks = [jnp.asarray(m) for m in _edge_colors(tree) if m.any()]
    p(f"colors: {len(cmasks)}")
    walls = []
    for sweep in range(8):
        t0 = time.perf_counter()
        lnl_first = None
        for cm in cmasks:
            brl, lnl0 = bb._bounded_sweep(
                part, idx8_s, e1_s, e2_s, eref_s, eids_s, em_s, cm,
                brl, *args, n_slots_k, split=split, interp=False,
                fused_newton=fused_newton, gauss_seidel=False)
            if lnl_first is None:
                lnl_first = float(lnl0)  # syncs
        dt = time.perf_counter() - t0
        walls.append(dt)
        p(f"sweep {sweep}: lnl0={lnl_first:.2f}  wall={dt:.2f}s")
    p(f"warm sweep wall: {min(walls[2:]):.2f}s "
      f"(median {sorted(walls[2:])[len(walls[2:])//2]:.2f}s)")
    return brl


def stage_smoke():
    from pllmod_tpu.optimize.blo import optimize_branch_lengths
    from pllmod_tpu.optimize.blo_bounded import \
        optimize_branch_lengths_bounded
    part, tree = _setup(60, 2048, seed=1)
    t_f = tree.copy()
    t0 = time.perf_counter()
    _, lnl_full = optimize_branch_lengths(part, t_f, tolerance=1e-7,
                                          max_sweeps=64)
    p(f"full driver: lnl={lnl_full:.4f} ({time.perf_counter()-t0:.0f}s)")
    t_b = tree.copy()
    t0 = time.perf_counter()
    _, lnl_b = optimize_branch_lengths_bounded(
        part, t_b, tolerance=1e-7, max_sweeps=64)
    p(f"bounded driver: lnl={lnl_b:.4f} ({time.perf_counter()-t0:.0f}s)")
    p(f"delta = {lnl_b - lnl_full:+.4f}  "
      f"({'PASS' if abs(lnl_b - lnl_full) < 0.05 else 'FAIL'})")


def stage_mid():
    part, tree = _setup(1024, 16384, seed=2)
    _trace_driver(part, tree, seg_rows=256, seg_emits=64)


def stage_north():
    from pllmod_tpu.ops import engine as engine_mod
    part, tree = _setup(10_000, 100_000, seed=3)
    # eval-throughput reference at this shape (marginal, 2 warm + timed)
    import jax
    t0 = time.perf_counter()
    lnl, ns = engine_mod.loglikelihood_bounded_fused(part, tree)
    jax.block_until_ready(lnl)
    p(f"bounded eval (cold): lnl={float(lnl):.2f} slots={ns} "
      f"({time.perf_counter()-t0:.0f}s)")
    bl2 = tree.lengths * 1.01
    t0 = time.perf_counter()
    lnl2, _ = engine_mod.loglikelihood_bounded_fused(part, tree,
                                                     brlens=bl2)
    jax.block_until_ready(lnl2)
    p(f"bounded eval (warm, new brlens): {time.perf_counter()-t0:.2f}s")
    _trace_driver(part, tree, seg_rows=256, seg_emits=64)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "smoke"
    p(f"=== stage {stage} ===")
    {"smoke": stage_smoke, "mid": stage_mid,
     "north": stage_north}[stage]()
    p("done")


if __name__ == "__main__":
    main()
