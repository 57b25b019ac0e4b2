"""On-chip parity sweep: every engine-auto decision vs the f64 oracle.

Runs ON THE REAL TPU (leave the platform alone; do not set
JAX_PLATFORMS). For each representative partition shape it evaluates
``tree_loglikelihood`` through the auto-selected production kernel and
checks it against the level-batched XLA engine (f32) and the host f64
site-repeats oracle (ops/repeats.py) at the 1e-6 reference-parity bar
(BASELINE.md §1). This is the real-hardware complement of the CPU test
suite: Mosaic tiling legality and split-storage accuracy only show up
on-chip (interpret mode enforces neither — see PERF_NOTES "CS crossover
+ kernel-shape constraints").

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_parity.py
(takes several minutes: one remote kernel compile per shape)
"""

from __future__ import annotations

import sys

import numpy as np


SHAPES = [
    # (states, cats, label)
    (4, 4, "DNA+G4 (CS=16, resident+split)"),
    (4, 8, "DNA+G8 (CS=32, resident+split)"),
    (4, 1, "DNA no-gamma (CS=4, fused+split)"),
    (10, 4, "GT10+G4 (CS=40, fused+read-split)"),
    (16, 4, "GT16+G4 (CS=64, fused+read-split)"),
    (20, 4, "protein+G4 (CS=80, fused+read-split)"),
    (20, 1, "20-state cats=1 (CS=20, XLA levels fallback)"),
    (5, 4, "5-state+G4 (CS=20, XLA levels fallback)"),
]


def check_bf16_residual() -> bool:
    """On-chip canary for the XLA bf16-propagation bug: the naive
    residual formula bf16(x - f32(bf16(x))) compiles to ZERO on TPU
    (the pass demotes the f32 subtraction; optimization_barrier does
    NOT stop it). pallas_clv._bf16_residual works around it with
    integer-bitcast rounding; this re-checks the workaround on the real
    compiler after every toolchain change."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from pllmod_tpu.ops.pallas_clv import _bf16_residual
    rng = np.random.default_rng(0)
    x = (rng.uniform(-1, 1, (64, 64)) *
         10.0 ** rng.integers(-20, 2, (64, 64))).astype(np.float32)
    got = np.asarray(jax.jit(_bf16_residual)(
        jnp.asarray(x)).astype(jnp.float32), np.float64)
    hi = x.astype(ml_dtypes.bfloat16).astype(np.float64)
    want = (x.astype(np.float64) - hi).astype(
        ml_dtypes.bfloat16).astype(np.float64)
    ok = np.array_equal(got, want)
    print(("OK " if ok else "FAIL") +
          " bf16-residual demotion canary (split packs)", flush=True)
    return ok


def main(n_taxa: int = 16, n_sites: int = 512) -> int:
    import jax.numpy as jnp
    from pllmod_tpu.ops import engine, repeats
    from pllmod_tpu.ops import charmap
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.topology import Tree
    from __graft_entry__ import _random_newick

    rng = np.random.default_rng(3)
    tree = Tree.from_newick(_random_newick(n_taxa, rng))
    failures = 0 if check_bf16_residual() else 1
    for states, cats, label in SHAPES:
        syms = charmap.MULTI_SYMBOLS[:states]
        mat = np.array(list(syms))[rng.integers(0, states,
                                                (n_taxa, n_sites))]
        seqs = ["".join(r) for r in mat]
        nr = states * (states - 1) // 2
        part = create_partition(
            seqs, states=states, n_rate_cats=cats,
            charmap=charmap.multistate(states),
            alpha=0.8 if cats > 1 else None,
            subst_rates=rng.uniform(0.5, 2.0, nr),
            freqs=rng.dirichlet([8] * states),
            compress=False, dtype=jnp.float32).cache_eigen()
        sched = (engine.fast_eval_schedule(part)
                 if engine.use_fast_kernel(part) else "levels")
        split = engine.use_split_clv(part)
        oracle = repeats.loglikelihood_repeats(part, tree)
        got = float(engine.tree_loglikelihood(part, tree))
        lvl = float(engine.tree_loglikelihood(part, tree,
                                              schedule="levels"))
        rel = abs(got - oracle) / abs(oracle)
        rel_l = abs(lvl - oracle) / abs(oracle)
        ok = rel < 1e-6
        failures += not ok
        print(f"{'OK ' if ok else 'FAIL'} {label:45s} "
              f"auto={sched}{'+split' if split else '':7s} "
              f"logL {got:.4f} oracle {oracle:.4f} "
              f"rel {rel:.2e} (levels {rel_l:.2e})", flush=True)
    failures += check_multi_eval(tree, rng, n_taxa, n_sites)
    failures += check_derivatives(tree, rng, n_taxa, n_sites)
    failures += check_bounded_serial(rng)
    failures += check_edge_grad(rng)
    failures += check_device_lbfgs(rng)
    failures += check_bounded_blo(rng)
    print("PASS" if failures == 0 else f"{failures} FAILURES", flush=True)
    return failures


def check_multi_eval(tree, rng, n_taxa, n_sites) -> int:
    """Mixed resident+fused combined-lane program (engine.multi_eval):
    a DNA+G4 (resident kind) + protein-like GT16 (fused kind) pair must
    each match its own single-partition production evaluation."""
    import jax.numpy as jnp
    from pllmod_tpu.ops import engine, charmap
    from pllmod_tpu.ops.partition import create_partition

    parts, singles = [], []
    for states, cats in ((4, 4), (16, 4)):
        syms = charmap.MULTI_SYMBOLS[:states]
        mat = np.array(list(syms))[rng.integers(0, states,
                                                (n_taxa, n_sites))]
        nr = states * (states - 1) // 2
        part = create_partition(
            ["".join(r) for r in mat], states=states, n_rate_cats=cats,
            charmap=charmap.multistate(states), alpha=0.8,
            subst_rates=rng.uniform(0.5, 2.0, nr),
            freqs=rng.dirichlet([8] * states),
            compress=False, dtype=jnp.float32).cache_eigen()
        parts.append(part)
        singles.append(float(engine.tree_loglikelihood(part, tree)))
    brls, arts, ks = [], [], []
    for part in parts:
        kind, arr, st = engine.fast_lane_args(part, tree)
        brls.append(jnp.asarray(np.asarray(tree.lengths, np.float32)))
        arts.append(arr)
        ks.append((kind, st))
    got = np.asarray(engine.multi_eval(parts, brls, arts, tuple(ks)))
    fails = 0
    for k in range(2):
        rel = abs(got[k] - singles[k]) / abs(singles[k])
        ok = rel < 1e-6
        fails += not ok
        print(f"{'OK ' if ok else 'FAIL'} multi_eval lane {k} "
              f"({ks[k][0]:8s}) logL {got[k]:.4f} single {singles[k]:.4f} "
              f"rel {rel:.2e}", flush=True)
    return fails


def check_derivatives(tree, rng, n_taxa, n_sites) -> int:
    """Fused derivative pipeline (megakernel directed CLVs → pallas
    sumtables → pallas per-edge derivatives) vs the XLA derivative path
    on-chip, DNA+G4 and GT16 shapes."""
    import jax.numpy as jnp
    from pllmod_tpu.ops import charmap, engine
    from pllmod_tpu.ops import derivatives as deriv_mod
    from pllmod_tpu.ops import pallas_deriv
    from pllmod_tpu.optimize import blo as blo_mod

    fails = 0
    for states, cats, label in ((4, 4, "DNA+G4"), (16, 4, "GT16+G4")):
        syms = charmap.MULTI_SYMBOLS[:states]
        mat = np.array(list(syms))[rng.integers(0, states,
                                                (n_taxa, n_sites))]
        nr = states * (states - 1) // 2
        part = create_partition_cached(
            ["".join(r) for r in mat], states, cats, rng)
        trav = blo_mod.DirectedTraversal(tree)
        fargs = blo_mod._fused_args(part, trav)
        if not fargs:
            print(f"SKIP deriv {label} (no fast path)", flush=True)
            continue
        brl = jnp.asarray(np.clip(np.asarray(tree.lengths), 1e-4, 100.0
                                  ).astype(np.float32))
        st, sc, eigen, lnB = blo_mod._deriv_pipeline_fast(
            part, brl, fargs["fused_idx"], fargs["fused_nslots"],
            fargs["fused_interp"], fargs["eref6"])
        lnl_f, df_f, ddf_f = pallas_deriv.edge_derivatives_pallas(
            part, st, sc, brl, eigen, lnB, fargs["fused_interp"])
        # XLA reference: level-scheduled directed CLVs + batched derivs
        levels, offsets, edge_ref, n_slots = trav.schedule()
        P = part.prob_matrices(brl)
        clvs, scalers = blo_mod._directed_clvs(part, P, levels, offsets,
                                               n_slots, None)
        st_x, sc_x = blo_mod._edge_sumtables(part, clvs, scalers,
                                             edge_ref, eigen)
        lnl_x, df_x, ddf_x = deriv_mod.edge_derivatives_batch(
            part, st_x, sc_x, brl, eigen)
        m = np.asarray(trav.edge_mask)
        rel_df = np.max(np.abs(np.asarray(df_f)[m] - np.asarray(df_x)[m])
                        / np.maximum(np.abs(np.asarray(df_x)[m]), 1e3))
        rel_l = np.max(np.abs(np.asarray(lnl_f)[m] - np.asarray(lnl_x)[m])
                       / np.abs(np.asarray(lnl_x)[m]))
        ok = rel_l < 1e-6 and rel_df < 1e-3
        fails += not ok
        print(f"{'OK ' if ok else 'FAIL'} deriv {label:8s} "
              f"rel lnl {rel_l:.2e} rel df {rel_df:.2e}", flush=True)
    return fails


def create_partition_cached(seqs, states, cats, rng):
    import jax.numpy as jnp
    from pllmod_tpu.ops import charmap
    from pllmod_tpu.ops.partition import create_partition
    nr = states * (states - 1) // 2
    return create_partition(
        seqs, states=states, n_rate_cats=cats,
        charmap=charmap.multistate(states), alpha=0.8,
        subst_rates=rng.uniform(0.5, 2.0, nr),
        freqs=rng.dirichlet([8] * states),
        compress=False, dtype=jnp.float32).cache_eigen()


def check_bounded_serial(rng) -> int:
    """Serial-order (slot-recycled) fused kernel vs the XLA bounded scan
    on-chip — validates the per-row RAW fences on real DMA (interpret
    mode cannot: round-4 serial mode, engine.loglikelihood_bounded_fused)."""
    import jax.numpy as jnp
    from pllmod_tpu.ops import engine
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.topology import Tree
    from __graft_entry__ import _random_newick

    fails = 0
    for n in (24, 96):
        tree = Tree.from_newick(_random_newick(n, rng))
        mat = np.array(list("ACGT"))[rng.integers(0, 4, (n, 512))]
        part = create_partition(["".join(r) for r in mat], states=4,
                                n_rate_cats=4, alpha=0.8,
                                compress=False,
                                dtype=jnp.float32).cache_eigen()
        l_scan, _ = engine.loglikelihood_bounded(part, tree)
        l_fused, _ = engine.loglikelihood_bounded_fused(part, tree)
        rel = abs(float(l_fused) - float(l_scan)) / abs(float(l_scan))
        ok = rel < 1e-6
        fails += not ok
        print(f"{'OK ' if ok else 'FAIL'} bounded-serial {n} taxa "
              f"rel {rel:.2e}", flush=True)
    return fails


def check_edge_grad(rng) -> int:
    """Edge-decomposition model-parameter gradients ON-CHIP vs autodiff
    through the XLA traversal (round-4's flagship-search fix,
    opt_model._edge_decomp_neg_loglh). The CLVs come from the REAL
    fused Pallas kernel here — interpret-mode tests cannot catch
    Mosaic/XLA-TPU-specific numeric bugs in this path."""
    import importlib
    import jax
    import jax.numpy as jnp
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.topology import Tree
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.common import PARAM_SUBST_RATES
    from __graft_entry__ import _random_newick
    om = importlib.import_module("pllmod_tpu.algorithm.opt_model")

    n = 16
    tree = Tree.from_newick(_random_newick(n, rng))
    mat = np.array(list("ACGT"))[rng.integers(0, 4, (n, 512))]
    part = create_partition(["".join(r) for r in mat], states=4,
                            n_rate_cats=4, alpha=0.8, compress=False,
                            dtype=jnp.float32)
    ti = TreeInfo(tree, [part], params_to_optimize=PARAM_SUBST_RATES)
    ea = om._edge_vg_args(ti, 0)
    if ea is None:
        print("FAIL edge-grad: fast kernel gated off", flush=True)
        return 1
    ops, root_info = tree.traversal_ops()
    ri = tuple(int(x) for x in root_info)
    ops_j = jnp.asarray(ops)
    brl = ea["brl"]
    args = (brl, ea["idx8"], ea["e1"], ea["e2"], ea["eref"], ea["swap"],
            ea["emask"], ea["e0"], ea["n_slots"], ea["interp"])
    fails = 0
    cases = [
        ("rates", om._neg_rates_fn, om._neg_rates_fn_edge,
         np.array([1.1, 2.0, 0.7, 0.9, 3.0], np.float32),
         (part, jnp.asarray(np.arange(6, dtype=np.int32)), 5)),
        ("freqs", om._neg_freqs_fn, om._neg_freqs_fn_edge,
         np.array([1.2, 0.8, 1.1], np.float32), (part,)),
        ("alpha", om._neg_cats_fn, om._neg_cats_fn_edge,
         np.array([0.2, 0.6, 1.2, 2.0], np.float32), (part,)),
    ]
    for name, fn_old, fn_new, x, pre in cases:
        xj = jnp.asarray(x)
        st_old = (3,) if name == "rates" else ()
        st_new = (3, 12, 13) if name == "rates" else (10, 11)
        f_o, g_o = jax.jit(jax.value_and_grad(fn_old),
                           static_argnums=st_old)(xj, *pre, ops_j, brl,
                                                  ri)
        f_n, g_n = jax.jit(jax.value_and_grad(fn_new),
                           static_argnums=st_new)(xj, *pre, *args)
        g_o, g_n = np.asarray(g_o), np.asarray(g_n)
        rel_f = abs(float(f_o - f_n)) / abs(float(f_o))
        rel_g = float(np.max(np.abs(g_o - g_n)
                             / (np.abs(g_o) + 1e-2 * np.abs(g_o).max())))
        ok = rel_f < 1e-6 and rel_g < 1e-3
        fails += not ok
        print(f"{'OK ' if ok else 'FAIL'} edge-grad {name:6s} "
              f"rel f {rel_f:.2e} rel g {rel_g:.2e}", flush=True)
    return fails


def check_device_lbfgs(rng) -> int:
    """The 189-dimension protein-GTR rates family through the
    whole-trajectory ON-DEVICE L-BFGS vs the host lock-step driver, both
    on-chip (round-4 VERDICT weak 3: the device lane algebra silently
    runs f32 on TPU and had only been validated in f64 on CPU and at
    6-dim DNA on-chip; the 189-dim projected L-BFGS is the case the
    optimizer exists for — replaces the vendored f2c L-BFGS-B,
    opt_algorithms.c:418-540)."""
    import os
    import importlib
    from pllmod_tpu.tree.topology import Tree
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.common import PARAM_SUBST_RATES
    from pllmod_tpu.ops import charmap
    from __graft_entry__ import _random_newick
    om = importlib.import_module("pllmod_tpu.algorithm.opt_model")

    n, sites = 10, 256
    tree = Tree.from_newick(_random_newick(n, rng))
    syms = charmap.MULTI_SYMBOLS[:20]
    mat = np.array(list(syms))[rng.integers(0, 20, (n, sites))]
    seqs = ["".join(r) for r in mat]
    res = {}
    for dev in ("0", "1"):
        os.environ["PLLMOD_LBFGS_ONDEVICE"] = dev
        try:
            part = create_partition_cached(seqs, 20, 4, np.random.
                                           default_rng(5))
            ti = TreeInfo(tree.copy(), [part],
                          params_to_optimize=PARAM_SUBST_RATES)
            lnl = om.opt_subst_rates(ti, tol=1e-3)
            res[dev] = (float(lnl),
                        np.asarray(ti.partitions[0].subst_rates[0]))
        finally:
            del os.environ["PLLMOD_LBFGS_ONDEVICE"]
    (lh, rh), (ld, rd) = res["0"], res["1"]
    dl = abs(lh - ld)
    # Endpoint-rate distance is only a diagnostic: 189 GTR rates from
    # 256 random sites are heavily underdetermined, so the f32 device
    # lane algebra legitimately lands elsewhere on the flat ridge than
    # the f64 host algebra while matching logL to ~1e-2.  The real
    # correctness criterion is that the device endpoint is a genuine
    # stationary point of the same quality: restart the HOST (f64
    # algebra) driver FROM the device endpoint and require it cannot
    # meaningfully improve on it.
    drel = float(np.max(np.abs(rd - rh) / np.maximum(np.abs(rh), 1e-3)))
    part = create_partition_cached(seqs, 20, 4,
                                   np.random.default_rng(5))
    part = part.with_model_params(subst_rates=np.asarray(
        rd, np.float64)[None, :]).cache_eigen()
    ti = TreeInfo(tree.copy(), [part],
                  params_to_optimize=PARAM_SUBST_RATES)
    os.environ["PLLMOD_LBFGS_ONDEVICE"] = "0"
    try:
        lnl_polish = float(om.opt_subst_rates(ti, tol=1e-3))
    finally:
        del os.environ["PLLMOD_LBFGS_ONDEVICE"]
    gain = lnl_polish - ld        # host improvement over device endpoint
    ok = dl <= max(1e-5 * abs(lh), 0.5) and gain <= 0.05
    print(f"{'OK ' if ok else 'FAIL'} device-L-BFGS 189-dim PROTGTR "
          f"host {lh:.4f} dev {ld:.4f} dlnl {dl:.2e} "
          f"host-polish gain {gain:+.3f} (rate drift on the flat "
          f"ridge {drel:.2e}, diagnostic)", flush=True)
    return int(not ok)


def check_bounded_blo(rng) -> int:
    """Memory-bounded whole-tree BLO (optimize/blo_bounded.py) vs the
    full directed-CLV driver ON-CHIP (the round-5 capacity-mode sweep:
    segmented megakernel + sumtable + Newton kernels on real Mosaic)."""
    import jax.numpy as jnp
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.topology import Tree
    from pllmod_tpu.optimize.blo import optimize_branch_lengths
    from pllmod_tpu.optimize.blo_bounded import \
        optimize_branch_lengths_bounded
    from __graft_entry__ import _random_newick

    n = 40
    tree = Tree.from_newick(_random_newick(n, rng))
    mat = np.array(list("ACGT"))[rng.integers(0, 4, (n, 512))]
    part = create_partition(["".join(r) for r in mat], states=4,
                            n_rate_cats=4, alpha=0.8, compress=False,
                            dtype=jnp.float32).cache_eigen()
    t_f, t_b = tree.copy(), tree.copy()
    _, l_full = optimize_branch_lengths(part, t_f, tolerance=1e-7,
                                        max_sweeps=64)
    _, l_b = optimize_branch_lengths_bounded(part, t_b, tolerance=1e-7,
                                             max_sweeps=64)
    d = abs(l_b - l_full)
    ok = d < 0.05
    print(f"{'OK ' if ok else 'FAIL'} bounded-BLO 40 taxa "
          f"full {l_full:.4f} bounded {l_b:.4f} d {d:.3f}", flush=True)
    return int(not ok)


if __name__ == "__main__":
    sys.exit(main())
