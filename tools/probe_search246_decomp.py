"""Warm-round wall decomposition of ml_search at the reference-flagship
shape (246 taxa x 4465 patterns; VERDICT r3 item 4: 'wall decomposition
in PERF_NOTES; no per-topology recompiles (assert compile counts)').

Instruments the search driver by wrapping its component entry points
with wall-clock accumulators (host syncs happen inside each component,
so the walls are attributable):
  - spr_round (SPR scoring + applies)       [search.spr_round]
  - opt_model (interleaved model opt)       [search.opt_model]
  - _score_regrafts_batch[_sharded] (the batched scoring dispatches)
  - TreeInfo.compute_loglh (evaluations)
  - optimize_branch_lengths* (BLO calls from inside the round)

After a warmup round, enables jax_log_compiles and asserts the warm
rounds trigger no fresh jit-entry compiles (the per-topology recompile
class of bug; eager while_loop recompiles are invisible here but were
eliminated in round 3 — see CLAUDE.md).

Writes tools/probe_search246_decomp.out.
"""
import logging
import sys
import time
from functools import wraps

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

OUT = open("/root/repo/tools/probe_search246_decomp.out", "w")
T0 = time.perf_counter()


def p(*a):
    print(f"[{time.perf_counter()-T0:8.1f}s]", *a, file=OUT, flush=True)
    print(*a, flush=True)


ACC: dict = {}


def timed(name, fn):
    @wraps(fn)
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            c, w = ACC.get(name, (0, 0.0))
            ACC[name] = (c + 1, w + time.perf_counter() - t0)
    return wrap


def snapshot(label):
    p(f"--- {label}")
    for name, (c, w) in sorted(ACC.items(), key=lambda kv: -kv[1][1]):
        p(f"    {name:28s} {c:5d} calls {w:8.1f}s")
    ACC.clear()


def main():
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.tree import starting
    from pllmod_tpu.ops import charmap as charmap_mod
    from pllmod_tpu.algorithm import search as search_mod
    from pllmod_tpu.algorithm import spr as spr_mod
    from pllmod_tpu.common import (PARAM_SUBST_RATES, PARAM_FREQUENCIES,
                                   PARAM_ALPHA, PARAM_BRANCHES_ITERATIVE)
    from tests import reference_impl as ref
    sys.path.insert(0, "/root/repo/tools")
    from probe_search246 import simulate

    p("devices:", jax.devices())
    rng = np.random.default_rng(246)
    n_taxa, n_sites = 246, 4465
    true_tree = ref.random_binary_tree(rng, n_taxa, 0.02, 0.6)
    rates = rng.uniform(0.5, 2.5, 6)
    freqs = rng.dirichlet([12, 9, 9, 12])
    seqs = simulate(rng, true_tree, rates, freqs, 0.9, n_sites)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.5,
                            dtype=jnp.float32)
    labels = [f"t{i}" for i in range(n_taxa)]
    start_tree, _ = starting.parsimony_stepwise(
        labels, seqs, charmap_mod.DNA, seed=1)
    ti = TreeInfo(start_tree, [part],
                  params_to_optimize=(PARAM_SUBST_RATES | PARAM_FREQUENCIES
                                      | PARAM_ALPHA
                                      | PARAM_BRANCHES_ITERATIVE))

    # --- instrument -----------------------------------------------------
    search_mod.spr_round = timed("spr_round", search_mod.spr_round)
    search_mod.opt_model = timed("opt_model", search_mod.opt_model)
    spr_mod._score_regrafts_batch = timed(
        "score_batch", spr_mod._score_regrafts_batch)
    spr_mod._score_regrafts_batch_sharded = timed(
        "score_batch_sharded", spr_mod._score_regrafts_batch_sharded)
    spr_mod.optimize_branch_lengths_treeinfo = timed(
        "blo_treeinfo", spr_mod.optimize_branch_lengths_treeinfo)
    spr_mod._fused_clvs_brl = timed("full_clv_rebuild",
                                    spr_mod._fused_clvs_brl)
    spr_mod._prob_matrices_jit = timed("pmatrices",
                                       spr_mod._prob_matrices_jit)
    spr_mod._score_all_regrafts_thorough = timed(
        "score_thorough", spr_mod._score_all_regrafts_thorough)
    TreeInfo.compute_loglh = timed("compute_loglh", TreeInfo.compute_loglh)

    rounds = {"n": 0}

    def on_round(rec):
        rounds["n"] += 1
        snapshot(f"round {rounds['n']} ({rec.mode} r={rec.radius}) "
                 f"logL {rec.loglh:.3f} applied {rec.n_applied}")

    # warmup: one fast + one thorough round pay the per-shape compiles
    # of BOTH stages (and the final model-opt) before counting
    t0 = time.perf_counter()
    search_mod.ml_search(ti, radius_min=1, radius_step=5, radius_max=10,
                         max_rounds=14, thorough=True, on_round=on_round)
    p(f"warmup search: {time.perf_counter()-t0:.0f}s")

    # warm: count fresh jit-entry compiles across 2 more rounds
    compiles = []

    class H(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            # count real XLA compilations only: eager tiny-op TRACE
            # records re-fire per call (constant folding defeats the
            # eager cache) but are sub-ms host work + hash-memoized on
            # the axon executable store — not compiles
            if "XLA compilation" in msg:
                compiles.append(msg)

    jax.config.update("jax_log_compiles", True)
    logger = logging.getLogger("jax._src.dispatch")
    h = H()
    logger.addHandler(h)
    try:
        t0 = time.perf_counter()
        res = search_mod.ml_search(ti, radius_min=1, radius_step=5,
                                   radius_max=10, max_rounds=2,
                                   thorough=True, on_round=on_round)
        p(f"2 warm rounds: {time.perf_counter()-t0:.0f}s, "
          f"final logL {res.loglh:.3f}")
    finally:
        logger.removeHandler(h)
        jax.config.update("jax_log_compiles", False)
    p(f"fresh jit-entry compiles during warm rounds: {len(compiles)}")
    for m in compiles[:20]:
        p("  COMPILE:", m.split(" for jit")[0][:120], "|",
          m[m.find("jit"):][:80] if "jit" in m else "")
    # both stages were warmed above; residual compiles come only from
    # shape-bucket growth (batch K / window W buckets)
    assert len(compiles) < 20, "per-topology recompile regression"
    p("OK decomposition complete")


main()
