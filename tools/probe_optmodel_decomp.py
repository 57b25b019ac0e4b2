"""Per-family wall decomposition of opt_model at the flagship shape
(246 taxa x 4480 patterns, GTR+G4 f32): times each family driver
(subst rates / frequencies / alpha / branches) plus the evaluation
dispatches inside them, cold then warm. Follow-up to
probe_search246_decomp.py, which attributed ~97% of a search round to
opt_model. Writes tools/probe_optmodel_decomp.out."""
import sys
import time
from functools import wraps

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

OUT = (open("/root/repo/tools/probe_optmodel_decomp.out", "w")
       if __name__ == "__main__" else sys.stderr)
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
        p(f"    {name:28s} {c:6d} calls {w:8.1f}s")
    ACC.clear()


def main():
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.tree import starting
    from pllmod_tpu.ops import charmap as charmap_mod
    import importlib
    om = importlib.import_module("pllmod_tpu.algorithm.opt_model")
    from pllmod_tpu.optimize import blo as blo_mod
    from pllmod_tpu.optimize import lbfgsb as lbfgsb_mod
    from pllmod_tpu.common import (PARAM_SUBST_RATES, PARAM_FREQUENCIES,
                                   PARAM_ALPHA, PARAM_BRANCHES_ITERATIVE)
    from tests import reference_impl as ref
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

    # family-level + inner-loop timers
    om.opt_subst_rates = timed("opt_subst_rates", om.opt_subst_rates)
    om.opt_frequencies = timed("opt_frequencies", om.opt_frequencies)
    om.opt_alpha = timed("opt_alpha", om.opt_alpha)
    om.opt_brlen = timed("opt_brlen(BLO)", om.opt_brlen)
    TreeInfo.compute_loglh = timed("compute_loglh",
                                   TreeInfo.compute_loglh)
    # the combined lane value+grad program: one call per L-BFGS
    # evaluation step (dispatch + host sync) — wrap what the cache
    # returns so every evaluation is counted
    orig_lane_prog = om._vg_lane_program

    def lane_prog_timed(family, statics):
        return timed(f"vg_prog[{family}]", orig_lane_prog(family, statics))

    om._vg_lane_program = lane_prog_timed
    om.minimize_lbfgsb_multi = timed("lbfgsb_multi",
                                     om.minimize_lbfgsb_multi)
    blo_mod.optimize_branch_lengths_treeinfo = timed(
        "blo_treeinfo", blo_mod.optimize_branch_lengths_treeinfo)

    for tag in ("cold", "warm1", "warm2"):
        t0 = time.perf_counter()
        lnl = om.opt_model(ti, tol=1e-2)
        p(f"opt_model {tag}: logL {lnl:.3f} in "
          f"{time.perf_counter()-t0:.1f}s")
        snapshot(tag)


if __name__ == "__main__":
    main()
