"""A REAL search at 1024 taxa (round-5 item 3): full fast+thorough
ml_search to CONVERGENCE at 1024 x 2048 GTR+G4 f32 on one chip, with
per-round wall decomposition (host build vs device) and fresh-compile
counts. Contrast: the round-4 probe ran 4 fast rounds only (RF 268,
182-264 s/round, ~90 ms/candidate host build); round 5 adds the native
host builds + converged thorough stage. Writes
tools/probe_search1k_full.out."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

OUT = (open("/root/repo/tools/probe_search1k_full.out", "w")
       if __name__ == "__main__" else sys.stderr)
T0 = time.perf_counter()


def p(*a):
    print(f"[{time.perf_counter()-T0:8.1f}s]", *a, file=OUT, flush=True)
    print(*a, flush=True)


def main():
    import jax
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.tree import starting
    from pllmod_tpu.ops import charmap as charmap_mod
    from pllmod_tpu.algorithm.search import ml_search
    from pllmod_tpu.common import (PARAM_SUBST_RATES, PARAM_FREQUENCIES,
                                   PARAM_ALPHA, PARAM_BRANCHES_ITERATIVE)
    from tests import reference_impl as ref
    sys.path.insert(0, "/root/repo/tools")
    from probe_search246 import simulate

    p("devices:", jax.devices())
    rng = np.random.default_rng(1024)
    n_taxa, n_sites = 1024, 2048
    true_tree = ref.random_binary_tree(rng, n_taxa, 0.02, 0.5)
    rates = rng.uniform(0.5, 2.5, 6)
    freqs = rng.dirichlet([12, 9, 9, 12])
    t0 = time.perf_counter()
    seqs = simulate(rng, true_tree, rates, freqs, 0.9, n_sites)
    p(f"simulated {n_taxa}x{n_sites} in {time.perf_counter()-t0:.0f}s")
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.5,
                            dtype=jnp.float32)
    p(f"patterns: {part.n_patterns_padded}")
    t0 = time.perf_counter()
    labels = [f"t{i}" for i in range(n_taxa)]
    start_tree, pscore = starting.parsimony_stepwise(
        labels, seqs, charmap_mod.DNA, seed=1)
    p(f"parsimony start (score {pscore}) in {time.perf_counter()-t0:.1f}s")
    ti = TreeInfo(start_tree, [part],
                  params_to_optimize=(PARAM_SUBST_RATES | PARAM_FREQUENCIES
                                      | PARAM_ALPHA
                                      | PARAM_BRANCHES_ITERATIVE))
    walls = {"t": time.perf_counter(), "prev": -np.inf, "viol": 0}
    import pllmod_tpu.algorithm.spr as spr_mod
    hb = {"prev": 0.0}

    def on_round(rec):
        now = time.perf_counter()
        hcur = spr_mod.HOST_BUILD_SECONDS
        p(f"round {rec.mode:8s} r={rec.radius:2d} logL {rec.loglh:.3f} "
          f"applied {rec.n_applied:3d} wall {now-walls['t']:.1f}s "
          f"host_build {hcur-hb['prev']:.1f}s")
        hb["prev"] = hcur
        if rec.loglh < walls["prev"] - 1e-3:
            walls["viol"] += 1
        walls["prev"] = max(walls["prev"], rec.loglh)
        walls["t"] = now

    t0 = time.perf_counter()
    res = ml_search(ti, radius_min=1, radius_step=5, radius_max=10,
                    thorough=True, on_round=on_round)
    total = time.perf_counter() - t0
    from pllmod_tpu.tree.splits import rf_distance
    rf = rf_distance(ti.tree, true_tree)
    p(f"CONVERGED: start {res.start_loglh:.3f} -> {res.loglh:.3f} in "
      f"{res.n_rounds} rounds, {total:.0f}s total, monotone violations "
      f"{walls['viol']}")
    p(f"RF to true tree: {rf} (max {2*(n_taxa-3)})")
    p(f"host-build total: {spr_mod.HOST_BUILD_SECONDS:.1f}s "
      f"({100*spr_mod.HOST_BUILD_SECONDS/total:.0f}% of search)")


if __name__ == "__main__":
    main()
