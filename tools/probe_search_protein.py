"""Protein-flagship search on-chip: 96 taxa x 1024 AA sites, LG+G4 f32
(CS=80 fused read-split kernels) through the full fast+thorough
ml_search with alpha+brlens optimization — the wide-state search-scale
demonstration (multipart probe covered 24 taxa). Writes
tools/probe_search_protein.out."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

OUT = (open("/root/repo/tools/probe_search_protein.out", "w")
       if __name__ == "__main__" else sys.stderr)
T0 = time.perf_counter()


def p(*a):
    print(f"[{time.perf_counter()-T0:8.1f}s]", *a, file=OUT, flush=True)
    print(*a, flush=True)


def main():
    import jax
    from scipy.linalg import expm
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.ops import charmap as cm
    from pllmod_tpu.ops import gamma as gamma_mod
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.tree import starting
    from pllmod_tpu.algorithm.search import ml_search
    from pllmod_tpu.utils import models_aa
    from pllmod_tpu.common import PARAM_ALPHA, PARAM_BRANCHES_ITERATIVE
    from tests import reference_impl as ref

    p("devices:", jax.devices())
    rng = np.random.default_rng(80)
    n_taxa, n_sites = 96, 1024
    true_tree = ref.random_binary_tree(rng, n_taxa, 0.02, 0.6)
    lg = models_aa.info("LG")
    rates, freqs = np.asarray(lg.rates), np.asarray(lg.freqs)

    # simulate AA data down the true tree under LG+G4
    S = np.zeros((20, 20))
    iu = np.triu_indices(20, 1)
    S[iu] = rates
    S = S + S.T
    Q = S * freqs[None, :]
    np.fill_diagonal(Q, -Q.sum(1))
    Q /= -(np.diag(Q) * freqs).sum()
    cat_rates = np.asarray(gamma_mod.compute_gamma_cats_host(0.9, 4,
                                                             "mean"))
    site_cat = rng.integers(0, 4, n_sites)
    adj = true_tree.adjacency()
    seqs_i = {true_tree.n_tips: rng.choice(20, n_sites, p=freqs)}
    stack = [(true_tree.n_tips, -1)]
    while stack:
        node, parent = stack.pop()
        for nbr, e in adj[node]:
            if nbr == parent:
                continue
            t = float(true_tree.lengths[e])
            Ps = [expm(Q * t * r) for r in cat_rates]
            cur = seqs_i[node]
            out = np.empty(n_sites, np.int64)
            for c in range(4):
                m = site_cat == c
                if m.any():
                    rows = Ps[c][cur[m]]
                    out[m] = (rng.random((m.sum(), 1)) <
                              rows.cumsum(1)).argmax(1)
            seqs_i[nbr] = out
            stack.append((nbr, node))
    chars = np.array(list("ARNDCQEGHILKMFPSTWYV"))
    seqs = ["".join(chars[seqs_i[t]]) for t in range(n_taxa)]
    p(f"simulated LG+G4 {n_taxa}x{n_sites}")

    part = create_partition(seqs, states=20, n_rate_cats=4, alpha=0.5,
                            charmap=cm.AA, subst_rates=rates,
                            freqs=freqs, dtype=jnp.float32)
    p(f"patterns: {part.n_patterns_padded}")
    labels = [f"t{i}" for i in range(n_taxa)]
    start_tree, pscore = starting.parsimony_stepwise(labels, seqs, cm.AA,
                                                     seed=1)
    p(f"parsimony start (score {pscore})")
    ti = TreeInfo(start_tree, [part],
                  params_to_optimize=PARAM_ALPHA
                  | PARAM_BRANCHES_ITERATIVE)
    walls = {"t": time.perf_counter(), "prev": -np.inf, "viol": 0}

    def on_round(rec):
        now = time.perf_counter()
        p(f"round {rec.mode:8s} r={rec.radius:2d} logL {rec.loglh:.3f} "
          f"applied {rec.n_applied:3d} wall {now-walls['t']:.1f}s")
        if rec.loglh < walls["prev"] - 1e-3:
            walls["viol"] += 1
        walls["prev"] = max(walls["prev"], rec.loglh)
        walls["t"] = now

    t0 = time.perf_counter()
    res = ml_search(ti, radius_min=1, radius_step=5, radius_max=10,
                    max_rounds=12, thorough=True, on_round=on_round)
    p(f"SEARCH DONE: start {res.start_loglh:.3f} -> {res.loglh:.3f} in "
      f"{res.n_rounds} rounds, {time.perf_counter()-t0:.0f}s, "
      f"monotone violations {walls['viol']}")
    from pllmod_tpu.tree.splits import rf_distance
    p(f"RF to true tree: {rf_distance(ti.tree, true_tree)} "
      f"(max {2*(n_taxa-3)})")


if __name__ == "__main__":
    main()
