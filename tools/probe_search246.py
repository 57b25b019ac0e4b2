"""Reference-flagship-scale e2e search on-chip (VERDICT r3 item 4): the
246-taxa x 4465-pattern shape (reference test/Makefile:59-63), GTR+G4
f32, full ml_search (fast + thorough stages, interleaved model opt,
batched SPR scoring). Records per-round wall + logL (monotone contract)
and a final decomposition. Writes tools/probe_search246.out.

Sequences are SIMULATED down a random 'true' tree (GTR+G4) so the
search has real signal; the start tree is a parsimony stepwise-addition
tree (tree/starting.py), matching the raxml-ng workflow the reference
feeds (SURVEY §3.4).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

OUT = (open("/root/repo/tools/probe_search246.out", "w")
       if __name__ == "__main__" else sys.stderr)
T0 = time.perf_counter()


def p(*a):
    print(f"[{time.perf_counter()-T0:8.1f}s]", *a, file=OUT, flush=True)
    print(*a, flush=True)


def simulate(rng, tree, rates, freqs, alpha, n_sites, cats=4):
    from scipy.linalg import expm
    from pllmod_tpu.ops import gamma as gamma_mod
    states = len(freqs)
    S = np.zeros((states, states))
    iu = np.triu_indices(states, 1)
    S[iu] = rates
    S = S + S.T
    Q = S * freqs[None, :]
    np.fill_diagonal(Q, -Q.sum(1))
    Q /= -(np.diag(Q) * freqs).sum()
    cat_rates = np.asarray(gamma_mod.compute_gamma_cats_host(alpha, cats,
                                                             "mean"))
    site_cat = rng.integers(0, cats, n_sites)
    adj = tree.adjacency()
    root = tree.n_tips
    seqs = {root: rng.choice(states, n_sites, p=freqs)}
    stack = [(root, -1)]
    while stack:
        node, parent = stack.pop()
        for nbr, e in adj[node]:
            if nbr == parent:
                continue
            t = float(tree.lengths[e])
            Ps = [expm(Q * t * r) for r in cat_rates]
            cur = seqs[node]
            out = np.empty(n_sites, np.int64)
            for c in range(cats):
                m = site_cat == c
                if m.any():
                    rows = Ps[c][cur[m]]
                    out[m] = (rng.random((m.sum(), 1)) <
                              rows.cumsum(1)).argmax(1)
            seqs[nbr] = out
            stack.append((nbr, node))
    chars = np.array(list("ACGT"))
    return ["".join(chars[seqs[t]]) for t in range(tree.n_tips)]


def main():
    import jax
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.tree import starting
    from pllmod_tpu.algorithm.search import ml_search
    from pllmod_tpu.common import (PARAM_SUBST_RATES, PARAM_FREQUENCIES,
                                   PARAM_ALPHA, PARAM_BRANCHES_ITERATIVE)
    from tests import reference_impl as ref

    p("devices:", jax.devices())
    rng = np.random.default_rng(246)
    n_taxa, n_sites = 246, 4465
    true_tree = ref.random_binary_tree(rng, n_taxa, 0.02, 0.6)
    rates = rng.uniform(0.5, 2.5, 6)
    freqs = rng.dirichlet([12, 9, 9, 12])
    t0 = time.perf_counter()
    seqs = simulate(rng, true_tree, rates, freqs, 0.9, n_sites)
    p(f"simulated {n_taxa}x{n_sites} in {time.perf_counter()-t0:.0f}s")

    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.5,
                            dtype=jnp.float32)
    p(f"patterns: {part.n_patterns_padded} (compressed)")
    t0 = time.perf_counter()
    from pllmod_tpu.ops import charmap as charmap_mod
    labels = [f"t{i}" for i in range(n_taxa)]
    start_tree, pscore = starting.parsimony_stepwise(
        labels, seqs, charmap_mod.DNA, seed=1)
    p(f"parsimony start tree (score {pscore}) in "
      f"{time.perf_counter()-t0:.0f}s")

    ti = TreeInfo(start_tree, [part],
                  params_to_optimize=(PARAM_SUBST_RATES | PARAM_FREQUENCIES
                                      | PARAM_ALPHA
                                      | PARAM_BRANCHES_ITERATIVE))
    walls = {"t": time.perf_counter(), "prev_lnl": -np.inf, "viol": 0}

    def on_round(rec):
        now = time.perf_counter()
        p(f"round {rec.mode:8s} r={rec.radius:2d} logL {rec.loglh:.3f} "
          f"applied {rec.n_applied:3d} wall {now-walls['t']:.1f}s")
        if rec.loglh < walls["prev_lnl"] - 1e-3:
            walls["viol"] += 1
        walls["prev_lnl"] = max(walls["prev_lnl"], rec.loglh)
        walls["t"] = now

    t0 = time.perf_counter()
    res = ml_search(ti, radius_min=1, radius_step=5, radius_max=15,
                    max_rounds=18, thorough=True, on_round=on_round)
    p(f"SEARCH DONE: start {res.start_loglh:.3f} -> final "
      f"{res.loglh:.3f} in {res.n_rounds} rounds, "
      f"{time.perf_counter()-t0:.0f}s total, monotone violations "
      f"{walls['viol']}")
    from pllmod_tpu.tree.splits import rf_distance
    p(f"RF to true tree: {rf_distance(ti.tree, true_tree)} "
      f"(max {2*(n_taxa-3)})")


if __name__ == "__main__":
    main()
