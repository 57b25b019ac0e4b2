"""Independent brute-force likelihood implementation (numpy + scipy).

Serves the role of the reference's scalar-CPU kernel as golden oracle
(SURVEY.md §4 "kernel-equivalence test"): a direct, slow, float64
implementation of Felsenstein pruning with scipy matrix exponentials,
written with completely different code paths from the JAX engine.
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import expm
from scipy.stats import gamma as gamma_dist


def build_q(rates, freqs):
    s = len(freqs)
    R = np.zeros((s, s))
    R[np.triu_indices(s, 1)] = rates
    R = R + R.T
    Q = R * freqs[None, :]
    np.fill_diagonal(Q, 0.0)
    np.fill_diagonal(Q, -Q.sum(axis=1))
    mean_rate = -np.sum(freqs * np.diag(Q))
    return Q / mean_rate


def gamma_cats_mean(alpha, k):
    if k == 1:
        return np.ones(1)
    bounds = gamma_dist.ppf(np.arange(1, k) / k, a=alpha, scale=1.0 / alpha)
    full = np.concatenate([[0.0], bounds, [np.inf]])
    cdf1 = gamma_dist.cdf(full * alpha, a=alpha + 1.0)  # rate-1 gamma at a+1
    return k * np.diff(cdf1)


def gamma_cats_median(alpha, k):
    if k == 1:
        return np.ones(1)
    med = gamma_dist.ppf((2 * np.arange(k) + 1) / (2 * k), a=alpha,
                         scale=1.0 / alpha)
    return med * k / med.sum()


def brute_force_loglh(tree, tip_masks, rates, freqs, rate_cats, rate_weights,
                      prop_invar=0.0, pattern_weights=None):
    """Direct recursive pruning likelihood.

    Args:
      tree: pllmod_tpu Tree (host object; only adjacency + lengths used)
      tip_masks: uint64 [tips, sites] state bitmasks per tip/site
      rates, freqs: model params (single matrix)
      rate_cats, rate_weights: [C]
    Returns:
      total logL (float), per-site logL [sites]
    """
    states = len(freqs)
    n_tips, n_sites = tip_masks.shape
    Q = build_q(np.asarray(rates, float), np.asarray(freqs, float))
    scale = np.asarray(rate_cats, float) / (1.0 - prop_invar)
    if pattern_weights is None:
        pattern_weights = np.ones(n_sites)

    bits = np.arange(states, dtype=np.uint64)
    tip_clv = ((tip_masks[:, :, None] >> bits[None, None, :]) & np.uint64(1)
               ).astype(float)  # [tips, sites, states]

    adj = tree.adjacency()

    def clv(node, parent, C_rate):
        """Returns ([sites, states], log_scale [sites]) for subtree below
        node as seen from parent, with Q scaled by C_rate."""
        if node < n_tips:
            return tip_clv[node], np.zeros(n_sites)
        out = np.ones((n_sites, states))
        logs = np.zeros(n_sites)
        for nbr, e in adj[node]:
            if nbr == parent:
                continue
            child_clv, child_logs = clv(nbr, node, C_rate)
            P = expm(Q * tree.lengths[e] * C_rate)
            out = out * (child_clv @ P.T)
            logs = logs + child_logs
        m = out.max(axis=1)
        m = np.where(m > 0, m, 1.0)
        out /= m[:, None]
        logs += np.log(m)
        return out, logs

    # virtual root on the first live edge
    root_edge = int(np.nonzero(tree.edge_nodes[:, 0] >= 0)[0][0])
    u, v = (int(x) for x in tree.edge_nodes[root_edge])

    site_l_var = np.zeros(n_sites)
    # accumulate across categories in linear space with per-cat log offsets
    cat_terms = []
    for c, r in enumerate(scale):
        cu, lu = clv(u, v, r)
        cv, lv = clv(v, u, r)
        P = expm(Q * tree.lengths[root_edge] * r)
        lk = np.einsum("si,ij,sj,i->s", cu, P, cv, np.asarray(freqs, float))
        cat_terms.append((rate_weights[c] * lk, lu + lv))
    # combine: all cats share tips, but scalings differ per cat — use logsumexp
    logs = np.stack([np.log(np.maximum(t, 1e-300)) + l for t, l in cat_terms])
    mx = logs.max(axis=0)
    site_lnl_var = mx + np.log(np.exp(logs - mx).sum(axis=0))

    if prop_invar > 0:
        inv_mask = tip_masks[0]
        for i in range(1, n_tips):
            inv_mask = inv_mask & tip_masks[i]
        inv_bits = ((inv_mask[:, None] >> bits[None, :]) & np.uint64(1)).astype(float)
        inv_term = inv_bits @ np.asarray(freqs, float)
        a = np.log1p(-prop_invar) + site_lnl_var
        with np.errstate(divide="ignore"):
            b = np.log(prop_invar) + np.log(inv_term)
        site_lnl = np.logaddexp(a, b)
        site_lnl = np.where(inv_term > 0, site_lnl, a)
    else:
        site_lnl = site_lnl_var

    return float(np.sum(site_lnl * pattern_weights)), site_lnl


def random_binary_tree(rng, n_tips, min_len=0.01, max_len=0.9):
    """Random unrooted binary tree as a pllmod_tpu Tree."""
    from pllmod_tpu.tree.topology import Tree

    labels = [f"t{i}" for i in range(n_tips)]
    # start with a 3-star around inner node n_tips
    edges = [[0, n_tips], [1, n_tips], [2, n_tips]]
    next_inner = n_tips + 1
    for tip in range(3, n_tips):
        # split a random existing edge
        e = rng.integers(len(edges))
        u, v = edges[e]
        w = next_inner
        next_inner += 1
        edges[e] = [u, w]
        edges.append([w, v])
        edges.append([tip, w])
    lengths = rng.uniform(min_len, max_len, size=len(edges))
    return Tree(n_tips, labels, np.array(edges, np.int32), lengths,
                n_nodes=next_inner)


def random_sequences(rng, n_tips, n_sites, alphabet="ACGT", gap_frac=0.05):
    chars = np.array(list(alphabet) + ["-"])
    probs = [((1 - gap_frac) / len(alphabet))] * len(alphabet) + [gap_frac]
    seqs = rng.choice(chars, p=probs, size=(n_tips, n_sites))
    return ["".join(row) for row in seqs]


def simulated_sequences(rng, tree, n_sites, rates=None, freqs=None,
                        alpha=0.9, cats=4):
    """DNA sequences evolved ALONG ``tree`` under GTR+Γ (scipy expm per
    edge) — tree-signal data for optimizer golden tests: random
    sequences carry no phylogenetic signal, so their likelihood surface
    has degenerate/saturated optima that different (all-correct) ascent
    schemes resolve differently."""
    from scipy.linalg import expm
    from pllmod_tpu.ops import gamma as gamma_mod
    if rates is None:
        rates = np.asarray([1.2, 2.5, 0.8, 1.1, 3.0, 1.0])
    if freqs is None:
        freqs = np.asarray([0.3, 0.25, 0.2, 0.25])
    states = len(freqs)
    S = np.zeros((states, states))
    S[np.triu_indices(states, 1)] = rates
    S = S + S.T
    Q = S * freqs[None, :]
    np.fill_diagonal(Q, -Q.sum(1))
    Q /= -(np.diag(Q) * freqs).sum()
    cat_rates = np.asarray(
        gamma_mod.compute_gamma_cats_host(alpha, cats, "mean"))
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
            Ps = [expm(Q * float(tree.lengths[e]) * r) for r in cat_rates]
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
