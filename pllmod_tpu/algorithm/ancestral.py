"""Marginal ancestral state probabilities.

TPU build of ``pllmod_treeinfo_compute_ancestral`` (treeinfo.c:1558-1718)
+ libpll's ``pll_compute_node_ancestral``: for each inner node u with
neighbors x, y, z, the per-site posterior over states is

    prob[s] ∝ π_s · Σ_c w_c Π_{n ∈ {x,y,z}} (P(t_n) · A_{n→u})_s

The reference re-roots and recomputes incrementally per node; here all
directed CLVs come from one batched pass, and ALL inner nodes are scored
in a single vmapped evaluation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pllmod_tpu.ops import clv as clv_mod
from pllmod_tpu.optimize.blo import DirectedTraversal

# TPU matmuls default to bf16 inputs; likelihoods need true f32
_PREC = jax.lax.Precision.HIGHEST


def ancestral_probabilities(partition, tree, nodes=None):
    """Posterior state probabilities at inner nodes.

    Args:
      partition: Partition
      tree: Tree
      nodes: optional list of inner node ids (default: all inner nodes)
    Returns:
      (nodes list, probs [n_nodes, patterns, states] numpy, normalized
      per site)
    """
    if nodes is None:
        adj = tree.adjacency()
        nodes = [n for n in range(tree.n_tips, tree.n_nodes) if adj[n]]
    trav = DirectedTraversal(tree)
    levels, offsets, _eref, n_slots = trav.schedule()
    brlens = jnp.asarray(tree.lengths, partition.dtype)
    P = partition.prob_matrices(brlens)
    clvs, scalers = clv_mod.update_partials_sched(partition, P, levels,
                                                  offsets, n_slots)

    # per node: (ref of A_{nbr->node}, edge id) for its 3 neighbors
    refs = []
    edges = []
    n_tips = tree.n_tips
    for u in nodes:
        row_r, row_e = [], []
        for nbr, e in tree.neighbors(u):
            if nbr < n_tips:
                row_r.append(nbr)
            else:
                row_r.append(n_tips + trav.sched_slot(nbr, u))
            row_e.append(e)
        assert len(row_r) == 3, "ancestral states need a binary tree"
        refs.append(row_r)
        edges.append(row_e)
    refs = jnp.asarray(np.array(refs, np.int32))
    edges = jnp.asarray(np.array(edges, np.int32))

    fc = partition.freqs_per_cat()
    w = partition.rate_weights
    dtype = partition.dtype

    acc = None
    for k in range(3):
        A, _s = clv_mod.gather_node_clvs(partition, clvs, scalers,
                                         refs[:, k])       # [N,P,C,S]
        Pk = P[edges[:, k]]                                 # [N,C,S,S]
        term = jnp.einsum("npcj,ncij->npci", A, Pk,
                          preferred_element_type=dtype,
                      precision=_PREC)
        acc = term if acc is None else acc * term
    per_cat = acc * fc[None, None, :, :]
    site_state = jnp.einsum("npcs,c->nps", per_cat, w,
                            preferred_element_type=dtype,
                      precision=_PREC)
    norm = jnp.sum(site_state, axis=2, keepdims=True)
    probs = site_state / jnp.maximum(norm, 1e-300)
    return nodes, np.asarray(probs)


def ancestral_states(partition, tree, nodes=None):
    """Most-probable state per site per inner node (argmax of
    :func:`ancestral_probabilities`)."""
    nodes, probs = ancestral_probabilities(partition, tree, nodes)
    return nodes, probs.argmax(axis=-1)
