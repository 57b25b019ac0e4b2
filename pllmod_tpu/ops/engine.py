"""Single-partition end-to-end likelihood evaluation.

The minimal jittable pipeline (SURVEY.md §3.1 call stack, functional form):
P-matrices -> pruning ops -> edge log-likelihood. The multi-partition,
caching, invalidation-aware layer lives in :mod:`pllmod_tpu.tree.treeinfo`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pllmod_tpu.ops import clv as clv_mod
from pllmod_tpu.ops import likelihood as lk_mod


@partial(jax.jit, static_argnums=(3,))
def loglikelihood(partition, ops, brlens, root_info):
    """Full-traversal log-likelihood (serial-scan schedule).

    Args:
      partition: Partition pytree
      ops: int32 [n_inner, 5] from Tree.traversal_ops
      brlens: [n_edges] branch lengths (indexed by edge id)
      root_info: static (node_u, node_v, root_edge) from Tree.traversal_ops
    Returns:
      scalar logL
    """
    P = partition.prob_matrices(brlens)
    clvs, scalers = clv_mod.update_partials(partition, P, ops)
    u, v, e = root_info
    return lk_mod.edge_loglikelihood(partition, clvs, scalers, u, v, P[e])


@partial(jax.jit, static_argnums=(3, 4))
def loglikelihood_levels(partition, level_ops, brlens, root_info,
                         n_slots: int):
    """Level-batched log-likelihood: all nodes of a tree level update in
    one batched einsum (O(log n) launches on balanced trees instead of
    O(n) scan steps — the TPU-first schedule)."""
    P = partition.prob_matrices(brlens)
    clvs, scalers = clv_mod.update_partials_levels(partition, P, level_ops,
                                                   n_slots)
    u, v, e = root_info
    return lk_mod.edge_loglikelihood(partition, clvs, scalers, u, v, P[e])


def loglikelihood_with_buffers(partition, ops, brlens, root_info):
    """As :func:`loglikelihood` but also returns (P, clvs, scalers) for
    incremental reuse."""
    P = partition.prob_matrices(brlens)
    clvs, scalers = clv_mod.update_partials(partition, P, ops)
    u, v, e = root_info
    lnl = lk_mod.edge_loglikelihood(partition, clvs, scalers, u, v, P[e])
    return lnl, (P, clvs, scalers)


def tree_loglikelihood(partition, tree, brlens=None, root_edge=None,
                       schedule: str = "levels"):
    """Convenience host-level wrapper: compile traversal + evaluate.

    ``schedule``: "levels" (default, batched per tree level) or "scan"
    (one node per step — the reference-equivalent serial schedule, kept
    for kernel-equivalence testing)."""
    ops, root_info = tree.traversal_ops(root_edge)
    if brlens is None:
        brlens = tree.lengths
    brlens = jnp.asarray(brlens, partition.dtype)
    ri = tuple(int(x) for x in root_info)
    if schedule == "levels":
        level_ops = clv_mod.compile_levels(ops, partition.n_tips)
        return loglikelihood_levels(partition, jnp.asarray(level_ops),
                                    brlens, ri, int(ops.shape[0]))
    return loglikelihood(partition, jnp.asarray(ops), brlens, ri)
