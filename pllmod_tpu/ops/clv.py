"""Felsenstein-pruning CLV update engine.

TPU-native equivalent of libpll's ``pll_update_partials(partition,
operations[], count)`` (SURVEY.md §2.9 "Hot kernels"; op layout at
``pll_optimize.c:758-765``). Differences from the reference, by design:

- **Functional**: CLVs are computed and returned, not mutated in place.
  A topology change just means a different ``ops`` array — rollback is free.
- **Array-encoded ops**: an op is a row of 5 ints
  ``(parent_slot, child1_node, child1_edge, child2_node, child2_edge)``
  with ``node < n_tips`` meaning a tip (CLV gathered from the per-code
  lookup table — the PATTERN_TIP analog), otherwise an inner CLV slot
  ``node - n_tips``. ``parent_slot == -1`` marks a masked (skipped) op,
  which is how partial/incremental traversals keep static shapes.
- **Exact power-of-two rescaling**: every node's CLV is renormalized per
  site by ``2^-e`` with ``e = exponent(max_cs clv)`` (frexp/ldexp — exact
  in floating point), accumulating integer per-site scaler counts. The
  final log-likelihood adds ``scaler * ln 2`` — this reproduces libpll's
  scale-buffer semantics (PLL_SCALE_BUFFER, PLL_SCALE_THRESHOLD) without
  any thresholding error, and it works identically in f32 and f64.

The inner per-op math ``clv_p = (P1 @ clv_c1) * (P2 @ clv_c2)`` is factored
into :func:`clv_op_compute` so the Pallas fused kernel
(:mod:`pllmod_tpu.ops.pallas_clv`) can be swapped in.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

LN2 = 0.6931471805599453


def tip_clv(partition, node):
    """Gather a tip's CLV [patterns, S] from the code lookup table."""
    codes = lax.dynamic_index_in_dim(partition.tip_states, node, axis=0,
                                     keepdims=False)          # [patterns]
    return partition.code_clv[codes]                           # [patterns, S]


def get_node_clv(partition, clvs, scalers, node):
    """CLV + scaler for any node (tip or inner). Returns
    ([patterns, C, S], [patterns] int32)."""
    n_tips = partition.n_tips
    C = clvs.shape[2]

    def from_tip(_):
        clv = tip_clv(partition, node)                          # [P, S]
        clv = jnp.broadcast_to(clv[:, None, :], (clv.shape[0], C, clv.shape[1]))
        return clv, jnp.zeros(clv.shape[0], dtype=jnp.int32)

    def from_inner(_):
        slot = node - n_tips
        return (lax.dynamic_index_in_dim(clvs, slot, axis=0, keepdims=False),
                lax.dynamic_index_in_dim(scalers, slot, axis=0, keepdims=False))

    return lax.cond(node < n_tips, from_tip, from_inner, None)


def clv_op_compute(c1, c2, P1, P2):
    """One pruning op: clv_p[p,c,i] = (Σ_j P1[c,i,j] c1[p,c,j]) *
    (Σ_j P2[c,i,j] c2[p,c,j]). Shapes: c* [P,C,S], P* [C,S,S]."""
    dtype = c1.dtype
    left = jnp.einsum("pcj,cij->pci", c1, P1, preferred_element_type=dtype)
    right = jnp.einsum("pcj,cij->pci", c2, P2, preferred_element_type=dtype)
    return left * right


def rescale(clv):
    """Exact power-of-two per-site rescaling.

    Returns (clv * 2^-e, e) with e = exponent of the per-site max over
    categories and states (0 where the site is all-zero)."""
    m = jnp.max(clv, axis=(1, 2))                              # [P]
    _, e = jnp.frexp(m)
    e = jnp.where(m > 0, e, 0).astype(jnp.int32)
    scaled = jnp.ldexp(clv, -e[:, None, None]).astype(clv.dtype)
    return scaled, e


def update_partials(partition, P, ops, init_clvs=None, init_scalers=None):
    """Run all pruning ops in sequence (post-order), returning the full CLV
    buffer for inner nodes.

    Args:
      partition: Partition
      P: [edges, C, S, S] transition matrices
      ops: int32 [n_ops, 5]; masked rows have parent_slot == -1
      init_clvs/init_scalers: optional starting buffers (incremental eval)
    Returns:
      clvs [n_inner, patterns, C, S], scalers [n_inner, patterns] int32
      where n_inner == n_ops (one CLV slot per op row by construction)
    """
    n_inner = ops.shape[0]
    Ppad = partition.n_patterns_padded
    C = partition.n_cats
    S = partition.states
    dtype = partition.dtype

    if init_clvs is None:
        init_clvs = jnp.zeros((n_inner, Ppad, C, S), dtype)
    if init_scalers is None:
        init_scalers = jnp.zeros((n_inner, Ppad), jnp.int32)

    def step(carry, op):
        clvs, scalers = carry

        def do(_):
            c1, s1 = get_node_clv(partition, clvs, scalers, op[1])
            c2, s2 = get_node_clv(partition, clvs, scalers, op[3])
            P1 = lax.dynamic_index_in_dim(P, op[2], axis=0, keepdims=False)
            P2 = lax.dynamic_index_in_dim(P, op[4], axis=0, keepdims=False)
            clv = clv_op_compute(c1, c2, P1, P2)
            clv, e = rescale(clv)
            sc = s1 + s2 + e
            slot = op[0]
            return (lax.dynamic_update_index_in_dim(clvs, clv, slot, axis=0),
                    lax.dynamic_update_index_in_dim(scalers, sc, slot, axis=0))

        def skip(_):
            return clvs, scalers

        return lax.cond(op[0] >= 0, do, skip, None), None

    (clvs, scalers), _ = lax.scan(step, (init_clvs, init_scalers), ops)
    return clvs, scalers


# ---------------------------------------------------------------------------
# Level-synchronous batched pruning (the TPU-first schedule)
# ---------------------------------------------------------------------------
def compile_levels(ops: "np.ndarray", n_tips: int):
    """Group a post-order ops schedule into dependency levels (host-side).

    All ops in a level depend only on tips and earlier levels, so each
    level runs as ONE batched tensor op — the SURVEY §7 "level-synchronous
    pruning: process all nodes of one topology level per kernel launch".
    For a balanced tree this turns O(n) serial steps into O(log n) batched
    steps.

    Args:
      ops: int32 [n_ops, 5] (parent_slot, c1, e1, c2, e2); masked rows -1.
        Child references follow the update_partials convention
        (< n_tips = tip, else slot + n_tips).
    Returns:
      level_ops int32 [n_levels, width, 5], rows padded with -1.
    """
    import numpy as np
    ops = np.asarray(ops)
    level_of_slot = {}
    rows_by_level = {}
    for row in ops:
        slot = int(row[0])
        if slot < 0:
            continue
        deps = []
        for child in (int(row[1]), int(row[3])):
            if child >= n_tips:
                deps.append(level_of_slot[child - n_tips])
        lvl = (max(deps) + 1) if deps else 0
        level_of_slot[slot] = lvl
        rows_by_level.setdefault(lvl, []).append(row)
    if not rows_by_level:
        return np.full((1, 1, 5), -1, np.int32)
    n_levels = max(rows_by_level) + 1
    width = max(len(v) for v in rows_by_level.values())
    out = np.full((n_levels, width, 5), -1, np.int32)
    for lvl, rows in rows_by_level.items():
        out[lvl, :len(rows)] = rows
    return out


def update_partials_levels(partition, P, level_ops, n_slots: int,
                           init_clvs=None, init_scalers=None):
    """Level-batched pruning: one vmapped gather/einsum/scatter per level.

    Args:
      level_ops: int32 [n_levels, width, 5] from :func:`compile_levels`
      n_slots: CLV slot count (ops may fill fewer than width*levels)
    Returns:
      (clvs [n_slots+1, patterns, C, S], scalers [n_slots+1, patterns]) —
      the +1 row is a scratch slot that masked rows write into.
    """
    Ppad = partition.n_patterns_padded
    C = partition.n_cats
    S = partition.states
    dtype = partition.dtype

    if init_clvs is None:
        clvs = jnp.zeros((n_slots + 1, Ppad, C, S), dtype)
        scalers = jnp.zeros((n_slots + 1, Ppad), jnp.int32)
    else:
        clvs = jnp.concatenate(
            [init_clvs, jnp.zeros((1, Ppad, C, S), dtype)], axis=0)
        scalers = jnp.concatenate(
            [init_scalers, jnp.zeros((1, Ppad), jnp.int32)], axis=0)

    def level_step(carry, ops_lvl):
        clvs, scalers = carry

        def gather(node):
            return get_node_clv(partition, clvs, scalers, node)

        c1, s1 = jax.vmap(gather)(ops_lvl[:, 1])      # [W,P,C,S], [W,P]
        c2, s2 = jax.vmap(gather)(ops_lvl[:, 3])
        P1 = P[jnp.maximum(ops_lvl[:, 2], 0)]         # [W,C,S,S]
        P2 = P[jnp.maximum(ops_lvl[:, 4], 0)]
        left = jnp.einsum("wpcj,wcij->wpci", c1, P1,
                          preferred_element_type=dtype)
        right = jnp.einsum("wpcj,wcij->wpci", c2, P2,
                           preferred_element_type=dtype)
        clv = left * right
        m = jnp.max(clv, axis=(2, 3))                 # [W,P]
        _, e = jnp.frexp(m)
        e = jnp.where(m > 0, e, 0).astype(jnp.int32)
        clv = jnp.ldexp(clv, -e[:, :, None, None]).astype(dtype)
        sc = s1 + s2 + e
        slots = jnp.where(ops_lvl[:, 0] >= 0, ops_lvl[:, 0], n_slots)
        clvs = clvs.at[slots].set(clv)
        scalers = scalers.at[slots].set(sc)
        return (clvs, scalers), None

    (clvs, scalers), _ = lax.scan(level_step, (clvs, scalers), level_ops)
    return clvs, scalers
