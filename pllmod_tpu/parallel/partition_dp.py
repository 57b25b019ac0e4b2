"""Partition-level data parallelism — the reference's "remote partitions".

In the reference, each MPI rank owns a subset of partitions
(``treeinfo->partitions[p] == NULL`` on non-owner ranks,
treeinfo.c:152-213) and the per-partition log-likelihoods meet in a
``parallel_reduce_cb(..., REDUCE_SUM)``. The TPU-native form: stack the
partitions into one pytree with a leading ``parts`` axis, shard that
axis over a mesh dimension, and let each device evaluate ONLY its local
partition shard inside ``shard_map``; the cross-rank reduce is a
``psum`` over the ``parts`` axis riding ICI.

Composability: this is orthogonal to site sharding
(:mod:`pllmod_tpu.parallel.sharding`) — a 2-D mesh ``(parts, sites)``
shards the stacked pattern axis on ``sites`` as well.

Constraints (stated, reference-equivalent): partitions in one stack must
share states, rate-category count and tip count (one alignment split
into parts); pattern axes are padded to a common width (padding patterns
carry weight 0, contributing exactly zero).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pllmod_tpu.ops import clv as clv_mod
from pllmod_tpu.ops import likelihood as lk_mod

PARTS_AXIS = "parts"


def stack_partitions(parts):
    """Stack same-shaped partitions into one pytree with a leading
    ``parts`` axis; pattern axes are padded to the widest partition.

    Returns the stacked Partition (leaves [n_parts, ...])."""
    if not parts:
        raise ValueError("need at least one partition")
    p0 = parts[0]
    for p in parts[1:]:
        if (p.states != p0.states or p.n_cats != p0.n_cats
                or p.n_tips != p0.n_tips):
            raise ValueError(
                "partition-DP stacks require equal states/cats/tips")
    wide = max(p.n_patterns_padded for p in parts)

    def pad(x, pat_axis):
        if x.shape[pat_axis] == wide:
            return x
        padw = [(0, 0)] * x.ndim
        padw[pat_axis] = (0, wide - x.shape[pat_axis])
        return jnp.pad(x, padw)

    padded = []
    for p in parts:
        padded.append(p.replace(
            tip_states=pad(p.tip_states, 1),
            pattern_weights=pad(p.pattern_weights, 0),
            inv_indicator=pad(p.inv_indicator, 0),
            # unify the static unpadded-count field so the pytree
            # treedefs match (padding patterns carry weight 0 -> inert)
            n_patterns=wide,
        ))
    # code_clv tables may differ in code count across partitions; pad rows
    n_codes = max(p.code_clv.shape[0] for p in padded)
    padded = [p.replace(code_clv=jnp.pad(
        p.code_clv, ((0, n_codes - p.code_clv.shape[0]), (0, 0))))
        for p in padded]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *padded)


def make_parts_mesh(devices=None, axis_name: str = PARTS_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _loglh_partition_dp(stacked, ops, brlens_stacked, root_info,
                        mesh: Mesh, parts_axis: str,
                        sites_axis: str | None):
    """Shared shard_map body for the 1-D (parts) and 2-D (parts × sites)
    partition-DP evaluations; one psum over the participating axes."""
    from jax import shard_map

    n_parts = brlens_stacked.shape[0]
    n_pdev = mesh.shape[parts_axis]
    if n_parts % n_pdev:
        raise ValueError(f"{n_parts} partitions not divisible over "
                         f"{n_pdev} devices on '{parts_axis}'; pad with "
                         f"weight-0 partitions")
    specs = jax.tree.map(lambda _: P(parts_axis), stacked)
    axes = (parts_axis,)
    if sites_axis is not None:
        wide = stacked.tip_states.shape[2]
        n_sdev = mesh.shape[sites_axis]
        if wide % n_sdev:
            raise ValueError(f"{wide} padded patterns not divisible over "
                             f"{n_sdev} devices on '{sites_axis}'")
        specs = specs.replace(
            tip_states=P(parts_axis, None, sites_axis),
            pattern_weights=P(parts_axis, sites_axis),
            inv_indicator=P(parts_axis, sites_axis, None))
        axes = (parts_axis, sites_axis)
    u, v, e = (int(x) for x in root_info)

    @partial(shard_map, mesh=mesh,
             in_specs=(specs, P(), P(parts_axis)),
             out_specs=P(), check_vma=False)
    def body(stacked_local, ops, brl_local):
        n_local = brl_local.shape[0]

        def one(i):
            part = jax.tree.map(lambda x: x[i], stacked_local)
            Pm = part.prob_matrices(brl_local[i])
            clvs, scalers = clv_mod.update_partials(part, Pm, ops)
            return lk_mod.edge_loglikelihood(part, clvs, scalers, u, v,
                                             Pm[e])

        local = jnp.sum(jax.lax.map(one, jnp.arange(n_local)))
        return jax.lax.psum(local, axes)

    return body(stacked, ops, brlens_stacked)


def total_loglh_partition_dp(stacked, ops, brlens_stacked, root_info,
                             mesh: Mesh, axis_name: str = PARTS_AXIS):
    """Total logL = Σ over partitions, each evaluated ONLY on its owner
    devices (shard_map over the parts axis + psum).

    Args:
      stacked: stacked Partition from :func:`stack_partitions`
      ops: int32 [n_inner, 5]
      brlens_stacked: [n_parts, n_edges] per-partition branch lengths
        (broadcast the shared lengths for LINKED, scale for SCALED)
      root_info: static (u, v, root_edge)
    """
    return _loglh_partition_dp(stacked, ops, brlens_stacked, root_info,
                               mesh, axis_name, None)


SITES_AXIS = "sites"


def make_2d_mesh(shape, devices=None,
                 axis_names=(PARTS_AXIS, SITES_AXIS)) -> Mesh:
    """2-D device mesh (parts × sites)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def total_loglh_partition_dp_2d(stacked, ops, brlens_stacked, root_info,
                                mesh: Mesh, parts_axis: str = PARTS_AXIS,
                                sites_axis: str = SITES_AXIS):
    """Partition-level DP composed with site-pattern sharding on a 2-D
    mesh: each device owns one (partition shard × pattern shard) tile —
    the reference's remote partitions (treeinfo.c:152-213) and per-rank
    site splits (§2.10 reduce seam) in ONE SPMD program. Both reduces
    are a single ``psum`` over both mesh axes (per-site power-of-two
    rescaling has no cross-site coupling, so site sharding is exact).
    """
    return _loglh_partition_dp(stacked, ops, brlens_stacked, root_info,
                               mesh, parts_axis, sites_axis)


def treeinfo_loglh_partition_dp(treeinfo, mesh: Mesh,
                                axis_name: str = PARTS_AXIS):
    """Evaluate a TreeInfo's total logL with partitions distributed over
    the mesh (the rank-distribution analog of treeinfo.c's remote
    partitions; brlen linkage respected via per-partition lengths)."""
    parts = [p for p in treeinfo.partitions if p is not None]
    idxs = [i for i, p in enumerate(treeinfo.partitions) if p is not None]
    stacked = stack_partitions(parts)
    ops, root_info = treeinfo.tree.traversal_ops()
    brl = jnp.stack([
        jnp.asarray(treeinfo.partition_brlens(i), parts[0].dtype)
        for i in idxs])
    return float(total_loglh_partition_dp(
        stacked, jnp.asarray(ops), brl,
        tuple(int(x) for x in root_info), mesh, axis_name))
