"""Mesh construction + partition sharding rules.

The single parallelism axis of the workload (SURVEY.md §2.10) is the
alignment site/pattern axis: CLVs are embarrassingly parallel across
patterns given replicated P-matrices, and log-likelihood / derivative
evaluation reduces over patterns exactly once. We therefore:

- build a 1-D ``Mesh`` with axis ``"sites"`` over all devices,
- shard every pattern-indexed array of the :class:`Partition` pytree on its
  pattern axis (``tip_states[:, P]``, ``pattern_weights[P]``,
  ``inv_indicator[P, :]``),
- replicate model parameters, trees, ops and P-matrices,

and let ``jit`` propagate the shardings: the per-site products stay local,
the one ``jnp.sum(lnl * weights)`` at the end lowers to a psum over ICI —
the direct analog of the reference's single ``parallel_reduce_cb(...,
REDUCE_SUM)`` per evaluation (``treeinfo.c:1061-1067``).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SITES_AXIS = "sites"


def make_mesh(devices=None, axis_name: str = SITES_AXIS) -> Mesh:
    """1-D mesh over the site axis (all local devices by default)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_partition(partition, mesh: Mesh, axis_name: str = SITES_AXIS):
    """Shard a Partition's pattern axis across the mesh; replicate the rest.

    The padded pattern count must be divisible by the mesh size (guaranteed
    when ``pattern_pad`` is a multiple of the device count; default 128).
    """
    n = partition.n_patterns_padded
    size = mesh.shape[axis_name]
    if n % size:
        raise ValueError(
            f"padded pattern count {n} not divisible by mesh size {size}; "
            f"use pattern_pad that is a multiple of the device count")
    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(axis_name))            # [patterns, ...]
    col = NamedSharding(mesh, P(None, axis_name))      # [tips, patterns]
    return partition.replace(
        tip_states=jax.device_put(partition.tip_states, col),
        pattern_weights=jax.device_put(partition.pattern_weights, row),
        inv_indicator=jax.device_put(partition.inv_indicator, row),
        code_clv=jax.device_put(partition.code_clv, rep),
        subst_rates=jax.device_put(partition.subst_rates, rep),
        freqs=jax.device_put(partition.freqs, rep),
        rate_cats=jax.device_put(partition.rate_cats, rep),
        rate_weights=jax.device_put(partition.rate_weights, rep),
        prop_invar=jax.device_put(partition.prop_invar, rep),
        alpha=jax.device_put(partition.alpha, rep),
        param_indices=jax.device_put(partition.param_indices, rep),
    )
