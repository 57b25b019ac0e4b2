"""Partition-level data parallelism over the device mesh — the
reference's rank-distributed "remote partitions" (treeinfo.c:152-213 +
parallel_reduce_cb; VERDICT round-1 coverage item 38)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pllmod_tpu.common import BRLEN_SCALED
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops import engine as engine_mod
from pllmod_tpu.parallel import (make_parts_mesh, stack_partitions,
                                 total_loglh_partition_dp,
                                 treeinfo_loglh_partition_dp)
from pllmod_tpu.tree.treeinfo import TreeInfo
from tests import reference_impl as ref


def _partitions(rng, tree, n_parts, n=10):
    parts = []
    for k in range(n_parts):
        seqs = ref.random_sequences(rng, n, 64 + 32 * (k % 2))
        parts.append(create_partition(
            seqs, states=4, n_rate_cats=4, alpha=0.5 + 0.3 * k,
            subst_rates=rng.uniform(0.5, 2.0, 6),
            freqs=rng.dirichlet([8] * 4), dtype=jnp.float64))
    return parts


def test_partition_dp_matches_serial(rng):
    n = 10
    tree = ref.random_binary_tree(rng, n)
    parts = _partitions(rng, tree, 8, n)
    mesh = make_parts_mesh(jax.devices()[:8])
    stacked = stack_partitions(parts)
    ops, root_info = tree.traversal_ops()
    brl = jnp.stack([jnp.asarray(tree.lengths, jnp.float64)] * 8)
    l_dp = float(total_loglh_partition_dp(
        stacked, jnp.asarray(ops), brl,
        tuple(int(x) for x in root_info), mesh))
    l_serial = sum(float(engine_mod.tree_loglikelihood(p, tree))
                   for p in parts)
    assert l_dp == pytest.approx(l_serial, rel=1e-12)


def test_partition_dp_treeinfo_scaled(rng):
    """SCALED brlen linkage through the distributed evaluation."""
    n = 9
    tree = ref.random_binary_tree(rng, n)
    parts = _partitions(rng, tree, 4, n)
    ti = TreeInfo(tree, parts, brlen_linkage=BRLEN_SCALED)
    ti.brlen_scalers[:] = [1.0, 1.5, 0.7, 2.0]
    mesh = make_parts_mesh(jax.devices()[:4])
    l_dp = treeinfo_loglh_partition_dp(ti, mesh)
    l_serial = ti.compute_loglh()
    assert l_dp == pytest.approx(l_serial, rel=1e-12)


def test_partition_dp_shape_mismatch_raises(rng):
    tree = ref.random_binary_tree(rng, 8)
    seqs = ref.random_sequences(rng, 8, 50)
    p4 = create_partition(seqs, states=4, n_rate_cats=4, alpha=1.0,
                          dtype=jnp.float64)
    p2cat = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.0,
                             dtype=jnp.float64)
    with pytest.raises(ValueError, match="equal states"):
        stack_partitions([p4, p2cat])


def test_partition_dp_2d_mesh_matches_serial(rng):
    """2-D (parts × sites) mesh: partition DP composed with site-pattern
    sharding gives the serial total exactly (one psum over both axes)."""
    from pllmod_tpu.parallel import make_2d_mesh, total_loglh_partition_dp_2d
    tree = ref.random_binary_tree(rng, 10)
    parts = _partitions(rng, tree, n_parts=4)
    want = sum(float(engine_mod.tree_loglikelihood(p, tree))
               for p in parts)
    stacked = stack_partitions(parts)
    ops, root_info = tree.traversal_ops()
    brl = jnp.stack([jnp.asarray(tree.lengths, jnp.float64)] * 4)
    mesh = make_2d_mesh((2, 4))
    got = float(total_loglh_partition_dp_2d(
        stacked, jnp.asarray(ops), brl,
        tuple(int(x) for x in root_info), mesh))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_partition_dp_2d_indivisible_raises(rng):
    from pllmod_tpu.common import UtilError  # noqa: F401  (import check)
    from pllmod_tpu.parallel import make_2d_mesh, total_loglh_partition_dp_2d
    tree = ref.random_binary_tree(rng, 6)
    parts = _partitions(rng, tree, n_parts=3, n=6)
    stacked = stack_partitions(parts)
    ops, root_info = tree.traversal_ops()
    brl = jnp.stack([jnp.asarray(tree.lengths, jnp.float64)] * 3)
    mesh = make_2d_mesh((2, 4))
    with pytest.raises(ValueError, match="not divisible"):
        total_loglh_partition_dp_2d(
            stacked, jnp.asarray(ops), brl,
            tuple(int(x) for x in root_info), mesh)
