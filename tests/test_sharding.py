"""Site-sharded data parallelism tests on the 8-virtual-device CPU mesh.

The SURVEY §4 requirement the reference never had: site-sharded logL must
equal single-device logL exactly; gradients and the full training step
must compile and run under the mesh with XLA-inserted collectives.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops import engine
from pllmod_tpu.parallel import make_mesh, shard_partition, replicate
from tests import reference_impl as ref


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh(jax.devices())


def _case(rng, n_tips=10, n_sites=300):
    tree = ref.random_binary_tree(rng, n_tips)
    seqs = ref.random_sequences(rng, n_tips, n_sites)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            subst_rates=rng.uniform(0.5, 2, 6),
                            freqs=rng.dirichlet([5] * 4),
                            prop_invar=0.15, dtype=jnp.float64)
    return tree, part


def test_sharded_loglh_matches_single_device(rng, mesh):
    tree, part = _case(rng)
    lnl_single = float(engine.tree_loglikelihood(part, tree))
    sharded = shard_partition(part, mesh)
    ops, root_info = tree.traversal_ops()
    ri = tuple(int(x) for x in root_info)
    with mesh:
        lnl_sharded = float(engine.loglikelihood(
            sharded, replicate(jnp.asarray(ops), mesh),
            replicate(jnp.asarray(tree.lengths, part.dtype), mesh), ri))
    assert lnl_sharded == pytest.approx(lnl_single, abs=1e-9)


def test_sharded_levels_match(rng, mesh):
    tree, part = _case(rng)
    levels, offsets, ri, n_slots = engine.compile_schedule(part, tree)
    brl = jnp.asarray(tree.lengths, part.dtype)
    lnl_single = float(engine.loglikelihood_levels(
        part, levels, brl, offsets, ri, n_slots))
    sharded = shard_partition(part, mesh)
    with mesh:
        lnl_sharded = float(engine.loglikelihood_levels(
            sharded, replicate(levels, mesh), replicate(brl, mesh),
            offsets, ri, n_slots))
    assert lnl_sharded == pytest.approx(lnl_single, abs=1e-9)


def test_sharded_gradients_match(rng, mesh):
    tree, part = _case(rng, n_tips=7, n_sites=200)
    ops, root_info = tree.traversal_ops()
    ri = tuple(int(x) for x in root_info)
    ops_j = jnp.asarray(ops)
    brl = jnp.asarray(tree.lengths, part.dtype)

    def f(p, b):
        return engine.loglikelihood(p, ops_j, b, ri)

    g_single = jax.grad(f, argnums=1)(part, brl)
    sharded = shard_partition(part, mesh)
    with mesh:
        g_sharded = jax.grad(f, argnums=1)(sharded, replicate(brl, mesh))
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-9)


def test_dryrun_multichip_entrypoint():
    """The driver contract: full sharded train step on 8 devices."""
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_blo_sweep_matches(rng, mesh):
    """BLO sweeps under the site mesh must equal single-device sweeps —
    the Newton-derivative reduce is the reference's critical collective
    (pll_optimize.c:1270-1286)."""
    from pllmod_tpu.optimize.blo import DirectedTraversal, _blo_sweep
    tree, part = _case(rng, n_tips=8, n_sites=200)
    part = part.cache_eigen()
    trav = DirectedTraversal(tree)
    levels, offsets, edge_ref, n_slots = trav.schedule()
    edge_mask = jnp.asarray(trav.edge_mask)
    brl = jnp.asarray(np.clip(tree.lengths, 1e-4, 100.0), part.dtype)
    args = (jnp.asarray(1e-4, part.dtype), jnp.asarray(100.0, part.dtype),
            jnp.asarray(1e-6, part.dtype))
    new_single, lnl_single = _blo_sweep(part, levels, offsets, edge_ref,
                                        edge_mask, brl, *args, n_slots)
    sharded = shard_partition(part, mesh)
    with mesh:
        new_sh, lnl_sh = _blo_sweep(
            sharded, replicate(levels, mesh), offsets,
            replicate(edge_ref, mesh), replicate(edge_mask, mesh),
            replicate(brl, mesh), *(replicate(a, mesh) for a in args),
            n_slots)
    assert float(lnl_sh) == pytest.approx(float(lnl_single), abs=1e-9)
    np.testing.assert_allclose(np.asarray(new_sh), np.asarray(new_single),
                               atol=1e-10)


def test_fused_kernel_sharded_sites(rng):
    """The production megakernel under shard_map: each device runs the
    whole-tree kernel on its pattern shard; psum reduces the site sum
    (the multi-chip production path)."""
    import jax
    import jax.numpy as jnp
    from pllmod_tpu.parallel import make_mesh, shard_partition
    from pllmod_tpu.parallel.sharding import loglikelihood_fused_sharded
    from pllmod_tpu.ops.engine import tree_loglikelihood

    tree = ref.random_binary_tree(rng, 12)
    seqs = ref.random_sequences(rng, 12, 900)
    # pattern_pad = 128 * mesh size keeps each local shard lane-aligned
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            prop_invar=0.1, dtype=jnp.float32,
                            compress=False, pattern_pad=1024)
    mesh = make_mesh(jax.devices()[:8])
    sh = shard_partition(part, mesh)
    l_sh = float(loglikelihood_fused_sharded(sh, tree, tree.lengths, mesh,
                                             interpret=True))
    l_ref = float(tree_loglikelihood(part, tree, schedule="scan"))
    assert l_sh == pytest.approx(l_ref, abs=2e-2)


def test_resident_sharded_parity(rng, mesh):
    """Site-sharded resident megakernel == single-host scan (the
    multi-chip contract for the production evaluation path)."""
    from pllmod_tpu.parallel.sharding import (shard_partition,
                                              loglikelihood_resident_sharded)
    import tests.reference_impl as ref
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.ops import engine as engine_mod
    n, sites = 12, 1200
    tree = ref.random_binary_tree(rng, n)
    seqs = ref.random_sequences(rng, n, sites)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float32,
                            pattern_pad=128 * 8).cache_eigen()
    l_one = float(engine_mod.tree_loglikelihood(part, tree,
                                                schedule="scan"))
    shp = shard_partition(part, mesh)
    l_mesh = float(loglikelihood_resident_sharded(
        shp, tree, tree.lengths, mesh, interpret=True))
    assert abs(l_mesh - l_one) <= 5e-6 * max(1.0, abs(l_one))


def test_sharded_fast_blo_sweep_matches(rng, mesh):
    """Fused-pipeline BLO sweep under the site mesh (pallas kernels per
    shard + psum'd Newton derivatives) == the single-device fused sweep.
    The multi-chip production BLO path."""
    from pllmod_tpu.ops import engine as engine_mod
    from pllmod_tpu.optimize.blo import DirectedTraversal, _blo_sweep, \
        _fused_args
    from pllmod_tpu.parallel.sharding import (blo_sweep_fast_sharded,
                                              shard_partition)

    tree = ref.random_binary_tree(rng, 8, 0.05, 0.3)
    seqs = ref.random_sequences(rng, 8, 700)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            prop_invar=0.1, dtype=jnp.float32,
                            compress=False, pattern_pad=1024).cache_eigen()
    brl = jnp.asarray(np.clip(tree.lengths, 1e-4, 100.0), jnp.float32)

    engine_mod.FORCE_FAST_KERNEL = True
    try:
        trav = DirectedTraversal(tree)
        levels, offsets, _eref, n_slots = trav.schedule()
        fargs = _fused_args(part, trav)
        nb_1, l0_1 = _blo_sweep(
            part, levels, offsets, jnp.asarray(trav.edge_ref),
            jnp.asarray(trav.edge_mask), brl,
            jnp.asarray(1e-4, jnp.float32), jnp.asarray(100.0, jnp.float32),
            jnp.asarray(1e-6, jnp.float32), n_slots, **fargs)

        m = make_mesh(jax.devices()[:8])
        sh = shard_partition(part, m)
        nb_8, l0_8 = blo_sweep_fast_sharded(sh, tree, brl, m,
                                            interpret=True)
    finally:
        engine_mod.FORCE_FAST_KERNEL = None
    assert float(l0_8) == pytest.approx(float(l0_1), rel=1e-6)
    np.testing.assert_allclose(np.asarray(nb_8), np.asarray(nb_1),
                               rtol=1e-3, atol=1e-5)
