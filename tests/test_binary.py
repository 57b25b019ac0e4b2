"""Checkpoint tests, mirroring the reference's binary-{sequential,random,
skeleton} golden tests: dump partition+tree, reload, verify identical
logL (test/src/binary/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.binary import (BinaryFile, ACCESS_RANDOM, ACCESS_SEQUENTIAL)
from pllmod_tpu.common import BinaryError
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops.engine import tree_loglikelihood
from tests import reference_impl as ref


@pytest.fixture
def case(rng):
    tree = ref.random_binary_tree(rng, 7)
    seqs = ref.random_sequences(rng, 7, 150)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            subst_rates=rng.uniform(0.5, 2, 6),
                            freqs=rng.dirichlet([5] * 4), prop_invar=0.1,
                            dtype=jnp.float64)
    return tree, part


def test_random_access_roundtrip(case, tmp_path):
    tree, part = case
    lnl0 = float(tree_loglikelihood(part, tree))
    path = str(tmp_path / "ckpt.bin")
    with BinaryFile.create(path, max_blocks=16,
                           access_type=ACCESS_RANDOM) as bf:
        bf.dump_partition(1, part)
        bf.dump_tree(2, tree)
        bf.dump_custom(7, b"hello-checkpoint")

    bf = BinaryFile.open(path)
    # random order
    assert bf.load_custom(7) == b"hello-checkpoint"
    t2 = bf.load_tree(2)
    p2 = bf.load_partition(1)
    bf.close()
    assert t2.labels == tree.labels
    np.testing.assert_array_equal(t2.edge_nodes, tree.edge_nodes)
    lnl1 = float(tree_loglikelihood(p2, t2))
    assert lnl1 == lnl0  # bit-identical reload


def test_sequential_roundtrip(case, tmp_path):
    tree, part = case
    path = str(tmp_path / "seq.bin")
    with BinaryFile.create(path, access_type=ACCESS_SEQUENTIAL) as bf:
        bf.dump_tree(10, tree)
        bf.dump_custom(11, b"x" * 100)
    bf = BinaryFile.open(path)
    bf.seek_first_block()
    t2 = bf.load_tree(10)
    assert bf.load_custom(11) == b"x" * 100
    bf.close()
    assert t2.n_tips == tree.n_tips


def test_skeleton_load(case, tmp_path):
    tree, part = case
    path = str(tmp_path / "sk.bin")
    with BinaryFile.create(path) as bf:
        bf.dump_partition(1, part)
    bf = BinaryFile.open(path)
    sk = bf.load_partition(1, skeleton=True)
    bf.close()
    # skeleton = Partition shell: model params live, site arrays zero-width
    assert sk.tip_states.shape == (part.n_tips, 0)
    assert sk.n_patterns == 0
    np.testing.assert_allclose(np.asarray(sk.subst_rates),
                               np.asarray(part.subst_rates))
    assert sk.n_tips == part.n_tips and sk.states == part.states
    # re-attaching site data restores a fully working partition
    from pllmod_tpu.binary import attach_skeleton
    full = attach_skeleton(sk, part)
    np.testing.assert_array_equal(np.asarray(full.tip_states),
                                  np.asarray(part.tip_states))
    assert full.n_patterns == part.n_patterns


def test_clv_block(case, tmp_path):
    tree, part = case
    clv = np.random.default_rng(0).random((64, 4, 4))
    sc = np.zeros(64, np.int32)
    path = str(tmp_path / "clv.bin")
    with BinaryFile.create(path) as bf:
        bf.dump_clv(3, clv, sc)
    bf = BinaryFile.open(path)
    c2, s2 = bf.load_clv(3)
    bf.close()
    np.testing.assert_array_equal(c2, clv)
    np.testing.assert_array_equal(s2, sc)


def test_append_and_map(case, tmp_path):
    tree, part = case
    path = str(tmp_path / "app.bin")
    with BinaryFile.create(path, max_blocks=8) as bf:
        bf.dump_custom(1, b"first")
    with BinaryFile.open_append(path) as bf:
        bf.dump_custom(2, b"second")
    bf = BinaryFile.open(path)
    assert [b for b, _ in bf.get_block_map()] == [1, 2]
    assert bf.load_custom(2) == b"second"
    assert bf.load_custom(1) == b"first"
    bf.close()


def test_missing_block_raises(case, tmp_path):
    path = str(tmp_path / "m.bin")
    with BinaryFile.create(path) as bf:
        bf.dump_custom(1, b"x")
    bf = BinaryFile.open(path)
    with pytest.raises(BinaryError):
        bf.load_custom(99)
    bf.close()


def test_bad_magic(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"NOTAPLLF" + b"\0" * 64)
    with pytest.raises(BinaryError):
        BinaryFile.open(str(p))


def test_treeinfo_checkpoint_roundtrip(rng, tmp_path):
    """save_treeinfo/load_treeinfo: resume gives the identical logL and
    preserves linkage state, remote slots, and the extra blob (the
    RAxML-NG checkpoint composition)."""
    import numpy as np
    import jax.numpy as jnp
    from pllmod_tpu import common
    from pllmod_tpu.binary import save_treeinfo, load_treeinfo
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from tests import reference_impl as ref

    tree = ref.random_binary_tree(rng, 7, 0.05, 0.4)
    seqs = ref.random_sequences(rng, 7, 120)
    p1 = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.7,
                          prop_invar=0.1, dtype=jnp.float64)
    p2 = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.3,
                          dtype=jnp.float64)
    ti = TreeInfo(tree, [p1, None, p2],
                  brlen_linkage=common.BRLEN_SCALED,
                  params_to_optimize=[common.PARAM_ALPHA, 0,
                                      common.PARAM_BRANCHES_ITERATIVE])
    ti.brlen_scalers[:] = (1.0, 1.0, 1.9)
    l0 = ti.compute_loglh()

    path = str(tmp_path / "ck.bin")
    save_treeinfo(path, ti, extra=b"round=3")
    ti2, extra = load_treeinfo(path)
    assert extra == b"round=3"
    assert ti2.partitions[1] is None
    assert ti2.brlen_linkage == common.BRLEN_SCALED
    assert ti2.params_to_optimize == ti.params_to_optimize
    np.testing.assert_allclose(ti2.brlen_scalers, ti.brlen_scalers)
    assert ti2.compute_loglh() == pytest.approx(l0, abs=1e-9)
