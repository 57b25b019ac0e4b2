"""Native C++ kernel equivalence tests: every native entry point must
agree exactly with its pure-python fallback (the reference's
scalar-vs-SIMD golden-equivalence pattern, SURVEY §4)."""

import numpy as np
import pytest

from pllmod_tpu import native
from pllmod_tpu.tree import Tree
from pllmod_tpu.tree.topology import _parse_newick_inner
from pllmod_tpu.tree import splits as sp
from pllmod_tpu.tree.splits import rf_distance
from pllmod_tpu.ops import charmap as cm
from tests import reference_impl as ref

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_compress_patterns_matches_numpy(rng):
    codes = rng.integers(0, 5, (6, 200)).astype(np.int32)
    w = rng.random(200)
    from pllmod_tpu.ops import partition as part_mod
    # numpy fallback path (bypass native)
    cols = np.ascontiguousarray(codes.T)
    view = cols.view([("", cols.dtype)] * cols.shape[1]).ravel()
    n_expected = len(np.unique(view))
    c2, w2 = native.compress_patterns(codes, w)
    assert c2.shape[1] == n_expected
    np.testing.assert_allclose(w2.sum(), w.sum())
    # weights of each pattern = sum of matching column weights
    for j in range(c2.shape[1]):
        match = (codes == c2[:, j:j + 1]).all(axis=0)
        np.testing.assert_allclose(w2[j], w[match].sum())


def test_parse_newick_native_matches_python(rng):
    for _ in range(5):
        t = ref.random_binary_tree(rng, 12)
        nw = t.to_newick()
        t_native = Tree.from_newick(nw)        # native path
        t_py = _parse_newick_inner(nw)         # python path
        assert t_native.labels == t_py.labels
        assert rf_distance(t_native, t_py) == 0
        np.testing.assert_allclose(sorted(t_native.lengths),
                                   sorted(t_py.lengths), atol=1e-9)


def test_parse_newick_rooted_and_quoted():
    nw = "(('sp one':0.1,b:0.2):0.3,(c:0.4,d:0.5):0.6);"
    t = Tree.from_newick(nw)
    assert "sp one" in t.labels
    assert t.n_edges == 2 * 4 - 3  # unrooted 4-taxon


def test_parse_newick_errors():
    from pllmod_tpu.common import TreeError
    with pytest.raises(TreeError):
        Tree.from_newick("((a,b),c")  # missing ; and )
    with pytest.raises(TreeError):
        Tree.from_newick("(a,b);")    # too few taxa


def test_fitch_native_matches_python(rng):
    t = ref.random_binary_tree(rng, 10)
    seqs = ref.random_sequences(rng, 10, 300)
    from pllmod_tpu.tree import starting
    masks = starting._tip_masks(seqs, cm.DNA)
    w = np.ones(300)
    s_native = native.fitch_score(masks, starting._fitch_ops(t), w)
    # force python path
    import pllmod_tpu.native as nat
    real = nat.available
    nat.available = lambda: False
    try:
        s_py = starting.parsimony_score(t, seqs, cm.DNA)
    finally:
        nat.available = real
    assert int(round(s_native)) == s_py


def test_transfer_matrix_matches_numpy(rng):
    t1 = ref.random_binary_tree(rng, 14)
    t2 = ref.random_binary_tree(rng, 14)
    s1, _ = sp.tree_splits(t1)
    s2, _ = sp.tree_splits(t2)
    d_native = native.transfer_distance_matrix(s1, s2, 14)
    x = s1[:, None, :] ^ s2[None, :, :]
    d_np = np.bitwise_count(x).sum(axis=-1).astype(np.int64)
    d_np = np.minimum(d_np, 14 - d_np)
    np.testing.assert_array_equal(d_native, d_np)


def test_shared_splits_matches_sets(rng):
    t1 = ref.random_binary_tree(rng, 14)
    t2 = ref.random_binary_tree(rng, 14)
    s1, _ = sp.tree_splits(t1)
    s2, _ = sp.tree_splits(t2)
    shared = native.shared_splits(s1, s2)
    expect = len(sp.split_set(s1) & sp.split_set(s2))
    assert shared == expect
    assert native.shared_splits(s1, s1) == len(s1)
