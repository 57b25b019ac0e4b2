"""Splits / RF / consensus / TBE tests.

Mirrors the reference's tree/split-reconstruct (splits -> consensus tree
-> splits -> RF == 0), split-tbe, and RF-distance golden tests.
"""

import numpy as np
import pytest

from pllmod_tpu.tree import Tree
from pllmod_tpu.tree import splits as sp
from pllmod_tpu.tree import moves
from pllmod_tpu.tree.consensus import (consensus, consensus_from_newicks,
                                       build_tree_from_splits)
from pllmod_tpu.tree.tbe import tbe_support, fbp_support
from tests import reference_impl as ref


def test_split_count_and_normalization(rng):
    t = ref.random_binary_tree(rng, 12)
    s, ids = sp.tree_splits(t)
    assert len(s) == 12 - 3  # n-3 inner edges
    # normalized: tip 0 bit clear
    assert not any(int(x[0]) & 1 for x in s)


def test_rf_identical_and_known():
    a = Tree.from_newick("((a:1,b:1):1,(c:1,d:1):1,e:1);")
    b = Tree.from_newick("((a:1,b:1):1,(c:1,d:1):1,e:1);")
    assert sp.rf_distance(a, b) == 0
    # shares only the {a,b} split -> RF 2
    c = Tree.from_newick("((a:1,b:1):1,(c:1,e:1):1,d:1);")
    assert sp.rf_distance(a, c) == 2
    # no shared splits -> max RF
    d = Tree.from_newick("((a:1,c:1):1,(b:1,d:1):1,e:1);")
    assert sp.rf_distance(a, d) == 4
    assert sp.max_rf_distance(5) == 4


def test_rf_after_random_spr(rng):
    t = ref.random_binary_tree(rng, 15)
    t2 = t.copy()
    # one SPR changes at most a few splits; RF>0 but < max
    for _ in range(100):
        e = int(rng.integers(len(t2.edge_nodes)))
        if t2.edge_nodes[e, 0] < 0:
            continue
        j = int(t2.edge_nodes[e, rng.integers(2)])
        if t2.is_tip(j):
            continue
        tgt = int(rng.integers(len(t2.edge_nodes)))
        try:
            moves.spr(t2, e, tgt, junction=j)
            break
        except Exception:
            continue
    d = sp.rf_distance(t, t2)
    assert 0 < d <= sp.max_rf_distance(15)


def test_rf_label_permutation_invariance(rng):
    """Same topology with tips in different id order => RF 0."""
    t = ref.random_binary_tree(rng, 10)
    nw = t.to_newick()
    t2 = Tree.from_newick(nw)
    assert sp.rf_distance(t, t2) == 0


def test_split_reconstruct_roundtrip(rng):
    """splits -> tree -> splits must reproduce the split set exactly
    (reference test tree/split-reconstruct)."""
    t = ref.random_binary_tree(rng, 14)
    s, _ = sp.tree_splits(t)
    t2, supp = build_tree_from_splits(s, np.ones(len(s)), t.n_tips, t.labels)
    t2.check_integrity()
    s2, _ = sp.tree_splits(t2)
    assert sp.rf_distance_splits(s, s2) == 0
    assert sp.rf_distance(t, t2) == 0


def test_hamming_and_compatibility():
    n = 8
    a = sp.split_from_tips([1, 2], n)
    b = sp.split_from_tips([1, 2, 3], n)
    c = sp.split_from_tips([3, 4], n)
    assert sp.compatible(a, b, n)      # nested
    assert sp.compatible(a, c, n)      # disjoint
    assert not sp.compatible(b, c, n)  # overlapping, neither nested
    assert sp.hamming_distance(a, b, n) == 1
    assert sp.hamming_distance(a, a, n) == 0


def test_strict_and_majority_consensus():
    t1 = Tree.from_newick("(((a:1,b:1):1,c:1):1,(d:1,e:1):1,f:1);")
    t2 = Tree.from_newick("(((a:1,b:1):1,c:1):1,(d:1,f:1):1,e:1);")
    t3 = Tree.from_newick("(((a:1,b:1):1,d:1):1,(c:1,e:1):1,f:1);")
    # {a,b} in all 3; {a,b,c} in 2/3; {d,e},{d,f},{c,e} in 1/3 each
    strict, supp_s = consensus([t1, t2, t3], threshold=1.0)
    s_strict, _ = sp.tree_splits(strict)
    assert len(s_strict) == 1  # only {a,b}
    maj, supp_m = consensus([t1, t2, t3], threshold=0.5)
    s_maj, _ = sp.tree_splits(maj)
    assert len(s_maj) == 2     # {a,b} and {a,b,c}
    assert sorted(round(v, 2) for v in supp_m.values()) == [0.67, 1.0]


def test_mre_extends_majority():
    t1 = Tree.from_newick("(((a:1,b:1):1,c:1):1,(d:1,e:1):1,f:1);")
    t2 = Tree.from_newick("(((a:1,b:1):1,c:1):1,(d:1,e:1):1,f:1);")
    t3 = Tree.from_newick("(((a:1,c:1):1,b:1):1,(d:1,f:1):1,e:1);")
    mre, _ = consensus([t1, t2, t3], threshold=0.0)
    s_mre, _ = sp.tree_splits(mre)
    # MRE adds compatible minority splits; must include {a,b} (2/3)
    # and {d,e} (2/3) and {a,b,c} (2/3)
    assert len(s_mre) == 3
    mre.check_integrity()


def test_weighted_consensus():
    t1 = Tree.from_newick("((a:1,b:1):1,(c:1,d:1):1,e:1);")
    t2 = Tree.from_newick("((a:1,c:1):1,(b:1,d:1):1,e:1);")
    heavy, _ = consensus([t1, t2], threshold=0.5, weights=[0.8, 0.2])
    s, _ = sp.tree_splits(heavy)
    s1, _ = sp.tree_splits(t1)
    assert sp.rf_distance_splits(s, s1) == 0
    with pytest.raises(Exception):
        consensus([t1, t2], weights=[0.8, 0.8])


def test_consensus_streaming_matches_inmemory(rng):
    trees = [ref.random_binary_tree(rng, 8) for _ in range(7)]
    base_labels = trees[0].labels
    newicks = [t.to_newick() for t in trees]
    c1, _ = consensus([Tree.from_newick(n) for n in newicks], 0.5)
    c2, _ = consensus_from_newicks(iter(newicks), 0.5)
    assert sp.rf_distance(c1, c2) == 0


def test_fbp_and_tbe_support(rng):
    reft = ref.random_binary_tree(rng, 10)
    # bootstrap = mostly identical trees + a few perturbed
    boots = [reft.copy() for _ in range(8)]
    for b in boots[6:]:
        for _ in range(50):
            e = int(rng.integers(len(b.edge_nodes)))
            if b.edge_nodes[e, 0] < 0:
                continue
            j = int(b.edge_nodes[e, rng.integers(2)])
            if b.is_tip(j):
                continue
            tgt = int(rng.integers(len(b.edge_nodes)))
            try:
                moves.spr(b, e, tgt, junction=j)
                break
            except Exception:
                continue
    fbp = fbp_support(reft, boots)
    tbe = tbe_support(reft, boots)
    assert set(fbp) == set(tbe)
    for e in fbp:
        assert 0.0 <= fbp[e] <= 1.0
        # TBE >= FBP always (transfer distance relaxation)
        assert tbe[e] >= fbp[e] - 1e-12
    # identical trees give support 1 everywhere
    fbp_id = fbp_support(reft, [reft.copy(), reft.copy()])
    assert all(v == 1.0 for v in fbp_id.values())
    tbe_id = tbe_support(reft, [reft.copy()])
    assert all(v == 1.0 for v in tbe_id.values())


def test_tbe_counting_matches_naive(rng):
    """The native counting-traversal transfer index (the reference's
    Nature-algorithm regime, tbe_functions.c:104-147) equals the naive
    popcount-matrix scan on random tree pairs of several sizes."""
    from pllmod_tpu import native
    from pllmod_tpu.tree import tbe as tbe_mod
    if not native.available():
        pytest.skip("native lib unavailable")
    for n in (6, 17, 64, 200):
        reft = ref.random_binary_tree(rng, n)
        ref_splits, _ = sp.tree_splits(reft)
        for _ in range(3):
            boot = ref.random_binary_tree(rng, n)
            d_cnt, p1 = tbe_mod.transfer_index(ref_splits, boot, n)
            # force the naive matrix path
            bs, _ = sp.tree_splits(boot, include_tips=False)
            d_mat = np.minimum(
                (p1 - 1).astype(np.int64),
                tbe_mod.transfer_distance_matrix(ref_splits, bs,
                                                 n).min(axis=1))
            np.testing.assert_array_equal(np.asarray(d_cnt), d_mat)
