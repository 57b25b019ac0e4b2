"""Starting-tree tests (reference: tree/random-tree, tree/parsimony-tree
golden tests: seeded RNG => deterministic topology; parsimony score
printed/verified)."""

import numpy as np
import pytest

from pllmod_tpu.ops import charmap as cm
from pllmod_tpu.tree.starting import (random_tree, parsimony_score,
                                      parsimony_stepwise,
                                      parsimony_tree_multi)
from pllmod_tpu.tree.splits import rf_distance


def test_random_tree_valid_and_deterministic():
    labels = [f"t{i}" for i in range(12)]
    t1 = random_tree(labels, seed=7)
    t2 = random_tree(labels, seed=7)
    t3 = random_tree(labels, seed=8)
    t1.check_integrity()
    assert t1.is_binary()
    assert t1.n_edges == 2 * 12 - 3
    assert rf_distance(t1, t2) == 0       # same seed, same topology
    assert rf_distance(t1, t3) > 0        # different seed (overwhelmingly)


def test_parsimony_score_known():
    from pllmod_tpu.tree import Tree
    # compatible topology: {a,b}|{c,d} split matches the character -> 1
    good = Tree.from_newick("((a:1,b:1):1,c:1,d:1);")
    assert parsimony_score(good, ["A", "A", "C", "C"], cm.DNA) == 1
    # incompatible topology {a,c}|{b,d} -> 2 changes
    bad = Tree.from_newick("((a:1,c:1):1,b:1,d:1);")
    seqs_by_label = {"a": "A", "b": "A", "c": "C", "d": "C"}
    assert parsimony_score(bad, [seqs_by_label[l] for l in bad.labels],
                           cm.DNA) == 2
    # all same: 0 mutations; all different: 3 on any binary tree
    assert parsimony_score(good, ["A", "A", "A", "A"], cm.DNA) == 0
    assert parsimony_score(good, ["A", "C", "G", "T"], cm.DNA) == 3


def test_parsimony_score_with_ambiguity():
    t = random_tree(["a", "b", "c", "d"], seed=1)
    seqs_by_label = {"a": "A", "b": "R", "c": "G", "d": "G"}
    seqs = [seqs_by_label[l] for l in t.labels]
    # R=A|G is compatible with both sides: 1 mutation suffices (A vs G)
    assert parsimony_score(t, seqs, cm.DNA) == 1


def test_parsimony_stepwise_beats_random(rng):
    # simulate clustered data: two clades with distinct signatures
    n, sites = 10, 200
    base1 = rng.choice(list("ACGT"), sites)
    base2 = base1.copy()
    flip = rng.random(sites) < 0.4
    base2[flip] = rng.choice(list("ACGT"), flip.sum())
    seqs = []
    for i in range(n):
        src = base1 if i < n // 2 else base2
        s = src.copy()
        mut = rng.random(sites) < 0.03
        s[mut] = rng.choice(list("ACGT"), mut.sum())
        seqs.append("".join(s))
    labels = [f"t{i}" for i in range(n)]
    ptree, pscore = parsimony_stepwise(labels, seqs, cm.DNA, seed=3)
    ptree.check_integrity()
    assert ptree.is_binary()
    assert pscore == parsimony_score(ptree, seqs, cm.DNA)
    # must beat the average random tree comfortably
    rscores = [parsimony_score(random_tree(labels, seed=s0), seqs, cm.DNA)
               for s0 in range(5)]
    assert pscore <= min(rscores)


def test_parsimony_multi_partition(rng):
    n = 8
    labels = [f"t{i}" for i in range(n)]
    seqs1 = ["".join(rng.choice(list("ACGT"), 80)) for _ in range(n)]
    seqs2 = ["".join(rng.choice(list("ARNDCQEGHILKMFPSTWYV"), 40))
             for _ in range(n)]
    t, score = parsimony_tree_multi(
        labels, [(seqs1, cm.DNA, None), (seqs2, cm.AA, None)], seed=5)
    t.check_integrity()
    assert t.is_binary()
    assert score == (parsimony_score(t, seqs1, cm.DNA)
                     + parsimony_score(t, seqs2, cm.AA))


def test_parsimony_spr_round_improves(rng):
    from pllmod_tpu.tree.starting import parsimony_spr_round
    n, sites = 12, 150
    base1 = rng.choice(list("ACGT"), sites)
    base2 = base1.copy()
    flip = rng.random(sites) < 0.4
    base2[flip] = rng.choice(list("ACGT"), flip.sum())
    seqs = []
    for i in range(n):
        src = base1 if i < n // 2 else base2
        s = src.copy()
        mut = rng.random(sites) < 0.04
        s[mut] = rng.choice(list("ACGT"), mut.sum())
        seqs.append("".join(s))
    labels = [f"t{i}" for i in range(n)]
    # start from a random tree: SPR round should reduce the score
    t = random_tree(labels, seed=2)
    s0 = parsimony_score(t, seqs, cm.DNA)
    t, s1, applied = parsimony_spr_round(t, seqs, cm.DNA)
    t.check_integrity()
    assert s1 <= s0
    assert applied > 0
    assert s1 == parsimony_score(t, seqs, cm.DNA)
    # iterating converges at or below the stepwise-addition score
    for _ in range(4):
        t, s2, applied = parsimony_spr_round(t, seqs, cm.DNA)
        if applied == 0:
            break
    pt, ps = parsimony_stepwise(labels, seqs, cm.DNA, seed=3)
    assert s2 <= ps * 1.1 + 3


def test_extend_tree_parsimony():
    """pllmod_utree_extend_parsimony_multipart analog: new taxa inserted
    by summed multi-partition parsimony; the old topology is preserved
    as a restriction of the result (pll_tree.c:1207-1273)."""
    from pllmod_tpu.tree.starting import (extend_tree_parsimony,
                                          parsimony_score_multi)
    from pllmod_tpu.tree.constraint import Constraint
    rng = np.random.default_rng(7)
    n = 9
    labels = [f"t{i}" for i in range(n)]
    seqs1 = ["".join(rng.choice(list("ACGT"), 50)) for _ in range(n)]
    seqs2 = ["".join(rng.choice(list("ACGT"), 30)) for _ in range(n)]
    parts = [(seqs1, cm.DNA, None), (seqs2, cm.DNA, None)]

    t5 = random_tree(labels[:5], seed=1)
    t9, score = extend_tree_parsimony(t5, labels[5:], parts, seed=2,
                                      default_brlen=0.25)
    assert t9.n_tips == n and t9.is_binary()
    assert t9.labels == labels
    # reference resets ALL branch lengths to the default
    np.testing.assert_allclose(
        t9.lengths[t9.edge_nodes[:, 0] >= 0], 0.25)
    assert score == parsimony_score_multi(t9, parts)
    # the original 5-taxon topology survives as a restriction
    assert Constraint(t5, t9.labels).check_tree(t9)


def test_resolve_multi_parsimony():
    """pllmod_utree_resolve_parsimony_multipart analog: random resolution
    + constrained parsimony SPR rounds; result is binary, respects the
    input tree's splits, and never scores worse than the pure random
    resolution it starts from (pll_tree.c:1110-1200)."""
    from pllmod_tpu.tree.starting import (resolve_multi_parsimony,
                                          parsimony_score_multi)
    from pllmod_tpu.tree.utils import resolve_multifurcations
    from pllmod_tpu.tree.constraint import Constraint
    rng = np.random.default_rng(11)
    n = 10
    labels = [f"t{i}" for i in range(n)]
    seqs = ["".join(rng.choice(list("ACGT"), 80)) for _ in range(n)]
    parts = [(seqs, cm.DNA, None)]
    from pllmod_tpu.tree import Tree
    multi = Tree.from_newick(
        "((t0:1,t1:1,t2:1,t3:1):1,t4:1,(t5:1,t6:1,t7:1,t8:1,t9:1):1);")

    tr, score = resolve_multi_parsimony(multi, parts, seed=5,
                                        max_spr_rounds=4)
    assert tr.is_binary()
    assert Constraint(multi, tr.labels).check_tree(tr)
    assert score == parsimony_score_multi(tr, parts)
    rand = resolve_multifurcations(multi, seed=5, default_brlen=0.1)
    assert score <= parsimony_score_multi(rand, parts)
    # already-binary input: no SPR rounds, identical topology back
    tr2, _ = resolve_multi_parsimony(tr, parts, seed=6)
    from pllmod_tpu.tree.splits import rf_distance
    assert rf_distance(tr, tr2) == 0


def test_native_stepwise_matches_python(rng):
    """Native C++ stepwise addition builds the IDENTICAL topology as the
    python reference path (same greedy rule + first-min tie-breaking),
    and the native directed Fitch sets equal the dict-based ones."""
    from pllmod_tpu import native
    from pllmod_tpu.tree import starting as st
    if not native.available():
        pytest.skip("native lib unavailable")
    from tests import reference_impl as ref
    from pllmod_tpu.ops import charmap as cm
    n, sites = 24, 60
    seqs = ref.random_sequences(rng, n, sites, gap_frac=0.0)
    labels = [f"t{i}" for i in range(n)]
    cmap = cm.for_states(4)
    t_nat, s_nat = st.parsimony_stepwise(labels, seqs, cmap, seed=5)
    # force the python fallback
    avail = native.available
    native.available = lambda: False
    try:
        t_py, s_py = st.parsimony_stepwise(labels, seqs, cmap, seed=5)
    finally:
        native.available = avail
    assert s_nat == s_py
    from pllmod_tpu.tree.splits import rf_distance
    assert rf_distance(t_nat, t_py) == 0
    # directed sets: array engine equals the dict engine
    masks = st._tip_masks(seqs, cmap)
    A, B = native.directed_fitch_sets(t_py.edge_nodes, n,
                                      t_py.n_nodes, masks)
    up = st._directed_fitch_sets(t_py, masks)
    for e, (u, v) in enumerate(t_py.edge_nodes):
        u, v = int(u), int(v)
        if u < 0:
            continue
        np.testing.assert_array_equal(A[e], up[(u, v)], err_msg=f"A {e}")
        np.testing.assert_array_equal(B[e], up[(v, u)], err_msg=f"B {e}")
