"""Tree utility + rooted-tree tests (reference: tree/serialize golden test
serialize->expand->RF==0; rtreemove-spr apply/rollback)."""

import numpy as np
import pytest

from pllmod_tpu.common import TreeError
from pllmod_tpu.tree import Tree
from pllmod_tpu.tree.rtree import RTree
from pllmod_tpu.tree.splits import rf_distance, tree_splits
from pllmod_tpu.tree.utils import (collapse_short_branches,
                                   resolve_multifurcations, outgroup_edge,
                                   serialize_tree, expand_tree,
                                   newick_with_support)
from tests import reference_impl as ref


def test_serialize_expand_rf_zero(rng):
    t = ref.random_binary_tree(rng, 20)
    blob = serialize_tree(t)
    t2 = expand_tree(blob)
    assert rf_distance(t, t2) == 0
    np.testing.assert_array_equal(t.edge_nodes, t2.edge_nodes)
    np.testing.assert_allclose(t.lengths, t2.lengths)


def test_collapse_and_resolve_roundtrip(rng):
    t = ref.random_binary_tree(rng, 12, 0.05, 0.5)
    # shrink two inner edges below threshold
    inner = [e for e, (u, v) in enumerate(t.edge_nodes)
             if not t.is_tip(int(u)) and not t.is_tip(int(v))]
    t.lengths[inner[0]] = 1e-8
    t.lengths[inner[1]] = 1e-8
    c = collapse_short_branches(t, 1e-6)
    c.check_integrity()
    assert not c.is_binary()
    assert c.n_edges == t.n_edges - 2
    # collapsed splits are a subset of the original's
    s_orig = {bytes(s) for s in tree_splits(t)[0]}
    s_coll = {bytes(s) for s in tree_splits(c)[0]}
    assert s_coll <= s_orig
    r = resolve_multifurcations(c, seed=5)
    r.check_integrity()
    assert r.is_binary()
    # resolution preserves all collapsed splits
    s_res = {bytes(s) for s in tree_splits(r)[0]}
    assert s_coll <= s_res


def test_outgroup_edge():
    t = Tree.from_newick("(((a:1,b:1):1,c:1):1,(d:1,e:1):1,f:1);")
    e = outgroup_edge(t, ["d", "e"])
    u, v = (int(x) for x in t.edge_nodes[e])
    # the split across e must be exactly {d,e}
    from pllmod_tpu.tree import moves
    side_u = {x for x in moves.subtree_nodes(t, e, u) if t.is_tip(x)}
    side_v = {x for x in moves.subtree_nodes(t, e, v) if t.is_tip(x)}
    names = [{t.labels[i] for i in side_u}, {t.labels[i] for i in side_v}]
    assert {"d", "e"} in names
    # single-tip outgroup
    e2 = outgroup_edge(t, ["f"])
    assert t.is_tip(int(min(t.edge_nodes[e2])))
    with pytest.raises(TreeError):
        outgroup_edge(t, ["a", "d"])  # polyphyletic


def test_newick_with_support():
    t = Tree.from_newick("((a:1,b:1):1,(c:1,d:1):1,e:1);")
    splits, ids = tree_splits(t)
    sup = {int(e): 0.87 for e in ids}
    nw = newick_with_support(t, sup)
    assert "87" in nw
    t2 = Tree.from_newick(nw)  # inner labels are skippable
    assert rf_distance(t, t2) == 0


# ---------------------------------------------------------------------------
# rooted trees
# ---------------------------------------------------------------------------
def test_rtree_parse_and_export():
    nw = "((a:0.1,b:0.2):0.3,(c:0.4,(d:0.5,e:0.6):0.7):0.8);"
    rt = RTree.from_newick(nw)
    rt.check_integrity()
    assert rt.n_tips == 5
    back = RTree.from_newick(rt.to_newick())
    back.check_integrity()
    assert back.labels == rt.labels


def test_rtree_sibling_and_spr_rollback():
    rt = RTree.from_newick(
        "((a:0.1,b:0.2):0.3,(c:0.4,(d:0.5,e:0.6):0.7):0.8);")
    a = rt.labels.index("a")
    b = rt.labels.index("b")
    assert rt.sibling(a) == b
    d = rt.labels.index("d")
    before = rt.to_newick()
    snap = rt.spr(a, d)       # move a next to d
    rt.check_integrity()
    assert rt.to_newick() != before
    rt.rollback(snap)
    assert rt.to_newick() == before


def test_rtree_spr_into_subtree_rejected():
    rt = RTree.from_newick("((a:1,b:1):1,(c:1,d:1):1);")
    inner_cd = int(rt.parent[rt.labels.index("c")])
    with pytest.raises(TreeError):
        rt.spr(inner_cd, rt.labels.index("c"))


def test_rtree_to_unrooted_matches():
    rt = RTree.from_newick("((a:0.1,b:0.2):0.3,(c:0.4,d:0.5):0.8);")
    ut = rt.to_unrooted()
    ut.check_integrity()
    expect = Tree.from_newick("((a:0.1,b:0.2):1.1,c:0.4,d:0.5);")
    assert rf_distance(ut, expect) == 0


def test_extend_tree_random(rng):
    from pllmod_tpu.tree.starting import extend_tree_random
    t = ref.random_binary_tree(rng, 8)
    t2 = extend_tree_random(t, ["x1", "x2", "x3"], seed=4)
    assert t2.n_tips == 11
    assert t2.is_binary()
    assert t2.labels[8:] == ["x1", "x2", "x3"]
    # restricting to the original taxa recovers the original topology
    from pllmod_tpu.tree.constraint import Constraint
    cons = Constraint(t, t2.labels)
    assert cons.check_tree(t2)


def test_root_unrooted_at_edge(rng):
    t = ref.random_binary_tree(rng, 8)
    e = next(i for i, r in enumerate(t.edge_nodes) if r[0] >= 0)
    rt = RTree.from_unrooted(t, e, position=0.3)
    rt.check_integrity()
    assert rt.n_tips == 8
    # unrooting recovers the original topology and total length
    back = rt.to_unrooted()
    assert rf_distance(t, back) == 0
    np.testing.assert_allclose(sorted(back.lengths), sorted(t.lengths),
                               atol=1e-12)


def test_treeinfo_compute_ancestral(rng):
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.ops.partition import create_partition
    t = ref.random_binary_tree(rng, 6)
    seqs = ref.random_sequences(rng, 6, 50, gap_frac=0.0)
    import jax.numpy as jnp
    p = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.0,
                         compress=False, dtype=jnp.float64)
    ti = TreeInfo(t, [p])
    (nodes, probs), = ti.compute_ancestral()
    assert probs.shape[0] == len(nodes) == t.n_inner
    np.testing.assert_allclose(probs.sum(-1)[:, :50], 1.0, atol=1e-10)


def test_nodes_at_node_dist():
    """BFS candidate enumeration (utree_operations.c:389-503): exact
    distances on a known caterpillar topology."""
    from pllmod_tpu.tree import Tree
    from pllmod_tpu.tree.utils import nodes_at_node_dist, nodes_at_edge_dist
    t = Tree.from_newick("((a:1,b:1):1,(c:1,d:1):1,e:1);")
    # node ids: tips a=0,b=1,c=2,d=3,e=4; inner ab=?, cd=?, root=?
    adj = t.adjacency()
    root = next(n for n in range(t.n_tips, t.n_nodes) if len(adj[n]) == 3)
    # distance-1 neighborhood of the root: its three neighbors
    d1 = nodes_at_node_dist(t, root, 1, 1)
    assert len(d1) == 3 and all(x != root for x in d1)
    # everything is within distance 3 of the root (5 tips + 2 inners)
    dall = nodes_at_node_dist(t, root, 1, 10)
    assert len(dall) == t.n_nodes - 1
    # min_dist excludes the near ring
    far = nodes_at_node_dist(t, root, 2, 10)
    assert set(far) | set(d1) == set(dall) and not set(far) & set(d1)
    # edge version: both endpoints at distance 0
    e_ab = next(e for n, e in adj[0])
    near = nodes_at_edge_dist(t, e_ab, 1, 1)
    assert 0 in near or 1 in near or root in near


def test_rtree_nodes_at_node_dist():
    from pllmod_tpu.tree.rtree import RTree
    rt = RTree.from_newick("(((a:1,b:1):1,c:1):1,(d:1,e:1):1);")
    root = rt.root
    d1 = rt.nodes_at_node_dist(root, 1, 1)
    assert len(d1) == 2            # root's two children
    dall = rt.nodes_at_node_dist(root, 1, 10)
    assert len(dall) == rt.n_nodes - 1
    # prune floats a node; floating nodes never appear as candidates
    orphan = rt.prune(0)
    assert orphan not in rt.nodes_at_node_dist(rt.root, 1, 10)


def test_branch_scaling_utilities():
    """scale_branches / scale_subtree_branches / set_length(_recursive)
    (pll_tree.c:1388-1460) + split lightside/show (utree_distances.c)."""
    from pllmod_tpu.tree.utils import (scale_branches,
                                       scale_subtree_branches,
                                       set_length, set_length_recursive)
    from pllmod_tpu.tree import splits as sp

    t = Tree.from_newick("((a:1,b:2):3,(c:4,d:5):6,e:7);")
    before = t.lengths.copy()
    scale_branches(t, 2.0)
    np.testing.assert_allclose(t.lengths, before * 2.0)

    # subtree scaling: scale the (a,b) clade side of its parent edge —
    # exactly the parent edge + a's and b's pendant edges change
    ab_inner = next(n for n in range(t.n_tips, t.n_nodes)
                    if {x for x, _ in t.neighbors(n)} >= {0, 1})
    pedge = next(e for nbr, e in t.neighbors(ab_inner)
                 if nbr not in (0, 1))
    before = t.lengths.copy()
    scale_subtree_branches(t, pedge, ab_inner, 10.0)
    e_a = t.edge_between(ab_inner, 0)
    e_b = t.edge_between(ab_inner, 1)
    expect = before.copy()
    expect[[pedge, e_a, e_b]] *= 10.0
    np.testing.assert_allclose(t.lengths, expect)

    set_length(t, e_a, 0.125)
    assert t.lengths[e_a] == 0.125
    t.lengths[e_b] = 0.0
    set_length_recursive(t, 0.5, missing_only=True)
    assert t.lengths[e_b] == 0.5 and t.lengths[e_a] == 0.125
    set_length_recursive(t, 0.25)
    np.testing.assert_allclose(t.lengths, 0.25)

    s = sp.split_from_tips([0, 1], t.n_tips)
    assert sp.lightside(s, t.n_tips) == 2
    # split_from_tips normalizes: tip 0's side is the zero side
    assert sp.show_split(s, t.n_tips) == "--***"
    with pytest.raises(TreeError):
        set_length(t, 999, 0.1) if False else scale_subtree_branches(
            t, pedge, 4, 1.0)   # node 4 (tip e) is not on edge pedge


def test_treeinfo_scale_branches():
    """pllmod_treeinfo_scale_branches_all / _partition semantics across
    linkage modes (treeinfo.c:1101-1197)."""
    from pllmod_tpu.common import BRLEN_UNLINKED, BRLEN_LINKED
    from pllmod_tpu.tree import TreeInfo
    t = Tree.from_newick("((a:1,b:2):3,(c:4,d:5):6,e:7);")
    ti = TreeInfo(t, [None, None], brlen_linkage=BRLEN_UNLINKED)
    ti.brlens[1] *= 3.0
    base = t.lengths.copy()
    ti.scale_branches_all(2.0)
    np.testing.assert_allclose(ti.tree.lengths, base * 2.0)
    np.testing.assert_allclose(ti.brlens[0], base * 2.0)
    np.testing.assert_allclose(ti.brlens[1], base * 6.0)
    ti.scale_branches_partition(1, 0.5)
    np.testing.assert_allclose(ti.brlens[1], base * 3.0)
    np.testing.assert_allclose(ti.brlens[0], base * 2.0)

    ti2 = TreeInfo(t.copy(), [None], brlen_linkage=BRLEN_LINKED)
    with pytest.raises(ValueError):
        ti2.scale_branches_partition(0, 2.0)


def test_treeinfo_compute_loglh_persite():
    """pllmod_treeinfo_compute_loglh_persite: per-pattern lnl vectors sum
    (weighted) to each partition's total logL."""
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree import TreeInfo
    rng = np.random.default_rng(3)
    t = Tree.from_newick("((a:0.1,b:0.2):0.05,(c:0.1,d:0.3):0.07,e:0.2);")
    seqs = ["".join(rng.choice(list("ACGT"), 60)) for _ in range(5)]
    p1 = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.6,
                          dtype="float64")
    p2 = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.4,
                          prop_invar=0.2, dtype="float64")
    ti = TreeInfo(t, [p1, p2])
    total = ti.compute_loglh()
    t2, persite = ti.compute_loglh_persite()
    assert abs(t2 - total) < 1e-8
    for i, p in enumerate([p1, p2]):
        w = np.asarray(p.pattern_weights)
        assert abs(float((persite[i] * w).sum())
                   - ti.partition_loglh[i]) < 1e-8
