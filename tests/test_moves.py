"""Move/rollback tests, mirroring the reference's treemove-{spr,nni,tbr}
golden tests (test/src/tree/): apply move -> integrity -> rollback ->
original likelihood restored exactly.
"""

import numpy as np
import pytest

from pllmod_tpu.common import TreeError
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops.engine import tree_loglikelihood
from pllmod_tpu.tree import Tree
from pllmod_tpu.tree import moves

NEWICK = ("((a:0.11,b:0.12):0.05,((c:0.2,d:0.21):0.09,(e:0.14,f:0.13):0.08)"
          ":0.07,g:0.3);")


@pytest.fixture
def tree():
    return Tree.from_newick(NEWICK)


@pytest.fixture
def partition(rng):
    n = 7
    seqs = ["".join(rng.choice(list("ACGT-"), 60)) for _ in range(n)]
    return create_partition(seqs, states=4, n_rate_cats=4, alpha=0.9,
                            subst_rates=[1.2, 2.5, 0.8, 1.1, 3.0, 1.0],
                            freqs=[0.3, 0.2, 0.24, 0.26])


def lnl(partition, tree):
    return float(tree_loglikelihood(partition, tree))


def inner_edges(tree):
    return [e for e in range(len(tree.edge_nodes))
            if tree.edge_nodes[e, 0] >= 0
            and not tree.is_tip(int(tree.edge_nodes[e, 0]))
            and not tree.is_tip(int(tree.edge_nodes[e, 1]))]


def test_spr_changes_topology_and_rolls_back(tree, partition):
    l0 = lnl(partition, tree)
    # prune the (a,b) clade and regraft near (c,d)
    a_edge = next(e for e, (x, y) in enumerate(tree.edge_nodes)
                  if tree.is_tip(int(min(x, y)))
                  and tree.labels[int(min(x, y))] == "a")
    junction = int(max(tree.edge_nodes[a_edge]))
    # pick a regraft edge outside the pruned subtree + not adjacent
    target = next(e for e, (x, y) in enumerate(tree.edge_nodes)
                  if x >= 0 and tree.is_tip(int(min(x, y)))
                  and tree.labels[int(min(x, y))] == "c")
    rb = moves.spr(tree, a_edge, target, junction=junction)
    tree.check_integrity()
    l1 = lnl(partition, tree)
    assert abs(l1 - l0) > 1e-9  # topology/lengths changed
    moves.rollback(tree, rb)
    tree.check_integrity()
    assert lnl(partition, tree) == pytest.approx(l0, abs=1e-10)


def test_spr_invalid_regraft_adjacent(tree):
    e = inner_edges(tree)[0]
    u = int(tree.edge_nodes[e, 0])
    adj_edge = next(ed for _, ed in tree.neighbors(u) if ed != e)
    with pytest.raises(TreeError):
        moves.spr(tree, e, adj_edge, junction=u)


def test_nni_both_types_rollback(tree, partition):
    l0 = lnl(partition, tree)
    e = inner_edges(tree)[0]
    for mt in (moves.NNI_LEFT, moves.NNI_RIGHT):
        rb = moves.nni(tree, e, mt)
        tree.check_integrity()
        assert abs(lnl(partition, tree) - l0) > 1e-9
        moves.rollback(tree, rb)
        assert lnl(partition, tree) == pytest.approx(l0, abs=1e-10)


def test_nni_requires_inner_edge(tree):
    tip_edge = next(e for e, (x, y) in enumerate(tree.edge_nodes)
                    if tree.is_tip(int(min(x, y))))
    with pytest.raises(TreeError):
        moves.nni(tree, tip_edge, moves.NNI_LEFT)


def test_nni_left_right_differ(tree):
    e = inner_edges(tree)[0]
    t1 = tree.copy()
    t2 = tree.copy()
    moves.nni(t1, e, moves.NNI_LEFT)
    moves.nni(t2, e, moves.NNI_RIGHT)
    assert not np.array_equal(t1.edge_nodes, t2.edge_nodes)


def test_tbr_rollback(partition):
    # bigger tree so a valid TBR exists with non-adjacent reconnection edges
    t = Tree.from_newick(
        "(((a:0.1,b:0.1):0.1,(c:0.1,d:0.1):0.1):0.1,"
        "((e:0.1,f:0.1):0.1,(g:0.1,h:0.1):0.1):0.1,i:0.2);")
    rng = np.random.default_rng(1)
    seqs = ["".join(rng.choice(list("ACGT"), 40)) for _ in range(9)]
    part = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.0)
    l0 = float(tree_loglikelihood(part, t))
    # find internal edge + one edge strictly inside each side
    for be in [e for e in range(len(t.edge_nodes))
               if not t.is_tip(int(t.edge_nodes[e, 0]))
               and not t.is_tip(int(t.edge_nodes[e, 1]))]:
        u, v = (int(x) for x in t.edge_nodes[be])
        u_adj = {ed for _, ed in t.neighbors(u)}
        v_adj = {ed for _, ed in t.neighbors(v)}
        side_u = moves.subtree_nodes(t, be, u)
        cands_u = [e for e in range(len(t.edge_nodes))
                   if t.edge_nodes[e, 0] >= 0 and e not in u_adj | v_adj
                   and set(int(x) for x in t.edge_nodes[e]) <= side_u]
        side_v = moves.subtree_nodes(t, be, v)
        cands_v = [e for e in range(len(t.edge_nodes))
                   if t.edge_nodes[e, 0] >= 0 and e not in u_adj | v_adj
                   and set(int(x) for x in t.edge_nodes[e]) <= side_v]
        if cands_u and cands_v:
            rb = moves.tbr(t, be, cands_u[0], cands_v[0])
            t.check_integrity()
            moves.rollback(t, rb)
            t.check_integrity()
            assert float(tree_loglikelihood(part, t)) == pytest.approx(
                l0, abs=1e-10)
            return
    pytest.fail("no valid TBR found")


def test_tbr_leaf_bisection_rejected(tree):
    tip_edge = next(e for e, (x, y) in enumerate(tree.edge_nodes)
                    if tree.is_tip(int(min(x, y))))
    with pytest.raises(TreeError):
        moves.tbr(tree, tip_edge, 0, 1)


def test_edge_ids_stable_under_spr(tree):
    """Edge ids must survive moves (pmatrix-index stability)."""
    ids_before = set(np.nonzero(tree.edge_nodes[:, 0] >= 0)[0])
    a_edge = next(e for e, (x, y) in enumerate(tree.edge_nodes)
                  if tree.is_tip(int(min(x, y)))
                  and tree.labels[int(min(x, y))] == "a")
    junction = int(max(tree.edge_nodes[a_edge]))
    target = next(e for e, (x, y) in enumerate(tree.edge_nodes)
                  if x >= 0 and tree.is_tip(int(min(x, y)))
                  and tree.labels[int(min(x, y))] == "c")
    moves.spr(tree, a_edge, target, junction=junction)
    ids_after = set(np.nonzero(tree.edge_nodes[:, 0] >= 0)[0])
    assert ids_before == ids_after
