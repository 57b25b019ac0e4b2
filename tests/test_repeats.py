"""Site-repeats engine (PLL_ATTRIB_SITE_REPEATS analog, ops/repeats.py):
golden equivalence against the JAX engines + asymptotic-work accounting.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops.engine import tree_loglikelihood
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops import repeats as rp
from tests import reference_impl as ref


def _make(rng, n_taxa, n_sites, pinv=0.0, compress=False):
    tree = ref.random_binary_tree(rng, n_taxa)
    seqs = ref.random_sequences(rng, n_taxa, n_sites)
    part = create_partition(
        seqs, states=4, n_rate_cats=4, alpha=0.7,
        subst_rates=rng.uniform(0.2, 4.0, size=6),
        freqs=rng.dirichlet([6, 6, 6, 6]), prop_invar=pinv,
        dtype=jnp.float64, compress=compress)
    return part, tree


@pytest.mark.parametrize("pinv", [0.0, 0.25])
def test_repeats_matches_scan(rng, pinv):
    part, tree = _make(rng, 10, 120, pinv=pinv)
    want = float(tree_loglikelihood(part, tree, schedule="scan"))
    got = rp.loglikelihood_repeats(part, tree)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_repeats_root_edge_invariance(rng):
    part, tree = _make(rng, 8, 80)
    want = float(tree_loglikelihood(part, tree, schedule="scan"))
    for e in range(0, tree.n_edges, 3):
        got = tree_loglikelihood(part, tree, root_edge=e,
                                 schedule="repeats")
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_repeat_heavy_alignment_does_less_work(rng):
    """Duplicated column blocks: the repeats engine computes a fraction
    of the dense pruning work (the reference mode's asymptotic win) while
    matching the dense engines exactly."""
    n_taxa, n_base, n_rep = 12, 12, 20
    tree = ref.random_binary_tree(rng, n_taxa)
    base = np.array([list(s) for s in
                     ref.random_sequences(rng, n_taxa, n_base)])
    cols = base[:, rng.integers(0, n_base, size=n_base * n_rep)]
    seqs = ["".join(row) for row in cols]
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.9,
                            dtype=jnp.float64, compress=False)
    want = float(tree_loglikelihood(part, tree, schedule="scan"))
    got, stats = rp.loglikelihood_repeats(part, tree, return_stats=True)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # every node sees at most n_base distinct subtree patterns
    assert stats["unique_work"] <= (n_taxa - 2) * n_base
    assert stats["unique_work"] < 0.2 * stats["dense_work"]

    info = rp.repeats_stats(part, tree)
    assert info["work_ratio"] < 0.2
    assert max(info["per_node_classes"]) <= n_base
    assert info["dense_work"] == (n_taxa - 2) * info["n_patterns"]


def test_repeats_on_compressed_patterns(rng):
    """Pattern compression composes with repeats (compression dedups
    whole columns; repeats dedup per-subtree slices on top)."""
    part, tree = _make(rng, 9, 200, compress=True)
    want = float(tree_loglikelihood(part, tree, schedule="scan"))
    got = rp.loglikelihood_repeats(part, tree)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # low-diversity data: even after column dedup, shallow nodes have
    # far fewer classes than patterns
    info = rp.repeats_stats(part, tree)
    assert min(info["per_node_classes"]) < info["n_patterns"]


def test_repeats_class_structure(rng):
    """site_id / id_site invariants (the reference's repeats arrays):
    representative sites map back to their own class, tip classes are
    the tip codes."""
    part, tree = _make(rng, 7, 50)
    ops, _ = tree.traversal_ops()
    Pn = part.n_patterns
    codes = np.asarray(part.tip_states)[:, :Pn]
    site_id, kcount, id_site = rp.compute_repeats(
        codes, ops, part.n_tips, int(part.code_clv.shape[0]))
    for s, sid in site_id.items():
        K = kcount[s]
        assert sid.min() >= 0 and sid.max() < K
        assert len(id_site[s]) == K
        np.testing.assert_array_equal(sid[id_site[s]], np.arange(K))


def test_repeats_binary_roundtrip(rng, tmp_path):
    """REPEATS block round-trip (pll_binary.c:517-884 analog)."""
    from pllmod_tpu.binary.binary import BinaryFile
    part, tree = _make(rng, 8, 60)
    ops, _ = tree.traversal_ops()
    Pn = part.n_patterns
    codes = np.asarray(part.tip_states)[:, :Pn]
    site_id, _k, id_site = rp.compute_repeats(
        codes, ops, part.n_tips, int(part.code_clv.shape[0]))
    path = str(tmp_path / "reps.bin")
    with BinaryFile.create(path) as bf:
        bf.dump_repeats(7, site_id, id_site)
    with BinaryFile.open(path) as bf:
        sid2, ids2 = bf.load_repeats(7)
    assert set(sid2) == set(site_id) and set(ids2) == set(id_site)
    for s in site_id:
        np.testing.assert_array_equal(sid2[s], site_id[s])
        np.testing.assert_array_equal(ids2[s], id_site[s])
