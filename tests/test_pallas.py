"""Pallas kernel equivalence (interpret mode on CPU).

The TPU production path must match the XLA engine exactly — the
scalar-vs-SIMD golden equivalence of the reference (SURVEY §4) applied to
the hand-written kernel."""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops import engine
from pllmod_tpu.ops import pallas_clv
from tests import reference_impl as ref


@pytest.mark.parametrize("n_tips,cats,pinv", [(6, 4, 0.0), (12, 2, 0.2),
                                              (20, 4, 0.0)])
def test_pallas_matches_xla(rng, n_tips, cats, pinv):
    tree = ref.random_binary_tree(rng, n_tips)
    seqs = ref.random_sequences(rng, n_tips, 100)
    part = create_partition(seqs, states=4, n_rate_cats=cats, alpha=0.9,
                            prop_invar=pinv,
                            subst_rates=rng.uniform(0.5, 2, 6),
                            freqs=rng.dirichlet([6] * 4),
                            dtype=jnp.float32)
    levels, offsets, ri, n_slots = engine.compile_schedule(part, tree)
    brl = jnp.asarray(tree.lengths, part.dtype)
    l_xla = float(engine.loglikelihood_levels(part, levels, brl, offsets,
                                              ri, n_slots))
    l_pl = float(pallas_clv.loglikelihood_pallas(part, levels, brl, offsets,
                                                 ri, n_slots, True))
    assert l_pl == pytest.approx(l_xla, abs=1e-3)


@pytest.mark.parametrize("n_tips,cats,pinv,sites", [(6, 4, 0.0, 100),
                                                    (12, 2, 0.2, 100),
                                                    (20, 4, 0.1, 300)])
def test_fused_matches_xla(rng, n_tips, cats, pinv, sites):
    """Whole-traversal megakernel (one pallas call, manual DMA) must match
    the level-batched XLA engine on the same f32 partition."""
    tree = ref.random_binary_tree(rng, n_tips)
    seqs = ref.random_sequences(rng, n_tips, sites)
    part = create_partition(seqs, states=4, n_rate_cats=cats, alpha=0.9,
                            prop_invar=pinv,
                            subst_rates=rng.uniform(0.5, 2, 6),
                            freqs=rng.dirichlet([6] * 4),
                            dtype=jnp.float32)
    levels, offsets, ri, n_slots = engine.compile_schedule(part, tree)
    brl = jnp.asarray(tree.lengths, part.dtype)
    l_xla = float(engine.loglikelihood_levels(part, levels, brl, offsets,
                                              ri, n_slots))
    idx8, e1, e2, rif, n_slots_f = pallas_clv.compile_fused(part, tree)
    l_fused = float(pallas_clv.loglikelihood_fused(
        part, idx8, brl, e1, e2, rif, n_slots_f, True))
    assert l_fused == pytest.approx(l_xla, abs=1e-3)


def test_fused_protein_and_odd_states(rng):
    """CS=80 (protein Γ4) and CS=28 (MULTI7 Γ4, not a sublane multiple)
    through the megakernel."""
    from pllmod_tpu.ops import charmap as cm
    AA = "ARNDCQEGHILKMFPSTWYV"
    tree = ref.random_binary_tree(rng, 9)
    seqs = ref.random_sequences(rng, 9, 130, alphabet=AA, gap_frac=0.05)
    part = create_partition(seqs, states=20, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float32)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    l_scan = float(engine.tree_loglikelihood(part, tree, schedule="scan"))
    idx8, e1, e2, ri, ns = pallas_clv.compile_fused(part, tree)
    l_f = float(pallas_clv.loglikelihood_fused(part, idx8, brl, e1, e2,
                                               ri, ns, True))
    assert l_f == pytest.approx(l_scan, abs=2e-3)

    cmap = cm.multistate(7)
    seqs7 = ["".join(rng.choice(list("0123456"), 96)) for _ in range(8)]
    tree7 = ref.random_binary_tree(rng, 8)
    p7 = create_partition(seqs7, charmap=cmap, n_rate_cats=4, alpha=1.0,
                          dtype=jnp.float32)
    l7s = float(engine.tree_loglikelihood(p7, tree7, schedule="scan"))
    idx8, e1, e2, ri, ns = pallas_clv.compile_fused(p7, tree7)
    l7f = float(pallas_clv.loglikelihood_fused(
        p7, idx8, jnp.asarray(tree7.lengths, jnp.float32), e1, e2, ri, ns,
        True))
    assert l7f == pytest.approx(l7s, abs=2e-3)


def test_fused_caterpillar(rng):
    """Maximally unbalanced (caterpillar) tree: every level has W=1, the
    fence fires on every node — stresses the RAW-hazard protocol."""
    n = 10
    newick = "(t0:0.1," + "".join(
        f"(t{i}:0.1," for i in range(1, n - 1)) + f"t{n-1}:0.1" + \
        ")" * (n - 2) + ");"
    from pllmod_tpu.tree.topology import Tree
    tree = Tree.from_newick(newick)
    seqs = ref.random_sequences(rng, n, 130)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float32)
    brl = jnp.asarray(tree.lengths, part.dtype)
    levels, offsets, ri, n_slots = engine.compile_schedule(part, tree)
    l_xla = float(engine.loglikelihood_levels(part, levels, brl, offsets,
                                              ri, n_slots))
    idx8, e1, e2, rif, n_slots_f = pallas_clv.compile_fused(part, tree)
    l_fused = float(pallas_clv.loglikelihood_fused(
        part, idx8, brl, e1, e2, rif, n_slots_f, True))
    assert l_fused == pytest.approx(l_xla, abs=1e-3)


def test_pallas_with_cached_eigen(rng):
    tree = ref.random_binary_tree(rng, 8)
    seqs = ref.random_sequences(rng, 8, 64)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=1.1,
                            dtype=jnp.float32)
    levels, offsets, ri, n_slots = engine.compile_schedule(part, tree)
    brl = jnp.asarray(tree.lengths, part.dtype)
    l_plain = float(pallas_clv.loglikelihood_pallas(
        part, levels, brl, offsets, ri, n_slots, True))
    cached = part.cache_eigen()
    l_cached = float(pallas_clv.loglikelihood_pallas(
        cached, levels, brl, offsets, ri, n_slots, True))
    assert l_cached == pytest.approx(l_plain, abs=1e-4)


def test_cached_eigen_invalidated_on_param_change(rng):
    """with_model_params must clear the cache — a stale eigendecomposition
    would silently corrupt every likelihood after a rate change."""
    tree = ref.random_binary_tree(rng, 6)
    seqs = ref.random_sequences(rng, 6, 50)
    part = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.0,
                            dtype=jnp.float64).cache_eigen()
    assert part.eigen_lam is not None
    new_rates = jnp.asarray(np.random.default_rng(0).uniform(
        0.5, 2, (1, 6)))
    p2 = part.with_model_params(subst_rates=new_rates)
    assert p2.eigen_lam is None
    # and the likelihood reflects the new rates
    from pllmod_tpu.ops.engine import tree_loglikelihood
    l_old = float(tree_loglikelihood(part, tree))
    l_new = float(tree_loglikelihood(p2, tree))
    assert abs(l_old - l_new) > 1e-6


def test_pallas_nondivisible_tile(rng):
    """Padded pattern counts that don't divide the tile cap (e.g. 65*128)
    must still tile exactly (regression: grid previously dropped the
    remainder)."""
    from pllmod_tpu.ops.pallas_clv import _pick_tile
    assert 8320 % _pick_tile(8320) == 0
    assert _pick_tile(16384) == 8192
    assert _pick_tile(128) == 128
    tree = ref.random_binary_tree(rng, 5)
    seqs = ref.random_sequences(rng, 5, 300)
    part = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.0,
                            compress=False, pattern_pad=384,
                            dtype=jnp.float32)
    assert part.n_patterns_padded == 384  # 3*128: not a power of two
    levels, offsets, ri, n_slots = engine.compile_schedule(part, tree)
    brl = jnp.asarray(tree.lengths, part.dtype)
    l_xla = float(engine.loglikelihood_levels(part, levels, brl, offsets,
                                              ri, n_slots))
    l_pl = float(pallas_clv.loglikelihood_pallas(part, levels, brl, offsets,
                                                 ri, n_slots, True))
    assert l_pl == pytest.approx(l_xla, abs=1e-3)
