"""Split-storage bf16x2 CLVs + fused root pseudo-node (pallas_clv):
the TPU production configuration of the fused megakernel.

Reference framing: same quantities as `pll_update_partials` +
`pll_compute_edge_loglikelihood` (SURVEY §3.1); the split scheme is a
precision/speed point (two single-pass DEFAULT dots ~ HIGH) whose logL
deviation must stay far inside the reference-parity bar (1e-6 relative,
BASELINE.md §1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops import pallas_clv
from pllmod_tpu.ops import engine as engine_mod
from tests import reference_impl as ref


def _case(rng, n, sites, cache=True, pinv=0.0):
    tree = ref.random_binary_tree(rng, n)
    seqs = ref.random_sequences(rng, n, sites)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.7,
                            subst_rates=rng.uniform(0.5, 2.0, 6),
                            freqs=rng.dirichlet([8] * 4),
                            prop_invar=pinv, dtype=jnp.float32)
    return (part.cache_eigen() if cache else part), tree


@pytest.mark.parametrize("n,sites,pinv", [(12, 128, 0.0), (48, 384, 0.15)])
def test_fuse_root_bit_exact(rng, n, sites, pinv):
    """The root pseudo-node path must be BIT-identical to the XLA root
    reduction (same dot precision, exact power-of-two rescale)."""
    part, tree = _case(rng, n, sites, pinv=pinv)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    idx8, e1, e2, ri, ns = pallas_clv.compile_fused(part, tree)
    i2, f1, f2, ri2, ns2 = pallas_clv.compile_fused(part, tree,
                                                    fuse_root=True)
    l_plain = float(pallas_clv.loglikelihood_fused(
        part, idx8, brl, e1, e2, ri, ns, True, False))
    l_fr = float(pallas_clv.loglikelihood_fused(
        part, i2, brl, f1, f2, ri2, ns2, True, False))
    assert l_fr == l_plain


def test_fuse_root_tip_edge(rng):
    part, tree = _case(rng, 9, 64)
    tip_edge = next(e for e, (u, v) in enumerate(tree.edge_nodes)
                    if int(u) >= 0 and (tree.is_tip(int(u))
                                        or tree.is_tip(int(v))))
    brl = jnp.asarray(tree.lengths, jnp.float32)
    idx8, e1, e2, ri, ns = pallas_clv.compile_fused(part, tree, tip_edge)
    i2, f1, f2, ri2, ns2 = pallas_clv.compile_fused(part, tree, tip_edge,
                                                    fuse_root=True)
    l_plain = float(pallas_clv.loglikelihood_fused(
        part, idx8, brl, e1, e2, ri, ns, True, False))
    l_fr = float(pallas_clv.loglikelihood_fused(
        part, i2, brl, f1, f2, ri2, ns2, True, False))
    assert l_fr == l_plain


def test_fuse_root_no_eigen_cache(rng):
    part, tree = _case(rng, 10, 96, cache=False)
    assert part.eigen_lam is None
    brl = jnp.asarray(tree.lengths, jnp.float32)
    idx8, e1, e2, ri, ns = pallas_clv.compile_fused(part, tree)
    i2, f1, f2, ri2, ns2 = pallas_clv.compile_fused(part, tree,
                                                    fuse_root=True)
    l_plain = float(pallas_clv.loglikelihood_fused(
        part, idx8, brl, e1, e2, ri, ns, True, False))
    l_fr = float(pallas_clv.loglikelihood_fused(
        part, i2, brl, f1, f2, ri2, ns2, True, False))
    assert l_fr == l_plain


@pytest.mark.parametrize("n,sites", [(12, 128), (48, 384)])
def test_split_storage_accuracy(rng, n, sites):
    """Split-storage logL within ~1e-6 relative of the exact path (the
    measured deviation is ~1.5e-7; the parity bar is 1e-6)."""
    part, tree = _case(rng, n, sites)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    i2, f1, f2, ri2, ns2 = pallas_clv.compile_fused(part, tree,
                                                    fuse_root=True)
    l_exact = float(pallas_clv.loglikelihood_fused(
        part, i2, brl, f1, f2, ri2, ns2, True, False))
    l_split = float(pallas_clv.loglikelihood_fused(
        part, i2, brl, f1, f2, ri2, ns2, True, True))
    assert l_split == pytest.approx(l_exact, rel=1e-6, abs=5e-3)


def _protein_case(rng, n, sites):
    from pllmod_tpu.ops import charmap
    tree = ref.random_binary_tree(rng, n)
    seqs = ref.random_sequences(rng, n, sites, alphabet=charmap.AA_ORDER,
                                gap_frac=0.0)
    part = create_partition(seqs, states=20, n_rate_cats=4, alpha=0.8,
                            subst_rates=rng.uniform(0.5, 2.0, 190),
                            freqs=rng.dirichlet([8] * 20),
                            dtype=jnp.float32)
    return part.cache_eigen(), tree


def test_split_read_wide_state_accuracy(rng):
    """split="read" (f32 storage, read-time hi/lo casts, 3 DEFAULT
    dots) — the wide-state production mode: within 1e-6 relative of
    the exact kernel on protein (measured on-chip 6.5e-8 vs f64 after
    the pack fix — see _bf16_residual)."""
    part, tree = _protein_case(rng, 10, 96)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    i2, f1, f2, ri2, ns2 = pallas_clv.compile_fused(part, tree,
                                                    fuse_root=True)
    l_exact = float(pallas_clv.loglikelihood_fused(
        part, i2, brl, f1, f2, ri2, ns2, True, False))
    l_fast = float(pallas_clv.loglikelihood_fused(
        part, i2, brl, f1, f2, ri2, ns2, True, True))
    l_read = float(pallas_clv.loglikelihood_fused(
        part, i2, brl, f1, f2, ri2, ns2, True, "read"))
    assert abs(l_read - l_exact) / abs(l_exact) < 1e-6
    assert abs(l_fast - l_exact) / abs(l_exact) < 1e-6


def test_split_read_dna_matches_bar(rng):
    """split="read" on DNA: also inside the bar."""
    part, tree = _case(rng, 12, 128)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    i2, f1, f2, ri2, ns2 = pallas_clv.compile_fused(part, tree,
                                                    fuse_root=True)
    l_exact = float(pallas_clv.loglikelihood_fused(
        part, i2, brl, f1, f2, ri2, ns2, True, False))
    l_read = float(pallas_clv.loglikelihood_fused(
        part, i2, brl, f1, f2, ri2, ns2, True, "read"))
    assert l_read == pytest.approx(l_exact, rel=1e-6, abs=5e-3)


def test_bf16_residual_demotion_safe():
    """pallas_clv._bf16_residual must equal the host ml_dtypes residual
    (the XLA-TPU bf16-propagation pass zeroed the naive formula on-chip
    — round-2 production bug; the bitcast construction is the fix and
    tools/tpu_parity.py re-checks it on real hardware)."""
    import ml_dtypes
    import jax
    rng = np.random.default_rng(0)
    x = (rng.uniform(-1, 1, (64, 64)) * 10.0 ** rng.integers(
        -20, 2, (64, 64))).astype(np.float32)
    got = np.asarray(jax.jit(pallas_clv._bf16_residual)(
        jnp.asarray(x)).astype(jnp.float32), np.float64)
    hi = x.astype(ml_dtypes.bfloat16).astype(np.float64)
    want = (x.astype(np.float64) - hi).astype(
        ml_dtypes.bfloat16).astype(np.float64)
    assert np.array_equal(got, want)


def test_split_flag_auto_off_on_cpu():
    """use_split_clv defaults to the platform (False on CPU) and honors
    the forced override."""
    assert engine_mod.use_split_clv() in (True, False)
    old = engine_mod.SPLIT_CLV
    try:
        engine_mod.SPLIT_CLV = True
        assert engine_mod.use_split_clv() is True
        engine_mod.SPLIT_CLV = False
        assert engine_mod.use_split_clv() is False
    finally:
        engine_mod.SPLIT_CLV = old


def test_engine_fused_schedule_uses_fuse_root(rng):
    """tree_loglikelihood(schedule='fused') goes through the pseudo-node
    path and still matches the scan engine."""
    from pllmod_tpu.ops.engine import tree_loglikelihood
    part, tree = _case(rng, 14, 128)
    l_fused = float(tree_loglikelihood(part, tree, schedule="fused"))
    l_scan = float(tree_loglikelihood(part, tree, schedule="scan"))
    assert l_fused == pytest.approx(l_scan, abs=1e-3)


def test_fuse_root_dyn_path(rng):
    """Dynamic-root fused logL (treeinfo's per-move path) with the
    in-trace pseudo-node row: bit-exact vs the XLA root, and split mode
    within the parity bar."""
    part, tree = _case(rng, 16, 128)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    idx8, e1, e2, rif, ns = pallas_clv.compile_fused(part, tree)
    rr = jnp.asarray(rif, jnp.int32)
    l_dyn = float(pallas_clv.loglikelihood_fused_dyn(
        part, idx8, brl, e1, e2, rr, ns, True, False, False))
    l_fr = float(pallas_clv.loglikelihood_fused_dyn(
        part, idx8, brl, e1, e2, rr, ns, True, False, True))
    l_fr_split = float(pallas_clv.loglikelihood_fused_dyn(
        part, idx8, brl, e1, e2, rr, ns, True, True, True))
    assert l_fr == l_dyn
    assert l_fr_split == pytest.approx(l_dyn, rel=1e-6, abs=5e-3)


def test_fused_std_split_buffers(rng):
    """update_partials_fused_std(split=True): directed-CLV buffers (the
    BLO/SPR input) within 1e-6 relative of the exact f32 path."""
    part, tree = _case(rng, 14, 128)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    P = part.prob_matrices(brl)
    ops, _ri = tree.traversal_ops()
    idx8, e1, e2, ns = pallas_clv.compile_fused_ops(part, np.asarray(ops))
    c0, s0 = pallas_clv.update_partials_fused_std(
        part, P, idx8, e1, e2, ns, True, split=False)
    c1, s1 = pallas_clv.update_partials_fused_std(
        part, P, idx8, e1, e2, ns, True, split=True)
    assert np.array_equal(np.asarray(s0), np.asarray(s1))
    a0, a1 = np.asarray(c0), np.asarray(c1)
    # split error is bounded relative to the per-site rescaled MAX
    # (~2^-17 of it per store), not per entry — tiny entries next to a
    # large one carry the shared-exponent error. Written slots only
    # (the last slot is the never-written scratch).
    site_max = np.maximum(a0.max(axis=(2, 3), keepdims=True), 1e-30)
    rel = np.abs(a1 - a0) / site_max
    # ~2^-15 of the site max after ~log2(n) accumulation levels
    assert float(np.max(rel[:-1])) < 1.5e-4
