"""VMEM-resident megakernel (pallas_resident): the TPU production
evaluation path — the whole pruning traversal + root reduction with the
live CLV set held in VMEM under Sethi-Ullman slot recycling.

Reference framing: pll_update_partials + pll_compute_edge_loglikelihood
(SURVEY §3.1) fused into one launch, combined with the memory-saver slot
scheme of pll_tree.c:1509-1573 — here used not to save HBM but to fit
the live set entirely on-chip."""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops import engine as engine_mod
from pllmod_tpu.ops import pallas_resident
from tests import reference_impl as ref


def _case(rng, n, sites, states=4, cache=True, pinv=0.0):
    tree = ref.random_binary_tree(rng, n)
    if states == 20:
        from pllmod_tpu.ops import charmap
        seqs = ref.random_sequences(rng, n, sites,
                                    alphabet=charmap.AA_ORDER,
                                    gap_frac=0.0)
    else:
        seqs = ref.random_sequences(rng, n, sites)
    nr = states * (states - 1) // 2
    part = create_partition(seqs, states=states, n_rate_cats=4, alpha=0.7,
                            subst_rates=rng.uniform(0.5, 2.0, nr),
                            freqs=rng.dirichlet([8] * states),
                            prop_invar=pinv, dtype=jnp.float32)
    return (part.cache_eigen() if cache else part), tree


@pytest.mark.parametrize("n,sites,pinv", [(8, 128, 0.0), (48, 384, 0.15)])
def test_resident_bit_exact_vs_scan(rng, n, sites, pinv):
    """Plain (f32, HIGHEST-dot) resident kernel == serial scan engine
    bit-for-bit (same dot precision, same exact power-of-two rescale)."""
    part, tree = _case(rng, n, sites, pinv=pinv)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    ops, ri = tree.traversal_ops()
    l_ref = float(engine_mod.loglikelihood(
        part, jnp.asarray(ops), brl, tuple(int(x) for x in ri)))
    idx8, e1, e2, ns = pallas_resident.compile_resident(part, tree)
    tip_hi = pallas_resident.expanded_tip_planes(part)
    l_res = float(pallas_resident.loglikelihood_resident(
        part, idx8, brl, (e1, e2), tip_hi, ns, True, False))
    assert l_res == l_ref


@pytest.mark.parametrize("n,sites", [(12, 128), (48, 384)])
def test_resident_split_accuracy(rng, n, sites):
    """Split-storage resident logL within 1e-6 relative of the exact
    path (measured deviation ~1e-7; parity bar 1e-6, BASELINE.md §1)."""
    part, tree = _case(rng, n, sites)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    idx8, e1, e2, ns = pallas_resident.compile_resident(part, tree)
    tip_hi = pallas_resident.expanded_tip_planes(part)
    l_exact = float(pallas_resident.loglikelihood_resident(
        part, idx8, brl, (e1, e2), tip_hi, ns, True, False))
    l_split = float(pallas_resident.loglikelihood_resident(
        part, idx8, brl, (e1, e2), tip_hi, ns, True, True))
    assert abs(l_split - l_exact) / abs(l_exact) < 1e-6


def test_resident_protein(rng):
    """CS=80 (20 states x 4 cats) exercises the wide-CS tiling."""
    part, tree = _case(rng, 10, 256, states=20)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    ops, ri = tree.traversal_ops()
    l_ref = float(engine_mod.loglikelihood(
        part, jnp.asarray(ops), brl, tuple(int(x) for x in ri)))
    idx8, e1, e2, ns = pallas_resident.compile_resident(part, tree)
    tip_hi = pallas_resident.expanded_tip_planes(part)
    l_res = float(pallas_resident.loglikelihood_resident(
        part, idx8, brl, (e1, e2), tip_hi, ns, True, False))
    assert l_res == l_ref


def test_resident_split_read_wide_state(rng):
    """split="read" (wide-state mode) on a 16-state genotype-like shape
    (CS=64 > the resident gate, so force the kernel directly): within
    1e-6 relative of the exact kernel."""
    from pllmod_tpu.ops import charmap
    rngl = np.random.default_rng(7)
    n, sites, states = 10, 128, 16
    tree = ref.random_binary_tree(rngl, n)
    syms = charmap.MULTI_SYMBOLS[:states]
    seqs = ["".join(np.array(list(syms))[rngl.integers(0, states, sites)])
            for _ in range(n)]
    part = create_partition(seqs, states=states, n_rate_cats=4, alpha=0.8,
                            charmap=charmap.multistate(states),
                            subst_rates=rngl.uniform(0.5, 2.0, 120),
                            freqs=rngl.dirichlet([8] * states),
                            dtype=jnp.float32).cache_eigen()
    brl = jnp.asarray(tree.lengths, jnp.float32)
    idx8, e1, e2, ns = pallas_resident.compile_resident(part, tree)
    tip_hi = pallas_resident.expanded_tip_planes(part)

    def run(split, inplace=False):
        return float(pallas_resident.loglikelihood_resident(
            part, idx8, brl, (e1, e2), tip_hi, ns, True, split,
            inplace=inplace))

    l_exact = run(False)
    l_fast = run(True)
    l_read = run("read")
    assert abs(l_read - l_exact) / abs(l_exact) < 1e-6
    assert abs(l_fast - l_exact) / abs(l_exact) < 1e-6


def test_resident_no_eigen_cache(rng):
    """Without a cached eigendecomposition the generic prob_matrices
    path builds P12; result must still match the scan engine."""
    part, tree = _case(rng, 10, 96, cache=False)
    assert part.eigen_lam is None
    brl = jnp.asarray(tree.lengths, jnp.float32)
    ops, ri = tree.traversal_ops()
    l_ref = float(engine_mod.loglikelihood(
        part, jnp.asarray(ops), brl, tuple(int(x) for x in ri)))
    idx8, e1, e2, ns = pallas_resident.compile_resident(part, tree)
    tip_hi = pallas_resident.expanded_tip_planes(part)
    l_res = float(pallas_resident.loglikelihood_resident(
        part, idx8, brl, (e1, e2), tip_hi, ns, True, False))
    assert l_res == l_ref


def test_resident_root_edge_choice(rng):
    """Any virtual-root edge (including a tip edge) gives the same logL
    (pulley principle) — exercises tip children of the root row."""
    part, tree = _case(rng, 9, 64)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    tip_hi = pallas_resident.expanded_tip_planes(part)
    vals = []
    for edge in range(min(6, len(tree.lengths))):
        u, v = tree.edge_nodes[edge]
        if int(u) < 0:
            continue
        idx8, e1, e2, ns = pallas_resident.compile_resident(
            part, tree, root_edge=edge)
        vals.append(float(pallas_resident.loglikelihood_resident(
            part, idx8, brl, (e1, e2), tip_hi, ns, True, False)))
    assert len(vals) >= 3
    assert np.allclose(vals, vals[0], rtol=2e-6)


def test_resident_slot_bound_padding(rng):
    """n_slots_min pads the slot scratch without changing the result —
    the contract that lets one executable serve every topology in
    treeinfo's per-move evaluations."""
    part, tree = _case(rng, 16, 128)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    idx8, e1, e2, ns = pallas_resident.compile_resident(part, tree)
    tip_hi = pallas_resident.expanded_tip_planes(part)
    bound = pallas_resident.resident_slot_bound(part.n_tips)
    idx8b, e1b, e2b, nsb = pallas_resident.compile_resident(
        part, tree, n_slots_min=bound)
    assert nsb >= ns and nsb >= bound
    a = float(pallas_resident.loglikelihood_resident(
        part, idx8, brl, (e1, e2), tip_hi, ns, True, False))
    b = float(pallas_resident.loglikelihood_resident(
        part, idx8b, brl, (e1b, e2b), tip_hi, nsb, True, False))
    assert a == b


def test_engine_resident_schedule(rng):
    """engine.tree_loglikelihood(schedule='resident') matches 'scan'."""
    part, tree = _case(rng, 14, 128)
    prev = engine_mod.FORCE_FAST_KERNEL
    engine_mod.FORCE_FAST_KERNEL = True
    try:
        l_res = float(engine_mod.tree_loglikelihood(
            part, tree, schedule="resident"))
    finally:
        engine_mod.FORCE_FAST_KERNEL = prev
    l_scan = float(engine_mod.tree_loglikelihood(part, tree,
                                                 schedule="scan"))
    # split-storage is off in interpret mode -> bit-exact
    assert l_res == l_scan


def test_resident_protein_split(rng):
    """Protein (CS=80) split mode: the child-major packs' widened main
    dot (K=4CS) must stay inside the 1e-6 parity bar."""
    part, tree = _case(rng, 10, 256, states=20)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    idx8, e1, e2, ns = pallas_resident.compile_resident(part, tree)
    tip_hi = pallas_resident.expanded_tip_planes(part)
    l_exact = float(pallas_resident.loglikelihood_resident(
        part, idx8, brl, (e1, e2), tip_hi, ns, True, False))
    l_split = float(pallas_resident.loglikelihood_resident(
        part, idx8, brl, (e1, e2), tip_hi, ns, True, True))
    assert abs(l_split - l_exact) / abs(l_exact) < 1e-6


def test_resident_inplace_variant(rng):
    """IN-PLACE kernel variant (per-child dots straight from the slot
    scratch, staged tips): bit-exact vs the prefilled-assembly kernel in
    interpret mode, DNA and protein."""
    for states in (4, 20):
        part, tree = _case(rng, 10, 256, states=states)
        part = part.cache_eigen()
        brl = jnp.asarray(tree.lengths, jnp.float32)
        idx8, e1, e2, ns = pallas_resident.compile_resident(part, tree)
        tip_hi = pallas_resident.expanded_tip_planes(part)
        l_asm = float(pallas_resident.loglikelihood_resident(
            part, idx8, brl, (e1, e2), tip_hi, ns, True, True))
        l_ip = float(pallas_resident.loglikelihood_resident(
            part, idx8, brl, (e1, e2), tip_hi, ns, True, True, "", True))
        assert l_ip == l_asm
