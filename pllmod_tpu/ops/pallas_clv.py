"""Fused Pallas CLV kernel: level-batched Felsenstein pruning on TPU.

The hot op of the whole framework (libpll ``pll_update_partials``,
SURVEY §2.9) as a hand-written TPU kernel. Design:

- **CS×P layout** ``[slots, C*S, patterns]``: patterns on the lane axis
  (always a multiple of 128), the merged categories×states axis on
  sublanes (16 for DNA+Γ4 — two perfect (8,128) tiles). The per-category
  S×S transition matrices become one block-diagonal [CS, CS] matrix, so
  the whole pruning op is ONE ``[CS,CS] @ [CS,TILE_P]`` matmul per child.
- **Scalar-prefetch gathers**: each level's child CLVs are gathered by
  BlockSpec ``index_map``s reading a prefetched index array — each grid
  step DMAs exactly the child block it needs straight from HBM. This
  replaces the XLA gather HLO (which runs far below HBM bandwidth) AND
  the serial per-node scan.
- **Fused exact rescaling**: per-site power-of-two renormalization via
  exponent bit manipulation (f32), numerically identical to the engine's
  frexp/ldexp scheme (the scaled CLV is multiplied by an exact power of
  two; exponents accumulate in an int32 scaler plane), so logL matches
  the XLA paths exactly.

Tips are expanded outside the kernel per level (tiny ``code_clv`` lookup
in XLA, pre-tiled over categories) and selected in-kernel by a
prefetched flag.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# TPU matmuls default to bf16 inputs; likelihoods need true f32
_PREC = jax.lax.Precision.HIGHEST

# pattern-tile size for the level kernels (overridable for tuning)
_TILE_OVERRIDE = 8192


def _pick_tile(P: int) -> int:
    """Largest multiple of 128 that divides P and is <= _TILE_OVERRIDE
    (P is always a multiple of 128; the grid must tile P exactly)."""
    cap = min(P, _TILE_OVERRIDE)
    for t in range(cap - cap % 128, 127, -128):
        if P % t == 0:
            return t
    return 128


# ---------------------------------------------------------------------------
# layout converters
# ---------------------------------------------------------------------------
def csp_from_standard(clvs):
    """[slots, P, C, S] -> [slots, C*S, P]."""
    n, P, C, S = clvs.shape
    return jnp.transpose(clvs, (0, 2, 3, 1)).reshape(n, C * S, P)


def csp_to_standard(clvs_csp, C: int, S: int):
    """[slots, C*S, P] -> [slots, P, C, S]."""
    n, CS, P = clvs_csp.shape
    return jnp.transpose(clvs_csp.reshape(n, C, S, P), (0, 3, 1, 2))


def block_diag_pmats(P):
    """[E, C, S, S] -> block-diagonal [E, C*S, C*S]."""
    E, C, S, _ = P.shape
    out = jnp.zeros((E, C * S, C * S), P.dtype)
    for c in range(C):
        out = out.at[:, c * S:(c + 1) * S, c * S:(c + 1) * S].set(P[:, c])
    return out


# ---------------------------------------------------------------------------
# the kernel: one child mat-vec pass
#
# Each level runs TWO pallas calls — one per child. A single call reading
# the CLV buffer twice (two index-mapped views of one array) triggers
# XLA/Mosaic alias analysis that serializes every DMA: measured 10x
# slower at runtime and ~100x slower to compile. With one buffer USE per
# call, Mosaic double-buffers the index-mapped gathers at full speed.
# The cheap elementwise combine (product + exact power-of-two rescale)
# runs in XLA, which fuses it with the level's block updates.
# ---------------------------------------------------------------------------
def _make_child_kernel(n_codes: int):
    """Kernel factory: ``n_codes`` (the REAL, unpadded code count) is
    baked in statically so the tip-expansion loop is short."""

    def _child_kernel(idx_ref,        # prefetch: [W, 3] int32
                      clvs_ref, sc_ref, codes_ref, codetab_ref, Pbd_ref,
                      out_clv_ref, out_sc_ref):
        """One (w, p) grid step: out = P_bd @ child_clv for one child.

        idx columns: 0=slot (clamped), 1=is_tip, 2=tip row (clamped).
        Blocks: clvs [1, CS, T], sc [1, 1, T], codes [1, 1, T] int32,
        codetab [CS, n_codes_pad] f32, Pbd [1, CS, CS],
        out [1, CS, T] / [1, 1, T].

        Tip CLVs are expanded IN-KERNEL from tip-state codes via a
        select-sum over the (small, static) code table — a gather-free
        lookup that avoids materializing [W, CS, P] tip arrays in HBM.
        """
        w = pl.program_id(0)
        CS = clvs_ref.shape[1]
        T = clvs_ref.shape[2]
        is_tip = idx_ref[w, 1] == 1

        codes = codes_ref[0]                                   # [1, T]
        acc = jnp.zeros((CS, T), jnp.float32)
        for k in range(n_codes):
            col = codetab_ref[:, k][:, None]                   # [CS, 1]
            acc = acc + jnp.where(codes == k, col, 0.0)

        c = jnp.where(is_tip, acc, clvs_ref[0])                # [CS, T]
        out_clv_ref[0] = jax.lax.dot_general(
            Pbd_ref[0], c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out_sc_ref[0] = jnp.where(is_tip, jnp.zeros_like(sc_ref[0]),
                                  sc_ref[0])

    return _child_kernel


def _child_pass(clvs_csp, scalers, idx3, tip_codes, codetab, Pbd_lvl,
                n_codes: int, interpret: bool):
    """P_bd @ child for all W rows of one level (one buffer use per call)."""
    n_slots, CS, P = clvs_csp.shape
    W = idx3.shape[0]
    TILE_P = _pick_tile(P)
    nP = P // TILE_P
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(W, nP),
        in_specs=[
            pl.BlockSpec((1, CS, TILE_P),
                         lambda w, p, idx: (idx[w, 0], 0, p)),
            pl.BlockSpec((1, 1, TILE_P),
                         lambda w, p, idx: (idx[w, 0], 0, p)),
            pl.BlockSpec((1, 1, TILE_P),
                         lambda w, p, idx: (idx[w, 2], 0, p)),
            pl.BlockSpec(codetab.shape, lambda w, p, idx: (0, 0)),
            pl.BlockSpec((1, CS, CS), lambda w, p, idx: (w, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, CS, TILE_P), lambda w, p, idx: (w, 0, p)),
            pl.BlockSpec((1, 1, TILE_P), lambda w, p, idx: (w, 0, p)),
        ],
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    fn = pl.pallas_call(
        _make_child_kernel(n_codes),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((W, CS, P), jnp.float32),
            jax.ShapeDtypeStruct((W, 1, P), scalers.dtype),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )
    return fn(idx3, clvs_csp, scalers, tip_codes, codetab, Pbd_lvl)


def _make_child2_kernel(n_codes: int):
    """Second-child pass FUSED with the combine: reads the first pass's
    (left, s1) blocks, computes right = P_bd @ c2 in-register, multiplies,
    rescales and writes the final level block — one fewer full round-trip
    of level data through HBM than kernel+XLA-combine."""

    def _kernel(idx_ref,              # prefetch: [W, 3] int32
                clvs_ref, sc_ref, codes_ref, codetab_ref, Pbd_ref,
                left_ref, s1_ref,
                out_clv_ref, out_sc_ref):
        w = pl.program_id(0)
        CS = clvs_ref.shape[1]
        T = clvs_ref.shape[2]
        is_tip = idx_ref[w, 1] == 1

        codes = codes_ref[0]
        acc = jnp.zeros((CS, T), jnp.float32)
        for k in range(n_codes):
            col = codetab_ref[:, k][:, None]
            acc = acc + jnp.where(codes == k, col, 0.0)

        c2 = jnp.where(is_tip, acc, clvs_ref[0])
        s2 = jnp.where(is_tip, jnp.zeros_like(sc_ref[0]), sc_ref[0])
        right = jax.lax.dot_general(
            Pbd_ref[0], c2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        prod = left_ref[0] * right

        m = jnp.max(prod, axis=0, keepdims=True)               # [1, T]
        mi = jax.lax.bitcast_convert_type(m, jnp.int32)
        e = ((mi >> 23) & 0xFF) - 126
        e = jnp.where(m > 0, e, 0)
        e = jnp.clip(e, -125, 127)
        scale = jax.lax.bitcast_convert_type(
            ((127 - e) << 23).astype(jnp.int32), jnp.float32)
        out_clv_ref[0] = prod * scale
        out_sc_ref[0] = s1_ref[0] + s2 + e

    return _kernel


def _child2_pass(clvs_csp, scalers, idx3, tip_codes, codetab, Pbd_lvl,
                 left, s1, n_codes: int, interpret: bool):
    """Fused second-child pass for one level."""
    n_slots, CS, P = clvs_csp.shape
    W = idx3.shape[0]
    TILE_P = _pick_tile(P)
    nP = P // TILE_P
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(W, nP),
        in_specs=[
            pl.BlockSpec((1, CS, TILE_P),
                         lambda w, p, idx: (idx[w, 0], 0, p)),
            pl.BlockSpec((1, 1, TILE_P),
                         lambda w, p, idx: (idx[w, 0], 0, p)),
            pl.BlockSpec((1, 1, TILE_P),
                         lambda w, p, idx: (idx[w, 2], 0, p)),
            pl.BlockSpec(codetab.shape, lambda w, p, idx: (0, 0)),
            pl.BlockSpec((1, CS, CS), lambda w, p, idx: (w, 0, 0)),
            pl.BlockSpec((1, CS, TILE_P), lambda w, p, idx: (w, 0, p)),
            pl.BlockSpec((1, 1, TILE_P), lambda w, p, idx: (w, 0, p)),
        ],
        out_specs=[
            pl.BlockSpec((1, CS, TILE_P), lambda w, p, idx: (w, 0, p)),
            pl.BlockSpec((1, 1, TILE_P), lambda w, p, idx: (w, 0, p)),
        ],
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    fn = pl.pallas_call(
        _make_child2_kernel(n_codes),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((W, CS, P), jnp.float32),
            jax.ShapeDtypeStruct((W, 1, P), scalers.dtype),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )
    return fn(idx3, clvs_csp, scalers, tip_codes, codetab, Pbd_lvl,
              left, s1)


def _make_combined_kernel(n_codes: int):
    """Combined two-child kernel (one call per level). The second CLV
    input must be a COPY of the buffer (two index-mapped views of one
    array serialize all DMAs — see module docstring)."""
    def _kernel(idx_ref,              # prefetch: [W, 6] int32
                clv1_ref, clv2_ref, sc1_ref, sc2_ref,
                codes1_ref, codes2_ref, codetab_ref, P1_ref, P2_ref,
                out_clv_ref, out_sc_ref):
        w = pl.program_id(0)
        CS = clv1_ref.shape[1]
        T = clv1_ref.shape[2]

        def expand_tip(codes):
            acc = jnp.zeros((CS, T), jnp.float32)
            for k in range(n_codes):
                col = codetab_ref[:, k][:, None]
                acc = acc + jnp.where(codes == k, col, 0.0)
            return acc

        def child(clv_ref, codes_ref, sc_ref, is_tip, P_ref):
            c = jnp.where(is_tip, expand_tip(codes_ref[0]), clv_ref[0])
            s = jnp.where(is_tip, jnp.zeros_like(sc_ref[0]), sc_ref[0])
            y = jax.lax.dot_general(P_ref[0], c, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            return y, s

        left, s1 = child(clv1_ref, codes1_ref, sc1_ref,
                         idx_ref[w, 2] == 1, P1_ref)
        right, s2 = child(clv2_ref, codes2_ref, sc2_ref,
                          idx_ref[w, 3] == 1, P2_ref)
        prod = left * right
        m = jnp.max(prod, axis=0, keepdims=True)               # [1, T]
        mi = jax.lax.bitcast_convert_type(m, jnp.int32)
        e = ((mi >> 23) & 0xFF) - 126
        e = jnp.where(m > 0, e, 0)
        e = jnp.clip(e, -125, 127)
        scale = jax.lax.bitcast_convert_type(
            ((127 - e) << 23).astype(jnp.int32), jnp.float32)
        out_clv_ref[0] = prod * scale
        out_sc_ref[0] = s1 + s2 + e

    return _kernel


def level_update_combined(clvs_csp, scalers, idx, tip_codes, codetab,
                          P1bd, P2bd, offset: int, n_codes: int,
                          interpret: bool = False):
    """One pallas call per level. Child 2 reads a PREFIX COPY of the CLV
    buffer (slots [0, offset) — all possible children) so the two gathers
    touch distinct buffers; measured ~10x faster than sharing the buffer
    and ~4x faster than two single-child calls."""
    n_slots, CS, P = clvs_csp.shape
    W = idx.shape[0]
    TILE_P = _pick_tile(P)
    nP = P // TILE_P
    # full-buffer copy for child-2 gathers: empirically the ONLY variant
    # XLA schedules at full DMA speed (prefix slices and mirror buffers
    # re-trigger the serialization pathology)
    clvs_b = clvs_csp + 0.0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(W, nP),
        in_specs=[
            pl.BlockSpec((1, CS, TILE_P),
                         lambda w, p, idx: (idx[w, 0], 0, p)),
            pl.BlockSpec((1, CS, TILE_P),
                         lambda w, p, idx: (idx[w, 1], 0, p)),
            pl.BlockSpec((1, 1, TILE_P),
                         lambda w, p, idx: (idx[w, 0], 0, p)),
            pl.BlockSpec((1, 1, TILE_P),
                         lambda w, p, idx: (idx[w, 1], 0, p)),
            pl.BlockSpec((1, 1, TILE_P),
                         lambda w, p, idx: (idx[w, 4], 0, p)),
            pl.BlockSpec((1, 1, TILE_P),
                         lambda w, p, idx: (idx[w, 5], 0, p)),
            pl.BlockSpec(codetab.shape, lambda w, p, idx: (0, 0)),
            pl.BlockSpec((1, CS, CS), lambda w, p, idx: (w, 0, 0)),
            pl.BlockSpec((1, CS, CS), lambda w, p, idx: (w, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, CS, TILE_P), lambda w, p, idx: (w, 0, p)),
            pl.BlockSpec((1, 1, TILE_P), lambda w, p, idx: (w, 0, p)),
        ],
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    fn = pl.pallas_call(
        _make_combined_kernel(n_codes),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((W, CS, P), jnp.float32),
            jax.ShapeDtypeStruct((W, 1, P), scalers.dtype),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )
    lvl_clv, lvl_sc = fn(idx, clvs_csp, clvs_b, scalers, scalers,
                         tip_codes, tip_codes, codetab, P1bd, P2bd)
    clvs_csp = lax.dynamic_update_slice(clvs_csp, lvl_clv, (offset, 0, 0))
    scalers = lax.dynamic_update_slice(scalers, lvl_sc, (offset, 0, 0))
    return clvs_csp, scalers


def level_update(clvs_csp, scalers, idx, tip_codes, codetab, P1bd, P2bd,
                 offset: int, n_codes: int, interpret: bool = False):
    """Run one level: compute W new CLVs, write slots [offset, offset+W).

    Args:
      clvs_csp: [n_slots, CS, P] f32
      scalers: [n_slots, 1, P] int32
      idx: int32 [W, 6] (slot1, slot2, is_tip1, is_tip2, tip1, tip2) —
        slot/tip columns clamped to valid ranges
      tip_codes: [n_tips, 1, P] int32 tip-state codes
      codetab: [CS, n_codes_pad] f32 code -> CLV column table
      P1bd/P2bd: [W, CS, CS] block-diagonal transition matrices
      offset: static slot offset of this level
    Returns updated (clvs_csp, scalers).
    """
    left, s1 = _child_pass(clvs_csp, scalers, idx[:, (0, 2, 4)], tip_codes,
                           codetab, P1bd, n_codes, interpret)
    right, s2 = _child_pass(clvs_csp, scalers, idx[:, (1, 3, 5)], tip_codes,
                            codetab, P2bd, n_codes, interpret)
    prod = left * right                                        # [W, CS, P]
    # exact power-of-two rescale (same frexp/ldexp semantics as the XLA
    # engine); fused by XLA with the block updates below
    m = jnp.max(prod, axis=1, keepdims=True)                   # [W, 1, P]
    _, e = jnp.frexp(m)
    e = jnp.where(m > 0, e, 0).astype(jnp.int32)
    clv = jnp.ldexp(prod, -e).astype(jnp.float32)
    sc = s1 + s2 + e[:, 0, :][:, None, :]
    clvs_csp = lax.dynamic_update_slice(clvs_csp, clv, (offset, 0, 0))
    scalers = lax.dynamic_update_slice(scalers, sc, (offset, 0, 0))
    return clvs_csp, scalers


# ---------------------------------------------------------------------------
# driver: full pruning pass over a LevelSchedule
# ---------------------------------------------------------------------------
def _level_idx(partition, ops_lvl):
    """XLA-side per-level index prep (host-cheap): clamped slot/tip ids."""
    n_tips = partition.n_tips
    c1 = ops_lvl[:, 1]
    c2 = ops_lvl[:, 3]
    is_tip1 = (c1 < n_tips).astype(jnp.int32)
    is_tip2 = (c2 < n_tips).astype(jnp.int32)
    slot1 = jnp.where(c1 < n_tips, 0, c1 - n_tips).astype(jnp.int32)
    slot2 = jnp.where(c2 < n_tips, 0, c2 - n_tips).astype(jnp.int32)
    tip1 = jnp.where(c1 < n_tips, c1, 0).astype(jnp.int32)
    tip2 = jnp.where(c2 < n_tips, c2, 0).astype(jnp.int32)
    return jnp.stack([slot1, slot2, is_tip1, is_tip2, tip1, tip2], axis=1)


def _code_table(partition):
    """[CS, n_codes_pad] f32 code->CLV column table (lane-padded)."""
    C = partition.n_cats
    code_clv = partition.code_clv                      # [n_codes, S]
    tab = jnp.tile(code_clv.T, (C, 1)).astype(jnp.float32)  # [CS, n_codes]
    n_codes = tab.shape[1]
    pad = (-n_codes) % 128
    if pad:
        tab = jnp.pad(tab, ((0, 0), (0, pad)))
    return tab, n_codes


def update_partials_pallas(partition, P, levels, offsets, n_slots: int,
                           interpret: bool = False):
    """Full level-scheduled pruning with the fused Pallas kernel.

    Returns (clvs_csp [n_slots, C*S, Ppad] f32,
             scalers [n_slots, 1, Ppad] int32).
    """
    Ppad = partition.n_patterns_padded
    CS = partition.n_cats * partition.states
    Pbd = block_diag_pmats(P.astype(jnp.float32))
    codetab, n_codes = _code_table(partition)
    tip_codes = partition.tip_states[:, None, :].astype(jnp.int32)
    clvs = jnp.zeros((n_slots, CS, Ppad), jnp.float32)
    scalers = jnp.zeros((n_slots, 1, Ppad), jnp.int32)
    for ops_lvl, off in zip(levels, offsets):
        idx = _level_idx(partition, ops_lvl)
        P1 = Pbd[ops_lvl[:, 2]]
        P2 = Pbd[ops_lvl[:, 4]]
        left, s1 = _child_pass(clvs, scalers, idx[:, (0, 2, 4)],
                               tip_codes, codetab, P1, n_codes, interpret)
        lvl_clv, lvl_sc = _child2_pass(clvs, scalers, idx[:, (1, 3, 5)],
                                       tip_codes, codetab, P2, left, s1,
                                       n_codes, interpret)
        clvs = lax.dynamic_update_slice(clvs, lvl_clv, (off, 0, 0))
        scalers = lax.dynamic_update_slice(scalers, lvl_sc, (off, 0, 0))
    return clvs, scalers


def root_loglikelihood_csp(partition, clvs_csp, scalers, ref_p, ref_c,
                           P_edge):
    """Edge logL from CS×P CLVs. ref encoding as usual: < n_tips tip id,
    else n_tips + slot (schedule-remapped)."""
    from pllmod_tpu.ops import likelihood as lk_mod
    n_tips = partition.n_tips
    C = partition.n_cats
    S = partition.states
    dtype = partition.dtype

    def fetch(ref):
        if ref < n_tips:
            codes = partition.tip_states[ref]
            t = partition.code_clv[codes].T                     # [S, P]
            clv = jnp.broadcast_to(t[None], (C, S, t.shape[1]))
            return clv.astype(dtype), jnp.zeros(t.shape[1], jnp.int32)
        slot = ref - n_tips
        clv = clvs_csp[slot].reshape(C, S, -1).astype(dtype)
        return clv, scalers[slot, 0]

    clv_p, s_p = fetch(ref_p)
    clv_c, s_c = fetch(ref_c)
    fc = partition.freqs_per_cat()
    right = jnp.einsum("cjp,cij->cip", clv_c, P_edge.astype(dtype),
                       preferred_element_type=dtype,
                      precision=_PREC)
    per_cat = jnp.einsum("cip,ci,cip->cp", clv_p, fc, right,
                         preferred_element_type=dtype,
                      precision=_PREC)
    lnl = lk_mod._site_lnl(partition, per_cat.T, s_p + s_c)
    return jnp.sum(lnl * partition.pattern_weights)


# ---------------------------------------------------------------------------
# Fused whole-traversal kernel ("megakernel"): the ENTIRE pruning pass in
# ONE pallas call.
#
# Design (vs the per-level kernels above):
# - grid = (n_inner, n_pattern_tiles), both dimensions "arbitrary"
#   (sequential), nodes ordered level-by-level.
# - The CLV slot buffer is a pallas OUTPUT in ANY memory space: the kernel
#   manually DMAs child blocks out of it and result blocks into it. Manual
#   copies sidestep the two-index-mapped-views alias pathology entirely —
#   no full-buffer copy per level, no left/s1 HBM round trip, no
#   dynamic_update_slice pass, and one kernel launch instead of 2/level.
# - Tip children are DMA'd as int32 code rows (16-80x less traffic than
#   expanded CLVs) and expanded in-VMEM via a one-hot MXU matmul.
# - RAW hazard between levels: each step's result is written with one of
#   two rotating write semaphores and o_scr buffers; before a buffer is
#   reused its previous write is awaited, so AT MOST TWO writes are ever
#   outstanding. The first step of each level ("fence") drains both — all
#   earlier levels' writes are then complete before any read of them.
#
# Traffic per evaluation ~= one read of every inner CLV + tip codes + one
# write of every inner CLV — within 2x of the HBM roofline for the whole
# likelihood (reference hot loop: pll_update_partials, SURVEY §3.1).
# ---------------------------------------------------------------------------
def _pick_tile_fused(P: int, CS: int) -> int:
    """Largest 128-multiple tile dividing P with ~6 [CS,T] f32 scratch
    buffers under a ~6 MB VMEM budget."""
    budget = 6 * 1024 * 1024
    cap = max(128, min(P, budget // (6 * CS * 4)))
    for t in range(cap - cap % 128, 127, -128):
        if P % t == 0:
            return t
    return 128


def _make_fused_kernel(n_codes: int, nW: int, nP: int):
    def _kernel(idx_ref,               # prefetch [nW, 8] int32
                tip_codes_ref,         # ANY [n_tips, 1, P] int32
                codetab_ref,           # VMEM [CS, n_codes_pad] f32
                P1_ref, P2_ref,        # VMEM blocks [1, CS, CS]
                clvs_ref, sc_ref,      # ANY outputs (read+written manually)
                c_scr, codes_scr, s_scr, o_scr, os_scr,
                rsem, wsem, wssem, cnt):
        w = pl.program_id(0)
        p = pl.program_id(1)
        CS = o_scr.shape[1]
        T = o_scr.shape[2]
        step = w * nP + p
        par = jax.lax.rem(step, jnp.asarray(2, step.dtype))
        oth = 1 - par

        @pl.when(step == 0)
        def _():
            cnt[0] = 0
            cnt[1] = 0

        slot1 = idx_ref[w, 0]
        slot2 = idx_ref[w, 1]
        is_tip1 = idx_ref[w, 2] == 1
        is_tip2 = idx_ref[w, 3] == 1
        tip1 = idx_ref[w, 4]
        tip2 = idx_ref[w, 5]
        out_slot = idx_ref[w, 6]
        fence = idx_ref[w, 7] == 1

        def drain(q):
            @pl.when(cnt[q] == 1)
            def _():
                pltpu.make_async_copy(
                    o_scr.at[q], clvs_ref.at[0, :, pl.ds(0, T)],
                    wsem.at[q]).wait()
                pltpu.make_async_copy(
                    os_scr.at[q], sc_ref.at[0, :, pl.ds(0, T)],
                    wssem.at[q]).wait()
                cnt[q] = 0

        # free this step's write buffers; at a level boundary also drain
        # the other slot so ALL previous-level writes land before reads
        drain(par)

        @pl.when(fence & (p == 0))
        def _():
            drain(oth)

        def start_read(k, sem, slot, is_tip, tip):
            @pl.when(is_tip)
            def _():
                pltpu.make_async_copy(
                    tip_codes_ref.at[tip, :, pl.ds(p * T, T)],
                    codes_scr.at[k], rsem.at[sem]).start()

            @pl.when(jnp.logical_not(is_tip))
            def _():
                pltpu.make_async_copy(
                    clvs_ref.at[slot, :, pl.ds(p * T, T)],
                    c_scr.at[k], rsem.at[sem]).start()
                pltpu.make_async_copy(
                    sc_ref.at[slot, :, pl.ds(p * T, T)],
                    s_scr.at[k], rsem.at[sem + 1]).start()

        def wait_read(k, sem, slot, is_tip, tip):
            @pl.when(is_tip)
            def _():
                pltpu.make_async_copy(
                    tip_codes_ref.at[tip, :, pl.ds(p * T, T)],
                    codes_scr.at[k], rsem.at[sem]).wait()

            @pl.when(jnp.logical_not(is_tip))
            def _():
                pltpu.make_async_copy(
                    clvs_ref.at[slot, :, pl.ds(p * T, T)],
                    c_scr.at[k], rsem.at[sem]).wait()
                pltpu.make_async_copy(
                    sc_ref.at[slot, :, pl.ds(p * T, T)],
                    s_scr.at[k], rsem.at[sem + 1]).wait()

        start_read(0, 0, slot1, is_tip1, tip1)
        start_read(1, 2, slot2, is_tip2, tip2)
        wait_read(0, 0, slot1, is_tip1, tip1)
        wait_read(1, 2, slot2, is_tip2, tip2)

        def expand(k, is_tip):
            # one-hot MXU expansion: codetab [CS, n_codes] @ onehot
            # [n_codes, T]; runs only on tip steps (pl.when), overwriting
            # the (unused) clv scratch slot
            @pl.when(is_tip)
            def _():
                codes = codes_scr[k]                        # [1, T] int32
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (n_codes, T), 0)
                onehot = (iota == codes).astype(jnp.float32)
                c_scr[k] = jax.lax.dot_general(
                    codetab_ref[:, :n_codes], onehot,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

        expand(0, is_tip1)
        expand(1, is_tip2)

        zero_s = jnp.zeros((1, T), jnp.int32)
        s1 = jnp.where(is_tip1, zero_s, s_scr[0])
        s2 = jnp.where(is_tip2, zero_s, s_scr[1])
        left = jax.lax.dot_general(
            P1_ref[0], c_scr[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        right = jax.lax.dot_general(
            P2_ref[0], c_scr[1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        prod = left * right

        # exact power-of-two rescale (identical to the XLA engines)
        m = jnp.max(prod, axis=0, keepdims=True)            # [1, T]
        mi = jax.lax.bitcast_convert_type(m, jnp.int32)
        e = ((mi >> 23) & 0xFF) - 126
        e = jnp.where(m > 0, e, 0)
        e = jnp.clip(e, -125, 127)
        scale = jax.lax.bitcast_convert_type(
            ((127 - e) << 23).astype(jnp.int32), jnp.float32)
        o_scr[par] = prod * scale
        os_scr[par] = s1 + s2 + e

        pltpu.make_async_copy(
            o_scr.at[par], clvs_ref.at[out_slot, :, pl.ds(p * T, T)],
            wsem.at[par]).start()
        pltpu.make_async_copy(
            os_scr.at[par], sc_ref.at[out_slot, :, pl.ds(p * T, T)],
            wssem.at[par]).start()
        cnt[par] = 1

        @pl.when(step == nW * nP - 1)
        def _():
            drain(par)
            drain(oth)

    return _kernel


def update_partials_fused(partition, P, idx8, e1, e2, n_slots: int,
                          interpret: bool = False):
    """Whole-traversal pruning in one pallas call.

    Args:
      idx8: int32 [n_inner, 8] from :func:`compile_fused`
        (slot1, slot2, is_tip1, is_tip2, tip1, tip2, out_slot, fence)
      e1/e2: int32 [n_inner] child edge ids (index P)
    Returns (clvs_csp [n_slots, CS, Ppad] f32,
             scalers [n_slots, 1, Ppad] int32).
    """
    Ppad = partition.n_patterns_padded
    CS = partition.n_cats * partition.states
    Pbd = block_diag_pmats(P.astype(jnp.float32))
    codetab, n_codes = _code_table(partition)
    tip_codes = partition.tip_states[:, None, :].astype(jnp.int32)
    nW = idx8.shape[0]
    TILE_P = _pick_tile_fused(Ppad, CS)
    nP = Ppad // TILE_P
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nW, nP),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # tip_codes
            pl.BlockSpec(memory_space=pltpu.VMEM),         # codetab
            pl.BlockSpec((1, CS, CS), lambda w, p, idx: (w, 0, 0)),
            pl.BlockSpec((1, CS, CS), lambda w, p, idx: (w, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CS, TILE_P), jnp.float32),      # c_scr
            pltpu.VMEM((2, 1, TILE_P), jnp.int32),         # codes_scr
            pltpu.VMEM((2, 1, TILE_P), jnp.int32),         # s_scr
            pltpu.VMEM((2, CS, TILE_P), jnp.float32),      # o_scr
            pltpu.VMEM((2, 1, TILE_P), jnp.int32),         # os_scr
            pltpu.SemaphoreType.DMA((4,)),                 # rsem
            pltpu.SemaphoreType.DMA((2,)),                 # wsem
            pltpu.SemaphoreType.DMA((2,)),                 # wssem
            pltpu.SMEM((2,), jnp.int32),                   # cnt
        ],
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    fn = pl.pallas_call(
        _make_fused_kernel(n_codes, nW, nP),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_slots, CS, Ppad), jnp.float32),
            jax.ShapeDtypeStruct((n_slots, 1, Ppad), jnp.int32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )
    return fn(idx8, tip_codes, codetab, Pbd[e1], Pbd[e2])


def compile_fused(partition, tree, root_edge=None):
    """Host-side: compile a tree into the fused-kernel index arrays.

    Returns (idx8 [n_inner, 8], e1, e2, root_info, n_slots); root refs
    remapped via the LevelSchedule as in engine.compile_schedule."""
    from pllmod_tpu.ops import clv as clv_mod
    ops, root_info = tree.traversal_ops(root_edge)
    sched = clv_mod.LevelSchedule(ops, partition.n_tips)
    n_tips = partition.n_tips
    rows, e1s, e2s = [], [], []
    for li, (arr, off) in enumerate(zip(sched.levels, sched.offsets)):
        W = arr.shape[0]
        c1, c2 = arr[:, 1], arr[:, 3]
        it1 = (c1 < n_tips).astype(np.int32)
        it2 = (c2 < n_tips).astype(np.int32)
        row = np.stack([
            np.where(it1 == 1, 0, c1 - n_tips),
            np.where(it2 == 1, 0, c2 - n_tips),
            it1, it2,
            np.where(it1 == 1, c1, 0),
            np.where(it2 == 1, c2, 0),
            off + np.arange(W),
            np.concatenate([[1 if li > 0 else 0], np.zeros(W - 1, int)]),
        ], axis=1)
        rows.append(row)
        e1s.append(arr[:, 2])
        e2s.append(arr[:, 4])
    idx8 = jnp.asarray(np.concatenate(rows).astype(np.int32))
    e1 = jnp.asarray(np.concatenate(e1s).astype(np.int32))
    e2 = jnp.asarray(np.concatenate(e2s).astype(np.int32))
    u, v, e = (int(x) for x in root_info)
    ri = (sched.remap_node(u), sched.remap_node(v), e)
    return idx8, e1, e2, ri, sched.n_slots


@partial(jax.jit, static_argnums=(5, 6, 7))
def loglikelihood_fused(partition, idx8, brlens, e1, e2, root_info,
                        n_slots: int, interpret: bool = False):
    """Full-tree logL through the fused whole-traversal kernel."""
    P = partition.prob_matrices(brlens)
    clvs, scalers = update_partials_fused(partition, P, idx8, e1, e2,
                                          n_slots, interpret=interpret)
    u, v, e = root_info
    return root_loglikelihood_csp(partition, clvs, scalers, u, v, P[e])


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def loglikelihood_pallas(partition, levels, brlens, offsets, root_info,
                         n_slots: int, interpret: bool = False):
    """Full-tree logL through the Pallas kernel path (f32 CLVs).

    root_info: (ref_p, ref_c, root_edge) with refs REMAPPED via the
    LevelSchedule (same convention as engine.loglikelihood_levels).
    """
    P = partition.prob_matrices(brlens)
    clvs, scalers = update_partials_pallas(partition, P, levels, offsets,
                                           n_slots, interpret=interpret)
    u, v, e = root_info
    return root_loglikelihood_csp(partition, clvs, scalers, u, v, P[e])