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

# MXU precision for the kernels' child dots. HIGHEST = exact f32 (6
# bf16 passes); HIGH = 3 passes (~16-bit operands, ~1e-5 relative CLV
# error — measured logL deviation on the flagship config is documented in
# PERF_NOTES.md). The one-hot tip-expansion dots always run 1-pass
# (operands are exactly 0/1 in bf16, and the MXU accumulates in f32).
_DOT_PREC = jax.lax.Precision.HIGHEST
_EXPAND_PREC = jax.lax.Precision.DEFAULT

# perf-probe knob (env, read at import): 1 = skip the per-node rescale
# chain entirely (WRONG results — underflows; only for measuring the
# rescale's share of the per-step vector chain)
import os as _os
_NO_RESCALE_PROBE = _os.environ.get("PLLMOD_FUSED_NO_RESCALE") == "1"
# dot-cost probe: "default1" / "default3" replace the merged HIGHEST dot
# with 1 / 3 DEFAULT (single-bf16-pass) dots — wrong results, timing only
_DOT_PROBE = _os.environ.get("PLLMOD_FUSED_DOT_PROBE", "")


def set_dot_precision(prec):
    """Set the kernel matmul precision (jax.lax.Precision or string)."""
    global _DOT_PREC
    _DOT_PREC = jax.lax.Precision(prec) if isinstance(prec, str) else prec


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


def _block_diag_single(P_edge, dtype):
    """[C, S, S] -> block-diagonal [C*S, C*S] (one edge; tiny)."""
    C, S, _ = P_edge.shape
    out = jnp.zeros((C * S, C * S), dtype)
    for c in range(C):
        out = out.at[c * S:(c + 1) * S, c * S:(c + 1) * S].set(
            P_edge[c].astype(dtype))
    return out


def root_loglikelihood_csp(partition, clvs_csp, scalers, ref_p, ref_c,
                           P_edge, scaler_total=None):
    """Edge logL from CS×P CLVs. ref encoding as usual: < n_tips tip id,
    else n_tips + slot (schedule-remapped).

    The per-category transition application runs as ONE block-diagonal
    [CS,CS] @ [CS,P] matmul: the batched per-category einsum lowers on
    TPU to C separate padded tiny matmuls (~0.17 ms/eval measured —
    comparable to several pruning steps), the block-diagonal form is a
    single MXU dot + fused elementwise reduce.

    ``scaler_total``: optional [P] int32 TOTAL rescale exponent for the
    whole tree (s_p + s_c). Required when the kernel ran with
    ``thread_scalers=False`` (the scaler plane then holds per-node
    exponents and per-slot cumulative values do not exist)."""
    from pllmod_tpu.ops import likelihood as lk_mod
    n_tips = partition.n_tips
    C = partition.n_cats
    S = partition.states
    CS = C * S
    dtype = partition.dtype

    def fetch(ref):
        if ref < n_tips:
            codes = partition.tip_states[ref]                   # [P]
            n_codes = partition.code_clv.shape[0]
            # one-hot matmul, not a gather (gather HLO is slow on TPU)
            onehot = (codes[None, :] ==
                      jnp.arange(n_codes)[:, None]).astype(dtype)
            t = jnp.einsum("ks,kp->sp", partition.code_clv.astype(dtype),
                           onehot, precision=_PREC)             # [S, P]
            return jnp.tile(t, (C, 1)), jnp.zeros(t.shape[1], jnp.int32)
        slot = ref - n_tips
        if clvs_csp.ndim == 4:      # split storage: lo + hi bf16 planes
            clv = (clvs_csp[slot, 0].astype(dtype) +
                   clvs_csp[slot, 1].astype(dtype))
        else:
            clv = clvs_csp[slot].astype(dtype)
        return clv, scalers[slot, 0]

    clv_p, s_p = fetch(ref_p)                                   # [CS, P]
    clv_c, s_c = fetch(ref_c)
    Pbd = _block_diag_single(P_edge, dtype)                     # [CS, CS]
    right = jax.lax.dot_general(Pbd, clv_c, (((1,), (0,)), ((), ())),
                                preferred_element_type=dtype,
                                precision=_PREC)                # [CS, P]
    fcflat = partition.freqs_per_cat().reshape(CS).astype(dtype)
    prod = clv_p * right * fcflat[:, None]
    per_cat = prod.reshape(C, S, -1).sum(axis=1)                # [C, P]
    s_tot = (s_p + s_c) if scaler_total is None else scaler_total
    lnl = lk_mod._site_lnl(partition, per_cat.T, s_tot)
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
    """Largest 128-multiple tile dividing P with ~8 [CS,T] f32 scratch
    buffers (double-buffered reads + rotating writes + expansion temps)
    under an ~8 MB VMEM budget. ``PLLMOD_FUSED_TILE`` (env) caps the
    tile for perf probing (per-step fixed-cost share measurements)."""
    budget = 8 * 1024 * 1024
    cap = max(128, min(P, budget // (8 * CS * 4)))
    tile_env = _os.environ.get("PLLMOD_FUSED_TILE")
    if tile_env:
        cap = max(128, min(cap, int(tile_env)))
    for t in range(cap - cap % 128, 127, -128):
        if P % t == 0:
            return t
    return 128


def _make_fused_kernel(n_codes: int, nW: int, nP: int,
                       thread_scalers: bool = True,
                       split: bool = False):
    """``thread_scalers=True``: the scaler plane is CUMULATIVE (each node
    reads its children's scaler rows and writes s1+s2+e) — the historic
    contract, needed by consumers that index per-slot scalers
    (update_partials_fused_std for BLO/SPR).

    ``thread_scalers=False``: the scaler plane holds each node's OWN
    rescale exponent ``e`` only; the two child-scaler DMAs + waits per
    step disappear (the kernel is partly bound by DMA issue/fence scalar
    work — PERF_NOTES). Cumulative values are reconstructed outside when
    needed; the root reduction needs just Σ_live e (one masked reduce).

    ``split=True``: SPLIT-STORAGE bf16x2 CLVs. Each CLV is stored as two
    bf16 planes (lo, hi) with hi+lo ~ the f32 value to ~2^-17 relative
    (same bytes as f32). The per-node child application then runs as TWO
    single-pass DEFAULT dots instead of one 6-pass HIGHEST dot:
        main = Ph @ hi12            (K = 2CS)
        corr = [Ph | Pl] @ [lo12; hi12]   (K = 4CS, one dot: Ph@lo + Pl@hi)
    where P12 = Ph + Pl is the host-side bf16 split of the paired
    block-diagonal transition matrix. Dropped term Pl@lo ~ 2^-18.
    Measured on the flagship: HIGHEST 1.08 ms/eval, this scheme ~0.85 —
    the earlier in-kernel 3-dot split was a dead end because it paid
    per-child VPU split-casts every step; split STORAGE pays one split
    per node at write time and reads come pre-split. logL deviation vs
    HIGHEST is ~1e-8 relative (PERF_NOTES), far inside the 1e-6 parity
    bar; the rescale stays an exact power of two.

    ``split="read"``: READ-TIME split — storage stays exact f32 (plain
    layout), and the dot section casts the child operand to (hi, lo)
    bf16 planes per step, then runs THREE single-pass DEFAULT dots
    (Ph@hi + Ph@lo + Pl@hi; only Pl@lo ~2^-18 dropped). The wide-state
    production mode (states > 8): measured on-chip, bf16x2 STORAGE
    error is representation-dominated (~1e-5 relative logL at 20
    states, and restoring the Pl@lo cross term changes nothing), so
    wide states must keep f32 CLVs; the read-time split still removes
    the 6-pass HIGHEST dot, which dominates the per-step chain at
    large CS. Accuracy = dropped-Pl@lo only (~1e-8 relative logL)."""
    store = split is True                  # bf16x2 split STORAGE
    def _kernel(idx_ref,               # prefetch [8, nW] int32 (COLUMN-
                                       # major: Mosaic pads SMEM rows to
                                       # 128 lanes, so [nW, 8] would cost
                                       # 512 B/row — 16x the bytes — and
                                       # cap tables at ~2k rows; see
                                       # update_partials_fused)
                tip_codes_ref,         # ANY [n_tips, 1, P] int32
                codetab_ref,           # VMEM [CS, n_codes_pad] f32
                P12_ref,               # VMEM block [1, 2*CS, 2*CS]
                clvs_ref, sc_ref,      # ANY outputs (read+written manually)
                c_scr, codes_scr, s_scr, o_scr, os_scr,
                rsem, wsem, wssem, cnt):
        w = pl.program_id(0)
        p = pl.program_id(1)
        CS = o_scr.shape[-2]
        T = o_scr.shape[-1]
        two = jnp.asarray(2, jnp.int32)
        step = (w * nP + p).astype(jnp.int32)
        par = jax.lax.rem(step, two)
        oth = 1 - par

        @pl.when(step == 0)
        def _():
            cnt[0] = 0
            cnt[1] = 0

        out_slot = idx_ref[6, w]
        # fence fires on the first pattern-tile of the first node of each
        # level: all previous-level writes must land before its reads
        fence_now = (idx_ref[7, w] == 1) & (p == 0)

        def clv_dst(slot, pt):
            if store:
                return clvs_ref.at[slot, :, :, pl.ds(pt * T, T)]
            return clvs_ref.at[slot, :, pl.ds(pt * T, T)]

        def drain(q):
            @pl.when(cnt[q] == 1)
            def _():
                pltpu.make_async_copy(
                    o_scr.at[q], clv_dst(0, 0), wsem.at[q]).wait()
                pltpu.make_async_copy(
                    os_scr.at[q], sc_ref.at[0, :, pl.ds(0, T)],
                    wssem.at[q]).wait()
                cnt[q] = 0

        drain(par)

        @pl.when(fence_now)
        def _():
            drain(oth)

        # ------------------------------------------------------------------
        # double-buffered reads with one-step LOOKAHEAD: step s issues step
        # s+1's child DMAs before computing, hiding read latency under the
        # matmuls. Fence steps are excluded from prefetch (their reads may
        # RAW-depend on writes not yet issued) and read synchronously.
        # ------------------------------------------------------------------
        def reads(st, start):
            wt = st // nP
            pt = jax.lax.rem(st, jnp.asarray(nP, jnp.int32))
            bf = jax.lax.rem(st, two)
            nsem = 3 if store else 2
            for k in (0, 1):
                sem = nsem * k
                slot = idx_ref[k, wt]
                is_tip = idx_ref[2 + k, wt] == 1
                tip = idx_ref[4 + k, wt]

                @pl.when(is_tip)
                def _(slot=slot, tip=tip, k=k, sem=sem):
                    c = pltpu.make_async_copy(
                        tip_codes_ref.at[tip, :, pl.ds(pt * T, T)],
                        codes_scr.at[bf, k], rsem.at[bf, sem])
                    c.start() if start else c.wait()

                @pl.when(jnp.logical_not(is_tip))
                def _(slot=slot, tip=tip, k=k, sem=sem):
                    if store:
                        # one DMA per stored plane (lo, hi) — the scratch
                        # interleaves (plane, child) so the flattened rows
                        # come out plane-major: [lo1, lo2, hi1, hi2]
                        for pp in range(2):
                            c = pltpu.make_async_copy(
                                clvs_ref.at[slot, pp, :, pl.ds(pt * T, T)],
                                c_scr.at[bf, pp, k], rsem.at[bf, sem + pp])
                            c.start() if start else c.wait()
                        sc_sem = sem + 2
                    else:
                        c = pltpu.make_async_copy(
                            clvs_ref.at[slot, :, pl.ds(pt * T, T)],
                            c_scr.at[bf, k], rsem.at[bf, sem])
                        c.start() if start else c.wait()
                        sc_sem = sem + 1
                    if thread_scalers:
                        c2 = pltpu.make_async_copy(
                            sc_ref.at[slot, :, pl.ds(pt * T, T)],
                            s_scr.at[bf, k], rsem.at[bf, sc_sem])
                        c2.start() if start else c2.wait()

        # steps NOT prefetched by their predecessor: step 0 and fence steps
        @pl.when((step == 0) | fence_now)
        def _():
            reads(step, True)

        reads(step, False)

        # prefetch the NEXT step's children (unless it is a fence step)
        nxt = step + 1

        @pl.when(nxt < nW * nP)
        def _():
            w_n = nxt // nP
            p_n = jax.lax.rem(nxt, jnp.asarray(nP, jnp.int32))
            nxt_fence = (idx_ref[7, w_n] == 1) & (p_n == 0)

            @pl.when(jnp.logical_not(nxt_fence))
            def _():
                reads(nxt, True)

        buf = par                                  # this step's read set
        is_tip1 = idx_ref[2, w] == 1
        is_tip2 = idx_ref[3, w] == 1

        def expand(k, is_tip):
            # one-hot MXU expansion: codetab [CS, n_codes] @ onehot
            # [n_codes, T]; operands are exactly 0/1 in bf16 so one MXU
            # pass is exact. Runs only on tip children (pl.when),
            # overwriting the (unused) clv scratch slot.
            @pl.when(is_tip)
            def _():
                codes = codes_scr[buf, k]                   # [1, T] int32
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (n_codes, T), 0)
                onehot = (iota == codes).astype(jnp.float32)
                exp = jax.lax.dot_general(
                    codetab_ref[:, :n_codes], onehot,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_EXPAND_PREC)
                if store:
                    # tip CLVs are exact 0/1: hi = value, lo = 0
                    c_scr[buf, 1, k] = exp.astype(jnp.bfloat16)
                    c_scr[buf, 0, k] = jnp.zeros((CS, T), jnp.bfloat16)
                else:
                    c_scr[buf, k] = exp

        expand(0, is_tip1)
        expand(1, is_tip2)

        if thread_scalers:
            zero_s = jnp.zeros((1, T), jnp.int32)
            s1 = jnp.where(is_tip1, zero_s, s_scr[buf, 0])
            s2 = jnp.where(is_tip2, zero_s, s_scr[buf, 1])
        # ONE block-diagonal [2CS,2CS]@[2CS,T] dot covers both children:
        # a HIGHEST-precision dot pays ~6 MXU pipeline fills of fixed
        # cost, so merging halves the dominant per-node dot overhead
        if store:
            # TWO single-pass DEFAULT dots replace one 6-pass HIGHEST:
            #   main = Ph @ hi12                    (K = 2CS)
            #   corr = [Ph | Pl] @ [lo12; hi12]     (K = 4CS)
            # pack = [Ph | Pl] (bf16, host-split); dropped term Pl@lo
            call = c_scr[buf].reshape(4 * CS, T)    # [lo1,lo2,hi1,hi2]
            pack = P12_ref[0]                       # [2CS, 4CS] bf16
            main = jax.lax.dot_general(
                pack[:, :2 * CS], call[2 * CS:, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            corr = jax.lax.dot_general(
                pack, call, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            lr = main + corr
        elif split == "read":
            # READ-TIME split (wide-state mode): f32 storage, per-step
            # hi/lo bf16 casts of the operand, THREE single-pass
            # DEFAULT dots  Ph@hi + Ph@lo + Pl@hi  (Pl@lo ~2^-18
            # dropped — measured bit-level on logL)
            c12 = c_scr[buf].reshape(2 * CS, T)     # f32
            hi = c12.astype(jnp.bfloat16)
            lo = (c12 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            pack = P12_ref[0]                       # [2CS, 4CS] bf16
            lr = jax.lax.dot_general(
                pack[:, :2 * CS], hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            lr = lr + jax.lax.dot_general(
                pack[:, :2 * CS], lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            lr = lr + jax.lax.dot_general(
                pack[:, 2 * CS:], hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        elif _DOT_PROBE:
            c12 = c_scr[buf].reshape(2 * CS, T)
            n_dots = {"default1": 1, "default3": 3}[_DOT_PROBE]
            lr = jnp.zeros((2 * CS, T), jnp.float32)
            for _j in range(n_dots):
                lr = lr + jax.lax.dot_general(
                    P12_ref[0] * (1.0 + _j), c12, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
        else:
            c12 = c_scr[buf].reshape(2 * CS, T)
            lr = jax.lax.dot_general(
                P12_ref[0], c12, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_DOT_PREC)
        prod = lr[:CS, :] * lr[CS:, :]

        if _NO_RESCALE_PROBE:
            scaled = prod
            e = jnp.zeros((1, T), jnp.int32)
        else:
            # exact power-of-two rescale (identical to the XLA engines)
            m = jnp.max(prod, axis=0, keepdims=True)        # [1, T]
            mi = jax.lax.bitcast_convert_type(m, jnp.int32)
            e = ((mi >> 23) & 0xFF) - 126
            e = jnp.where(m > 0, e, 0)
            e = jnp.clip(e, -125, 127)
            scale = jax.lax.bitcast_convert_type(
                ((127 - e) << 23).astype(jnp.int32), jnp.float32)
            scaled = prod * scale
        if store:
            # ONE split per node at write time (vs two per child at read
            # time in the measured dead-end variant)
            oh = scaled.astype(jnp.bfloat16)
            o_scr[par, 0] = (scaled - oh.astype(jnp.float32)).astype(
                jnp.bfloat16)
            o_scr[par, 1] = oh
        else:
            o_scr[par] = scaled
        os_scr[par] = (s1 + s2 + e) if thread_scalers else e

        pltpu.make_async_copy(
            o_scr.at[par], clv_dst(out_slot, p),
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


def _eigen_lamr_basis(partition, dtype):
    """Shared pieces of the direct propagator build: per-category scaled
    eigenvalues ``lamr`` [C, S] (rate / (1-pinv) folded in, the libpll
    effective-rate convention) and the outer-product basis ``M`` [C, S
    (k), S (i), S (j)] with M[c,k,i,j] = V[c,i,k] · Vinv[c,k,j].
    Requires a cached eigendecomposition."""
    pidx = partition.param_indices
    lam_c = partition.eigen_lam[pidx]                       # [C, S]
    pinv_c = partition.prop_invar[pidx]
    rate_c = partition.rate_cats / (1.0 - pinv_c)
    lamr = (lam_c * rate_c[:, None]).astype(dtype)          # [C, S]
    M = jnp.einsum("cik,ckj->ckij",
                   partition.eigen_V[pidx].astype(dtype),
                   partition.eigen_Vinv[pidx].astype(dtype),
                   precision=_PREC)                         # [C,S,S,S]
    return lamr, M


def fused_p12(partition, brlens, e1, e2):
    """Per-node PAIRED block-diagonal transition matrices [nW, 2CS, 2CS]
    built in ONE matmul against a static propagator basis.

    P12[n] = blockdiag(P(t_{e1[n]}), P(t_{e2[n]})) with
    P(t)[c·S+i, c·S+j] = Σ_k V[c,i,k] exp(λ[c,k]·t·r_c/(1-p_c)) Vinv[c,k,j].

    Replaces the chain  prob_matrices → block_diag_pmats → Pbd[e1]/Pbd[e2]
    gathers → two at[].set packs  (XLA gather HLO + scattered updates,
    ~0.2 ms/eval on TPU — see PERF_NOTES) with: two [nW] branch-length
    gathers, one exp, and one [nW, 2CS] @ [2CS, (2CS)²] matmul. Exact
    w.r.t. the old path up to f32 summation order (the basis contraction
    adds exact zeros for cross-block terms). Requires cached eigen."""
    CS = partition.n_cats * partition.states
    S = partition.states
    lamr, M = _eigen_lamr_basis(partition, jnp.float32)
    lamr_flat = lamr.reshape(CS)
    t1 = jnp.take(brlens, e1).astype(jnp.float32)           # [nW]
    t2 = jnp.take(brlens, e2).astype(jnp.float32)
    exp12 = jnp.concatenate([
        jnp.exp(t1[:, None] * lamr_flat[None, :]),
        jnp.exp(t2[:, None] * lamr_flat[None, :]),
    ], axis=1)                                              # [nW, 2CS]
    B2 = jnp.zeros((2 * CS, 2 * CS, 2 * CS), jnp.float32)
    for side in range(2):
        for c in range(partition.n_cats):
            o = side * CS + c * S
            B2 = B2.at[o:o + S, o:o + S, o:o + S].set(M[c])
    P12 = jnp.einsum("nk,kx->nx", exp12,
                     B2.reshape(2 * CS, 4 * CS * CS), precision=_PREC)
    return P12.reshape(-1, 2 * CS, 2 * CS)


def p_edge_from_eigen(partition, t):
    """Single-edge P [C, S, S] for (traced) branch length ``t`` from the
    cached eigendecomposition — the root-edge companion of
    :func:`fused_p12` (avoids building all-edge P matrices just to index
    one edge). Computed in partition dtype (the root reduction runs at
    full precision even on f64 CPU golden paths)."""
    lamr, M = _eigen_lamr_basis(partition, partition.dtype)
    expo = jnp.exp(lamr * jnp.asarray(t, partition.dtype))  # [C, S]
    return jnp.einsum("ck,ckij->cij", expo, M, precision=_PREC)


def _bf16_residual(x, hi=None):
    """bf16 residual plane ``bf16(x - f32(bf16(x)))`` computed so it
    SURVIVES XLA-TPU's bfloat16-propagation pass.

    The naive formula is silently destroyed on TPU: the pass sees the
    result consumed as bf16 and demotes the subtraction's operands to
    bf16, turning the residual into ``bf16(x) - bf16(x) == 0`` — and it
    propagates straight through ``jax.lax.optimization_barrier`` (all
    barrier placements measured broken on-chip). Round-2 production
    impact: every DEVICE-built split pack carried an all-zero low
    plane, silently running the split kernels with a bf16-only P
    matrix — logL off by up to 7e-5 relative, 70x the parity bar
    (tools/probe_split_oracle.py). In-KERNEL (Mosaic) splits are safe:
    Pallas bypasses the XLA HLO pipeline (verified on-chip: stored lo
    planes are correct).

    The fix recomputes the hi plane with INTEGER bit ops (round-to-
    nearest-even to the top 16 bits via bitcast — exact for all finite
    inputs, verified == ml_dtypes rounding) — the pass cannot demote
    integer arithmetic, and measured on-chip the barriered f32
    subtraction against the bitcast hi survives intact. ``hi`` (the
    bf16 plane) is accepted for signature compatibility but recomputed
    here; callers store ``x.astype(bfloat16)`` which equals the bitcast
    rounding."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    rnd = bits + 0x7FFF + ((bits >> 16) & 1)
    hif = jax.lax.bitcast_convert_type(rnd & jnp.int32(-65536),
                                       jnp.float32)
    diff = jax.lax.optimization_barrier(x - hif)
    return diff.astype(jnp.bfloat16)


def split_pack_p12(P12):
    """bf16 split-pack [nW, 2CS, 4CS] = [Ph | Pl] of f32 paired
    block-diagonal transition matrices (kernel ``split`` mode)."""
    Ph = P12.astype(jnp.bfloat16)
    Pl = _bf16_residual(P12)
    return jnp.concatenate([Ph, Pl], axis=2)


def update_partials_fused(partition, P, idx8, e1, e2, n_slots: int,
                          interpret: bool = False, P12=None,
                          thread_scalers: bool = True,
                          split: bool = False, init=None):
    """Whole-traversal pruning in one pallas call.

    Args:
      idx8: int32 [n_inner, 8] from :func:`compile_fused`
        (slot1, slot2, is_tip1, is_tip2, tip1, tip2, out_slot, fence)
      e1/e2: int32 [n_inner] child edge ids (index P)
      P12: optional precomputed [nW, 2CS, 2CS] paired block-diagonal
        transition matrices (:func:`fused_p12`); when given, ``P`` may be
        None and the block-diag/gather pack below is skipped entirely
      thread_scalers: kernel scaler mode (see :func:`_make_fused_kernel`).
        False drops the two child-scaler DMAs+waits per step; the scaler
        plane then holds PER-NODE exponents, not cumulative sums.
      split: True = split-storage bf16x2 CLVs + two-DEFAULT-dot child
        application; "read" = f32 storage + read-time split (3 DEFAULT
        dots — the wide-state mode); False = exact HIGHEST dot (see
        :func:`_make_fused_kernel`). split=True returns bf16
        [n_slots, 2, CS, Ppad] (planes lo, hi) instead of f32.
      init: optional (clvs, scalers) PRIOR buffers (output shapes/
        dtypes) aliased into the outputs: slots the op table does not
        write RETAIN their prior values — the CLV-validity partial-
        traversal protocol (reference treeinfo.c:872-944) on the fused
        kernel; pass a MASKED/dirty-row op table and the cached buffers.
    Returns (clvs_csp [n_slots, CS, Ppad] f32 — or the split layout —
             scalers [n_slots, 1, Ppad] int32).
    """
    store = split is True
    Ppad = partition.n_patterns_padded
    CS = partition.n_cats * partition.states
    codetab, n_codes = _code_table(partition)
    tip_codes = partition.tip_states[:, None, :].astype(jnp.int32)
    nW = idx8.shape[0]
    TILE_P = _pick_tile_fused(Ppad, CS)
    nP = Ppad // TILE_P
    pwidth = 4 * CS if split else 2 * CS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nW, nP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # tip_codes
            pl.BlockSpec(memory_space=pltpu.VMEM),         # codetab
            pl.BlockSpec((1, 2 * CS, pwidth),
                         lambda w, p, idx: (w, 0, 0)),
        ] + ([pl.BlockSpec(memory_space=pl.ANY),           # init clvs
              pl.BlockSpec(memory_space=pl.ANY)]           # init scalers
             if init is not None else []),
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            (pltpu.VMEM((2, 2, 2, CS, TILE_P), jnp.bfloat16) if store
             else pltpu.VMEM((2, 2, CS, TILE_P), jnp.float32)),  # c_scr
            pltpu.VMEM((2, 2, 1, TILE_P), jnp.int32),      # codes_scr
            pltpu.VMEM((2, 2, 1, TILE_P), jnp.int32),      # s_scr
            (pltpu.VMEM((2, 2, CS, TILE_P), jnp.bfloat16) if store
             else pltpu.VMEM((2, CS, TILE_P), jnp.float32)),  # o_scr
            pltpu.VMEM((2, 1, TILE_P), jnp.int32),         # os_scr
            pltpu.SemaphoreType.DMA((2, 6 if store else 4)),  # rsem
            pltpu.SemaphoreType.DMA((2,)),                 # wsem
            pltpu.SemaphoreType.DMA((2,)),                 # wssem
            pltpu.SMEM((2,), jnp.int32),                   # cnt
        ],
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    clv_shape = ((n_slots, 2, CS, Ppad) if store else (n_slots, CS, Ppad))
    kern = _make_fused_kernel(n_codes, nW, nP, thread_scalers, split)
    io_aliases = None
    if init is not None:
        # prior buffers ride in as aliased inputs (indices count the
        # scalar-prefetch operand): the kernel never reads or writes
        # the extra refs — aliasing alone preserves unwritten slots
        io_aliases = {4: 0, 5: 1}

        def kern_init(s_ref, tc_ref, ct_ref, p12_ref, _ic, _is, clv_ref,
                      sc_ref, *scratch):
            kern(s_ref, tc_ref, ct_ref, p12_ref, clv_ref, sc_ref,
                 *scratch)

        kern_run = kern_init
    else:
        kern_run = kern
    fn = pl.pallas_call(
        kern_run,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(clv_shape,
                                 jnp.bfloat16 if store else jnp.float32),
            jax.ShapeDtypeStruct((n_slots, 1, Ppad), jnp.int32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
        **({"input_output_aliases": io_aliases} if io_aliases else {}),
    )
    if P12 is None:
        # pair the two children's block-diagonal P matrices into one
        # [2CS, 2CS] block-diagonal per node (see kernel dot)
        Pbd = block_diag_pmats(P.astype(jnp.float32))
        nW_ = idx8.shape[0]
        P12 = jnp.zeros((nW_, 2 * CS, 2 * CS), jnp.float32)
        P12 = P12.at[:, :CS, :CS].set(Pbd[e1])
        P12 = P12.at[:, CS:, CS:].set(Pbd[e2])
    if split:
        P12 = split_pack_p12(P12)
    idx8_t = idx8.T                    # [8, nW] column-major prefetch
    if init is not None:
        return fn(idx8_t, tip_codes, codetab, P12, init[0], init[1])
    return fn(idx8_t, tip_codes, codetab, P12)


def compile_fused_ops(partition, ops, pad_to: int | None = None,
                      n_slots_min: int | None = None,
                      as_numpy: bool = False, serial: bool = False):
    """Compile an ARBITRARY pruning-op list (including directed-CLV
    schedules from BLO/SPR and masked/padded op tables) for the fused
    megakernel, PRESERVING the original slot numbering — the kernel's
    manual DMA writes don't need contiguous slots, so downstream code
    that indexes the returned buffer by the op table's own slot ids
    (gather_node_clvs, edge_ref) works unchanged.

    Rows are emitted in dependency-level order with fence flags; masked
    rows (parent_slot < 0) and padding rows (up to ``pad_to``) become
    dummy tip/tip ops writing to a scratch slot. Returns
    (idx8 [pad_to or n_live, 8], e1, e2, n_slots) with n_slots =
    max_slot + 2 (last slot = scratch).

    ``serial=True``: keep the ORIGINAL row order — required for
    SLOT-RECYCLED tables (clv.bounded_slot_ops: a slot is written
    several times, so level reordering would corrupt reads). Fences are
    emitted per-row wherever a row reads a slot written within the last
    2 rows (the kernel's write pipeline is 2-deep: a write issued at
    row w is guaranteed drained by row w+2's buffer recycle, so only
    distance ≤ 2 RAW hazards need a drain). This is the memory-bounded
    capacity mode of the megakernel (reference pll_tree.c:1509-1573).
    """
    ops = np.asarray(ops)
    n_tips = partition.n_tips
    live = ops[ops[:, 0] >= 0]
    if live.size == 0:
        raise ValueError("no live ops")
    if serial:
        return _compile_fused_serial(live, ops, n_tips, pad_to,
                                     n_slots_min, as_numpy)
    level_of: dict[int, int] = {}
    rows_by_level: dict[int, list] = {}
    for row in live:
        # child slots not defined by THIS table are external (already
        # valid in an aliased prior buffer — the partial-traversal
        # case): they impose no ordering, like tips
        deps = [level_of.get(int(c) - n_tips, -1)
                for c in (row[1], row[3]) if int(c) >= n_tips]
        lvl = (max(deps) + 1) if deps else 0
        level_of[int(row[0])] = lvl
        rows_by_level.setdefault(lvl, []).append(row)
    n_slots = int(live[:, 0].max()) + 2        # +1 scratch for dummies
    if n_slots_min is not None:
        # fixed buffer size across varying op tables (e.g. SPR remainder
        # trees of different sizes) so the jitted consumer never retraces
        n_slots = max(n_slots, n_slots_min)
    rows8, e1s, e2s = [], [], []
    for li, lvl in enumerate(sorted(rows_by_level)):
        arr = np.stack(rows_by_level[lvl]).astype(np.int64)
        c1, c2 = arr[:, 1], arr[:, 3]
        it1 = (c1 < n_tips).astype(np.int64)
        it2 = (c2 < n_tips).astype(np.int64)
        W = arr.shape[0]
        fence = np.zeros(W, np.int64)
        if li > 0:
            fence[0] = 1
        rows8.append(np.stack([
            np.where(it1 == 1, 0, c1 - n_tips),
            np.where(it2 == 1, 0, c2 - n_tips),
            it1, it2,
            np.where(it1 == 1, c1, 0), np.where(it2 == 1, c2, 0),
            arr[:, 0], fence,
        ], axis=1))
        e1s.append(arr[:, 2])
        e2s.append(arr[:, 4])
    idx8 = np.concatenate(rows8)
    e1 = np.concatenate(e1s)
    e2 = np.concatenate(e2s)
    if pad_to is not None and pad_to > idx8.shape[0]:
        npad = pad_to - idx8.shape[0]
        dummy = np.zeros((npad, 8), np.int64)
        dummy[:, 2] = dummy[:, 3] = 1            # tip/tip children
        dummy[:, 6] = n_slots - 1                # scratch slot
        idx8 = np.concatenate([idx8, dummy])
        e1 = np.concatenate([e1, np.zeros(npad, np.int64)])
        e2 = np.concatenate([e2, np.zeros(npad, np.int64)])
    return _fused_table_out(idx8, e1, e2, n_slots, as_numpy)


def _fused_table_out(idx8, e1, e2, n_slots, as_numpy):
    if as_numpy:
        # ONE packed [10, n] host array (idx8.T | e1 | e2): callers that
        # rebuild tables per call (incremental eval) upload it in a
        # single device transfer — three separate device_puts cost ~3
        # tunnel round-trips per call on the remote runtime
        return (np.concatenate([idx8.T, e1[None], e2[None]]
                               ).astype(np.int32), n_slots)
    return (jnp.asarray(idx8.astype(np.int32)),
            jnp.asarray(e1.astype(np.int32)),
            jnp.asarray(e2.astype(np.int32)), n_slots)


def _compile_fused_serial(live, ops, n_tips, pad_to, n_slots_min,
                          as_numpy):
    """Serial-order fused-kernel table (see compile_fused_ops
    ``serial=True``): original row order, per-row fences on distance-≤2
    RAW hazards, slot recycling allowed."""
    arr = live.astype(np.int64)
    c1, c2 = arr[:, 1], arr[:, 3]
    it1 = (c1 < n_tips).astype(np.int64)
    it2 = (c2 < n_tips).astype(np.int64)
    out = arr[:, 0]
    n = arr.shape[0]
    fence = np.zeros(n, np.int64)
    for w in range(n):
        for c, is_t in ((c1[w], it1[w]), (c2[w], it2[w])):
            if is_t:
                continue
            slot = c - n_tips
            if (w >= 1 and out[w - 1] == slot) or \
                    (w >= 2 and out[w - 2] == slot):
                fence[w] = 1
    idx8 = np.stack([
        np.where(it1 == 1, 0, c1 - n_tips),
        np.where(it2 == 1, 0, c2 - n_tips),
        it1, it2,
        np.where(it1 == 1, c1, 0), np.where(it2 == 1, c2, 0),
        out, fence,
    ], axis=1)
    e1 = arr[:, 2]
    e2 = arr[:, 4]
    n_slots = int(out.max()) + 2
    if n_slots_min is not None:
        n_slots = max(n_slots, n_slots_min)
    if pad_to is not None and pad_to > idx8.shape[0]:
        npad = pad_to - idx8.shape[0]
        dummy = np.zeros((npad, 8), np.int64)
        dummy[:, 2] = dummy[:, 3] = 1
        dummy[:, 6] = n_slots - 1
        idx8 = np.concatenate([idx8, dummy])
        e1 = np.concatenate([e1, np.zeros(npad, np.int64)])
        e2 = np.concatenate([e2, np.zeros(npad, np.int64)])
    return _fused_table_out(idx8, e1, e2, n_slots, as_numpy)


def update_partials_fused_std(partition, P, idx8, e1, e2, n_slots: int,
                              interpret: bool = False,
                              split: bool | None = None):
    """Fused-kernel pruning returning STANDARD-layout buffers
    ([n_slots, Ppad, C, S] f32 CLVs + [n_slots, Ppad] scalers) — a
    drop-in for :func:`pllmod_tpu.ops.clv.update_partials` on op tables
    compiled by :func:`compile_fused_ops`. Conversion from the kernel's
    CS×P layout costs one transpose pass over the buffer.

    ``split`` (default: :func:`engine.use_split_clv` — on for real TPU
    runs) runs the traversal with split-storage bf16x2 CLVs (~20% faster
    — PERF_NOTES) and merges the planes to f32 during the layout
    conversion; the returned buffers are ~1e-7-relative of the exact
    path, inside the parity bar of every BLO/SPR consumer."""
    if split is None:
        from pllmod_tpu.ops import engine as engine_mod
        split = engine_mod.use_split_clv(partition)
    clvs_csp, scalers = update_partials_fused(partition, P, idx8, e1, e2,
                                              n_slots, interpret=interpret,
                                              split=split)
    C, S = partition.n_cats, partition.states
    if clvs_csp.ndim == 4:          # split STORAGE ("read" is f32 3-dim)
        clvs_csp = (clvs_csp[:, 0].astype(jnp.float32) +
                    clvs_csp[:, 1].astype(jnp.float32))
    clvs = csp_to_standard(clvs_csp, C, S).astype(partition.dtype)
    return clvs, scalers[:, 0, :]


def compile_fused(partition, tree, root_edge=None, fuse_root: bool = False):
    """Host-side: compile a tree into the fused-kernel index arrays.

    Returns (idx8 [n_inner, 8], e1, e2, root_info, n_slots); root refs
    remapped via the LevelSchedule as in engine.compile_schedule.
    Delegates row packing to :func:`compile_fused_ops` (one source of
    truth for the 8-column idx layout).

    ``fuse_root=True`` appends a ROOT PSEUDO-NODE row: children (u, v),
    paired matrices (diag(freqs_per_cat), P_root), out = the scratch
    slot. The kernel's ordinary step then computes the root-edge
    per-category site product (f ⊙ clv_u) * (P_root @ clv_v) — the two
    root CLVs never round-trip through XLA (reference: the in-place
    root loop of pll_compute_edge_loglikelihood). The epilogue only
    reduces the product slot (:func:`root_from_prod_slot`)."""
    ops, root_info = tree.traversal_ops(root_edge)
    idx8, e1, e2, n_slots = compile_fused_ops(partition, ops)
    # compile_fused_ops preserves the op table's slot numbering, so the
    # traversal's root refs pass through unchanged
    u, v, e = (int(x) for x in root_info)
    if fuse_root:
        n_tips = partition.n_tips
        def enc(ref):
            if ref < n_tips:
                return 0, 1, ref
            return ref - n_tips, 0, 0
        s_u, it_u, t_u = enc(u)
        s_v, it_v, t_v = enc(v)
        root_slot = n_slots - 1                  # the scratch slot
        row = np.asarray([[s_u, s_v, it_u, it_v, t_u, t_v,
                           root_slot, 1]], np.int32)
        idx8 = jnp.concatenate([idx8, jnp.asarray(row)])
        e1 = jnp.concatenate([e1, jnp.asarray([0], jnp.int32)])
        e2 = jnp.concatenate([e2, jnp.asarray([e], jnp.int32)])
        return idx8, e1, e2, (u, v, e, root_slot), n_slots
    return idx8, e1, e2, (u, v, e), n_slots


def _root_pair(partition, P_root):
    """[1, 2CS, 2CS] paired matrix of the root pseudo-node:
    blockdiag(diag(freqs_per_cat), P_root) — the kernel step then emits
    (f ⊙ clv_u) * (P_root @ clv_v), the root-edge site product."""
    CS = partition.n_cats * partition.states
    fcflat = partition.freqs_per_cat().reshape(CS).astype(jnp.float32)
    pair = jnp.zeros((1, 2 * CS, 2 * CS), jnp.float32)
    pair = pair.at[0, :CS, :CS].set(jnp.diag(fcflat))
    pair = pair.at[0, CS:, CS:].set(
        _block_diag_single(P_root, jnp.float32))
    return pair


def root_from_prod_slot(partition, clvs, scalers, root_slot: int,
                        persite: bool = False):
    """Edge logL epilogue for the fused-root path: the kernel already
    left the (rescaled) per-category site product in ``root_slot``; its
    scaler row is the TOTAL exponent (children cumulative + own).

    ``persite=True`` additionally returns the per-PATTERN logL vector
    (the reference's ``persite`` out-array,
    pll_compute_edge_loglikelihood) — free here, since the site vector
    exists right before the weighted reduction."""
    from pllmod_tpu.ops import likelihood as lk_mod
    C, S = partition.n_cats, partition.states
    dtype = partition.dtype
    if clvs.ndim == 4:          # split storage
        prod = (clvs[root_slot, 0].astype(dtype) +
                clvs[root_slot, 1].astype(dtype))
    else:
        prod = clvs[root_slot].astype(dtype)
    per_cat = prod.reshape(C, S, -1).sum(axis=1)             # [C, P]
    lnl = lk_mod._site_lnl(partition, per_cat.T, scalers[root_slot, 0])
    total = jnp.sum(lnl * partition.pattern_weights)
    if persite:
        return total, lnl
    return total


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def loglikelihood_fused(partition, idx8, brlens, e1, e2, root_info,
                        n_slots: int, interpret: bool = False,
                        split: bool = False, persite: bool = False):
    """Full-tree logL through the fused whole-traversal kernel.

    With a cached eigendecomposition the per-node transition matrices are
    built DIRECTLY in paired block-diagonal layout (:func:`fused_p12`) and
    all-edge P matrices are never materialized; otherwise (no cache /
    non-reversible) the generic ``prob_matrices`` path runs.

    Scaler modes (same-process A/B, flagship config): THREADED cumulative
    scalers 1.110 ms/eval vs LEAN per-node scalers + XLA slot-sum
    1.143 ms — the two child-scaler DMAs are fully hidden behind the
    vector chain, while the lean mode's root-side
    ``sum(scalers[:-1])`` reduction reads the whole 8 MB scaler plane.
    Threaded stays the default; the lean mode remains available via
    :func:`update_partials_fused` (valid because :func:`compile_fused`
    emits DENSE slot tables — slots 0..n_slots-2 all written, the last
    slot is the never-written scratch)."""
    fuse_root = len(root_info) == 4
    e = root_info[2]
    CS = partition.n_cats * partition.states
    if partition.reversible and partition.eigen_lam is not None:
        if fuse_root:
            P12 = fused_p12(partition, brlens, e1[:-1], e2[:-1])
        else:
            P12 = fused_p12(partition, brlens, e1, e2)
        P_root = p_edge_from_eigen(partition, brlens[e])
    else:
        P = partition.prob_matrices(brlens)
        Pbd = block_diag_pmats(P.astype(jnp.float32))
        ee1 = e1[:-1] if fuse_root else e1
        ee2 = e2[:-1] if fuse_root else e2
        P12 = jnp.zeros((ee1.shape[0], 2 * CS, 2 * CS), jnp.float32)
        P12 = P12.at[:, :CS, :CS].set(Pbd[ee1])
        P12 = P12.at[:, CS:, CS:].set(Pbd[ee2])
        P_root = P[e]
    if fuse_root:
        P12 = jnp.concatenate([P12, _root_pair(partition, P_root)])
    clvs, scalers = update_partials_fused(
        partition, None, idx8, e1, e2, n_slots, interpret=interpret,
        P12=P12, split=split)
    if fuse_root:
        return root_from_prod_slot(partition, clvs, scalers, root_info[3],
                                   persite=persite)
    assert not persite, "persite needs compile_fused(fuse_root=True)"
    return root_loglikelihood_csp(partition, clvs, scalers,
                                  root_info[0], root_info[1], P_root)


def root_loglikelihood_csp_dyn(partition, clvs_csp, scalers, ref_p, ref_c,
                               P_edge):
    """As :func:`root_loglikelihood_csp` but with TRACED node refs, so a
    topology change (new root placement after an SPR move) does not
    trigger a recompile. Tip expansion uses a one-hot matmul instead of a
    gather (CLAUDE.md: gather HLO is slow on TPU)."""
    from pllmod_tpu.ops import likelihood as lk_mod
    n_tips = partition.n_tips
    C = partition.n_cats
    S = partition.states
    Ppad = partition.n_patterns_padded
    dtype = partition.dtype
    n_codes = partition.code_clv.shape[0]

    CS = C * S

    def fetch(ref):
        def tip(_):
            codes = jax.lax.dynamic_index_in_dim(
                partition.tip_states, jnp.clip(ref, 0, n_tips - 1), 0,
                keepdims=False)                                   # [P]
            onehot = (codes[None, :] ==
                      jnp.arange(n_codes)[:, None]).astype(dtype)
            t = jnp.einsum("ks,kp->sp", partition.code_clv.astype(dtype),
                           onehot, precision=_PREC)               # [S,P]
            return jnp.tile(t, (C, 1)), jnp.zeros(Ppad, jnp.int32)

        def inner(_):
            slot = jnp.clip(ref - n_tips, 0, clvs_csp.shape[0] - 1)
            clv = jax.lax.dynamic_index_in_dim(
                clvs_csp, slot, 0, keepdims=False)
            if clv.ndim == 3:       # split storage: lo + hi bf16 planes
                clv = clv[0].astype(dtype) + clv[1].astype(dtype)
            sc = jax.lax.dynamic_index_in_dim(
                scalers, slot, 0, keepdims=False)[0]
            return clv.astype(dtype), sc
        return jax.lax.cond(ref < n_tips, tip, inner, None)

    clv_p, s_p = fetch(ref_p)                                    # [CS, P]
    clv_c, s_c = fetch(ref_c)
    Pbd = _block_diag_single(P_edge, dtype)
    right = jax.lax.dot_general(Pbd, clv_c, (((1,), (0,)), ((), ())),
                                preferred_element_type=dtype,
                                precision=_PREC)                 # [CS, P]
    fcflat = partition.freqs_per_cat().reshape(CS).astype(dtype)
    prod = clv_p * right * fcflat[:, None]
    per_cat = prod.reshape(C, S, -1).sum(axis=1)                 # [C, P]
    lnl = lk_mod._site_lnl(partition, per_cat.T, s_p + s_c)
    return jnp.sum(lnl * partition.pattern_weights)


@partial(jax.jit, static_argnums=(6, 7, 8, 9))
def loglikelihood_fused_dyn(partition, idx8, brlens, e1, e2, root_refs,
                            n_slots: int, interpret: bool = False,
                            split: bool = False, fuse_root: bool = False):
    """Fused-kernel logL with DYNAMIC root info: ``root_refs`` is an int32
    [3] array (ref_p, ref_c, root_edge). Changing topology (new idx8/e1/
    e2/root_refs of the same shapes) reuses the compiled executable —
    the per-move cost during tree search is data upload only.

    ``fuse_root``: append the root pseudo-node row IN-TRACE (the row is
    data, so dynamic root refs stay recompile-free). Requires idx8 to be
    a DENSE table (scratch slot n_slots-1 unwritten or only dummy-
    written, as compile_fused/compile_fused_ops emit)."""
    CS = partition.n_cats * partition.states
    if partition.reversible and partition.eigen_lam is not None:
        P12 = fused_p12(partition, brlens, e1, e2)
        t_root = jax.lax.dynamic_index_in_dim(brlens, root_refs[2], 0,
                                              keepdims=False)
        P_root = p_edge_from_eigen(partition, t_root)
    else:
        P = partition.prob_matrices(brlens)
        Pbd = block_diag_pmats(P.astype(jnp.float32))
        P12 = jnp.zeros((e1.shape[0], 2 * CS, 2 * CS), jnp.float32)
        P12 = P12.at[:, :CS, :CS].set(Pbd[e1])
        P12 = P12.at[:, CS:, CS:].set(Pbd[e2])
        P_root = jax.lax.dynamic_index_in_dim(P, root_refs[2], 0,
                                              keepdims=False)
    if fuse_root:
        n_tips = partition.n_tips

        def enc(ref):
            tip = ref < n_tips
            return (jnp.where(tip, 0, ref - n_tips),
                    tip.astype(jnp.int32), jnp.where(tip, ref, 0))

        s_u, it_u, t_u = enc(root_refs[0])
        s_v, it_v, t_v = enc(root_refs[1])
        row = jnp.stack([s_u, s_v, it_u, it_v, t_u, t_v,
                         jnp.asarray(n_slots - 1, jnp.int32),
                         jnp.asarray(1, jnp.int32)])[None].astype(jnp.int32)
        idx8 = jnp.concatenate([idx8, row])
        P12 = jnp.concatenate([P12, _root_pair(partition, P_root)])
        clvs, scalers = update_partials_fused(
            partition, None, idx8, e1, e2, n_slots, interpret=interpret,
            P12=P12, split=split)
        return root_from_prod_slot(partition, clvs, scalers, n_slots - 1)
    clvs, scalers = update_partials_fused(
        partition, None, idx8, e1, e2, n_slots, interpret=interpret,
        P12=P12, split=split)
    return root_loglikelihood_csp_dyn(partition, clvs, scalers,
                                      root_refs[0], root_refs[1], P_root)


# ---------------------------------------------------------------------------
# Node-packed megakernel: G = 128//CS nodes per grid step.
#
# The single-node kernel's dots are [CS,CS]@[CS,T] with CS=16 for DNA+Γ4 —
# the MXU pads K to 128, wasting 8x of the systolic array (measured: the
# dots dominate the kernel). Packing G level-mates into one
# block-diagonal [G·CS, G·CS] matrix makes every child application a FULL
# [128,128]@[128,T] MXU matmul. Group members write a CONTIGUOUS slot
# range, so each step issues ONE result DMA; reads stay per-member
# (children scatter across earlier levels). Levels are padded to a
# multiple of G with dummy tip nodes whose outputs land in padding slots
# that are never read.
#
# Buffers are 2D row-major: clvs [n_slots_pad·CS, P], scalers
# [n_slots_pad, P] — slot s owns rows [s·CS, (s+1)·CS).
# ---------------------------------------------------------------------------
def _pick_tile_packed(P: int, GM: int) -> int:
    """Same VMEM budget arithmetic as the fused kernel, keyed on GM."""
    return _pick_tile_fused(P, GM)


def _make_packed_kernel(n_codes: int, G: int, CS: int, nG: int, nP: int):
    GM = G * CS

    def _kernel(idxm_ref,              # prefetch [nG*G, 6] int32
                idxg_ref,              # prefetch [nG, 4] int32
                tip_codes_ref,         # ANY [n_tips, 1, P] int32
                bigtab_ref,            # VMEM [GM, G*n_codes] f32
                P1_ref, P2_ref,        # VMEM blocks [1, GM, GM]
                clvs_ref, sc_ref,      # ANY outputs [n_slots_pad*CS, P]/[n_slots_pad, P]
                c_scr, codes_scr, s_scr, o_scr, os_scr,
                rsem, rssem, wsem, wssem, cnt):
        grp = pl.program_id(0)
        p = pl.program_id(1)
        T = o_scr.shape[2]
        step = grp * nP + p
        par = jax.lax.rem(step, jnp.asarray(2, step.dtype))
        oth = 1 - par

        @pl.when(step == 0)
        def _():
            cnt[0] = 0
            cnt[1] = 0

        out_base = idxg_ref[grp, 0]
        fence = idxg_ref[grp, 1] == 1
        any_tip = (idxg_ref[grp, 2] == 1, idxg_ref[grp, 3] == 1)

        def drain(q):
            @pl.when(cnt[q] == 1)
            def _():
                pltpu.make_async_copy(
                    o_scr.at[q], clvs_ref.at[pl.ds(0, GM), pl.ds(0, T)],
                    wsem.at[q]).wait()
                pltpu.make_async_copy(
                    os_scr.at[q], sc_ref.at[pl.ds(0, G), :, pl.ds(0, T)],
                    wssem.at[q]).wait()
                cnt[q] = 0

        drain(par)

        @pl.when(fence & (p == 0))
        def _():
            drain(oth)

        # -- per-member reads (side k, member g static) ------------------
        def member(k, g):
            row = grp * G + g
            slot = idxm_ref[row, 2 * k]
            is_tip = idxm_ref[row, 2 * k + 1] == 1
            tip = idxm_ref[row, 4 + k]
            return slot, is_tip, tip

        def rd(k, g, start):
            slot, is_tip, tip = member(k, g)

            @pl.when(is_tip)
            def _():
                c = pltpu.make_async_copy(
                    tip_codes_ref.at[tip, :, pl.ds(p * T, T)],
                    codes_scr.at[k, g], rsem.at[k, g])
                c.start() if start else c.wait()

            @pl.when(jnp.logical_not(is_tip))
            def _():
                c = pltpu.make_async_copy(
                    clvs_ref.at[pl.ds(slot * CS, CS), pl.ds(p * T, T)],
                    c_scr.at[k, pl.ds(g * CS, CS), :], rsem.at[k, g])
                c.start() if start else c.wait()
                c2 = pltpu.make_async_copy(
                    sc_ref.at[slot, :, pl.ds(p * T, T)],
                    s_scr.at[k, g], rssem.at[k, g])
                c2.start() if start else c2.wait()

        def rd_contig(k, start):
            """Whole-side gather: the consumer-driven level reordering
            makes a group's side-k children a consecutive slot run for
            most groups — one [GM, T] DMA + one [G, 1, T] scaler DMA."""
            s0 = idxg_ref[grp, 5 + 2 * k]
            c = pltpu.make_async_copy(
                clvs_ref.at[pl.ds(s0 * CS, GM), pl.ds(p * T, T)],
                c_scr.at[k], rsem.at[k, 0])
            c.start() if start else c.wait()
            c2 = pltpu.make_async_copy(
                sc_ref.at[pl.ds(s0, G), :, pl.ds(p * T, T)],
                s_scr.at[k], rssem.at[k, 0])
            c2.start() if start else c2.wait()

        contig = (idxg_ref[grp, 4] == 1, idxg_ref[grp, 6] == 1)
        for start in (True, False):
            for k in (0, 1):
                @pl.when(contig[k])
                def _(k=k, start=start):
                    rd_contig(k, start)

                @pl.when(jnp.logical_not(contig[k]))
                def _(k=k, start=start):
                    for g in range(G):
                        rd(k, g, start)

        # -- tip expansion: block-diag codetab (kron(I_G, codetab)) @
        #    one-hot of the G code rows — one MXU dot per side, gated on
        #    the group having any tip on that side -----------------------
        for k in (0, 1):
            @pl.when(any_tip[k])
            def _(k=k):
                codes = codes_scr[k, :, 0, :]                # [G, T] int32
                bcodes = jnp.repeat(codes, n_codes, axis=0)  # [G*nc, T]
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (G * n_codes, T), 0)
                onehot = (bcodes == jax.lax.rem(
                    iota, jnp.asarray(n_codes, jnp.int32))).astype(
                        jnp.float32)
                exp_all = jax.lax.dot_general(
                    bigtab_ref[...], onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_EXPAND_PREC)                  # [GM, T]
                for g in range(G):
                    _, is_tip, _ = member(k, g)

                    @pl.when(is_tip)
                    def _(g=g):
                        c_scr[k, g * CS:(g + 1) * CS, :] = \
                            exp_all[g * CS:(g + 1) * CS, :]

        left = jax.lax.dot_general(
            P1_ref[0], c_scr[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_DOT_PREC)
        right = jax.lax.dot_general(
            P2_ref[0], c_scr[1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_DOT_PREC)
        prod = left * right                                   # [GM, T]

        zero_s = jnp.zeros((1, T), jnp.int32)
        for g in range(G):
            blk = prod[g * CS:(g + 1) * CS, :]
            m = jnp.max(blk, axis=0, keepdims=True)           # [1, T]
            mi = jax.lax.bitcast_convert_type(m, jnp.int32)
            e = ((mi >> 23) & 0xFF) - 126
            e = jnp.where(m > 0, e, 0)
            e = jnp.clip(e, -125, 127)
            scale = jax.lax.bitcast_convert_type(
                ((127 - e) << 23).astype(jnp.int32), jnp.float32)
            o_scr[par, g * CS:(g + 1) * CS, :] = blk * scale
            _, it1, _ = member(0, g)
            _, it2, _ = member(1, g)
            s1 = jnp.where(it1, zero_s, s_scr[0, g])
            s2 = jnp.where(it2, zero_s, s_scr[1, g])
            os_scr[par, g] = s1 + s2 + e

        pltpu.make_async_copy(
            o_scr.at[par],
            clvs_ref.at[pl.ds(out_base * CS, GM), pl.ds(p * T, T)],
            wsem.at[par]).start()
        pltpu.make_async_copy(
            os_scr.at[par],
            sc_ref.at[pl.ds(out_base, G), :, pl.ds(p * T, T)],
            wssem.at[par]).start()
        cnt[par] = 1

        @pl.when(step == nG * nP - 1)
        def _():
            drain(par)
            drain(oth)

    return _kernel


def _group_blockdiag(Pbd_sel, nG: int, G: int, CS: int):
    """[nG*G, CS, CS] -> block-diagonal [nG, G*CS, G*CS]."""
    blk = Pbd_sel.reshape(nG, G, CS, CS)
    Z = jnp.zeros((nG, G, CS, G, CS), Pbd_sel.dtype)
    for g in range(G):
        Z = Z.at[:, g, :, g, :].set(blk[:, g])
    return Z.reshape(nG, G * CS, G * CS)


def update_partials_packed(partition, P, packed, interpret: bool = False):
    """Whole-traversal pruning, G nodes per grid step (one pallas call).

    ``packed`` is the host-compiled :class:`PackedSchedule`. Returns
    (clvs2d [n_slots_pad*CS, Ppad] f32, scalers2d [n_slots_pad, Ppad]
    int32)."""
    Ppad = partition.n_patterns_padded
    C, S = partition.n_cats, partition.states
    CS = C * S
    G, nG = packed.G, packed.nG
    GM = G * CS
    Pbd = block_diag_pmats(P.astype(jnp.float32))
    codetab, n_codes = _code_table(partition)
    # kron(I_G, codetab[:, :n_codes])
    eye = jnp.eye(G, dtype=jnp.float32)
    bigtab = jnp.einsum("ab,ck->acbk", eye,
                        codetab[:, :n_codes]).reshape(GM, G * n_codes)
    tip_codes = partition.tip_states[:, None, :].astype(jnp.int32)
    P1G = _group_blockdiag(Pbd[packed.e1], nG, G, CS)
    P2G = _group_blockdiag(Pbd[packed.e2], nG, G, CS)
    TILE_P = _pick_tile_packed(Ppad, GM)
    nP = Ppad // TILE_P
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nG, nP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # tip_codes
            pl.BlockSpec(memory_space=pltpu.VMEM),           # bigtab
            pl.BlockSpec((1, GM, GM), lambda g, p, i1, i2: (g, 0, 0)),
            pl.BlockSpec((1, GM, GM), lambda g, p, i1, i2: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, GM, TILE_P), jnp.float32),        # c_scr
            pltpu.VMEM((2, G, 1, TILE_P), jnp.int32),        # codes_scr
            pltpu.VMEM((2, G, 1, TILE_P), jnp.int32),        # s_scr
            pltpu.VMEM((2, GM, TILE_P), jnp.float32),        # o_scr
            pltpu.VMEM((2, G, 1, TILE_P), jnp.int32),        # os_scr
            pltpu.SemaphoreType.DMA((2, G)),                 # rsem
            pltpu.SemaphoreType.DMA((2, G)),                 # rssem
            pltpu.SemaphoreType.DMA((2,)),                   # wsem
            pltpu.SemaphoreType.DMA((2,)),                   # wssem
            pltpu.SMEM((2,), jnp.int32),                     # cnt
        ],
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    fn = pl.pallas_call(
        _make_packed_kernel(n_codes, G, CS, nG, nP),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((packed.n_slots_pad * CS, Ppad),
                                 jnp.float32),
            jax.ShapeDtypeStruct((packed.n_slots_pad, 1, Ppad),
                                 jnp.int32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )
    return fn(packed.idxm, packed.idxg, tip_codes, bigtab, P1G, P2G)


class PackedSchedule:
    """Host-compiled G-packed level schedule (see update_partials_packed).

    Attributes: G, nG, idxm [nG*G, 6] (slot1, is_tip1, slot2, is_tip2,
    tip1, tip2), idxg [nG, 8] (out_base_slot, fence, any_tip1, any_tip2,
    contig1, start_slot1, contig2, start_slot2 — the last four drive the
    kernel's contiguous whole-side gather fast path), e1/e2 [nG*G] child
    edge ids (dummies -> edge 0), n_slots_pad, root_info (refs remapped
    to PADDED slots)."""

    def __init__(self, partition, tree, root_edge=None, group: int = 0):
        from pllmod_tpu.ops import clv as clv_mod
        ops, root_info = tree.traversal_ops(root_edge)
        sched = clv_mod.LevelSchedule(ops, partition.n_tips)
        n_tips = partition.n_tips
        CS = partition.n_cats * partition.states
        G = group or max(1, 128 // CS)
        self.G = G
        n_levels = len(sched.levels)

        # --- consumer-driven level reordering --------------------------
        # Each inner node has exactly ONE consumer (its parent's op).
        # Sorting every level by (consumer level, consumer group, side,
        # consumer member) makes each consumer group's side-k children a
        # CONSECUTIVE slot run, so the kernel can gather a whole group
        # side with ONE strided DMA instead of G.
        lvl_of_slot = np.empty(sched.n_slots, np.int64)
        for li, (arr, off) in enumerate(zip(sched.levels, sched.offsets)):
            lvl_of_slot[off:off + arr.shape[0]] = li
        # consumer[slot] = (level, row-within-level, side)
        consumer = {}
        for li, arr in enumerate(sched.levels):
            for r, row in enumerate(arr):
                for side, col in enumerate((1, 3)):
                    c = int(row[col])
                    if c >= n_tips:
                        consumer[c - n_tips] = (li, r, side)
        orders = [None] * n_levels
        pos_in_level = {}               # slot -> new row index in its level
        for li in reversed(range(n_levels)):
            arr = sched.levels[li]
            off = sched.offsets[li]
            W = arr.shape[0]
            if li == n_levels - 1:
                order = list(range(W))
            else:
                def key(r):
                    # root-edge endpoints have no consumer -> sort last
                    cl, crow, side = consumer.get(off + r,
                                                  (n_levels, r, 0))
                    cpos = pos_in_level.get((cl, crow), crow)
                    return (cl, cpos // G, side, cpos % G)
                order = sorted(range(W), key=key)
            orders[li] = order
            for newpos, r in enumerate(order):
                pos_in_level[(li, r)] = newpos
        # reorder the level arrays; remap row indices -> new positions
        new_levels = [sched.levels[li][orders[li]] for li in range(n_levels)]

        # padded slot numbering over the NEW order
        pad_remap = np.full(sched.n_slots, -1, np.int64)
        pad_off = 0
        pad_offsets = []
        for li, arr in enumerate(new_levels):
            W = arr.shape[0]
            off = sched.offsets[li]
            pad_offsets.append(pad_off)
            for newpos, r in enumerate(orders[li]):
                pad_remap[off + r] = pad_off + newpos
            pad_off += -(-W // G) * G
        self.n_slots_pad = pad_off

        idxm, idxg, e1s, e2s = [], [], [], []
        for li, arr in enumerate(new_levels):
            W = arr.shape[0]
            Wp = -(-W // G) * G
            c1 = np.concatenate([arr[:, 1], np.zeros(Wp - W, np.int64)])
            c2 = np.concatenate([arr[:, 3], np.zeros(Wp - W, np.int64)])
            ed1 = np.concatenate([arr[:, 2], np.zeros(Wp - W, np.int64)])
            ed2 = np.concatenate([arr[:, 4], np.zeros(Wp - W, np.int64)])
            it1 = (c1 < n_tips).astype(np.int64)
            it2 = (c2 < n_tips).astype(np.int64)
            slot1 = np.where(it1 == 1, 0, pad_remap[np.where(
                it1 == 1, 0, c1 - n_tips)])
            slot2 = np.where(it2 == 1, 0, pad_remap[np.where(
                it2 == 1, 0, c2 - n_tips)])
            idxm.append(np.stack([
                slot1, it1, slot2, it2,
                np.where(it1 == 1, c1, 0), np.where(it2 == 1, c2, 0),
            ], axis=1))
            e1s.append(ed1)
            e2s.append(ed2)
            for gi in range(Wp // G):
                sl = slice(gi * G, (gi + 1) * G)
                row = [
                    pad_offsets[li] + gi * G,
                    1 if (li > 0 and gi == 0) else 0,
                    1 if it1[sl].any() else 0,
                    1 if it2[sl].any() else 0,
                ]
                for it, slot in ((it1, slot1), (it2, slot2)):
                    full = (gi + 1) * G <= W
                    contig = (full and not it[sl].any()
                              and (np.diff(slot[sl]) == 1).all())
                    row += [1 if contig else 0,
                            int(slot[sl][0]) if contig else 0]
                idxg.append(row)
        self.idxm = jnp.asarray(np.concatenate(idxm).astype(np.int32))
        self.idxg = jnp.asarray(np.asarray(idxg, np.int32))
        self.e1 = jnp.asarray(np.concatenate(e1s).astype(np.int32))
        self.e2 = jnp.asarray(np.concatenate(e2s).astype(np.int32))
        self.nG = self.idxg.shape[0]
        self.contig_frac = float(
            np.asarray(self.idxg)[:, (4, 6)].mean())
        u, v, e = (int(x) for x in root_info)

        def remap(node):
            if node < n_tips:
                return int(node)
            return n_tips + int(pad_remap[sched.remap[node - n_tips]])

        self.root_info = (remap(u), remap(v), e)

    def key(self):
        """Hashable identity for jit static caching."""
        return (self.G, self.nG, self.n_slots_pad, self.root_info)


@partial(jax.jit, static_argnums=(2, 3))
def loglikelihood_packed(partition, brlens, packed, interpret: bool = False):
    """Full-tree logL through the node-packed megakernel."""
    P = partition.prob_matrices(brlens)
    clvs2d, sc2d = update_partials_packed(partition, P, packed,
                                          interpret=interpret)
    CS = partition.n_cats * partition.states
    clvs = clvs2d.reshape(packed.n_slots_pad, CS,
                          partition.n_patterns_padded)
    scalers = sc2d
    u, v, e = packed.root_info
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