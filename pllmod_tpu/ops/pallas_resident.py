"""VMEM-resident whole-traversal likelihood megakernel.

The fused HBM megakernel (:mod:`pllmod_tpu.ops.pallas_clv`) streams every
child CLV out of HBM and writes every result back — ~3 MB per node, and
the read chain measures at only ~370 GB/s effective (DMA-latency-bound;
PERF_NOTES.md).  But a pruning traversal consumes each inner CLV exactly
ONCE: under a Sethi-Ullman (register-need) evaluation order at most
~ceil(log2(n_taxa))+2 CLVs are live at any step
(:func:`pllmod_tpu.ops.clv.bounded_slot_ops`; the reference memory-saver
slot scheme: pll_tree.c:1509-1573).  At flagship shapes that whole live
set fits in VMEM.

This kernel keeps the live CLV set RESIDENT in VMEM scratch:

- grid = (pattern_tiles, nodes): nodes run the serial bounded schedule;
  pattern tiles are independent, so the slot scratch is simply reused
  per tile.
- inner-child reads and result writes are VMEM vector ops — no DMA at
  all; only int32 tip-code rows stream from HBM (one-step lookahead,
  and there are no RAW hazards so no fences anywhere).
- the final row is the ROOT PSEUDO-NODE (same paired-matrix trick as
  ``pallas_clv.compile_fused(fuse_root=True)``): the ordinary kernel
  step computes the per-category site product (f ⊙ clv_u)·(P_root@clv_v)
  and writes it — with the total cumulative scaler — straight to the
  kernel outputs.  No CLV buffer ever exists in HBM.

Per-eval HBM traffic on the flagship config (128 taxa × 16384 patterns
× GTR+Γ4): tip codes 8 MB + P12 blocks 2 MB/tile + 1 MB product out ≈
12 MB, vs ~380 MB for the HBM megakernel — the per-step serial chain
(dots + rescale + split casts) becomes the only cost.

Computes the edge log-likelihood ONLY (no CLV buffer is returned), so it
serves evaluation-style consumers: bench, treeinfo full evals, model-
optimization objectives, SPR rescoring.  BLO / ancestral / SPR directed
tables need all node CLVs and keep the HBM megakernel.

Reference scope: pll_update_partials + pll_compute_edge_loglikelihood
(SURVEY §3.1, the hot loop of every optimizer) in ONE kernel launch.
"""

from __future__ import annotations

import os as _os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pllmod_tpu.ops import clv as clv_mod
from pllmod_tpu.ops.pallas_clv import (
    _DOT_PREC,
    _root_pair,
    block_diag_pmats,
    fused_p12,
)


def resident_slot_bound(n_tips: int) -> int:
    """A topology-independent live-slot bound (Sethi-Ullman register
    need of a binary tree ≤ ⌈log2(n_leaves)⌉+1, +2 for the pinned root
    endpoints).  Passing this as ``n_slots_min`` keeps the jitted
    kernel's scratch shape fixed across topologies (tree search) so one
    executable serves every move."""
    return int(np.ceil(np.log2(max(n_tips, 2)))) + 3


def compile_resident(partition, tree, root_edge=None,
                     n_slots_min: int | None = None):
    """Host-side: compile a tree into the resident kernel's index rows.

    Runs :func:`clv.bounded_slot_ops` (Sethi-Ullman slot recycling, the
    reference's pll_tree.c:1509 slot scheme) over the pruning traversal,
    keeps its SERIAL order, and appends the root pseudo-node row.

    Returns (idx8 [n_inner+1, 8], e1, e2, n_slots); idx8 columns are
    (slot1, slot2, is_tip1, is_tip2, tip1, tip2, out_slot, is_root).
    """
    ops, root_info = tree.traversal_ops(root_edge)
    u, v, e = (int(x) for x in root_info)
    n_tips = partition.n_tips
    ops_np = np.asarray(ops)
    live = ops_np[ops_np[:, 0] >= 0]
    ops_b, n_slots, slot_map = clv_mod.bounded_slot_ops(
        live, n_tips, root_refs=(u, v))
    rows8, e1s, e2s = [], [], []
    for r in ops_b:
        out, c1, ee1, c2, ee2 = (int(x) for x in r)
        it1 = 1 if c1 < n_tips else 0
        it2 = 1 if c2 < n_tips else 0
        rows8.append([0 if it1 else c1 - n_tips,
                      0 if it2 else c2 - n_tips,
                      it1, it2,
                      c1 if it1 else 0, c2 if it2 else 0,
                      out, 0])
        e1s.append(ee1)
        e2s.append(ee2)

    def enc(ref):
        if ref < n_tips:
            return 0, 1, ref
        return slot_map[ref - n_tips], 0, 0

    s_u, it_u, t_u = enc(u)
    s_v, it_v, t_v = enc(v)
    rows8.append([s_u, s_v, it_u, it_v, t_u, t_v, 0, 1])
    e1s.append(0)
    e2s.append(e)
    if n_slots_min is not None:
        n_slots = max(n_slots, n_slots_min)
    return (jnp.asarray(np.asarray(rows8, np.int32)),
            jnp.asarray(np.asarray(e1s, np.int32)),
            jnp.asarray(np.asarray(e2s, np.int32)),
            n_slots)


# ---------------------------------------------------------------------------
# The production kernel: prefilled-assembly resident kernel.
#
# The v1 ablation (PERF_NOTES) put 31% of the step chain in the VPU
# copies that assemble the dot input from the slot scratch and 26% in
# the in-kernel one-hot tip expansion.  v2 removes both:
#  - the assembly buffer is double-buffered and PREFILLED one step ahead
#    by ASYNC local copies (VMEM->VMEM for inner children, HBM->VMEM of
#    pre-expanded tip rows for tips) issued after the predecessor's
#    result store — by the serial order every child value exists then,
#    so the copies always overlap the predecessor's compute;
#  - tips are expanded ONCE per partition on the host
#    (:func:`expanded_tip_planes`; exact — tip CLVs are 0/1, bf16 holds
#    them exactly) and stream in like inner rows.
# The assembly layout is CHILD-major ([lo1, hi1, lo2, hi2]) so one copy
# moves a whole child; the split packs are column-permuted to match
# (:func:`split_pack_cm`), with the main (hi-only) dot widened to K=4CS
# with zero blocks — free on the MXU for CS<=32 (K pads to 128).
# ---------------------------------------------------------------------------
def expanded_tip_planes(partition):
    """Pre-expanded tip CLV rows [n_tips, CS, Ppad] bf16 (exact: tip
    CLVs are 0/1 indicators — the PATTERN_TIP code table rows — and the
    C categories share them).  Built once per partition (host numpy);
    the v2 resident kernel streams these instead of expanding codes
    in-kernel.  Reference analog: the tipmap/tipchars expansion of
    pll_update_partials' tip-tip cases."""
    import ml_dtypes
    codes = np.asarray(partition.tip_states)                # [n_tips, Ppad]
    ctab = np.asarray(partition.code_clv, np.float32)       # [n_codes, S]
    C = partition.n_cats
    n_tips, Ppad = codes.shape
    S = ctab.shape[1]
    out = np.empty((n_tips, C * S, Ppad), ml_dtypes.bfloat16)
    for t in range(n_tips):
        rows = ctab[codes[t]].T                             # [S, Ppad]
        out[t] = np.tile(rows, (C, 1)).astype(ml_dtypes.bfloat16)
    return jnp.asarray(out)


def split_pack_cm(P12):
    """Child-major split packs [nW, 2CS, 8CS] = [corr | main] for the v2
    kernel's two DEFAULT dots over the child-major assembly
    [lo1, hi1, lo2, hi2]:
        corr = [Ph1 | Pl1 | Ph2 | Pl2]   (Ph@lo12 + Pl@hi12)
        main = [ 0  | Ph1 |  0  | Ph2]   (Ph@hi12; zero blocks pad K —
                                          free on the MXU for CS<=32)
    where Ph/Pl is the bf16 hi/lo split of the paired block-diagonal
    transition matrix and the index is the child block."""
    CS = P12.shape[1] // 2
    from pllmod_tpu.ops.pallas_clv import _bf16_residual
    Ph = P12.astype(jnp.bfloat16)
    Pl = _bf16_residual(P12)         # demotion-safe: see _bf16_residual
    z = jnp.zeros_like(Ph[:, :, :CS])
    corr = jnp.concatenate([Ph[:, :, :CS], Pl[:, :, :CS],
                            Ph[:, :, CS:], Pl[:, :, CS:]], axis=2)
    main = jnp.concatenate([z, Ph[:, :, :CS], z, Ph[:, :, CS:]], axis=2)
    return jnp.concatenate([corr, main], axis=2)


def split_pack_ip(P12):
    """Per-child split packs [nW, CS, 4CS] = [Ph1 | Pl1 | Ph2 | Pl2] for
    the IN-PLACE kernel variant: child k's correction dot is
    pack[:, 2kCS:(2k+2)CS] @ [lo_k; hi_k] (= Ph@lo + Pl@hi) and its main
    dot reuses the Ph slice pack[:, 2kCS:(2k+1)CS] @ hi_k — no column
    duplication, half the pack rows of :func:`split_pack_cm`."""
    CS = P12.shape[1] // 2
    from pllmod_tpu.ops.pallas_clv import _bf16_residual
    Ph = P12.astype(jnp.bfloat16)
    Pl = _bf16_residual(P12)         # demotion-safe: see _bf16_residual
    return jnp.concatenate([Ph[:, :CS, :CS], Pl[:, :CS, :CS],
                            Ph[:, CS:, CS:], Pl[:, CS:, CS:]], axis=2)


def _make_resident_kernel_ip(nW: int, nP: int, NS: int):
    """IN-PLACE variant (split storage only): each child is dotted
    straight from its VMEM slot — no assembly copies at all. Tip rows DMA
    into 4 staging SLOT rows (double-buffered × child; lo halves zeroed
    once per pattern tile), so the dot operand is uniformly
    ``slots[opk]`` with ``opk = is_tip ? NS+2buf+k : idx[w,k]``.

    Trade measured against the prefilled-assembly kernel (PERF_NOTES):
    +2 DEFAULT dot fixed costs per step, −(one [2CS,T] VPU copy per
    inner child + per-step tip lo zero-stores)."""
    def _kernel(idx_ref,            # prefetch [nW, 8] int32
                tip_hi_ref,         # ANY [n_tips, CS, Ppad] bf16
                Pip_ref,            # VMEM block [1, CS, 4CS] bf16
                prod_ref,           # VMEM out block [CS, T] f32
                rsc_ref,            # VMEM out block [1, T] int32
                slots, ssc, rsem):
        p = pl.program_id(0)
        w = pl.program_id(1)
        CS = prod_ref.shape[0]
        T = prod_ref.shape[-1]
        two = jnp.asarray(2, jnp.int32)
        nW_j = jnp.asarray(nW, jnp.int32)
        step = (p * nW + w).astype(jnp.int32)

        def reads(st, start):
            wt = jax.lax.rem(st, nW_j)
            pt = st // nW_j
            bf = jax.lax.rem(st, two)
            for k in (0, 1):
                is_tip = idx_ref[2 + k, wt] == 1
                tip = idx_ref[4 + k, wt]

                @pl.when(is_tip)
                def _(tip=tip, k=k, bf=bf, pt=pt):
                    c = pltpu.make_async_copy(
                        tip_hi_ref.at[tip, :, pl.ds(pt * T, T)],
                        slots.at[NS + 2 * bf + k, pl.ds(CS, CS)],
                        rsem.at[bf, k])
                    c.start() if start else c.wait()

        @pl.when(w == 0)
        def _():
            # staging lo halves are zero (tips are exact in bf16); they
            # are only ever READ, so zero once per pattern tile
            for r in range(4):
                slots[NS + r, :CS] = jnp.zeros((CS, T), jnp.bfloat16)

        @pl.when(step == 0)
        def _():
            reads(step, True)

        reads(step, False)

        @pl.when(step + 1 < nW * nP)
        def _():
            reads(step + 1, True)

        buf = jax.lax.rem(step, two)
        is_tip1 = idx_ref[2, w] == 1
        is_tip2 = idx_ref[3, w] == 1

        def child(k, is_tip):
            opk = jnp.where(is_tip, NS + 2 * buf + k, idx_ref[k, w])
            ch = slots[opk]                               # [2CS, T] bf16
            corr = jax.lax.dot_general(
                Pip_ref[0, :, 2 * k * CS:(2 * k + 2) * CS], ch,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            main = jax.lax.dot_general(
                Pip_ref[0, :, 2 * k * CS:(2 * k + 1) * CS], ch[CS:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            return main + corr

        prod = child(0, is_tip1) * child(1, is_tip2)

        zero_s = jnp.zeros((1, T), jnp.int32)
        s1 = jnp.where(is_tip1, zero_s, ssc[idx_ref[0, w]])
        s2 = jnp.where(is_tip2, zero_s, ssc[idx_ref[1, w]])

        # exact power-of-two rescale (identical to the XLA engines)
        m = jnp.max(prod, axis=0, keepdims=True)
        mi = jax.lax.bitcast_convert_type(m, jnp.int32)
        e = ((mi >> 23) & 0xFF) - 126
        e = jnp.where(m > 0, e, 0)
        e = jnp.clip(e, -125, 127)
        scale = jax.lax.bitcast_convert_type(
            ((127 - e) << 23).astype(jnp.int32), jnp.float32)
        scaled = prod * scale
        stot = s1 + s2 + e

        is_root = w == nW - 1

        @pl.when(jnp.logical_not(is_root))
        def _():
            out = idx_ref[6, w]
            oh = scaled.astype(jnp.bfloat16)
            slots[out, :CS] = (scaled - oh.astype(jnp.float32)).astype(
                jnp.bfloat16)
            slots[out, CS:] = oh
            ssc[out] = stot

        @pl.when(is_root)
        def _():
            prod_ref[...] = scaled
            rsc_ref[...] = stot

    return _kernel


def _pick_tile_resident(P: int, CS: int, NS: int, split: bool) -> int:
    """VMEM working set of the v2 kernel: NS slots ([2CS,T] bf16 split /
    [CS,T] f32 plain) + double-buffered assembly + tip staging (plain) +
    scalers + output blocks, under ~10 MB."""
    if split:
        per_t = NS * 2 * CS * 2 + 2 * 4 * CS * 2
    else:
        per_t = NS * CS * 4 + 2 * 2 * CS * 4 + 2 * 2 * CS * 2
    per_t += NS * 4 + CS * 4 + 8
    budget = 10 * 1024 * 1024
    cap = max(128, min(P, budget // per_t))
    tile_env = _os.environ.get("PLLMOD_RESIDENT_TILE")
    if tile_env:
        cap = max(128, min(cap, int(tile_env)))
    for t in range(cap - cap % 128, 127, -128):
        if P % t == 0:
            return t
    return 128


def _make_resident_kernel(nW: int, nP: int, split: bool,
                             probe: str = ""):
    """v2 step: wait the tip-row DMAs (prefetched one step ahead — tip
    rows are pure inputs, so prefetch is ALWAYS safe, no dependency
    tracking), VPU-copy inner children from the slot scratch into the
    assembly (child-major: ONE contiguous [2CS,T] copy per child), run
    the child dots, rescale, store into the out slot.

    Measured design notes (PERF_NOTES): prefilling the INNER children by
    async VMEM->VMEM copies is a dead end — a node's latest child
    completes at step-1 in post-order, so its copy gets zero overlap,
    and the copies contend for the same DMA engines as the tip reads
    (v2-async variant measured 0.81 ms vs 0.68 hybrid on the flagship).
    The in-kernel one-hot tip expansion of v1 (26% of the step chain) is
    what this version removes.

    ``probe`` (timing-only ablations, wrong results): subset of
    {"norescale", "nocast", "nodot", "nozero", "noasm"}."""
    probes = set(probe.split(",")) if probe else set()
    store = split is True                  # bf16x2 split STORAGE

    def _kernel(idx_ref,            # prefetch [nW, 8] int32
                tip_hi_ref,         # ANY [n_tips, CS, Ppad] bf16
                P12_ref,            # VMEM block [1, 2CS, 8CS or 2CS]
                prod_ref,           # VMEM out block [CS, T] f32
                rsc_ref,            # VMEM out block [1, T] int32
                slots, ssc, asm, stage, rsem):
        p = pl.program_id(0)
        w = pl.program_id(1)
        CS = asm.shape[1] // (4 if store else 2)
        T = asm.shape[-1]
        two = jnp.asarray(2, jnp.int32)
        nW_j = jnp.asarray(nW, jnp.int32)
        step = (p * nW + w).astype(jnp.int32)

        # -- tip-row reads with one-step lookahead. Destination: the hi
        # rows of the (double-buffered) assembly in split mode, the cast
        # staging buffer in plain mode.
        def reads(st, start):
            wt = jax.lax.rem(st, nW_j)
            pt = st // nW_j
            bf = jax.lax.rem(st, two)
            for k in (0, 1):
                is_tip = idx_ref[2 + k, wt] == 1
                tip = idx_ref[4 + k, wt]

                @pl.when(is_tip)
                def _(tip=tip, k=k, bf=bf, pt=pt):
                    if store:
                        dst = asm.at[bf, pl.ds((2 * k + 1) * CS, CS)]
                    else:
                        dst = stage.at[bf, k]
                    c = pltpu.make_async_copy(
                        tip_hi_ref.at[tip, :, pl.ds(pt * T, T)],
                        dst, rsem.at[bf, k])
                    c.start() if start else c.wait()

        @pl.when(step == 0)
        def _():
            reads(step, True)

        reads(step, False)

        @pl.when(step + 1 < nW * nP)
        def _():
            reads(step + 1, True)

        buf = jax.lax.rem(step, two)
        is_tip1 = idx_ref[2, w] == 1
        is_tip2 = idx_ref[3, w] == 1

        for k, is_tip in ((0, is_tip1), (1, is_tip2)):
            @pl.when(is_tip)
            def _(k=k):
                if store:
                    if "nozero" not in probes:
                        # tip lo rows are zero (bf16 tips are exact)
                        asm[buf, 2 * k * CS:(2 * k + 1) * CS] = jnp.zeros(
                            (CS, T), jnp.bfloat16)
                else:
                    asm[buf, k * CS:(k + 1) * CS] = stage[
                        buf, k].astype(jnp.float32)

            @pl.when(jnp.logical_not(is_tip))
            def _(k=k):
                if "noasm" in probes:
                    return
                slot = idx_ref[k, w]
                if store:
                    # child-major slot rows [lo, hi]: ONE contiguous copy
                    asm[buf, 2 * k * CS:(2 * k + 2) * CS] = slots[slot]
                else:
                    asm[buf, k * CS:(k + 1) * CS] = slots[slot]

        zero_s = jnp.zeros((1, T), jnp.int32)
        s1 = jnp.where(is_tip1, zero_s, ssc[idx_ref[0, w]])
        s2 = jnp.where(is_tip2, zero_s, ssc[idx_ref[1, w]])

        if "nodot" in probes:
            lr = asm[buf, :2 * CS, :].astype(jnp.float32)
        elif store:
            call = asm[buf]                      # [4CS, T] child-major
            corr = jax.lax.dot_general(
                P12_ref[0, :, :4 * CS], call, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            main = jax.lax.dot_general(
                P12_ref[0, :, 4 * CS:], call,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            lr = main + corr
        elif split == "read":
            # READ-TIME split (wide-state mode): f32 assembly, hi/lo
            # bf16 casts per step, three single-pass DEFAULT dots
            # (Ph@hi + Ph@lo + Pl@hi; Pl@lo ~2^-18 dropped)
            c12 = asm[buf]                       # [2CS, T] f32
            hi = c12.astype(jnp.bfloat16)
            lo = (c12 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            pack = P12_ref[0]                    # [2CS, 4CS] bf16
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
        else:
            lr = jax.lax.dot_general(
                P12_ref[0], asm[buf], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_DOT_PREC)
        prod = lr[:CS, :] * lr[CS:, :]

        if "norescale" in probes:
            scaled = prod
            stot = s1 + s2
        else:
            # exact power-of-two rescale (identical to the XLA engines)
            m = jnp.max(prod, axis=0, keepdims=True)
            mi = jax.lax.bitcast_convert_type(m, jnp.int32)
            e = ((mi >> 23) & 0xFF) - 126
            e = jnp.where(m > 0, e, 0)
            e = jnp.clip(e, -125, 127)
            scale = jax.lax.bitcast_convert_type(
                ((127 - e) << 23).astype(jnp.int32), jnp.float32)
            scaled = prod * scale
            stot = s1 + s2 + e

        is_root = w == nW - 1

        @pl.when(jnp.logical_not(is_root))
        def _():
            out = idx_ref[6, w]
            if store:
                oh = scaled.astype(jnp.bfloat16)
                if "nocast" in probes:
                    slots[out, CS:] = oh
                else:
                    slots[out, :CS] = (scaled - oh.astype(
                        jnp.float32)).astype(jnp.bfloat16)
                    slots[out, CS:] = oh
            else:
                slots[out] = scaled
            ssc[out] = stot

        @pl.when(is_root)
        def _():
            prod_ref[...] = scaled
            rsc_ref[...] = stot

    return _kernel


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def loglikelihood_resident(partition, idx8, brlens, e12, tip_hi,
                            n_slots: int, interpret: bool = False,
                            split: bool = True, _probe: str = "",
                            inplace: bool | None = None):
    """Full-tree edge logL through the v2 (prefilled-assembly) resident
    kernel.  Same contract as :func:`loglikelihood_resident` plus
    ``tip_hi`` = :func:`expanded_tip_planes` of the partition (build it
    once per partition; it is model-parameter- and topology-invariant).

    ``split``: False (exact-HIGHEST dot), True (bf16x2 split storage,
    fast 2-dot — small state counts) or "read" (f32 storage + read-time
    hi/lo casts + 3 dots — the wide-state mode, states > 8).

    ``inplace`` (split mode only; default = PLLMOD_RESIDENT_INPLACE env,
    off): per-child dots straight from the slot scratch instead of the
    prefilled assembly — see :func:`_make_resident_kernel_ip`."""
    from pllmod_tpu.ops import likelihood as lk_mod
    e1, e2 = e12
    Ppad = partition.n_patterns_padded
    C, S = partition.n_cats, partition.states
    CS = C * S
    nW = int(idx8.shape[0])

    if partition.reversible and partition.eigen_lam is not None:
        P12 = fused_p12(partition, brlens, e1[:-1], e2[:-1])
        from pllmod_tpu.ops.pallas_clv import p_edge_from_eigen
        P_root = p_edge_from_eigen(partition, jnp.take(brlens, e2[-1]))
    else:
        P = partition.prob_matrices(brlens)
        Pbd = block_diag_pmats(P.astype(jnp.float32))
        P12 = jnp.zeros((nW - 1, 2 * CS, 2 * CS), jnp.float32)
        P12 = P12.at[:, :CS, :CS].set(Pbd[e1[:-1]])
        P12 = P12.at[:, CS:, CS:].set(Pbd[e2[:-1]])
        P_root = jnp.take(P, e2[-1], axis=0)
    P12 = jnp.concatenate([P12, _root_pair(partition, P_root)])
    if inplace is None:
        inplace = bool(int(_os.environ.get("PLLMOD_RESIDENT_INPLACE", "0")))
    store = split is True
    inplace = inplace and store
    if inplace:
        P12 = split_pack_ip(P12)
        prow, pwidth = CS, 4 * CS
    elif store:
        P12 = split_pack_cm(P12)
        prow, pwidth = 2 * CS, 8 * CS
    elif split == "read":
        # f32 slots/assembly; [Ph | Pl] pack for the 3-dot read-time
        # split (see _make_resident_kernel)
        from pllmod_tpu.ops.pallas_clv import split_pack_p12
        P12 = split_pack_p12(P12)
        prow, pwidth = 2 * CS, 4 * CS
    else:
        prow, pwidth = 2 * CS, 2 * CS

    NS = max(n_slots, 1)
    T = _pick_tile_resident(Ppad, CS, NS + (4 if inplace else 0), store)
    nP = Ppad // T
    if inplace:
        scratch_shapes = [
            pltpu.VMEM((NS + 4, 2 * CS, T), jnp.bfloat16),  # slots+staging
            pltpu.VMEM((NS, 1, T), jnp.int32),              # ssc
            pltpu.SemaphoreType.DMA((2, 2)),                # rsem
        ]
        kernel = _make_resident_kernel_ip(nW, nP, NS)
    else:
        scratch_shapes = [
            (pltpu.VMEM((NS, 2 * CS, T), jnp.bfloat16) if store
             else pltpu.VMEM((NS, CS, T), jnp.float32)),   # slots
            pltpu.VMEM((NS, 1, T), jnp.int32),             # ssc
            (pltpu.VMEM((2, 4 * CS, T), jnp.bfloat16) if store
             else pltpu.VMEM((2, 2 * CS, T), jnp.float32)),  # asm
            # tip staging (cast to f32 at use) — plain/"read" modes only
            (pltpu.VMEM((1, 1, 8, 128), jnp.bfloat16) if store
             else pltpu.VMEM((2, 2, CS, T), jnp.bfloat16)),
            pltpu.SemaphoreType.DMA((2, 2)),               # rsem
        ]
        kernel = _make_resident_kernel(nW, nP, split, _probe)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nP, nW),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # tip_hi
            pl.BlockSpec((1, prow, pwidth),
                         lambda p, w, idx: (w, 0, 0)),   # P12 packs
        ],
        out_specs=[
            pl.BlockSpec((CS, T), lambda p, w, idx: (0, p)),
            pl.BlockSpec((1, T), lambda p, w, idx: (0, p)),
        ],
        scratch_shapes=scratch_shapes,
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((CS, Ppad), jnp.float32),
            jax.ShapeDtypeStruct((1, Ppad), jnp.int32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )
    prod, rsc = fn(idx8.T, tip_hi, P12)
    per_cat = prod.astype(partition.dtype).reshape(C, S, -1).sum(axis=1)
    lnl = lk_mod._site_lnl(partition, per_cat.T, rsc[0])
    return jnp.sum(lnl * partition.pattern_weights)
