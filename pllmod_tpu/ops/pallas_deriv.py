"""Fused Pallas kernels for the branch-length derivative pipeline.

TPU production path for the reference's second hot loop (SURVEY.md §3.2):
``pll_update_sumtable`` + ``pll_compute_likelihood_derivatives``
(call sites pll_optimize.c:1462-1475, 1223-1287). The XLA formulation in
:mod:`pllmod_tpu.ops.derivatives` + :func:`pllmod_tpu.optimize.blo._edge_sumtables`
stays the golden reference (and the f64/CPU path); these kernels compute
the same quantities but straight from the megakernel's CS×P (optionally
split-storage bf16x2) directed-CLV buffers:

* **sumtable kernel** — grid (edges, pattern tiles); per edge DMAs the two
  facing CLV rows (manual double-buffered reads with one-step lookahead —
  pure streaming, no fences needed because nothing is written back to the
  buffer), expands tip children in-VMEM via the exact one-hot MXU dot,
  applies the paired block-diagonal basis  blockdiag(Vᵀdiag(π), V⁻¹)  in
  ONE [2CS,2CS]@[2CS,T] HIGHEST dot and writes  st = left ⊙ right.
  Replaces: csp→standard layout conversion (750 MB of traffic at the
  flagship) + two gather HLOs + two einsums (measured 13.1 ms → target
  ~roofline of one 0.5 GB read).

* **derivative kernel** — grid (edges, pattern tiles); reads st once and
  emits per-edge (logL, d logL/dt, d² logL/dt²) with the scaler/p-inv
  log-space mixture of :func:`pllmod_tpu.ops.derivatives.edge_derivatives`.
  The per-edge exponential weights exp(λ·r·t) are tiny [E, CS] arrays
  computed outside in XLA, so one kernel serves every Newton iteration.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pllmod_tpu.ops.clv import LN2
from pllmod_tpu.ops.pallas_clv import (_code_table, _pick_tile_fused,
                                       _EXPAND_PREC)

_PREC = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# host-side compilation
# ---------------------------------------------------------------------------
def compile_edge_refs(edge_ref, edge_mask, n_tips: int):
    """Pack a DirectedTraversal's ``edge_ref`` [E, 2] into the kernel's
    [E, 6] int32 rows (slot1, slot2, is_tip1, is_tip2, tip1, tip2) —
    same column convention as the megakernel's idx8[:, :6]. Dead edge
    slots become tip0/tip0 dummies (mask downstream)."""
    return jnp.asarray(compile_edge_refs_np(edge_ref, edge_mask, n_tips))


def compile_edge_refs_np(edge_ref, edge_mask, n_tips: int):
    """Host-only :func:`compile_edge_refs` (callers batching many tables
    stack and upload once — a device_put per table costs a ~40 ms
    tunnel round trip on the remote runtime)."""
    edge_ref = np.asarray(edge_ref)
    edge_mask = np.asarray(edge_mask)
    E = edge_ref.shape[0]
    out = np.zeros((E, 6), np.int64)
    out[:, 2] = out[:, 3] = 1                      # dummy: tip/tip
    for e in range(E):
        if not edge_mask[e]:
            continue
        for k in (0, 1):
            r = int(edge_ref[e, k])
            if r < n_tips:
                out[e, k] = 0
                out[e, 2 + k] = 1
                out[e, 4 + k] = r
            else:
                out[e, k] = r - n_tips
                out[e, 2 + k] = 0
                out[e, 4 + k] = 0
    return out.astype(np.int32)


def sumtable_basis(partition, eigen=None):
    """Paired block-diagonal sumtable basis AB [2CS, 2CS] f32:
    top-left  blockdiag_c(A_c),  A_c[k, i] = π_c[i]·V_c[i, k]
    bottom-right blockdiag_c(V⁻¹_c)
    so that  [left; right] = AB @ [clv_p; clv_c]  and  st = left ⊙ right
    (the factorization of ops/derivatives.sumtable)."""
    if eigen is None:
        eigen = partition.eigen()
    _, V, Vinv = eigen
    pidx = partition.param_indices
    V_c = V[pidx].astype(jnp.float32)              # [C,S,S]
    Vinv_c = Vinv[pidx].astype(jnp.float32)
    pi_c = partition.freqs_per_cat().astype(jnp.float32)   # [C,S]
    A_c = jnp.einsum("cik,ci->cki", V_c, pi_c, precision=_PREC)
    C = partition.n_cats
    S = partition.states
    CS = C * S
    AB = jnp.zeros((2 * CS, 2 * CS), jnp.float32)
    for c in range(C):
        o = c * S
        AB = AB.at[o:o + S, o:o + S].set(A_c[c])
        AB = AB.at[CS + o:CS + o + S, CS + o:CS + o + S].set(Vinv_c[c])
    return AB


# ---------------------------------------------------------------------------
# sumtable kernel
# ---------------------------------------------------------------------------
def _make_sumtable_kernel(n_codes: int, nE: int, nP: int, split: bool):
    def _kernel(eref_ref,          # prefetch [nE, 6] int32
                tip_codes_ref,     # ANY [n_tips, 1, Ppad] int32
                codetab_ref,       # VMEM [CS, n_codes_pad] f32
                AB_ref,            # VMEM block [2CS, 2CS] f32
                clvs_ref,          # ANY [n_slots, (2,) CS, Ppad]
                sc_in_ref,         # ANY [n_slots, 1, Ppad] int32
                st_ref,            # out block [1, CS, T] f32
                sc_out_ref,        # out block [1, 1, T] int32
                c_scr, codes_scr, s_scr, rsem):
        e = pl.program_id(0)
        p = pl.program_id(1)
        CS = st_ref.shape[-2]
        T = st_ref.shape[-1]
        two = jnp.asarray(2, jnp.int32)
        step = (e * nP + p).astype(jnp.int32)
        par = jax.lax.rem(step, two)

        # pure streaming reads: double-buffered, one-step lookahead, no
        # fences (inputs are never written by this kernel)
        def reads(st, start):
            et = st // nP
            pt = jax.lax.rem(st, jnp.asarray(nP, jnp.int32))
            bf = jax.lax.rem(st, two)
            nsem = 3 if split else 2
            for k in (0, 1):
                sem = nsem * k
                slot = eref_ref[k, et]
                is_tip = eref_ref[2 + k, et] == 1
                tip = eref_ref[4 + k, et]

                @pl.when(is_tip)
                def _(slot=slot, tip=tip, k=k, sem=sem, bf=bf, pt=pt):
                    c = pltpu.make_async_copy(
                        tip_codes_ref.at[tip, :, pl.ds(pt * T, T)],
                        codes_scr.at[bf, k], rsem.at[bf, sem])
                    c.start() if start else c.wait()

                @pl.when(jnp.logical_not(is_tip))
                def _(slot=slot, k=k, sem=sem, bf=bf, pt=pt):
                    if split:
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
                    c2 = pltpu.make_async_copy(
                        sc_in_ref.at[slot, :, pl.ds(pt * T, T)],
                        s_scr.at[bf, k], rsem.at[bf, sc_sem])
                    c2.start() if start else c2.wait()

        @pl.when(step == 0)
        def _():
            reads(step, True)

        reads(step, False)
        nxt = step + 1

        @pl.when(nxt < nE * nP)
        def _():
            reads(nxt, True)

        buf = par
        is_tip1 = eref_ref[2, e] == 1
        is_tip2 = eref_ref[3, e] == 1

        def expand(k, is_tip):
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
                if split:
                    c_scr[buf, 1, k] = exp.astype(jnp.bfloat16)
                    c_scr[buf, 0, k] = jnp.zeros((CS, T), jnp.bfloat16)
                else:
                    c_scr[buf, k] = exp

        expand(0, is_tip1)
        expand(1, is_tip2)

        if split:
            call = (c_scr[buf, 0].astype(jnp.float32) +
                    c_scr[buf, 1].astype(jnp.float32)).reshape(2 * CS, T)
        else:
            call = c_scr[buf].reshape(2 * CS, T)
        lr = jax.lax.dot_general(
            AB_ref[...], call, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC)
        st_ref[0] = lr[:CS, :] * lr[CS:, :]

        zero_s = jnp.zeros((1, T), jnp.int32)
        s1 = jnp.where(is_tip1, zero_s, s_scr[buf, 0])
        s2 = jnp.where(is_tip2, zero_s, s_scr[buf, 1])
        sc_out_ref[0] = s1 + s2

    return _kernel


def edge_sumtables_pallas(partition, clvs, scalers, eref6,
                          split: bool = False, interpret: bool = False,
                          AB=None):
    """Batched per-edge sumtables straight from CS×P directed-CLV buffers.

    Args:
      clvs: [n_slots, CS, Ppad] f32 or split [n_slots, 2, CS, Ppad] bf16
        (the megakernel's native layouts — NO csp_to_standard conversion)
      scalers: [n_slots, 1, Ppad] int32 cumulative
      eref6: [E, 6] int32 from :func:`compile_edge_refs`
    Returns:
      (st [E, CS, Ppad] f32, sc [E, 1, Ppad] int32)
    """
    Ppad = partition.n_patterns_padded
    CS = partition.n_cats * partition.states
    codetab, n_codes = _code_table(partition)
    tip_codes = partition.tip_states[:, None, :].astype(jnp.int32)
    if AB is None:
        AB = sumtable_basis(partition)
    nE = eref6.shape[0]
    TILE_P = _pick_tile_fused(Ppad, CS)
    nP = Ppad // TILE_P
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nE, nP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # tip_codes
            pl.BlockSpec(memory_space=pltpu.VMEM),         # codetab
            pl.BlockSpec((2 * CS, 2 * CS), lambda e, p, er: (0, 0)),  # AB
            pl.BlockSpec(memory_space=pl.ANY),             # clvs
            pl.BlockSpec(memory_space=pl.ANY),             # scalers
        ],
        out_specs=[
            pl.BlockSpec((1, CS, TILE_P), lambda e, p, er: (e, 0, p)),
            pl.BlockSpec((1, 1, TILE_P), lambda e, p, er: (e, 0, p)),
        ],
        scratch_shapes=[
            (pltpu.VMEM((2, 2, 2, CS, TILE_P), jnp.bfloat16) if split
             else pltpu.VMEM((2, 2, CS, TILE_P), jnp.float32)),  # c_scr
            pltpu.VMEM((2, 2, 1, TILE_P), jnp.int32),     # codes_scr
            pltpu.VMEM((2, 2, 1, TILE_P), jnp.int32),     # s_scr
            pltpu.SemaphoreType.DMA((2, 6 if split else 4)),  # rsem
        ],
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    fn = pl.pallas_call(
        _make_sumtable_kernel(n_codes, nE, nP, split),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nE, CS, Ppad), jnp.float32),
            jax.ShapeDtypeStruct((nE, 1, Ppad), jnp.int32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )
    # column-major prefetch: Mosaic pads SMEM rows to 128 lanes, so the
    # row-major [nE, 6] layout costs 512 B/row and overflows the 1 MiB
    # SMEM budget at ~2k rows (≥1k-taxon trees)
    return fn(eref6.T, tip_codes, codetab, AB, clvs, scalers)


# ---------------------------------------------------------------------------
# derivative kernel
# ---------------------------------------------------------------------------
def _make_deriv_kernel(nP: int):
    def _kernel(st_ref,            # block [1, CS, T] f32
                sc_ref,            # block [1, 1, T] int32
                emul_ref,          # block [1, 8, CS] f32
                lnB_ref,           # block [1, 1, T] f32
                pw_ref,            # block [1, 1, T] f32
                out_ref):          # block [1, 1, 128] f32 (accumulated)
        p = pl.program_id(1)
        st = st_ref[0]                                  # [CS, T]
        rows = jax.lax.dot_general(
            emul_ref[0], st, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC)  # [8, T]
        L = rows[0:1, :]
        dL = rows[1:2, :]
        ddL = rows[2:3, :]
        tiny = jnp.asarray(1e-37, jnp.float32)
        Lsafe = jnp.maximum(L, tiny)
        ln_a = jnp.log(Lsafe) + sc_ref[0].astype(jnp.float32) * LN2
        ln_b = lnB_ref[0]                               # [1, T]
        mx = jnp.maximum(ln_a, ln_b)
        site_lnl = mx + jnp.log1p(jnp.exp(-jnp.abs(ln_a - ln_b)))
        frac = jnp.exp(ln_a - site_lnl)
        r1 = frac * dL / Lsafe
        site_ddf = frac * ddL / Lsafe - r1 * r1
        w = pw_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = (jnp.where(lane == 0, jnp.sum(site_lnl * w), 0.0) +
               jnp.where(lane == 1, jnp.sum(r1 * w), 0.0) +
               jnp.where(lane == 2, jnp.sum(site_ddf * w), 0.0))

        @pl.when(p == 0)
        def _():
            out_ref[0] = row

        @pl.when(p != 0)
        def _():
            out_ref[0] = out_ref[0] + row

    return _kernel


def deriv_coeffs(partition, t, eigen=None):
    """Per-edge exponential weight rows for the derivative kernel:
    emul [E, 8, CS] f32, rows (w·e^{λrt}, w·λr·e^{λrt}, w·(λr)²·e^{λrt},
    0...) with w = rate_weight·(1−p_c) per category (the libpll effective
    weights; ops/derivatives.edge_derivatives). The t-independent
    (λr, w) pieces are shared with the fused Newton kernel
    (:func:`_lam_weight_rows`)."""
    rows = _lam_weight_rows(partition, eigen)[0]        # [8, CS]
    lr_f = rows[0:1]                                    # [1, CS]
    w_f = rows[1:2]
    t32 = jnp.asarray(t, jnp.float32)
    expo = jnp.exp(t32[:, None] * lr_f)                 # [E, CS]
    r0 = w_f * expo
    emul = jnp.stack([r0, r0 * lr_f, r0 * lr_f * lr_f], axis=1)
    return jnp.pad(emul, ((0, 0), (0, 5), (0, 0)))      # [E, 8, CS]


def invar_log_plane(partition):
    """Constant per-partition p-inv mixture term B (log space, −1e30 for
    B=0) as a [1, 1, Ppad] f32 plane (ops/derivatives.edge_derivatives)."""
    pidx = partition.param_indices
    pinv_c = partition.prop_invar[pidx]
    inv_pc = jnp.einsum("ps,cs->pc", partition.inv_indicator,
                        partition.freqs_per_cat(), precision=_PREC)
    B = jnp.einsum("pc,c->p", inv_pc,
                   partition.rate_weights * pinv_c, precision=_PREC)
    lnB = jnp.where(B > 0, jnp.log(jnp.maximum(B, 1e-37)), -1e30)
    return lnB.astype(jnp.float32)[None, None, :]


def edge_derivatives_pallas(partition, st, sc, t, eigen=None,
                            lnB=None, interpret: bool = False):
    """(logL, df, ddf) per edge from pallas sumtables — one st read total.

    Args:
      st: [E, CS, Ppad] f32, sc: [E, 1, Ppad] int32 (edge_sumtables_pallas)
      t: [E] branch lengths (traced — fine inside Newton iterations)
    Returns (lnl [E], df [E], ddf [E]) f32."""
    E, CS, Ppad = st.shape
    emul = deriv_coeffs(partition, t, eigen)
    if lnB is None:
        lnB = invar_log_plane(partition)
    pw = partition.pattern_weights.astype(jnp.float32)[None, None, :]
    TILE_P = _pick_tile_fused(Ppad, CS)
    nP = Ppad // TILE_P
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    fn = pl.pallas_call(
        _make_deriv_kernel(nP),
        grid=(E, nP),
        in_specs=[
            pl.BlockSpec((1, CS, TILE_P), lambda e, p: (e, 0, p)),
            pl.BlockSpec((1, 1, TILE_P), lambda e, p: (e, 0, p)),
            pl.BlockSpec((1, 8, CS), lambda e, p: (e, 0, 0)),
            pl.BlockSpec((1, 1, TILE_P), lambda e, p: (0, 0, p)),
            pl.BlockSpec((1, 1, TILE_P), lambda e, p: (0, 0, p)),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda e, p: (e, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((E, 1, 128), jnp.float32),
        compiler_params=compiler_params,
        interpret=interpret,
    )
    out = fn(st, sc, emul, lnB, pw)
    return out[:, 0, 0], out[:, 0, 1], out[:, 0, 2]


# ---------------------------------------------------------------------------
# fused per-edge Newton kernel
# ---------------------------------------------------------------------------
def _make_newton_kernel(max_iters: int, n_parts: int = 1):
    """Whole bracketed Newton optimization of ONE edge per grid step,
    with the edge's full sumtable row(s) RESIDENT in VMEM: the iterative
    formulation re-reads st [E, CS, Ppad] every iteration (the measured
    bound of the BLO sweep: ~0.72 ms/iteration = one 265 MB read at the
    flagship), while each edge's Newton problem is independent given the
    directed CLVs — so all iterations of an edge can run against one
    read of its row. Update rules are EXACTLY
    :func:`pllmod_tpu.optimize.newton.minimize_newton_multi`
    (reference: pllmod_opt_minimize_newton_multi, opt_algorithms.c:
    133-261): bracket [xl, xh], step clamp (xmax-xmin)/max_iters,
    bisection fallback when not concave or out of bracket, freeze on
    convergence + per-edge EARLY EXIT (scalar scf.while). Per-site math
    = :func:`_make_deriv_kernel`.

    ``n_parts > 1`` is the multi-partition variant (reference:
    utree_derivative_func_multi, pll_optimize.c:1223-1287): per-partition
    (lnl, df, ddf) are summed per iteration. The SCALED-mode chain rule
    (df·s, ddf·s², pll_optimize.c:1249-1267) is folded into each
    partition's λr rows by the caller (lr' = s·λ·r_c, so the emul dot
    against the st computed at b·s differentiates w.r.t. the SHARED b).

    MEASURED DEAD END (do not re-try): batching G edges per grid step
    into one block-diagonal [8G, G·CS]@[G·CS, T] dot made the stage
    SLOWER (G=4: 4.79 vs 3.72 ms at the flagship) — the per-iteration
    dot is bound by feeding the st operand bytes from VMEM through the
    MXU, which grouping leaves unchanged, and it costs the per-edge
    early exit (Mosaic legalizes only SCALAR scf.while carries; vector
    state forces a fixed-trip fori)."""
    def _kernel(*refs):
        # per partition k: st_k [1,CS_k,P_k] f32, sc_k [1,1,P_k] int32,
        #   lw_k [1,8,CS_k] f32 (rows: lr·s, w), lnB_k [1,1,P_k] f32,
        #   pw_k [1,1,P_k] f32
        # then: t0 [1,1,128] f32 (lane 0), par [1,128] f32
        #   (xmin, xmax, tol), out [1,1,128] f32 (t_opt, lnl0)
        groups = [refs[5 * k:5 * k + 5] for k in range(n_parts)]
        t0_ref, par_ref, out_ref = refs[5 * n_parts:]
        t0 = t0_ref[0, 0, 0]
        xmin = par_ref[0, 0]
        xmax = par_ref[0, 1]
        tol = par_ref[0, 2]
        max_step = (xmax - xmin) / max_iters
        tiny = jnp.asarray(1e-37, jnp.float32)

        def derivs(t):
            lnl_t = df_t = ddf_t = jnp.float32(0)
            for st_ref, sc_ref, lw_ref, lnB_ref, pw_ref in groups:
                st = st_ref[0]                          # [CS, P]
                scv = sc_ref[0].astype(jnp.float32)     # [1, P]
                lnb = lnB_ref[0]
                pw = pw_ref[0]
                lr = lw_ref[0, 0:1, :]                  # [1, CS]
                w = lw_ref[0, 1:2, :]
                zeros5 = jnp.zeros((5,) + lr.shape[1:], jnp.float32)
                expo = jnp.exp(t * lr)                  # [1, CS]
                r0 = w * expo
                emul = jnp.concatenate(
                    [r0, r0 * lr, r0 * lr * lr, zeros5], axis=0)  # [8,CS]
                rows = jax.lax.dot_general(
                    emul, st, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_PREC)
                L = rows[0:1]
                dL = rows[1:2]
                ddL = rows[2:3]
                Lsafe = jnp.maximum(L, tiny)
                ln_a = jnp.log(Lsafe) + scv * LN2
                mx = jnp.maximum(ln_a, lnb)
                site_lnl = mx + jnp.log1p(jnp.exp(-jnp.abs(ln_a - lnb)))
                frac = jnp.exp(ln_a - site_lnl)
                r1 = frac * dL / Lsafe
                site_ddf = frac * ddL / Lsafe - r1 * r1
                lnl_t = lnl_t + jnp.sum(site_lnl * pw)
                df_t = df_t + jnp.sum(r1 * pw)
                ddf_t = ddf_t + jnp.sum(site_ddf * pw)
            return lnl_t, df_t, ddf_t

        # early-exit while loop (all-scalar carries): the grid step's
        # cost is its per-iteration st feed through the MXU, and
        # near-converged edges (most of every warm sweep) stop after
        # 1-2 iterations — same per-edge freeze semantics as
        # minimize_newton_multi's convergence mask
        def cond(state):
            i, x, xl, xh, conv, lnl0 = state
            return (i < max_iters) & jnp.logical_not(conv)

        def body(state):
            i, x, xl, xh, conv, lnl0 = state
            lnl, df, ddf = derivs(x)
            lnl0 = jnp.where(i == 0, lnl, lnl0)
            xl = jnp.where(df > 0, x, xl)
            xh = jnp.where(df < 0, x, xh)
            newton_dx = jnp.where(ddf < 0, -df / ddf, 0.0)
            newton_dx = jnp.clip(newton_dx, -max_step, max_step)
            x_newton = x + newton_dx
            x_bisect = jnp.where(df > 0, 0.5 * (x + xh), 0.5 * (x + xl))
            use_newton = (ddf < 0) & (x_newton > xl) & (x_newton < xh)
            x_new = jnp.clip(jnp.where(use_newton, x_newton, x_bisect),
                             xmin, xmax)
            new_conv = (jnp.abs(x_new - x) < tol) | (df == 0)
            return i + 1, x_new, xl, xh, new_conv, lnl0

        _, x, _, _, _, lnl0 = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), t0, xmin, xmax, jnp.asarray(False),
             jnp.float32(0)))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        out_ref[0] = (jnp.where(lane == 0, x, 0.0) +
                      jnp.where(lane == 1, lnl0, 0.0))

    return _kernel


def _lam_weight_rows(partition, eigen=None, scale=1.0):
    """[1, 8, CS] f32 rows (λ·r_c per flat cat-state, effective weight
    w_c·(1−p_c) repeated per state) — the t-independent pieces of
    :func:`deriv_coeffs`, consumed by the fused Newton kernel.

    ``scale`` folds a SCALED-linkage brlen scaler into λr (lr' = s·λ·r):
    with sumtables built at b·s, exp(b·lr') then differentiates the
    per-partition logL w.r.t. the SHARED b — the chain rule df·s, ddf·s²
    of pll_optimize.c:1249-1267 without post-hoc factors."""
    if eigen is None:
        eigen = partition.eigen()
    pidx = partition.param_indices
    lam_c = eigen[0][pidx]
    pinv_c = partition.prop_invar[pidx]
    rc = partition.rate_cats / (1.0 - pinv_c)
    lr = (lam_c * rc[:, None] * scale).astype(jnp.float32)
    S = partition.states
    CS = partition.n_cats * S
    w_f = jnp.repeat((partition.rate_weights *
                      (1.0 - pinv_c)).astype(jnp.float32), S)
    rows = jnp.stack([lr.reshape(CS), w_f], axis=0)     # [2, CS]
    return jnp.pad(rows, ((0, 6), (0, 0)))[None]        # [1, 8, CS]


# VMEM budget for one grid step of the Newton kernel (≈16 MB physical;
# leave headroom for Mosaic spills)
NEWTON_VMEM_BYTES = 12 * 1024 * 1024


def newton_fits_vmem(*partitions) -> bool:
    """Whole per-edge working set must fit VMEM: double-buffered st rows
    (Mosaic prefetches the next edge's blocks during compute) + the
    [8, Ppad] dot output and ~6 live [1, Ppad] f32 site temporaries per
    partition — not just the st rows (a 5 MB-row small-CS/huge-Ppad
    shape passes a rows-only gate but fails Mosaic VMEM allocation)."""
    # CS ≤ 128: the kernel reads t from the leading CS lanes of one
    # VREG row
    if any(p.n_cats * p.states > 128 for p in partitions):
        return False
    st_rows = sum(p.n_cats * p.states * p.n_patterns_padded * 4
                  for p in partitions)
    working = sum(14 * p.n_patterns_padded * 4 for p in partitions)
    return 2 * st_rows + working <= NEWTON_VMEM_BYTES


def newton_edges_pallas_multi(partitions, sts, scs, t0, scalers, xmin,
                              xmax, tol, max_iters: int = 10, eigens=None,
                              lnBs=None, interpret: bool = False):
    """All-edge bracketed Newton branch-length optimization over K
    partitions in ONE pallas call — one sumtable read TOTAL instead of
    one per Newton iteration. Multi-partition derivative accumulation
    with SCALED-mode scalers folded into the λr rows (see
    :func:`_lam_weight_rows`).

    Args:
      sts/scs: per-partition sumtables from :func:`edge_sumtables_pallas`
        built at ``t0 * scalers[k]``
      t0: [E] shared starting branch lengths; scalers: K floats;
        xmin/xmax/tol: scalars (traced ok)
    Returns (t_opt [E] f32, lnl0 [E] f32 — per-edge total logL at t0).
    """
    K = len(partitions)
    E = sts[0].shape[0]
    if eigens is None:
        eigens = [None] * K
    if lnBs is None:
        lnBs = [invar_log_plane(p) for p in partitions]
    operands, in_specs = [], []
    for part, st, sc, s, eig, lnB in zip(partitions, sts, scs, scalers,
                                         eigens, lnBs):
        _, CS, Ppad = st.shape
        lw = _lam_weight_rows(part, eig, scale=s)
        pw = part.pattern_weights.astype(jnp.float32)[None, None, :]
        operands += [st, sc, lw, lnB, pw]
        in_specs += [
            pl.BlockSpec((1, CS, Ppad), lambda e: (e, 0, 0)),
            pl.BlockSpec((1, 1, Ppad), lambda e: (e, 0, 0)),
            pl.BlockSpec((1, 8, CS), lambda e: (0, 0, 0)),
            pl.BlockSpec((1, 1, Ppad), lambda e: (0, 0, 0)),
            pl.BlockSpec((1, 1, Ppad), lambda e: (0, 0, 0)),
        ]
    t0_in = jnp.zeros((E, 1, 128), jnp.float32).at[:, 0, 0].set(
        jnp.asarray(t0, jnp.float32))
    par = jnp.zeros((1, 128), jnp.float32)
    par = par.at[0, 0].set(jnp.asarray(xmin, jnp.float32))
    par = par.at[0, 1].set(jnp.asarray(xmax, jnp.float32))
    par = par.at[0, 2].set(jnp.asarray(tol, jnp.float32))
    operands += [t0_in, par]
    in_specs += [
        pl.BlockSpec((1, 1, 128), lambda e: (e, 0, 0)),
        pl.BlockSpec((1, 128), lambda e: (0, 0)),
    ]
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    fn = pl.pallas_call(
        _make_newton_kernel(max_iters, K),
        grid=(E,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 128), lambda e: (e, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((E, 1, 128), jnp.float32),
        compiler_params=compiler_params,
        interpret=interpret,
    )
    out = fn(*operands)
    return out[:, 0, 0], out[:, 0, 1]


def newton_edges_pallas(partition, st, sc, t0, xmin, xmax, tol,
                        max_iters: int = 10, eigen=None, lnB=None,
                        interpret: bool = False):
    """Single-partition :func:`newton_edges_pallas_multi`."""
    return newton_edges_pallas_multi(
        (partition,), (st,), (sc,), t0, (1.0,), xmin, xmax, tol,
        max_iters, (eigen,), None if lnB is None else (lnB,), interpret)
