"""Grouped megakernel: consumer-targeted writes + full-MXU group dots.

The whole-traversal fused kernel (:mod:`pallas_clv`) processes one node
per grid step; its per-node merged child dot is [2CS,2CS]@[2CS,T] with
2CS=32 for DNA+Γ4 — the MXU pads M and K to 128, wasting ~4x of the
systolic array, and the measured kernel is bound by the per-step vector
chain + DMA issue (PERF_NOTES). The earlier node-packing attempt
(``update_partials_packed``) was a measured dead end because gathering
G nodes' children needed per-member scattered DMAs.

This kernel removes the scatter at the source — **consumer-targeted
writes**:

- Nodes are list-scheduled into GROUPS of G = 128//(2·CS) members with
  no intra-group dependencies (antichains) and every child produced in
  a strictly earlier group (d >= 1).
- Each group owns a [2·G·CS, P] INPUT BUFFER in HBM, rows laid out
  side-major: child (side k, member m) occupies rows
  [(k·G+m)·CS, ...+CS). A producer node DMAs its result directly into
  its consumer's buffer at the consumer-assigned row offset — so each
  group's step reads ONE contiguous [128, T] block. No gathers, ever.
- Both children of all G members go through a SINGLE
  [2GM, 2GM] @ [2GM, T] block-diagonal HIGHEST dot (2GM = 128 for DNA):
  full MXU utilization, 1 dot per G nodes instead of G padded dots.
  The side-major layout makes the combine one [GM, T] multiply
  (``lr[:GM] * lr[GM:]``) at full sublane occupancy.
- Tip children are expanded in-VMEM from code rows into their buffer
  positions (one one-hot DEFAULT dot per side, exact 0/1 operands).
- Read-after-write: a write issued at step s is semaphore-waited at
  step s+2 (rotating two write-scratch parities); any consumer read of
  it is prefetched no earlier than nP steps later, so with nP >= 3
  pattern tiles every dependency is safely drained with NO fences. For
  nP < 3 (small test shapes) the kernel runs in an all-fence mode
  (synchronous reads, drain at each group boundary).

Reference framing: this is still libpll's ``pll_update_partials`` hot
loop (SURVEY §3.1; pll.c partials kernels), re-tiled so the TPU's
128x128 MXU runs at full width on 4-state models.

Scope: SINGLE-CONSUMER traversals (full-tree/edge-rooted logL — the
bench, tree_loglikelihood, treeinfo evaluation, Brent objectives, SPR
re-evaluation). Directed-CLV tables (BLO sumtables, ancestral) have
multi-consumer nodes and keep the fused kernel.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pllmod_tpu.ops.pallas_clv import (
    _code_table, _eigen_lamr_basis, _DOT_PREC, _EXPAND_PREC, _PREC,
    block_diag_pmats, root_loglikelihood_csp,
)


import os as _os

# perf-probe knobs (comma-separated in PLLMOD_GROUPED_PROBE, read at
# import; all produce WRONG results — only for measuring cost shares):
#   norescale  skip the per-member rescale chain
#   noscalers  skip scaler-plane reads/writes entirely
#   nodot      replace the group dot with a copy (MXU share)
#   nowrite    skip the consumer-targeted result writes (write share)
_PROBE = set(filter(None, _os.environ.get(
    "PLLMOD_GROUPED_PROBE", "").split(",")))


def _pick_group(CS: int) -> int:
    """Members per group: fill the 128-wide MXU with 2·G·CS rows."""
    return max(1, 128 // (2 * CS))


def _pick_tile_grouped(P: int, Q2M: int) -> tuple[int, int]:
    """(tile, nP) with nP >= 3 when P allows it (lookahead mode needs 3
    tiles of write-drain distance) under a ~6 MB scratch budget:
    b_scr 2x[2GM,T] + o_scr 2x[GM,T] + dot temps."""
    budget = 6 * 1024 * 1024
    cap = max(128, min(P, budget // (6 * Q2M // 2 * 4)))
    best = 128
    for t in range(cap - cap % 128, 127, -128):
        if P % t == 0:
            best = t
            break
    if P // best < 3:        # prefer nP >= 3 over a bigger tile
        for t in range(best - 128, 127, -128):
            if P % t == 0 and P // t >= 3:
                return t, P // t
    return best, P // best


class GroupedSchedule:
    """Host-compiled consumer-targeted group schedule.

    Attributes:
      G, nG, Q (=2G children/group), GM (=G*CS)
      side_meta: int32 [nG, Q, 2] — (is_tip, tip_id) per child position
      dst_meta:  int32 [nG, G, 2] — (dst_group, dst_q) per member
      grp_meta:  int32 [nG, 2]    — (any_tip side0, any_tip side1)
      e_sides:   int32 [nG, Q]    — child edge ids (dummy -> 0)
      root_info: (ref_u, ref_v, root_edge) with inner refs n_tips+q
                 pointing into the landing buffer (group nG)
    """

    def __init__(self, partition, tree, root_edge=None, group: int = 0):
        ops, root_info = tree.traversal_ops(root_edge)
        ops = np.asarray(ops)
        n_tips = partition.n_tips
        CS = partition.n_cats * partition.states
        G = group or _pick_group(CS)
        self.G, self.CS = G, CS
        self.GM = G * CS
        self.Q = 2 * G
        live = ops[ops[:, 0] >= 0]
        nR = live.shape[0]

        # node height (critical-path priority: schedule tall nodes first)
        height = {}
        for row in live:                       # ops are in topological order
            hs = [height.get(int(c) - n_tips, 0) + 1
                  for c in (row[1], row[3]) if int(c) >= n_tips]
            height[int(row[0])] = max(hs) if hs else 0

        # d>=1 list scheduling: a row is ready in group g iff every inner
        # child was scheduled in a group <= g-1
        group_of: dict[int, int] = {}          # out slot -> group
        remaining = sorted(range(nR),
                           key=lambda r: -height[int(live[r, 0])])
        groups: list[list[int]] = []
        while remaining:
            g = len(groups)
            members, rest = [], []
            for r in remaining:
                ok = all(group_of.get(int(c) - n_tips, g) < g
                         for c in (live[r, 1], live[r, 3])
                         if int(c) >= n_tips)
                if ok and len(members) < G:
                    members.append(r)
                else:
                    rest.append(r)
            if not members:
                raise RuntimeError("grouped schedule stalled (cycle?)")
            for r in members:
                group_of[int(live[r, 0])] = g
            groups.append(members)
            remaining = rest
        nG = len(groups)
        self.nG = nG

        # position of each row within its group
        pos_of: dict[int, tuple[int, int]] = {}    # out slot -> (g, m)
        for g, members in enumerate(groups):
            for m, r in enumerate(members):
                pos_of[int(live[r, 0])] = (g, m)

        side_meta = np.zeros((nG, self.Q, 2), np.int64)
        dst_meta = np.zeros((nG, G, 2), np.int64)
        grp_meta = np.zeros((nG, 2), np.int64)
        e_sides = np.zeros((nG, self.Q), np.int64)
        # default dst for dummy members: landing-buffer trash rows. Track
        # a rotating trash q so two dummies in one group never write the
        # same rows from the same step.
        u, v, e = (int(x) for x in root_info)
        used_land = {0, 1}
        trash_cycle = [q for q in range(self.Q) if q not in (0, 1)] or [0]
        for g, members in enumerate(groups):
            ti = 0
            for m in range(G):
                if m < len(members):
                    row = live[members[m]]
                    for k, (ccol, ecol) in enumerate(((1, 2), (3, 4))):
                        c = int(row[ccol])
                        q = k * G + m
                        e_sides[g, q] = int(row[ecol])
                        if c < n_tips:
                            side_meta[g, q] = (1, c)
                            grp_meta[g, k] = 1
                        else:
                            side_meta[g, q] = (0, 0)
                else:
                    # dummy member: tip/tip children of tip 0, edge 0.
                    # Dummies MUST be tips: marking them "inner" would
                    # leave uninitialized (possibly NaN) buffer rows, and
                    # one NaN column poisons the whole group dot (0*NaN)
                    for k in range(2):
                        side_meta[g, k * G + m] = (1, 0)
                        grp_meta[g, k] = 1
                    dst_meta[g, m] = (nG, trash_cycle[ti % len(trash_cycle)])
                    ti += 1

        # consumer-targeted dst assignment: each inner child is consumed
        # by exactly one (group, member, side); root endpoints land in
        # buffer nG at q=0 (u) / q=1 (v)
        consumed = set()
        for g, members in enumerate(groups):
            for m, r in enumerate(members):
                row = live[r]
                for k, ccol in enumerate((1, 3)):
                    c = int(row[ccol])
                    if c >= n_tips:
                        slot = c - n_tips
                        if slot in consumed:
                            raise ValueError(
                                "grouped kernel requires single-consumer "
                                f"traversals (slot {slot} consumed twice)")
                        consumed.add(slot)
                        pg, pm = pos_of[slot]
                        dst_meta[pg, pm] = (g, k * G + m)
        for ref, q in ((u, 0), (v, 1)):
            if ref >= n_tips:
                pg, pm = pos_of[ref - n_tips]
                dst_meta[pg, pm] = (nG, q)
        # sanity: every member got a dst (root endpoints or consumers)
        self.side_meta = jnp.asarray(side_meta.astype(np.int32))
        self.dst_meta = jnp.asarray(dst_meta.astype(np.int32))
        self.grp_meta = jnp.asarray(grp_meta.astype(np.int32))
        self.e_sides_np = e_sides
        self.e_sides = jnp.asarray(e_sides.astype(np.int32))
        ref_u = u if u < n_tips else n_tips + 0
        ref_v = v if v < n_tips else n_tips + 1
        self.root_info = (ref_u, ref_v, e)
        self.n_tips = n_tips

    def key(self):
        """Hashable identity for jit static caching."""
        return (self.G, self.nG, self.CS, self.root_info)


def _make_grouped_kernel(n_codes: int, G: int, CS: int, nG: int, nP: int,
                         all_fence: bool, depth: int):
    """``depth``: read-lookahead depth (number of scratch read buffers).
    A single outstanding read exposes the full DMA issue->land latency
    (~5 us on the axon v5e) at every step — measured as an ~0.8 ms/eval
    floor with all compute disabled. depth=3 keeps two reads in flight.
    RAW safety: a read issued at step s only depends on writes drained
    by step s (rotating-2 write scratch drains a write exactly 2 steps
    after issue), so depth D needs nP >= D + 1 with d>=1 group
    distance; the caller picks D accordingly."""
    GM = G * CS
    Q = 2 * G

    def _kernel(side_ref,              # prefetch [nG, Q, 2] int32
                dst_ref,               # prefetch [nG, G, 2] int32
                grp_ref,               # prefetch [nG, 2] int32
                tip_codes_ref,         # ANY [n_tips, 1, P] int32
                bigtab_ref,            # VMEM [GM, G*n_codes] f32
                PQ_ref,                # VMEM block [1, 2GM, 2GM]
                bufs_ref, sbufs_ref,   # ANY outputs (manual DMA)
                b_scr, codes_scr, s_scr, o_scr, os_scr,
                rsem, wsem, wssem, cnt):
        g = pl.program_id(0)
        p = pl.program_id(1)
        T = o_scr.shape[2]
        two = jnp.asarray(2, jnp.int32)
        step = (g * nP + p).astype(jnp.int32)
        par = jax.lax.rem(step, two)
        oth = 1 - par

        @pl.when(step == 0)
        def _():
            cnt[0] = 0
            cnt[1] = 0

        def drain(q_):
            @pl.when(cnt[q_] == 1)
            def _():
                for m in range(G):
                    pltpu.make_async_copy(
                        o_scr.at[q_, pl.ds(m * CS, CS)],
                        bufs_ref.at[0, 0, pl.ds(0, CS), :],
                        wsem.at[q_, m]).wait()
                    if "noscalers" not in _PROBE:
                        pltpu.make_async_copy(
                            os_scr.at[q_, m],
                            sbufs_ref.at[0, 0, 0],
                            wssem.at[q_, m]).wait()
                cnt[q_] = 0

        drain(par)
        if all_fence:
            @pl.when(p == 0)
            def _():
                drain(oth)

        # -- reads: ONE contiguous buffer block + scaler rows + tip codes
        def reads(st, start):
            gt = st // nP
            pt = jax.lax.rem(st, jnp.asarray(nP, jnp.int32))
            bf = jax.lax.rem(st, jnp.asarray(depth, jnp.int32))
            if "noread" not in _PROBE:
                c = pltpu.make_async_copy(
                    bufs_ref.at[gt, pt], b_scr.at[bf], rsem.at[bf, 0])
                c.start() if start else c.wait()
            if "noscalers" not in _PROBE:
                c2 = pltpu.make_async_copy(
                    sbufs_ref.at[gt, pt], s_scr.at[bf], rsem.at[bf, 1])
                c2.start() if start else c2.wait()
            if "nocodes" not in _PROBE:
                for q in range(Q):
                    is_tip = side_ref[gt, q, 0] == 1
                    tip = side_ref[gt, q, 1]

                    @pl.when(is_tip)
                    def _(q=q, tip=tip):
                        ct = pltpu.make_async_copy(
                            tip_codes_ref.at[tip, :, pl.ds(pt * T, T)],
                            codes_scr.at[bf, q], rsem.at[bf, 2 + q])
                        ct.start() if start else ct.wait()

        if all_fence:
            reads(step, True)
            reads(step, False)
        else:
            # (depth-1)-deep lookahead: step 0 primes steps 0..depth-2,
            # then every step issues step+depth-1 — keeping depth reads
            # in flight so DMA latency amortizes across steps
            @pl.when(step == 0)
            def _():
                for j in range(depth - 1):
                    if j < nG * nP:
                        reads(jnp.asarray(j, jnp.int32), True)

            ahead = step + (depth - 1)

            @pl.when(ahead < nG * nP)
            def _():
                reads(ahead, True)

            reads(step, False)

        buf = jax.lax.rem(step, jnp.asarray(depth, jnp.int32))

        # -- tip expansion into buffer rows (one one-hot dot per side) --
        sides = () if "nocodes" in _PROBE else (0, 1)
        for k in sides:
            @pl.when(grp_ref[g, k] == 1)
            def _(k=k):
                codes = codes_scr[buf, k * G:(k + 1) * G, 0, :]  # [G, T]
                bcodes = jnp.repeat(codes, n_codes, axis=0)    # [G*nc, T]
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (G * n_codes, T), 0)
                onehot = (bcodes == jax.lax.rem(
                    iota, jnp.asarray(n_codes, jnp.int32))).astype(
                        jnp.float32)
                exp_all = jax.lax.dot_general(
                    bigtab_ref[...], onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_EXPAND_PREC)                    # [GM, T]
                for m in range(G):
                    @pl.when(side_ref[g, k * G + m, 0] == 1)
                    def _(m=m):
                        b_scr[buf, (k * G + m) * CS:(k * G + m + 1) * CS,
                              :] = exp_all[m * CS:(m + 1) * CS, :]

        # -- ONE full-width block-diagonal dot for all children --------
        if "nodot" in _PROBE:
            lr = b_scr[buf] * 0.5
        else:
            lr = jax.lax.dot_general(
                PQ_ref[0], b_scr[buf], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_DOT_PREC)                           # [2GM, T]
        prod = lr[:GM, :] * lr[GM:, :]                         # [GM, T]

        # -- per-member rescale + cumulative scalers + targeted writes --
        zero_s = jnp.zeros((1, T), jnp.int32)
        for m in range(G):
            blk = prod[m * CS:(m + 1) * CS, :]
            if "norescale" in _PROBE:
                o_scr[par, m * CS:(m + 1) * CS, :] = blk
                e = jnp.zeros((1, T), jnp.int32)
            else:
                mx = jnp.max(blk, axis=0, keepdims=True)       # [1, T]
                mi = jax.lax.bitcast_convert_type(mx, jnp.int32)
                e = ((mi >> 23) & 0xFF) - 126
                e = jnp.where(mx > 0, e, 0)
                e = jnp.clip(e, -125, 127)
                scale = jax.lax.bitcast_convert_type(
                    ((127 - e) << 23).astype(jnp.int32), jnp.float32)
                o_scr[par, m * CS:(m + 1) * CS, :] = blk * scale
            if "noscalers" not in _PROBE:
                s1 = jnp.where(side_ref[g, m, 0] == 1, zero_s,
                               s_scr[buf, m])
                s2 = jnp.where(side_ref[g, G + m, 0] == 1, zero_s,
                               s_scr[buf, G + m])
                os_scr[par, m] = s1 + s2 + e
            else:
                os_scr[par, m] = e

        if "nowrite" not in _PROBE:
            for m in range(G):
                dg = dst_ref[g, m, 0]
                dq = dst_ref[g, m, 1]
                pltpu.make_async_copy(
                    o_scr.at[par, pl.ds(m * CS, CS)],
                    bufs_ref.at[dg, p, pl.ds(dq * CS, CS), :],
                    wsem.at[par, m]).start()
                if "noscalers" not in _PROBE:
                    pltpu.make_async_copy(
                        os_scr.at[par, m],
                        sbufs_ref.at[dg, p, dq],
                        wssem.at[par, m]).start()
            cnt[par] = 1

        @pl.when(step == nG * nP - 1)
        def _():
            drain(par)
            drain(oth)

    return _kernel


def grouped_pq(partition, brlens, e_sides):
    """[nG, 2GM, 2GM] per-group block-diagonal transition matrices from
    the cached eigen basis in ONE matmul (the Q-side generalization of
    :func:`pallas_clv.fused_p12`).

    e_sides: int32 [nG, Q] child edge ids (side-major positions)."""
    CS = partition.n_cats * partition.states
    S = partition.states
    nG, Q = e_sides.shape
    QM = Q * CS
    lamr, M = _eigen_lamr_basis(partition, jnp.float32)
    lamr_flat = lamr.reshape(CS)
    t_q = jnp.take(brlens, e_sides.reshape(-1)).astype(
        jnp.float32).reshape(nG, Q)                          # [nG, Q]
    expq = jnp.exp(t_q[:, :, None] * lamr_flat[None, None, :]
                   ).reshape(nG, QM)                         # [nG, QM]
    B = jnp.zeros((QM, QM, QM), jnp.float32)
    for q in range(Q):
        for c in range(partition.n_cats):
            o = q * CS + c * S
            B = B.at[o:o + S, o:o + S, o:o + S].set(M[c])
    PQ = jnp.einsum("nk,kx->nx", expq, B.reshape(QM, QM * QM),
                    precision=_PREC)
    return PQ.reshape(nG, QM, QM)


def _pq_from_pmats(partition, P, e_sides):
    """Generic (no eigen cache / non-reversible) PQ pack from all-edge
    P matrices: gather + block-diagonal placement."""
    CS = partition.n_cats * partition.states
    nG, Q = e_sides.shape
    QM = Q * CS
    Pbd = block_diag_pmats(P.astype(jnp.float32))             # [E, CS, CS]
    sel = Pbd[e_sides.reshape(-1)].reshape(nG, Q, CS, CS)
    out = jnp.zeros((nG, QM, QM), jnp.float32)
    for q in range(Q):
        out = out.at[:, q * CS:(q + 1) * CS, q * CS:(q + 1) * CS].set(
            sel[:, q])
    return out


def update_partials_grouped(partition, sched: GroupedSchedule, PQ,
                            interpret: bool = False):
    """Whole-traversal pruning with the grouped megakernel.

    Returns (bufs [nG+1, 2GM, Ppad] f32, sbufs [nG+1, 2G, 1, Ppad] i32);
    the landing buffer (index nG) holds the two root-facing CLVs at
    positions 0 and 1."""
    Ppad = partition.n_patterns_padded
    CS = partition.n_cats * partition.states
    G, nG, Q = sched.G, sched.nG, sched.Q
    GM = G * CS
    codetab, n_codes = _code_table(partition)
    eye = jnp.eye(G, dtype=jnp.float32)
    bigtab = jnp.einsum("ab,ck->acbk", eye,
                        codetab[:, :n_codes]).reshape(GM, G * n_codes)
    tip_codes = partition.tip_states[:, None, :].astype(jnp.int32)
    TILE_P, nP = _pick_tile_grouped(Ppad, 2 * GM)
    all_fence = nP < 3
    depth = 1 if all_fence else min(3, nP - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nG, nP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # tip_codes
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bigtab
            pl.BlockSpec((1, 2 * GM, 2 * GM),
                         lambda g, p, i1, i2, i3: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((depth, 2 * GM, TILE_P), jnp.float32),  # b_scr
            pltpu.VMEM((depth, Q, 1, TILE_P), jnp.int32),      # codes_scr
            pltpu.VMEM((depth, Q, 1, TILE_P), jnp.int32),      # s_scr
            pltpu.VMEM((2, GM, TILE_P), jnp.float32),          # o_scr
            pltpu.VMEM((2, G, 1, TILE_P), jnp.int32),          # os_scr
            pltpu.SemaphoreType.DMA((depth, 2 + Q)),           # rsem
            pltpu.SemaphoreType.DMA((2, G)),                   # wsem
            pltpu.SemaphoreType.DMA((2, G)),                   # wssem
            pltpu.SMEM((2,), jnp.int32),                       # cnt
        ],
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    fn = pl.pallas_call(
        _make_grouped_kernel(n_codes, G, CS, nG, nP, all_fence, depth),
        grid_spec=grid_spec,
        out_shape=[
            # tile-major: each (group, pattern-tile) block is CONTIGUOUS
            # in HBM, so the per-step [2GM, T] read and the [CS, T]
            # targeted writes are single unstrided DMA runs (measured:
            # row-strided reads of [128, T-of-Ppad] ran well below HBM
            # bandwidth)
            jax.ShapeDtypeStruct((nG + 1, nP, 2 * GM, TILE_P),
                                 jnp.float32),
            jax.ShapeDtypeStruct((nG + 1, nP, Q, 1, TILE_P), jnp.int32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )
    return fn(sched.side_meta, sched.dst_meta, sched.grp_meta,
              tip_codes, bigtab, PQ)


@partial(jax.jit, static_argnums=(2, 3))
def loglikelihood_grouped(partition, brlens, sched: GroupedSchedule,
                          interpret: bool = False):
    """Full-tree logL through the grouped megakernel."""
    from pllmod_tpu.ops.pallas_clv import p_edge_from_eigen
    u, v, e = sched.root_info
    if partition.reversible and partition.eigen_lam is not None:
        PQ = grouped_pq(partition, brlens, sched.e_sides)
        P_root = p_edge_from_eigen(partition, brlens[e])
    else:
        P = partition.prob_matrices(brlens)
        PQ = _pq_from_pmats(partition, P, sched.e_sides)
        P_root = P[e]
    bufs, sbufs = update_partials_grouped(partition, sched, PQ,
                                          interpret=interpret)
    CS = partition.n_cats * partition.states
    Ppad = partition.n_patterns_padded
    # un-tile the landing buffer: [nP, 2GM, T] -> [Q, CS, Ppad]
    land = jnp.transpose(bufs[sched.nG], (1, 0, 2)).reshape(
        sched.Q, CS, Ppad)
    land_s = jnp.transpose(sbufs[sched.nG], (1, 2, 0, 3)).reshape(
        sched.Q, 1, Ppad)
    return root_loglikelihood_csp(partition, land, land_s, u, v, P_root)
