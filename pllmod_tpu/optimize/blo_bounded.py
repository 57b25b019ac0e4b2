"""Memory-bounded O(n log n) whole-tree branch-length optimization.

The last structural gap vs the reference (round-4 VERDICT item 1): the
reference's ``recomp_iterative`` walks the tree once per smoothing sweep,
re-orienting ONE CLV per step and running a serial Newton per edge
(``/root/reference/src/optimize/pll_optimize.c:778-926``, the
one-op-per-step ``update_partials_and_scalers`` recursion at
``:1658-1708``) — O(n) work per sweep, but it relies on one resident CLV
buffer per inner node (O(n) slots; 64 TB at the 10k-taxa × 100k-pattern
north-star scale). The full-buffer TPU sweep (:mod:`.blo`) needs 3(n−2)
directed slots, and the chunked fallback pays O(n²) node updates per
sweep (PERF_NOTES "Memory").

This module closes the gap with a HEAVY-PATH EULER WALK: a single
serial-order schedule on the fused megakernel that

1. recomputes each *outer* (pre-order) CLV exactly once per sweep while
   descending, holding only the root-to-current-node path of outer CLVs
   live (slot-recycled),
2. pre-computes the *inner* (post-order) CLV of the SMALLER child
   subtree on the way down (a Sethi-Ullman bounded prepass, O(log n)
   transient slots) so the larger child's outer CLV can be formed before
   descending into it, and
3. emits, for every edge, the pair of directed CLVs facing each other
   across it the moment both are live — each emit becomes a per-edge
   sumtable row + a bracketed Newton update, Gauss-Seidel style: CLV
   updates later in the walk see the already-optimized branch lengths.

Recursing into the LARGER subtree first makes every prepass run on the
smaller child, so total work per sweep is Σ min(|a|,|b|) + 3n ≤
n·log2(n) + O(n) CLV updates with max(2·depth + log2 n + 2W) live slots
— ~250 slots ≈ 1.6 GB at the north-star scale instead of 64 TB, at
~13× the reference's per-sweep update count (each update running at
megakernel throughput).

The schedule is cut into fixed-shape SEGMENTS (``seg_rows`` megakernel
rows, ≤ ``seg_emits`` edge emits each). On device the whole sweep is one
``lax.scan`` over segments: per segment the paired P matrices are
rebuilt from the *current* branch lengths (:func:`..ops.pallas_clv.
fused_p12` — this is what makes the sweep Gauss-Seidel), the megakernel
advances the carried slot buffer (``init=`` aliasing), the segment's
edges get sumtable rows (:func:`..ops.pallas_deriv.edge_sumtables_
pallas`) and a VMEM-resident bracketed Newton
(:func:`..ops.pallas_deriv.newton_edges_pallas`), and the optimized
lengths scatter back into the carried brlens vector. Edges within one
segment update Jacobi-style (window ≤ ``seg_emits``); across segments
the sweep is exactly the reference's serial Gauss-Seidel regime.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from pllmod_tpu.common import (MIN_BRANCH_LEN, MAX_BRANCH_LEN,
                               TOL_BRANCH_LEN)


# ---------------------------------------------------------------------------
# host-side schedule builder
# ---------------------------------------------------------------------------
class _SlotAlloc:
    """Free-list slot allocator with per-segment deferred frees: a slot
    referenced by a pending emit of the OPEN segment must survive until
    the segment's sumtable kernel has read it (emits execute against the
    buffer state at segment END), so its free is deferred to the segment
    boundary."""

    def __init__(self):
        self.free_list: list[int] = []
        self.next_slot = 0
        self.protected: set[int] = set()
        self.deferred: list[int] = []

    def alloc(self) -> int:
        if self.free_list:
            return self.free_list.pop()
        s = self.next_slot
        self.next_slot += 1
        return s

    def free(self, slot: int):
        if slot in self.protected:
            self.deferred.append(slot)
        else:
            self.free_list.append(slot)

    def protect(self, slot: int):
        self.protected.add(slot)

    def flush_segment(self):
        self.free_list.extend(self.deferred)
        self.deferred.clear()
        self.protected.clear()


class BoundedSweepSchedule:
    """Compiled segmented heavy-path Euler-walk BLO schedule (host-side).

    Attributes (all numpy, segment-major):
      seg_ops:   int32 [n_seg, R, 5] raw op rows (-1-padded)
      seg_edges: int32 [n_seg, W]    edge ids (0-padded)
      seg_refs:  int32 [n_seg, W, 2] facing-CLV refs (tip or n_tips+slot)
      seg_mask:  bool  [n_seg, W]    live emits
      n_slots:   peak live slots (excludes the kernel's scratch slot)
      n_rows / n_emits: live totals (schedule-size accounting)
    """

    def __init__(self, tree, seg_rows: int = 256, seg_emits: int = 64,
                 root_tip: int = 0, pad_segments_to: int | None = None):
        n_tips = tree.n_tips
        if n_tips < 4:
            raise ValueError("bounded BLO sweep needs >= 4 taxa")
        adj = tree.adjacency()
        (r, e0), = adj[root_tip]

        # rooted structure at root_tip's neighbor: children, subtree
        # sizes, Sethi-Ullman register need — one O(n) postorder pass
        post = tree.postorder(r, avoid_edge=e0)
        kids: dict[int, list[tuple[int, int]]] = {}
        size = {}
        need = {}
        parent_of = {}
        for node, par, pe in post:
            par = par if par != -1 else root_tip
            parent_of[node] = par
            if node < n_tips:
                size[node] = 1
                need[node] = 0
                continue
            pe_eff = pe if node != r else e0
            ks = [(nbr, e) for nbr, e in adj[node]
                  if not (nbr == par and e == pe_eff)]
            assert len(ks) == 2, "tree must be binary"
            kids[node] = ks
            (c1, _), (c2, _) = ks
            size[node] = 1 + size[c1] + size[c2]
            n1, n2 = need[c1], need[c2]
            need[node] = (n1 + 1) if n1 == n2 else max(n1, n2, 1)

        alloc = _SlotAlloc()
        segs: list[tuple[list, list]] = []
        rows_cur: list[list[int]] = []
        emits_cur: list[tuple[int, int, int]] = []

        def close_segment():
            if rows_cur or emits_cur:
                segs.append((rows_cur.copy(), emits_cur.copy()))
                rows_cur.clear()
                emits_cur.clear()
                alloc.flush_segment()

        def add_row(out_slot, r1, e1, r2, e2):
            rows_cur.append([out_slot, r1, e1, r2, e2])
            if len(rows_cur) >= seg_rows:
                close_segment()

        def add_emit(edge, ref1, ref2):
            emits_cur.append((edge, ref1, ref2))
            for rf in (ref1, ref2):
                if rf >= n_tips:
                    alloc.protect(rf - n_tips)
            if len(emits_cur) >= seg_emits:
                close_segment()

        def ref(slot):
            return n_tips + slot

        def prepass(node) -> int:
            """Inner (post-order) CLV of ``node`` toward its parent via
            a Sethi-Ullman bounded traversal; returns the slot (caller
            frees)."""
            res: dict[int, int] = {}
            stack = [(node, False)]
            while stack:
                v, done = stack.pop()
                if done:
                    (c1, ee1), (c2, ee2) = kids[v]
                    r1 = c1 if c1 < n_tips else ref(res[c1])
                    r2 = c2 if c2 < n_tips else ref(res[c2])
                    for c in (c1, c2):
                        if c >= n_tips:
                            alloc.free(res.pop(c))
                    s = alloc.alloc()
                    res[v] = s
                    add_row(s, r1, ee1, r2, ee2)
                else:
                    stack.append((v, True))
                    ks = sorted((c for c, _ in kids[v] if c >= n_tips),
                                key=lambda k: need[k])
                    stack.extend((k, False) for k in ks)
            return res[node]

        # --- heavy-path Euler walk (iterative state machine) -----------
        # frames: ("enter", v, pe, outer_ref) |
        #   ("resume1"/"resume2", v, pe, outer_ref, locals dict)
        ret: int | None = None          # last subtree's inner-CLV ref
        stack2: list[tuple] = [("enter", r, e0, root_tip)]
        while stack2:
            frame = stack2.pop()
            tag = frame[0]
            if tag == "enter":
                _, v, pe, outer_ref = frame
                (c1, ee1), (c2, ee2) = kids[v]
                # recurse into the LARGER subtree first: the prepass
                # (full postorder) always runs on the smaller child
                if size[c1] >= size[c2]:
                    a, e_a, b, e_b = c1, ee1, c2, ee2
                else:
                    a, e_a, b, e_b = c2, ee2, c1, ee1
                if b < n_tips:
                    ib0_ref = b
                    ib0_slot = None
                else:
                    ib0_slot = prepass(b)
                    ib0_ref = ref(ib0_slot)
                if ib0_slot is not None:
                    alloc.free(ib0_slot)       # read-before-write in-row
                sa = alloc.alloc()
                add_row(sa, outer_ref, pe, ib0_ref, e_b)
                loc = dict(a=a, e_a=e_a, b=b, e_b=e_b, sa=sa)
                stack2.append(("resume1", v, pe, outer_ref, loc))
                if a < n_tips:
                    ret = a
                else:
                    stack2.append(("enter", a, e_a, ref(sa)))
            elif tag == "resume1":
                _, v, pe, outer_ref, loc = frame
                inner_a = ret
                add_emit(loc["e_a"], ref(loc["sa"]), inner_a)
                alloc.free(loc["sa"])
                sb = alloc.alloc()
                add_row(sb, outer_ref, pe, inner_a, loc["e_a"])
                loc["sb"] = sb
                loc["inner_a"] = inner_a
                stack2.append(("resume2", v, pe, outer_ref, loc))
                if loc["b"] < n_tips:
                    ret = loc["b"]
                else:
                    stack2.append(("enter", loc["b"], loc["e_b"],
                                   ref(sb)))
            else:                                        # resume2
                _, v, pe, outer_ref, loc = frame
                inner_b = ret
                add_emit(loc["e_b"], ref(loc["sb"]), inner_b)
                alloc.free(loc["sb"])
                inner_a = loc["inner_a"]
                for rf in (inner_a, inner_b):
                    if rf >= n_tips:
                        alloc.free(rf - n_tips)
                sv = alloc.alloc()
                add_row(sv, inner_a, loc["e_a"], inner_b, loc["e_b"])
                ret = ref(sv)

        add_emit(e0, root_tip, ret)                     # the root edge
        close_segment()

        n_seg = len(segs)
        if pad_segments_to is not None:
            n_seg = max(n_seg, -(-n_seg // pad_segments_to)
                        * pad_segments_to)
        seg_ops = np.full((n_seg, seg_rows, 5), -1, np.int32)
        seg_edges = np.zeros((n_seg, seg_emits), np.int32)
        seg_refs = np.zeros((n_seg, seg_emits, 2), np.int32)
        seg_mask = np.zeros((n_seg, seg_emits), bool)
        n_rows = n_emits = 0
        for i, (rws, ems) in enumerate(segs):
            if rws:
                seg_ops[i, :len(rws)] = rws
            for j, (e, r1, r2) in enumerate(ems):
                seg_edges[i, j] = e
                seg_refs[i, j] = (r1, r2)
                seg_mask[i, j] = True
            n_rows += len(rws)
            n_emits += len(ems)
        self.n_tips = n_tips
        self.seg_rows = seg_rows
        self.seg_emits = seg_emits
        self.seg_ops = seg_ops
        self.seg_edges = seg_edges
        self.seg_refs = seg_refs
        self.seg_mask = seg_mask
        self.n_slots = alloc.next_slot
        self.n_rows = n_rows
        self.n_emits = n_emits

    # ------------------------------------------------------------------
    def compile_tables(self, partition):
        """Fused-kernel tables for the device sweep. Returns
        (idx8 [n_seg, R, 8], e1 [n_seg, R], e2 [n_seg, R],
        eref6 [n_seg, W, 6], edge_ids, emask, n_slots_kernel)."""
        from pllmod_tpu.ops import pallas_clv, pallas_deriv
        n_slots_k = self.n_slots + 1                  # + kernel scratch
        R = self.seg_rows
        dummy8 = np.zeros((R, 8), np.int32)
        dummy8[:, 2] = dummy8[:, 3] = 1               # tip/tip children
        dummy8[:, 6] = n_slots_k - 1                  # scratch slot
        zeroR = np.zeros(R, np.int32)
        idx8s, e1s, e2s, erefs = [], [], [], []
        for i in range(self.seg_ops.shape[0]):
            # hazard-respecting within-segment reorder: the walk's rows
            # are chains of adjacent dependencies (~75% would fence,
            # stalling the megakernel's prefetch); pushing producers ≥3
            # rows ahead of consumers where the DAG allows removes most
            seg = _reorder_segment_rows(self.seg_ops[i], self.n_tips)
            if not (seg[:, 0] >= 0).any():
                idx8, e1, e2 = dummy8, zeroR, zeroR
            else:
                # as_numpy: host-side only — a jnp array per segment
                # would cost one ~40 ms tunnel device_put EACH (~4750
                # puts = 222 s at 10k taxa); everything uploads below
                # in SIX stacked transfers
                packed, ns = pallas_clv.compile_fused_ops(
                    partition, seg, serial=True,
                    pad_to=R, n_slots_min=n_slots_k, as_numpy=True)
                assert ns == n_slots_k, (ns, n_slots_k)
                idx8 = packed[:8].T
                e1, e2 = packed[8], packed[9]
            idx8s.append(idx8)
            e1s.append(e1)
            e2s.append(e2)
            erefs.append(pallas_deriv.compile_edge_refs_np(
                self.seg_refs[i], self.seg_mask[i], self.n_tips))
        return (jnp.asarray(np.stack(idx8s)), jnp.asarray(np.stack(e1s)),
                jnp.asarray(np.stack(e2s)), jnp.asarray(np.stack(erefs)),
                jnp.asarray(self.seg_edges), jnp.asarray(self.seg_mask),
                n_slots_k)


def _reorder_segment_rows(rows: np.ndarray, n_tips: int,
                          min_dist: int = 3) -> np.ndarray:
    """Reorder one segment's op rows so producers sit ≥ ``min_dist``
    rows ahead of their consumers where the dependency DAG allows
    (bounded-lookahead list scheduling over exact RAW/WAR/WAW edges on
    slot ids). Semantics-preserving: same writes, same
    last-write-per-slot, so the segment-end buffer state the emits read
    is unchanged — only the megakernel's fence count drops (the walk's
    natural order fences most rows, stalling the DMA prefetch)."""
    live_idx = np.nonzero(rows[:, 0] >= 0)[0]
    n = len(live_idx)
    if n <= 2:
        return rows
    lv = [list(map(int, rows[i])) for i in live_idx]
    preds: list[set] = [set() for _ in range(n)]
    last_writer: dict[int, int] = {}
    readers: dict[int, list] = {}
    for i, (o, r1, _e1, r2, _e2) in enumerate(lv):
        for r in (r1, r2):
            s = r - n_tips
            if r >= n_tips and s in last_writer:
                preds[i].add(last_writer[s])          # RAW
        if o in last_writer:
            preds[i].add(last_writer[o])              # WAW
        for j in readers.get(o, ()):                  # WAR
            if j != i:
                preds[i].add(j)
        readers[o] = []
        last_writer[o] = i
        for r in (r1, r2):
            if r >= n_tips:
                readers.setdefault(r - n_tips, []).append(i)
    succs_left = [0] * n
    children_of: list[list] = [[] for _ in range(n)]
    for i in range(n):
        for p in preds[i]:
            children_of[p].append(i)
    indeg = [len(preds[i]) for i in range(n)]
    ready = [i for i in range(n) if indeg[i] == 0]
    pos_of = [0] * n
    order = []
    raw_preds = []
    for i, (o, r1, _e1, r2, _e2) in enumerate(lv):
        rp = set()
        for r in (r1, r2):
            s = r - n_tips
            if r >= n_tips:
                # RAW producers only (fence condition)
                for p in preds[i]:
                    if lv[p][0] == s:
                        rp.add(p)
        raw_preds.append(rp)
    emitted = [False] * n
    while ready:
        pos = len(order)
        pick = None
        # prefer the EARLIEST-original ready row that is fence-free;
        # ready is kept in ascending original order (insertion sorted)
        for k, i in enumerate(ready[:16]):
            if all(pos - pos_of[p] >= min_dist for p in raw_preds[i]
                   if emitted[p]) and all(emitted[p]
                                          for p in raw_preds[i]):
                pick = k
                break
        if pick is None:
            pick = 0
        i = ready.pop(pick)
        pos_of[i] = pos
        emitted[i] = True
        order.append(i)
        for c in children_of[i]:
            indeg[c] -= 1
            if indeg[c] == 0:
                # keep ascending original order (stable tie-break)
                import bisect
                bisect.insort(ready, c)
    out = rows.copy()
    out[live_idx] = np.asarray([lv[i] for i in order], rows.dtype)
    return out


def validate_schedule(sched: BoundedSweepSchedule, tree) -> None:
    """Structural replay check (host): every emitted pair must be the two
    directed CLVs facing each other across its edge — i.e. their tip sets
    are the edge's bipartition. Raises AssertionError on any violation.
    Used by the test suite; O(n·depth) sets, small trees only."""
    n_tips = sched.n_tips
    all_tips = frozenset(range(n_tips))
    # edge splits
    adj = tree.adjacency()

    def side_tips(start, avoid_edge):
        seen = {start}
        out = set()
        stk = [start]
        while stk:
            u = stk.pop()
            if u < n_tips:
                out.add(u)
            for nbr, e in adj[u]:
                if e != avoid_edge and nbr not in seen:
                    seen.add(nbr)
                    stk.append(nbr)
        return frozenset(out)

    content: dict[int, frozenset] = {}
    for i in range(sched.seg_ops.shape[0]):
        for row in sched.seg_ops[i]:
            out_slot, r1, e1, r2, e2 = (int(x) for x in row)
            if out_slot < 0:
                continue

            def get(rf):
                return (frozenset([rf]) if rf < n_tips
                        else content[rf - n_tips])

            s1, s2 = get(r1), get(r2)
            assert not (s1 & s2), f"overlapping children at row {row}"
            content[out_slot] = s1 | s2
        for j in range(sched.seg_emits):
            if not sched.seg_mask[i, j]:
                continue
            e = int(sched.seg_edges[i, j])
            r1, r2 = (int(x) for x in sched.seg_refs[i, j])

            def get(rf):
                return (frozenset([rf]) if rf < n_tips
                        else content[rf - n_tips])

            s1, s2 = get(r1), get(r2)
            assert s1 | s2 == all_tips and not (s1 & s2), \
                f"emit {e}: not a bipartition"
            u, v = (int(x) for x in tree.edge_nodes[e])
            su = side_tips(u, e)
            assert s1 in (su, all_tips - su), \
                f"emit {e}: wrong split"


# ---------------------------------------------------------------------------
# device sweep
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("n_slots", "max_newton_iters",
                                   "split", "interp", "fused_newton",
                                   "gauss_seidel"))
def _bounded_sweep(partition, idx8_s, e1_s, e2_s, eref_s, eids_s, em_s,
                   cmask, brlens, min_brlen, max_brlen, tol,
                   n_slots: int, max_newton_iters: int = 10, split=False,
                   interp: bool = False, fused_newton: bool = True,
                   gauss_seidel: bool = False):
    """One bounded pass over the schedule (see module docstring).

    ``gauss_seidel=False`` (default): the per-segment P matrices are
    built from the INCOMING ``brlens`` for the whole pass — every CLV
    and sumtable is mutually consistent, and only the edges selected by
    ``cmask`` update (an edge-COLOR class: a block Gauss-Seidel
    sub-sweep exactly like the production full-buffer driver's color
    sweeps, :func:`.blo._edge_colors`). ``gauss_seidel=True``: P
    matrices refresh per segment from the carried lengths (the cheaper
    single-pass mode — edges inside one emit window update against
    window-stale CLVs, which on hard landscapes can cost a few tenths
    of a logL unit vs the colored driver).

    Returns (new_brlens, logL at pass-start brlens)."""
    from pllmod_tpu.ops import pallas_clv, pallas_deriv
    from pllmod_tpu.optimize.newton import minimize_newton_multi

    eigen = partition.eigen()
    lnB = pallas_deriv.invar_log_plane(partition)
    AB = pallas_deriv.sumtable_basis(partition)
    Ppad = partition.n_patterns_padded
    CS = partition.n_cats * partition.states
    store = split is True
    if store:
        clvs0 = jnp.zeros((n_slots, 2, CS, Ppad), jnp.bfloat16)
    else:
        clvs0 = jnp.zeros((n_slots, CS, Ppad), jnp.float32)
    scalers0 = jnp.zeros((n_slots, 1, Ppad), jnp.int32)
    E = brlens.shape[0]
    ldtype = brlens.dtype
    brl_frozen = brlens

    def seg_step(carry, xs):
        clvs, scalers, brl, lnl0, have0 = carry
        idx8, e1, e2, eref, eids, em = xs
        if gauss_seidel:
            # P from the CURRENT lengths — the Gauss-Seidel seam
            P12 = pallas_clv.fused_p12(partition, brl, e1, e2)
        else:
            P12 = pallas_clv.fused_p12(partition, brl_frozen, e1, e2)
            em = em & jnp.take(cmask, eids)
        clvs, scalers = pallas_clv.update_partials_fused(
            partition, None, idx8, e1, e2, n_slots, interpret=interp,
            P12=P12, split=split, init=(clvs, scalers))
        st, sc = pallas_deriv.edge_sumtables_pallas(
            partition, clvs, scalers, eref, split=store,
            interpret=interp, AB=AB)
        t0 = jnp.take(brl, eids).astype(ldtype)
        if fused_newton:
            t_new, lnl0_all = pallas_deriv.newton_edges_pallas(
                partition, st, sc, t0, min_brlen, max_brlen, tol,
                max_newton_iters, eigen, lnB, interp)
        else:
            lnl0_all, _, _ = pallas_deriv.edge_derivatives_pallas(
                partition, st, sc, t0, eigen, lnB, interp)

            def deriv_fn(t):
                _, df, ddf = pallas_deriv.edge_derivatives_pallas(
                    partition, st, sc, t, eigen, lnB, interp)
                return df.astype(t.dtype), ddf.astype(t.dtype)

            t_new = minimize_newton_multi(
                deriv_fn, t0, min_brlen, max_brlen, tol=tol,
                max_iters=max_newton_iters)
        any_live = em.any()
        first = jnp.logical_not(have0) & any_live
        lnl_here = lnl0_all[jnp.argmax(em)].astype(ldtype)
        lnl0 = jnp.where(first, lnl_here, lnl0)
        # masked scatter through a shadow row: padded lanes hit row E
        b_ext = jnp.concatenate([brl, jnp.zeros((1,), ldtype)])
        idx = jnp.where(em, eids, E)
        brl = b_ext.at[idx].set(
            jnp.clip(t_new.astype(ldtype), min_brlen, max_brlen))[:E]
        return (clvs, scalers, brl, lnl0, have0 | any_live), None

    init = (clvs0, scalers0, brlens, jnp.asarray(-jnp.inf, ldtype),
            jnp.asarray(False))
    (clvs, scalers, brl, lnl0, _), _ = lax.scan(
        seg_step, init, (idx8_s, e1_s, e2_s, eref_s, eids_s, em_s))
    return brl, lnl0


def optimize_branch_lengths_bounded(partition, tree, seg_rows: int = 256,
                                    seg_emits: int = 64,
                                    max_sweeps: int = 32,
                                    tolerance: float = 1e-4,
                                    min_brlen: float = MIN_BRANCH_LEN,
                                    max_brlen: float = MAX_BRANCH_LEN,
                                    newton_tol: float = TOL_BRANCH_LEN,
                                    write_back: bool = True,
                                    interpret: bool | None = None,
                                    pad_segments_to: int | None = None,
                                    colored: bool = True,
                                    schedule: BoundedSweepSchedule | None
                                    = None):
    """Memory-bounded whole-tree BLO at O(n log n) work per sweep.

    The capacity-scale replacement for both
    :func:`.blo.optimize_branch_lengths` (needs 3(n−2) directed CLV
    slots — infeasible beyond ~800 taxa × 100k patterns) and
    :func:`.blo.optimize_branch_lengths_chunked` (bounded memory but
    O(n²) node updates per sweep). Driver semantics mirror the smoothing
    loop of ``pllmod_opt_optimize_branch_lengths_local``
    (pll_optimize.c:1849-1919): sweeps until the logL gain at sweep
    start drops below ``tolerance``, best-iterate kept, final exact
    bounded evaluation.

    Requires the fused-kernel shape gate (f32 partition, CS tiling —
    :func:`..ops.engine.use_fast_kernel`); callers should fall back to
    the chunked driver otherwise.

    ``colored=True`` (default): each smoothing sweep runs as 3-4
    edge-COLOR sub-passes with mutually consistent CLVs (block
    Gauss-Seidel — the production full-buffer driver's regime, see
    :func:`_bounded_sweep`); ``colored=False`` runs the cheaper
    single-pass per-segment Gauss-Seidel (~3× less CLV work per sweep,
    slightly weaker optima on strongly coupled landscapes).

    Returns (brlens [n_edge_slots], logL); writes back into ``tree``
    unless ``write_back=False``.
    """
    from pllmod_tpu.ops import engine as engine_mod

    if partition.eigen_lam is None:
        partition = partition.cache_eigen()
    if interpret is None:
        interpret = engine_mod.fast_kernel_interpret()
    sched = schedule
    if sched is None:
        sched = BoundedSweepSchedule(tree, seg_rows=seg_rows,
                                     seg_emits=seg_emits,
                                     pad_segments_to=pad_segments_to)
    (idx8_s, e1_s, e2_s, eref_s, eids_s, em_s,
     n_slots_k) = sched.compile_tables(partition)
    from pllmod_tpu.ops import pallas_deriv
    split = engine_mod.use_split_clv(partition)
    fused_newton = pallas_deriv.newton_fits_vmem(partition)
    dtype = partition.dtype
    brlens = jnp.asarray(np.clip(np.asarray(tree.lengths, np.float64),
                                 min_brlen, max_brlen).astype(
                                     np.dtype(dtype)))
    args = (jnp.asarray(min_brlen, dtype), jnp.asarray(max_brlen, dtype),
            jnp.asarray(newton_tol, dtype))

    E = int(brlens.shape[0])
    if colored:
        from pllmod_tpu.optimize.blo import _edge_colors
        cmasks = [jnp.asarray(m) for m in _edge_colors(tree) if m.any()]
    else:
        cmasks = [jnp.ones((E,), bool)]

    def sweep(brl):
        lnl_first = None
        for cm in cmasks:
            brl, lnl0 = _bounded_sweep(
                partition, idx8_s, e1_s, e2_s, eref_s, eids_s, em_s,
                cm, brl, *args, n_slots_k, split=split,
                interp=interpret, fused_newton=fused_newton,
                gauss_seidel=not colored)
            if lnl_first is None:
                lnl_first = float(lnl0)
        return brl, lnl_first          # logL at sweep-START brl

    # smoothing loop with overshoot damping — same semantics as the
    # full-buffer host driver (and pll_optimize.c:1849-1919): edges in
    # one emit window update Jacobi-style against window-stale CLVs, so
    # a worsening sweep retries from a half-step toward the best iterate
    best_brlens, best_lnl = brlens, -np.inf
    lnl_prev = None
    for _ in range(max_sweeps):
        brlens_start = brlens
        brlens, lnl0 = sweep(brlens)
        if lnl0 > best_lnl:
            best_lnl, best_brlens = lnl0, brlens_start
        if lnl_prev is not None:
            if lnl0 < lnl_prev - 1e-9:
                brlens = 0.5 * (best_brlens + brlens)
                lnl_prev = None
                continue
            if abs(lnl0 - lnl_prev) < tolerance:
                break
        lnl_prev = lnl0

    # damped half-step polish from the best iterate (window-Jacobi can
    # oscillate around the joint optimum exactly like the color sweeps)
    for _ in range(4):
        new_brlens, lnl0 = sweep(brlens)
        if lnl0 > best_lnl:
            best_lnl, best_brlens = lnl0, brlens
        brlens = 0.5 * (brlens + new_brlens)
    # the final iterate was optimized but never scored — exact bounded
    # evaluation (same O(log n)-slot memory regime)
    final_lnl, _ = engine_mod.loglikelihood_bounded_fused(
        partition, tree, brlens=np.asarray(brlens, np.float64),
        interpret=interpret)
    final_lnl = float(final_lnl)
    if final_lnl >= best_lnl:
        best_lnl, best_brlens = final_lnl, brlens
    if write_back:
        tree.lengths = np.asarray(best_brlens, np.float64).copy()
    return best_brlens, best_lnl
