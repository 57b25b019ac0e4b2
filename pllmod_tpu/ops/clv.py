"""Felsenstein-pruning CLV update engine.

TPU-native equivalent of libpll's ``pll_update_partials(partition,
operations[], count)`` (SURVEY.md §2.9 "Hot kernels"; op layout at
``pll_optimize.c:758-765``). Differences from the reference, by design:

- **Functional**: CLVs are computed and returned, not mutated in place.
  A topology change just means a different ``ops`` array — rollback is free.
- **Array-encoded ops**: an op is a row of 5 ints
  ``(parent_slot, child1_node, child1_edge, child2_node, child2_edge)``
  with ``node < n_tips`` meaning a tip (CLV gathered from the per-code
  lookup table — the PATTERN_TIP analog), otherwise an inner CLV slot
  ``node - n_tips``. ``parent_slot == -1`` marks a masked (skipped) op,
  which is how partial/incremental traversals keep static shapes.
- **Exact power-of-two rescaling**: every node's CLV is renormalized per
  site by ``2^-e`` with ``e = exponent(max_cs clv)`` (frexp/ldexp — exact
  in floating point), accumulating integer per-site scaler counts. The
  final log-likelihood adds ``scaler * ln 2`` — this reproduces libpll's
  scale-buffer semantics (PLL_SCALE_BUFFER, PLL_SCALE_THRESHOLD) without
  any thresholding error, and it works identically in f32 and f64.

The inner per-op math ``clv_p = (P1 @ clv_c1) * (P2 @ clv_c2)`` is factored
into :func:`clv_op_compute` so the Pallas fused kernel
(:mod:`pllmod_tpu.ops.pallas_clv`) can be swapped in.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# TPU matmuls default to bf16 inputs; likelihoods need true f32
_PREC = jax.lax.Precision.HIGHEST

LN2 = 0.6931471805599453


def tip_clv(partition, node):
    """Gather a tip's CLV [patterns, S] from the code lookup table."""
    codes = lax.dynamic_index_in_dim(partition.tip_states, node, axis=0,
                                     keepdims=False)          # [patterns]
    return partition.code_clv[codes]                           # [patterns, S]


def get_node_clv(partition, clvs, scalers, node):
    """CLV + scaler for any node (tip or inner). Returns
    ([patterns, C, S], [patterns] int32)."""
    n_tips = partition.n_tips
    C = clvs.shape[2]

    def from_tip(_):
        clv = tip_clv(partition, node)                          # [P, S]
        clv = jnp.broadcast_to(clv[:, None, :], (clv.shape[0], C, clv.shape[1]))
        return clv, jnp.zeros(clv.shape[0], dtype=jnp.int32)

    def from_inner(_):
        slot = node - n_tips
        return (lax.dynamic_index_in_dim(clvs, slot, axis=0, keepdims=False),
                lax.dynamic_index_in_dim(scalers, slot, axis=0, keepdims=False))

    return lax.cond(node < n_tips, from_tip, from_inner, None)


def clv_op_compute(c1, c2, P1, P2):
    """One pruning op: clv_p[p,c,i] = (Σ_j P1[c,i,j] c1[p,c,j]) *
    (Σ_j P2[c,i,j] c2[p,c,j]). Shapes: c* [P,C,S], P* [C,S,S]."""
    dtype = c1.dtype
    left = jnp.einsum("pcj,cij->pci", c1, P1, preferred_element_type=dtype,
                      precision=_PREC)
    right = jnp.einsum("pcj,cij->pci", c2, P2, preferred_element_type=dtype,
                      precision=_PREC)
    return left * right


def rescale(clv):
    """Exact power-of-two per-site rescaling.

    Returns (clv * 2^-e, e) with e = exponent of the per-site max over
    categories and states (0 where the site is all-zero)."""
    m = jnp.max(clv, axis=(1, 2))                              # [P]
    _, e = jnp.frexp(m)
    e = jnp.where(m > 0, e, 0).astype(jnp.int32)
    scaled = jnp.ldexp(clv, -e[:, None, None]).astype(clv.dtype)
    return scaled, e


def update_partials(partition, P, ops, init_clvs=None, init_scalers=None):
    """Run all pruning ops in sequence (post-order), returning the full CLV
    buffer for inner nodes.

    The step body is branch-free: masked rows (parent_slot == -1) compute
    harmlessly and write to a scratch slot — a ``lax.cond`` here would
    make XLA select (i.e. COPY) the entire carry buffer every step, which
    is the difference between µs and ms per node on TPU.

    Args:
      partition: Partition
      P: [edges, C, S, S] transition matrices
      ops: int32 [n_ops, 5]; masked rows have parent_slot == -1
      init_clvs/init_scalers: optional starting buffers (incremental eval),
        shaped [n_ops(+1), ...] — the +1 scratch row is appended if absent
    Returns:
      clvs [n_ops + 1, patterns, C, S], scalers [n_ops + 1, patterns] —
      the last row is scratch (masked-op target); slot i of ops row i as
      usual
    """
    n_inner = ops.shape[0]
    Ppad = partition.n_patterns_padded
    C = partition.n_cats
    S = partition.states
    dtype = partition.dtype

    if init_clvs is None:
        init_clvs = jnp.zeros((n_inner + 1, Ppad, C, S), dtype)
    elif init_clvs.shape[0] == n_inner:
        init_clvs = jnp.concatenate(
            [init_clvs, jnp.zeros((1, Ppad, C, S), dtype)], axis=0)
    if init_scalers is None:
        init_scalers = jnp.zeros((n_inner + 1, Ppad), jnp.int32)
    elif init_scalers.shape[0] == n_inner:
        init_scalers = jnp.concatenate(
            [init_scalers, jnp.zeros((1, Ppad), jnp.int32)], axis=0)

    def step(carry, op):
        clvs, scalers = carry
        # dynamic-slice child access (NOT a gather HLO — XLA lowers
        # dynamic_index to a fast slice; gathers serialize on TPU)
        c1, s1 = get_node_clv(partition, clvs, scalers,
                              jnp.maximum(op[1], 0))
        c2, s2 = get_node_clv(partition, clvs, scalers,
                              jnp.maximum(op[3], 0))
        P1 = lax.dynamic_index_in_dim(P, jnp.maximum(op[2], 0), axis=0,
                                      keepdims=False)
        P2 = lax.dynamic_index_in_dim(P, jnp.maximum(op[4], 0), axis=0,
                                      keepdims=False)
        clv = clv_op_compute(c1, c2, P1, P2)
        clv, e = rescale(clv)
        sc = s1 + s2 + e
        # scratch row = LAST buffer row (not ops count: incremental eval
        # passes short masked-padded op tables over full cached buffers)
        slot = jnp.where(op[0] >= 0, op[0], clvs.shape[0] - 1)
        return (lax.dynamic_update_index_in_dim(clvs, clv, slot, axis=0),
                lax.dynamic_update_index_in_dim(scalers, sc, slot, axis=0)), None

    (clvs, scalers), _ = lax.scan(step, (init_clvs, init_scalers), ops)
    return clvs, scalers


# ---------------------------------------------------------------------------
# Level-synchronous batched pruning (the TPU-first schedule)
# ---------------------------------------------------------------------------
class LevelSchedule:
    """Dependency-leveled pruning schedule with CONTIGUOUS slot ranges.

    All ops in a level depend only on tips and earlier levels, so each
    level runs as ONE batched tensor op (SURVEY §7 "level-synchronous
    pruning"). Slots are renumbered level-by-level so every level writes a
    contiguous block via ``dynamic_update_slice`` — no XLA scatter, which
    is the difference between roofline and disaster on TPU.

    Attributes:
      levels: list of int32 [W_l, 5] arrays (parent_slot renumbered,
        child refs renumbered: < n_tips tip, else n_tips + new_slot)
      n_slots: total slot count
      offsets: per-level starting slot
      remap: int64 [n_slots] old slot -> new slot
    """

    def __init__(self, ops, n_tips: int):
        import numpy as np
        ops = np.asarray(ops)
        self.n_tips = n_tips
        level_of_slot: dict[int, int] = {}
        rows_by_level: dict[int, list] = {}
        for row in ops:
            slot = int(row[0])
            if slot < 0:
                continue
            deps = [level_of_slot[int(c) - n_tips]
                    for c in (row[1], row[3]) if int(c) >= n_tips]
            lvl = (max(deps) + 1) if deps else 0
            level_of_slot[slot] = lvl
            rows_by_level.setdefault(lvl, []).append(row.copy())

        n_old = max(level_of_slot, default=-1) + 1
        self.remap = np.full(max(n_old, 1), -1, np.int64)
        new = 0
        self.offsets = []
        ordered_levels = []
        for lvl in sorted(rows_by_level):
            self.offsets.append(new)
            rows = rows_by_level[lvl]
            for r in rows:
                self.remap[int(r[0])] = new
                new += 1
            ordered_levels.append(rows)
        self.n_slots = new
        # renumber child refs (children always live in earlier levels)
        self.levels = []
        for rows in ordered_levels:
            arr = np.stack(rows).astype(np.int32)
            arr[:, 0] = self.remap[arr[:, 0]]
            for col in (1, 3):
                inner = arr[:, col] >= n_tips
                arr[inner, col] = (n_tips +
                                   self.remap[arr[inner, col] - n_tips])
            self.levels.append(arr)

    def remap_node(self, node: int) -> int:
        """Translate an old node reference (tip or n_tips+old_slot)."""
        if node < self.n_tips:
            return int(node)
        return int(self.n_tips + self.remap[node - self.n_tips])

    @property
    def n_levels(self):
        return len(self.levels)


def gather_node_clvs(partition, clvs, scalers, nodes):
    """Batched, cond-free CLV gather for a vector of node references.

    nodes int32 [W]; returns ([W, P, C, S], [W, P]). Tip rows come from
    the code-CLV lookup (PATTERN_TIP analog), inner rows from the slot
    buffer; both gathers are real gathers (no select over the full
    buffer — the naive vmap(cond) formulation materializes
    [W, n_slots, P, C, S] and OOMs).
    """
    n_tips = partition.n_tips
    C = clvs.shape[2]
    S = partition.code_clv.shape[1]
    is_tip = nodes < n_tips
    tip_idx = jnp.where(is_tip, nodes, 0)
    codes = partition.tip_states[tip_idx]                   # [W, P]
    # per-state gathers: the one-shot code_clv[codes] form emits a
    # [W*P, S] gather temp whose S-wide minor dim XLA-TPU pads to 128
    # lanes (32x HBM at S=4 — 16 GB for 0.5 GB of data, the
    # probe_spr_big 4096x4096 OOM); gathering each state column keeps
    # the minor dim on P and the values bit-identical
    cct = partition.code_clv.T                              # [S, codes]
    tclv = jnp.stack([cct[s][codes] for s in range(S)], -1)  # [W, P, S]
    tclv = jnp.broadcast_to(tclv[:, :, None, :],
                            (*tclv.shape[:2], C, tclv.shape[2]))
    slot_idx = jnp.where(is_tip, 0, nodes - n_tips)
    iclv = clvs[slot_idx]                                   # [W, P, C, S]
    isc = scalers[slot_idx]                                 # [W, P]
    clv = jnp.where(is_tip[:, None, None, None], tclv, iclv)
    sc = jnp.where(is_tip[:, None], 0, isc)
    return clv.astype(partition.dtype), sc


def update_partials_sched(partition, P, levels, offsets, n_slots: int,
                          init_clvs=None, init_scalers=None):
    """Level-batched pruning over a :class:`LevelSchedule`.

    Args:
      levels: tuple of int32 [W_l, 5] arrays (renumbered)
      offsets: tuple of ints — starting slot per level
    Returns:
      (clvs [n_slots, patterns, C, S], scalers [n_slots, patterns])
    """
    Ppad = partition.n_patterns_padded
    C = partition.n_cats
    S = partition.states
    dtype = partition.dtype

    clvs = init_clvs if init_clvs is not None else \
        jnp.zeros((n_slots, Ppad, C, S), dtype)
    scalers = init_scalers if init_scalers is not None else \
        jnp.zeros((n_slots, Ppad), jnp.int32)

    for ops_lvl, off in zip(levels, offsets):
        c1, s1 = gather_node_clvs(partition, clvs, scalers, ops_lvl[:, 1])
        c2, s2 = gather_node_clvs(partition, clvs, scalers, ops_lvl[:, 3])
        P1 = P[ops_lvl[:, 2]]                         # [W,C,S,S]
        P2 = P[ops_lvl[:, 4]]
        left = jnp.einsum("wpcj,wcij->wpci", c1, P1,
                          preferred_element_type=dtype,
                      precision=_PREC)
        right = jnp.einsum("wpcj,wcij->wpci", c2, P2,
                           preferred_element_type=dtype,
                      precision=_PREC)
        clv = left * right
        m = jnp.max(clv, axis=(2, 3))                 # [W,P]
        _, e = jnp.frexp(m)
        e = jnp.where(m > 0, e, 0).astype(jnp.int32)
        clv = jnp.ldexp(clv, -e[:, :, None, None]).astype(dtype)
        sc = s1 + s2 + e
        # contiguous block write — levels own disjoint slot ranges
        clvs = lax.dynamic_update_slice(clvs, clv, (off, 0, 0, 0))
        scalers = lax.dynamic_update_slice(scalers, sc, (off, 0))
    return clvs, scalers


def compile_levels(ops, n_tips: int):
    """Back-compat helper: padded [L, W, 5] level array WITHOUT slot
    renumbering (kept for the test suite's structural checks)."""
    import numpy as np
    ops = np.asarray(ops)
    level_of_slot = {}
    rows_by_level = {}
    for row in ops:
        slot = int(row[0])
        if slot < 0:
            continue
        deps = [level_of_slot[int(c) - n_tips]
                for c in (row[1], row[3]) if int(c) >= n_tips]
        lvl = (max(deps) + 1) if deps else 0
        level_of_slot[slot] = lvl
        rows_by_level.setdefault(lvl, []).append(row)
    if not rows_by_level:
        return np.full((1, 1, 5), -1, np.int32)
    n_levels = max(rows_by_level) + 1
    width = max(len(v) for v in rows_by_level.values())
    out = np.full((n_levels, width, 5), -1, np.int32)
    for lvl, rows in rows_by_level.items():
        out[lvl, :len(rows)] = rows
    return out


# ---------------------------------------------------------------------------
# Memory-bounded slot assignment (pll_utree_traverse_apply's reusable CLV
# slots, pll_tree.c:1509-1573): a Sethi-Ullman-ordered serial schedule
# whose parent slots are recycled the moment their single consumer has
# read them, so a full-tree evaluation needs only O(log n) live CLVs —
# ~16 slots for 10,000 taxa instead of ~10,000 (BASELINE.md §3
# north-star memory plan; see PERF_NOTES.md "Memory").
# ---------------------------------------------------------------------------
def bounded_slot_ops_pipelined(ops, n_tips: int, root_refs=None,
                               lookahead: int = 24, min_dist: int = 3,
                               slack: int = 8):
    """Slot-recycled serial schedule REORDERED for the fused megakernel's
    2-deep write pipeline: a windowed peephole over the Sethi-Ullman
    order that at each position emits the earliest of the next
    ``lookahead`` ready rows whose children were written ≥ ``min_dist``
    rows back (no RAW fence — the plain SU order fences ~75% of rows at
    10k taxa, stalling the kernel's DMA prefetch on every one), falling
    back to the earliest ready row (fence) when the DAG truly
    serializes. Slots recycle through a FIFO queue seeded with
    ``lookahead + slack`` spares so a freed slot is not immediately
    rewritten; live slots ≤ SU bound + lookahead + slack. Same contract
    as :func:`bounded_slot_ops`."""
    import numpy as np
    from collections import deque
    ops = np.asarray(ops)
    live = ops[ops[:, 0] >= 0]
    children = {int(r[0]): ((int(r[1]), int(r[2])),
                            (int(r[3]), int(r[4]))) for r in live}
    pinned = set()
    if root_refs is not None:
        pinned = {int(x) - n_tips for x in root_refs if int(x) >= n_tips}
    # SU emission order of ORIGINAL slots: replay bounded_slot_ops on a
    # copy to obtain the order (its out_rows are in SU order but with
    # recycled ids; we need original ids — recompute the order here via
    # the same needier-child-first postorder)
    order = _su_emission_order(live, n_tips)
    n = len(order)
    dep = {}
    n_cons = {s: 0 for s in children}
    for s, ((c1, _e1), (c2, _e2)) in children.items():
        ds = [c - n_tips for c in (c1, c2)
              if c >= n_tips and (c - n_tips) in children]
        dep[s] = ds
        for d in ds:
            n_cons[d] += 1
    emitted = {}
    cons_left = dict(n_cons)
    free = deque(range(lookahead + slack))
    next_slot = [lookahead + slack]
    slot_map = {}
    out_rows = []
    taken = [False] * n
    head = 0

    def alloc():
        if free:
            return free.popleft()
        v = next_slot[0]
        next_slot[0] += 1
        return v

    while head < n:
        pos = len(out_rows)
        pick = None
        scanned = 0
        i = head
        while i < n and scanned < lookahead:
            if not taken[i]:
                s = order[i]
                if all(d in emitted for d in dep[s]):
                    if all(pos - emitted[d] >= min_dist
                           for d in dep[s]):
                        pick = i
                        break
                    if pick is None:
                        pick = i          # fence fallback: earliest ready
                scanned += 1
            i += 1
        if pick is None:                  # nothing ready in window
            pick = next(j for j in range(head, n) if not taken[j])
        s = order[pick]
        taken[pick] = True
        while head < n and taken[head]:
            head += 1
        (c1, e1), (c2, e2) = children[s]

        def ref(c):
            return c if c < n_tips else n_tips + slot_map[c - n_tips]

        r1, r2 = ref(c1), ref(c2)
        for d in dep[s]:
            cons_left[d] -= 1
            if cons_left[d] == 0 and d not in pinned:
                free.append(slot_map[d])
        slot_map[s] = alloc()
        emitted[s] = pos
        out_rows.append([slot_map[s], r1, e1, r2, e2])
    return (np.asarray(out_rows, np.int32), next_slot[0], slot_map)


def _su_emission_order(live, n_tips: int):
    """Original-slot emission order of :func:`bounded_slot_ops` (the
    needier-child-first Sethi-Ullman postorder), without slot ids."""
    import numpy as np
    children = {int(r[0]): ((int(r[1]), int(r[2])),
                            (int(r[3]), int(r[4]))) for r in live}
    need = {}

    def compute_need(slot):
        stack = [(slot, False)]
        while stack:
            s2, done = stack.pop()
            if s2 in need:
                continue
            kids = [c - n_tips for (c, _e) in children[s2] if c >= n_tips]
            if done or not kids:
                n1 = need.get(kids[0], 0) if len(kids) > 0 else 0
                n2 = need.get(kids[1], 0) if len(kids) > 1 else 0
                if not kids:
                    need[s2] = 1
                elif len(kids) == 1:
                    need[s2] = max(n1, 1)
                else:
                    need[s2] = (n1 + 1) if n1 == n2 else max(n1, n2)
            else:
                stack.append((s2, True))
                for k in kids:
                    stack.append((k, False))

    roots = set(children) - {int(c) - n_tips for r in live
                             for c in (r[1], r[3]) if int(c) >= n_tips}
    order = []
    for r in sorted(roots):
        compute_need(r)
        stack = [(r, False)]
        while stack:
            s2, done = stack.pop()
            if done:
                order.append(s2)
            else:
                stack.append((s2, True))
                kids = [(c - n_tips) for (c, _e) in children[s2]
                        if c >= n_tips]
                kids.sort(key=lambda k: need[k])
                for k in kids:
                    stack.append((k, False))
    return order


def bounded_slot_ops(ops, n_tips: int, root_refs=None):
    """Reorder a pruning op table into a slot-recycling serial schedule.

    Args:
      ops: int32 [n_inner, 5] from Tree.traversal_ops (masked rows
        dropped)
      n_tips: tip count
      root_refs: optional (u, v) node refs that must stay LIVE at the end
        (the virtual-root endpoints); their slots are never recycled.
    Returns:
      (ops_bounded [n_live, 5], n_slots, slot_map) — child refs remapped
      to the recycled slot space; ``slot_map[old_slot] = bounded slot``
      valid for slots alive at the END of the schedule (root endpoints).
    """
    import numpy as np
    ops = np.asarray(ops)
    live = ops[ops[:, 0] >= 0]
    children = {int(r[0]): ((int(r[1]), int(r[2])), (int(r[3]), int(r[4])))
                for r in live}

    # register need (Strahler-style): tips cost 0; evaluating the needier
    # child first bounds concurrent live slots by need(root) <= log2(n)+1
    need = {}

    def compute_need(slot):
        stack = [(slot, False)]
        while stack:
            s, done = stack.pop()
            if s in need:
                continue
            kids = [c - n_tips for (c, _e) in children[s] if c >= n_tips]
            if done or not kids:
                n1 = need.get(kids[0], 0) if len(kids) > 0 else 0
                n2 = need.get(kids[1], 0) if len(kids) > 1 else 0
                if not kids:
                    need[s] = 1
                elif len(kids) == 1:
                    need[s] = max(n1, 1)
                else:
                    need[s] = (n1 + 1) if n1 == n2 else max(n1, n2)
            else:
                stack.append((s, True))
                for k in kids:
                    stack.append((k, False))

    roots = set(children) - {int(c) - n_tips for r in live
                             for c in (r[1], r[3]) if int(c) >= n_tips}
    for r in sorted(roots):
        compute_need(r)

    out_rows = []
    slot_map = {}
    free = []
    next_slot = [0]
    pinned = set()
    if root_refs is not None:
        pinned = {int(x) - n_tips for x in root_refs if int(x) >= n_tips}

    def alloc():
        if free:
            return free.pop()
        s = next_slot[0]
        next_slot[0] += 1
        return s

    def emit(slot):
        # iterative post-order, needier child first
        stack = [(slot, False)]
        while stack:
            s, done = stack.pop()
            if done:
                (c1, e1), (c2, e2) = children[s]

                def ref(c):
                    return c if c < n_tips else n_tips + slot_map[c - n_tips]

                r1, r2 = ref(c1), ref(c2)
                # consume (free) child slots BEFORE allocating the parent
                for c in (c1, c2):
                    cs = c - n_tips
                    if c >= n_tips and cs not in pinned:
                        free.append(slot_map[cs])
                slot_map[s] = alloc()
                out_rows.append([slot_map[s], r1, e1, r2, e2])
            else:
                stack.append((s, True))
                kids = [(c - n_tips) for (c, _e) in children[s]
                        if c >= n_tips]
                kids.sort(key=lambda k: need[k])   # needier LAST = popped first
                for k in kids:
                    stack.append((k, False))
    for r in sorted(roots):
        emit(r)
    return (np.asarray(out_rows, np.int32), next_slot[0], slot_map)
