"""Branch-length optimization: all edges at once from directed CLVs.

TPU re-design of the reference's iterative BLO
(``pllmod_opt_optimize_branch_lengths_local_multi`` +
``recomp_iterative_multi``, pll_optimize.c:1395-1951; call stack SURVEY.md
§3.2). The reference walks the tree edge-by-edge, re-orienting one CLV per
step and running a serial Newton per edge (Gauss-Seidel). That serial chain
is hostile to TPU; instead:

1. **Directed CLVs in O(n)**: one post-order pass (every node's CLV toward
   its parent) plus one pre-order pass (every node's CLV away from each
   child) yields, for every edge (u,v), the two conditional likelihood
   vectors facing each other across the edge. Both passes run through the
   same masked-scan pruning kernel (:func:`pllmod_tpu.ops.clv.update_partials`).
2. **Batched sumtables**: one gather + einsum produces the sumtable of
   every edge at once (libpll computes them one edge at a time).
3. **Batched bracketed Newton**: every branch optimizes to convergence
   simultaneously from its sumtable — a Jacobi-style sweep. A few sweeps
   (each O(n) CLV work) replace the reference's smoothing loops, and a
   monotonicity guard (the SAFE-mode analog, pll_optimize.c:1587-1632)
   keeps the best iterate and damps on overshoot.

The per-sweep log-likelihood comes free from the edge derivatives (every
edge's sumtable evaluates the same tree logL), so no extra traversal.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pllmod_tpu.common import (MIN_BRANCH_LEN, MAX_BRANCH_LEN, TOL_BRANCH_LEN)
from pllmod_tpu.ops import derivatives as deriv_mod
from pllmod_tpu.ops import clv as clv_mod
from pllmod_tpu.optimize.newton import minimize_newton_multi


class DirectedTraversal:
    """Compiled directed-CLV schedule for a tree (host-side, O(n)).

    Produces:
      ops: int32 [3*(n_tips-2), 5] — schedule rows for every (inner node,
        direction) CLV; consumed by update_partials. Node references encode
        tips as ``t < n_tips`` and directed slots as ``n_tips + slot``.
      edge_ref: int32 [n_edge_slots, 2] — per edge id, the references of
        the two CLVs facing each other across the edge (masked rows (0,0)).
      edge_mask: bool [n_edge_slots] — live edges.

    The equivalent state in the reference is treeinfo's per-subnode
    ``clv_valid`` bookkeeping (treeinfo.c:230-352); here directions are
    materialized slots instead of invalidation flags.
    """

    def __init__(self, tree, root_tip: int = 0):
        n_tips = tree.n_tips
        from pllmod_tpu import native
        if native.available():
            out = native.directed_traversal(tree.edge_nodes, n_tips,
                                            tree.n_nodes, root_tip)
            if out is not None:
                # native fast path (identical slot numbering — the SPR
                # candidate host-build hot loop at >=1k taxa)
                ops, slot_de = out
                en = tree.edge_nodes
                live = en[:, 0] >= 0
                tip0 = en[:, 0] < n_tips
                tip1 = en[:, 1] < n_tips
                ref0 = np.where(tip0, en[:, 0], n_tips + slot_de[:, 0])
                ref1 = np.where(tip1, en[:, 1], n_tips + slot_de[:, 1])
                ok = (live & (tip0 | (slot_de[:, 0] >= 0))
                      & (tip1 | (slot_de[:, 1] >= 0)))
                edge_ref = np.zeros((len(en), 2), np.int32)
                edge_ref[ok, 0] = ref0[ok]
                edge_ref[ok, 1] = ref1[ok]
                self.n_tips = n_tips
                self.ops = np.ascontiguousarray(ops)
                self.edge_ref = edge_ref
                self.edge_mask = np.asarray(ok)
                self._slot_de = slot_de
                self._en = en.copy()
                self._slot_of = None
                self._sched = None
                return
        adj = tree.adjacency()
        # root at root_tip's neighbor
        (r, _e0), = adj[root_tip]
        slot_of: dict[tuple[int, int], int] = {}
        rows: list[list[int]] = []

        def ref(node, toward):
            return node if node < n_tips else n_tips + slot_of[(node, toward)]

        # --- post-order: slot (u -> parent) for every inner u -------------
        # (traverse from r with tip 0 as the virtual ancestor)
        post = tree.postorder(r, avoid_edge=_e0)
        for node, parent, pedge in post:
            if node < n_tips:
                continue
            par = parent if parent != -1 else root_tip
            kids = [(nbr, e) for nbr, e in adj[node]
                    if nbr != par and e != (pedge if parent != -1 else _e0)]
            assert len(kids) == 2, "tree must be binary for BLO"
            slot = len(rows)
            slot_of[(node, par)] = slot
            rows.append([slot, ref(kids[0][0], node), kids[0][1],
                         ref(kids[1][0], node), kids[1][1]])

        # --- pre-order: slots (u -> child) ---------------------------------
        stack = [(r, root_tip, _e0)]  # (node, parent, edge_to_parent)
        while stack:
            u, par, pe = stack.pop()
            if u < n_tips:
                continue
            kids = [(nbr, e) for nbr, e in adj[u] if e != pe]
            (c1, e1), (c2, e2) = kids
            for (c, ec), (o, eo) in (((c1, e1), (c2, e2)),
                                     ((c2, e2), (c1, e1))):
                slot = len(rows)
                slot_of[(u, c)] = slot
                rows.append([slot, ref(par, u), pe, ref(o, u), eo])
            stack.append((c1, u, e1))
            stack.append((c2, u, e2))

        n_edge_slots = len(tree.edge_nodes)
        edge_ref = np.zeros((n_edge_slots, 2), np.int32)
        edge_mask = np.zeros(n_edge_slots, bool)
        for e, (u, v) in enumerate(tree.edge_nodes):
            u, v = int(u), int(v)
            if u < 0:
                continue
            try:
                edge_ref[e] = (ref(u, v), ref(v, u))
                edge_mask[e] = True
            except KeyError:
                pass  # edge outside the traversed component (pruned remainder)

        self.n_tips = n_tips
        self.ops = np.asarray(rows, np.int32).reshape(-1, 5)
        self.edge_ref = edge_ref
        self.edge_mask = edge_mask
        self._slot_of = slot_of
        self._sched = None

    @property
    def slot_of(self) -> dict:
        """(node, toward-neighbor) -> directed slot. Built lazily on
        the native path (most remainder-tree traversals never need
        it)."""
        if self._slot_of is None:
            so = {}
            en, sd = self._en, self._slot_de
            for e in range(len(en)):
                u, v = int(en[e, 0]), int(en[e, 1])
                if u < 0:
                    continue
                if sd[e, 0] >= 0:
                    so[(u, v)] = int(sd[e, 0])
                if sd[e, 1] >= 0:
                    so[(v, u)] = int(sd[e, 1])
            self._slot_of = so
        return self._slot_of

    def schedule(self):
        """Level schedule over the directed ops + remapped edge refs.

        Returns (levels tuple, offsets tuple, edge_ref_remapped, n_slots):
        the level-batched form of this traversal (contiguous slot blocks;
        see clv.LevelSchedule)."""
        if self._sched is None:
            from pllmod_tpu.ops.clv import LevelSchedule
            sched = LevelSchedule(self.ops, self.n_tips)
            edge_ref = self.edge_ref.copy()
            inner = edge_ref >= self.n_tips
            edge_ref[inner] = (self.n_tips +
                               sched.remap[edge_ref[inner] - self.n_tips])
            self._sched_remap = sched.remap
            self._sched = (tuple(jnp.asarray(l) for l in sched.levels),
                           tuple(sched.offsets), jnp.asarray(edge_ref),
                           sched.n_slots)
        return self._sched

    def sched_slot(self, node: int, toward: int) -> int:
        """Directed-CLV slot of (node -> toward) under the level schedule."""
        self.schedule()
        return int(self._sched_remap[self.slot_of[(node, toward)]])


def _edge_sumtables(partition, clvs, scalers, edge_ref, eigen):
    """Batched sumtables for every edge from directed CLVs (cond-free
    gathers). Returns (st [E,P,C,S], sc [E,P])."""
    clv_p, s_p = clv_mod.gather_node_clvs(partition, clvs, scalers,
                                          edge_ref[:, 0])
    clv_c, s_c = clv_mod.gather_node_clvs(partition, clvs, scalers,
                                          edge_ref[:, 1])
    st = jax.vmap(lambda a, b: deriv_mod.sumtable(partition, a, b, eigen))(
        clv_p, clv_c)
    return st, s_p + s_c


def _directed_clvs(partition, P, levels, offsets, n_slots, fused):
    """Directed-CLV buffers: fused Pallas megakernel on TPU f32 (original
    slot numbering; pair with the UN-remapped edge_ref), level-batched XLA
    otherwise."""
    if fused is None:
        return clv_mod.update_partials_sched(partition, P, levels,
                                             offsets, n_slots)
    from pllmod_tpu.ops import pallas_clv
    idx8, e1, e2, ns, interp = fused
    return pallas_clv.update_partials_fused_std(partition, P, idx8, e1, e2,
                                                ns, interp)


def _fused_args(partition, trav, newton_parts=None):
    """Fused-kernel kwargs for the BLO sweeps, or {} off the TPU path.

    Includes ``eref6`` (the edge-ref rows for the pallas sumtable/
    derivative kernels): when present the sweeps run the FULLY fused
    pipeline — megakernel directed CLVs in CS×P layout → pallas
    sumtables → pallas derivative evals per Newton iteration — with no
    layout conversion and no gather HLO (measured 29.6 → single-digit
    ms/sweep on the flagship, PERF_NOTES).

    ``fused_newton`` (a STATIC flag decided here, at call time — an env
    read inside the jitted sweep would be frozen into the first trace)
    selects the per-edge VMEM-resident Newton kernel when every
    partition's sumtable row fits VMEM (``newton_parts`` lists them for
    the multi-partition sweep; defaults to the single partition)."""
    import os

    from pllmod_tpu.ops import engine as engine_mod
    # every partition runs the fused pipeline (megakernel + sumtable
    # kernel), so every one must pass the kernel-shape gate — a lone
    # unsupported shape (e.g. 5-state CS=20) must drop the WHOLE sweep
    # to the XLA path (Mosaic rejects its tiling at compile time)
    if not all(engine_mod.use_fast_kernel(p)
               for p in (newton_parts or (partition,))):
        return {}
    from pllmod_tpu.ops import pallas_clv, pallas_deriv
    idx8, e1, e2, ns = pallas_clv.compile_fused_ops(partition, trav.ops)
    eref6 = pallas_deriv.compile_edge_refs(trav.edge_ref, trav.edge_mask,
                                           partition.n_tips)
    fused_newton = (
        pallas_deriv.newton_fits_vmem(*(newton_parts or (partition,)))
        and os.environ.get("PLLMOD_FUSED_NEWTON", "1") != "0")
    return dict(fused_idx=(idx8, e1, e2), fused_nslots=ns,
                fused_interp=engine_mod.fast_kernel_interpret(),
                eref6=eref6, fused_newton=fused_newton)


def _edge_colors(tree, edge_mask=None):
    """Greedy proper edge coloring (host): no two same-color edges share
    a node, so a same-color batched Newton step is a TRUE block
    Gauss-Seidel step — the strongest (adjacent-edge) coupling that makes
    plain Jacobi oscillate is excluded from every simultaneous update.
    Trees have max degree 3, so greedy uses ≤ 3-4 colors. Returns a list
    of bool [n_edge_slots] masks."""
    adj = tree.adjacency()
    n_edges = len(tree.edge_nodes)
    colors: dict[int, int] = {}
    for e, (u, v) in enumerate(tree.edge_nodes):
        u, v = int(u), int(v)
        if u < 0 or (edge_mask is not None and not edge_mask[e]):
            continue
        used = {colors.get(int(ee)) for n in (u, v) for _, ee in adj[n]
                if int(ee) != e}
        c = 0
        while c in used:
            c += 1
        colors[e] = c
    ncol = max(colors.values()) + 1 if colors else 1
    masks = [np.zeros(n_edges, bool) for _ in range(ncol)]
    for e, c in colors.items():
        masks[c][e] = True
    return masks


def _deriv_pipeline_fast(partition, brlens, fused_idx, fused_nslots,
                         fused_interp, eref6):
    """Fully fused TPU derivative pipeline: megakernel directed CLVs in
    native CS×P (split) layout → pallas per-edge sumtables. Returns
    (st, sc, eigen, lnB) ready for :func:`edge_derivatives_pallas`."""
    from pllmod_tpu.ops import engine as engine_mod
    from pllmod_tpu.ops import pallas_clv, pallas_deriv
    split = engine_mod.use_split_clv(partition)
    idx8, fe1, fe2 = fused_idx
    P12 = pallas_clv.fused_p12(partition, brlens, fe1, fe2)
    clvs, scalers = pallas_clv.update_partials_fused(
        partition, None, idx8, fe1, fe2, fused_nslots,
        interpret=fused_interp, P12=P12, split=split)
    eigen = partition.eigen()
    # the sumtable kernel's split flag is about the BUFFER layout: only
    # storage mode (True) yields bf16x2 planes; "read" traversals write
    # plain f32 buffers
    st, sc = pallas_deriv.edge_sumtables_pallas(
        partition, clvs, scalers, eref6, split=split is True,
        interpret=fused_interp)
    return st, sc, eigen, pallas_deriv.invar_log_plane(partition)


def _safe_accept(edge_mask, brlens, t_opt, l_old_all, l_new_all,
                 axis_name):
    """Per-edge eval-and-revert of the reference's SAFE mode
    (PLLMOD_OPT_BLO_NEWTON_SAFE, pll_optimize.c:1587-1632): edge ``e``'s
    proposed length is accepted only if the tree logL with ONLY that
    edge changed does not drop.  ``l_*_all[e]`` is exactly that
    quantity — per-edge logL through edge ``e``'s sumtable (others at
    incoming lengths), so one batched derivative evaluation at the
    proposed lengths replaces the reference's serial re-evaluations.
    The tolerance absorbs the dtype's rounding noise at the logL scale
    (the reference compares exactly, in double)."""
    dtype = brlens.dtype
    l_old = l_old_all.astype(dtype)
    l_new = l_new_all.astype(dtype)
    if axis_name is not None:
        l_old = jax.lax.psum(l_old, axis_name)
        l_new = jax.lax.psum(l_new, axis_name)
    eps = 32.0 * jnp.finfo(dtype).eps * (1.0 + jnp.abs(l_old))
    accept = l_new >= l_old - eps
    return jnp.where(edge_mask & accept, t_opt, brlens)


@partial(jax.jit, static_argnames=("n_slots", "max_newton_iters",
                                   "fused_nslots", "fused_interp",
                                   "fused_newton", "axis_name", "safe"))
def _blo_sweep(partition, levels, offsets, edge_ref, edge_mask, brlens,
               min_brlen, max_brlen, tol, n_slots: int,
               max_newton_iters: int = 10, fused_idx=None,
               fused_nslots=None, fused_interp=False, eref6=None,
               fused_newton: bool = False, axis_name=None,
               safe: bool = False):
    """One Jacobi BLO sweep. Returns (new_brlens, logL at incoming brlens).

    ``edge_mask`` doubles as the update selector: a color sub-sweep
    passes only its color class (see :func:`_edge_colors`).

    ``axis_name``: running under shard_map on a site mesh — per-shard
    sumtables, with every Newton iteration's (df, ddf) and the sweep
    logL psum-reduced (the reference's per-iteration collective,
    pll_optimize.c:1270-1286). The in-kernel fused Newton cannot psum
    per iteration, so sharded sweeps use the iterative path.

    ``safe``: per-edge eval-and-revert (see :func:`_safe_accept`)."""
    live_idx = jnp.argmax(edge_mask)               # any live edge
    if eref6 is not None:
        from pllmod_tpu.ops import pallas_deriv
        st, sc, eigen, lnB = _deriv_pipeline_fast(
            partition, brlens, fused_idx, fused_nslots, fused_interp,
            eref6)
        if fused_newton and axis_name is None:
            # fused per-edge Newton: whole bracketed optimization per
            # edge against its VMEM-resident sumtable row — ONE st read
            # total instead of one per Newton iteration (the measured
            # bound of the iterative sweep)
            t_all, lnl0_all = pallas_deriv.newton_edges_pallas(
                partition, st, sc, brlens, min_brlen, max_brlen, tol,
                max_newton_iters, eigen, lnB, fused_interp)
            lnl0 = lnl0_all[live_idx].astype(brlens.dtype)
            t_opt = t_all.astype(brlens.dtype)
            if safe:
                # recompute the baseline with the SAME evaluator as
                # l_new so the comparison's fp noise is symmetric
                l_old_all, _, _ = pallas_deriv.edge_derivatives_pallas(
                    partition, st, sc, brlens, eigen, lnB, fused_interp)
                l_new_all, _, _ = pallas_deriv.edge_derivatives_pallas(
                    partition, st, sc, t_opt, eigen, lnB, fused_interp)
                return _safe_accept(edge_mask, brlens, t_opt, l_old_all,
                                    l_new_all, axis_name), lnl0
            return jnp.where(edge_mask, t_opt, brlens), lnl0
        lnl0_all, _, _ = pallas_deriv.edge_derivatives_pallas(
            partition, st, sc, brlens, eigen, lnB, fused_interp)
        lnl0 = lnl0_all[live_idx].astype(brlens.dtype)

        def deriv_fn(t):
            _, df, ddf = pallas_deriv.edge_derivatives_pallas(
                partition, st, sc, t, eigen, lnB, fused_interp)
            return df.astype(t.dtype), ddf.astype(t.dtype)

        def l_at(t):
            l_all, _, _ = pallas_deriv.edge_derivatives_pallas(
                partition, st, sc, t, eigen, lnB, fused_interp)
            return l_all
    else:
        P = partition.prob_matrices(brlens)
        fused = None if fused_nslots is None else (
            fused_idx[0], fused_idx[1], fused_idx[2], fused_nslots,
            fused_interp)
        clvs, scalers = _directed_clvs(partition, P, levels, offsets,
                                       n_slots, fused)
        eigen = partition.eigen()
        st, sc = _edge_sumtables(partition, clvs, scalers, edge_ref, eigen)

        lnl0_all, _, _ = deriv_mod.edge_derivatives_batch(
            partition, st, sc, brlens, eigen)
        lnl0 = lnl0_all[live_idx]

        def deriv_fn(t):
            _, df, ddf = deriv_mod.edge_derivatives_batch(
                partition, st, sc, t, eigen)
            return df, ddf

        def l_at(t):
            l_all, _, _ = deriv_mod.edge_derivatives_batch(
                partition, st, sc, t, eigen)
            return l_all

    if axis_name is not None:
        _local_deriv = deriv_fn

        def deriv_fn(t):
            df, ddf = _local_deriv(t)
            return (jax.lax.psum(df, axis_name),
                    jax.lax.psum(ddf, axis_name))

        lnl0 = jax.lax.psum(lnl0, axis_name)

    t_opt = minimize_newton_multi(deriv_fn, brlens, min_brlen, max_brlen,
                                  tol=tol, max_iters=max_newton_iters)
    if safe:
        return _safe_accept(edge_mask, brlens, t_opt, lnl0_all,
                            l_at(t_opt), axis_name), lnl0
    return jnp.where(edge_mask, t_opt, brlens), lnl0


@partial(jax.jit, static_argnames=("n_slots", "fused_nslots",
                                   "fused_interp", "fused_newton",
                                   "axis_name", "safe"))
def _lnl_at(partition, levels, offsets, edge_ref, edge_mask, brlens,
            n_slots: int, fused_idx=None, fused_nslots=None,
            fused_interp=False, eref6=None, fused_newton: bool = False,
            axis_name=None, safe: bool = False):
    # fused_newton/safe are accepted (callers splat _fused_args) but
    # unused: a bare logL evaluation has no Newton loop to guard
    if eref6 is not None:
        from pllmod_tpu.ops import pallas_deriv
        st, sc, eigen, lnB = _deriv_pipeline_fast(
            partition, brlens, fused_idx, fused_nslots, fused_interp,
            eref6)
        lnl_all, _, _ = pallas_deriv.edge_derivatives_pallas(
            partition, st, sc, brlens, eigen, lnB, fused_interp)
        lnl = lnl_all[jnp.argmax(edge_mask)].astype(brlens.dtype)
        if axis_name is not None:
            lnl = jax.lax.psum(lnl, axis_name)
        return lnl
    P = partition.prob_matrices(brlens)
    fused = None if fused_nslots is None else (
        fused_idx[0], fused_idx[1], fused_idx[2], fused_nslots, fused_interp)
    clvs, scalers = _directed_clvs(partition, P, levels, offsets, n_slots,
                                   fused)
    eigen = partition.eigen()
    e = jnp.argmax(edge_mask)
    ref = edge_ref[e]
    clv_p, s_p = clv_mod.gather_node_clvs(partition, clvs, scalers,
                                          ref[:1])
    clv_c, s_c = clv_mod.gather_node_clvs(partition, clvs, scalers,
                                          ref[1:])
    st = deriv_mod.sumtable(partition, clv_p[0], clv_c[0], eigen)
    lnl, _, _ = deriv_mod.edge_derivatives(partition, st, s_p[0] + s_c[0],
                                           brlens[e], eigen)
    return lnl


@partial(jax.jit, static_argnames=("n_slots", "max_newton_iters",
                                   "fused_nslots", "fused_interp",
                                   "fused_newton", "axis_name", "safe"))
def _blo_sweep_multi(partitions, scalers, levels, offsets, edge_ref,
                     edge_mask, brlens, min_brlen, max_brlen, tol,
                     n_slots: int, max_newton_iters: int = 10,
                     fused_idx=None, fused_nslots=None,
                     fused_interp=False, eref6=None,
                     fused_newton: bool = False, axis_name=None,
                     safe: bool = False):
    """One Jacobi BLO sweep over SHARED branch lengths across partitions.

    Multi-partition derivative accumulation with per-partition scalers
    (chain rule df·s, ddf·s² — pll_optimize.c:1249-1267); the cross-rank
    reduce of the reference (pll_optimize.c:1270-1286) is the mesh psum.

    Args:
      partitions: tuple of Partition pytrees (shapes may differ)
      scalers: tuple of scalar brlen scalers (SCALED mode; 1.0 otherwise)
    Returns (new_brlens, logL at incoming brlens).
    """
    st_all, sc_all, eig_all, lnb_all = [], [], [], []
    lnl0 = 0.0
    live_idx = jnp.argmax(edge_mask)
    fused = None if fused_nslots is None else (
        fused_idx[0], fused_idx[1], fused_idx[2], fused_nslots, fused_interp)
    if eref6 is not None:
        from pllmod_tpu.ops import pallas_deriv
        for part, s in zip(partitions, scalers):
            st, sc, eigen, lnB = _deriv_pipeline_fast(
                part, brlens * s, fused_idx, fused_nslots, fused_interp,
                eref6)
            st_all.append(st)
            sc_all.append(sc)
            eig_all.append(eigen)
            lnb_all.append(lnB)

    def l_at(t):
        """Per-edge logL summed over partitions: element ``e`` is the
        tree logL with ONLY edge e at t[e] (others at sweep-start)."""
        tot = jnp.zeros_like(t)
        for i, (part, s, st, sc, eigen) in enumerate(
                zip(partitions, scalers, st_all, sc_all, eig_all)):
            if eref6 is not None:
                l_all, _, _ = pallas_deriv.edge_derivatives_pallas(
                    part, st, sc, t * s, eigen, lnb_all[i], fused_interp)
            else:
                l_all, _, _ = deriv_mod.edge_derivatives_batch(
                    part, st, sc, t * s, eigen)
            tot = tot + l_all.astype(t.dtype)
        return tot

    if eref6 is not None:
        if fused_newton and axis_name is None:
            # multi-partition fused Newton: every partition's sumtable
            # row for an edge resident in VMEM at once; per-iteration
            # (lnl, df, ddf) accumulate over partitions IN-KERNEL with
            # the SCALED-mode chain rule folded into the λr rows
            # (pll_optimize.c:1223-1287)
            t_all, lnl0_all = pallas_deriv.newton_edges_pallas_multi(
                partitions, st_all, sc_all, brlens, scalers, min_brlen,
                max_brlen, tol, max_newton_iters, eig_all, lnb_all,
                fused_interp)
            lnl0 = lnl0_all[live_idx].astype(brlens.dtype)
            t_opt = t_all.astype(brlens.dtype)
            if safe:
                return _safe_accept(edge_mask, brlens, t_opt,
                                    l_at(brlens), l_at(t_opt),
                                    axis_name), lnl0
            return jnp.where(edge_mask, t_opt, brlens), lnl0
        for part, s, st, sc, eigen, lnB in zip(partitions, scalers,
                                               st_all, sc_all, eig_all,
                                               lnb_all):
            l0_all, _, _ = pallas_deriv.edge_derivatives_pallas(
                part, st, sc, brlens * s, eigen, lnB, fused_interp)
            lnl0 = lnl0 + l0_all[live_idx].astype(brlens.dtype)
    else:
        for part, s in zip(partitions, scalers):
            P = part.prob_matrices(brlens * s)
            clvs, sclr = _directed_clvs(part, P, levels, offsets, n_slots,
                                        fused)
            eigen = part.eigen()
            st, sc = _edge_sumtables(part, clvs, sclr, edge_ref, eigen)
            l0, _, _ = deriv_mod.edge_derivatives(
                part, st[live_idx], sc[live_idx], brlens[live_idx] * s,
                eigen)
            st_all.append(st)
            sc_all.append(sc)
            eig_all.append(eigen)
            lnl0 = lnl0 + l0

    def deriv_fn(t):
        df_tot = jnp.zeros_like(t)
        ddf_tot = jnp.zeros_like(t)
        for i, (part, s, st, sc, eigen) in enumerate(
                zip(partitions, scalers, st_all, sc_all, eig_all)):
            if eref6 is not None:
                _, df, ddf = pallas_deriv.edge_derivatives_pallas(
                    part, st, sc, t * s, eigen, lnb_all[i], fused_interp)
                df = df.astype(t.dtype)
                ddf = ddf.astype(t.dtype)
            else:
                _, df, ddf = deriv_mod.edge_derivatives_batch(
                    part, st, sc, t * s, eigen)
            df_tot = df_tot + df * s
            ddf_tot = ddf_tot + ddf * s * s
        if axis_name is not None:
            df_tot = jax.lax.psum(df_tot, axis_name)
            ddf_tot = jax.lax.psum(ddf_tot, axis_name)
        return df_tot, ddf_tot

    if axis_name is not None:
        lnl0 = jax.lax.psum(lnl0, axis_name)
    t_opt = minimize_newton_multi(deriv_fn, brlens, min_brlen, max_brlen,
                                  tol=tol, max_iters=max_newton_iters)
    if safe:
        return _safe_accept(edge_mask, brlens, t_opt, l_at(brlens),
                            l_at(t_opt), axis_name), lnl0
    return jnp.where(edge_mask, t_opt, brlens), lnl0


def _driver_loop(sweep_fn, final_fn, brlens, color_masks, tolerance,
                 max_sweeps: int, n_polish: int):
    """The BLO smoothing driver as a traced on-device loop.

    Replicates the host driver's semantics EXACTLY (smoothing sweeps with
    best-iterate tracking, damped retry on a worsening sweep, tolerance
    break, optional damped polish, final evaluation — the batched analog
    of pll_optimize.c:1849-1919's smoothing loop with the SAFE-mode
    revert folded into best-iterate tracking) but runs as ONE device
    program: on the remote-TPU runtime the host driver pays ~40 ms
    dispatch + sync per sub-sweep (~130 per call — the measured e2e
    bound, PERF_NOTES), which this collapses to a single dispatch.

    Args:
      sweep_fn(brlens, cmask) -> (new_brlens, logL at incoming brlens)
      final_fn(brlens) -> logL (exact evaluation at the final iterate)
      color_masks: bool [K, E] — sub-sweep masks of ONE smoothing sweep
        (edge-color classes, or [1, E] for a plain Jacobi sweep)
      max_sweeps: traced scalar (so 8-sweep and 32-sweep callers share
        one compiled program)
    Returns (best_brlens, best_lnl).
    """
    ldtype = brlens.dtype
    tolerance = jnp.asarray(tolerance, ldtype)
    max_sweeps = jnp.asarray(max_sweeps, jnp.int32)

    def one_sweep(brl):
        def body(carry, cm):
            new, lnl = sweep_fn(carry, cm)
            return new, lnl
        out, lnls = jax.lax.scan(body, brl, color_masks)
        return out, lnls[0]          # logL at sweep-START brlens

    def cond(st):
        return (st[0] < max_sweeps) & (~st[6])

    def body(st):
        i, brl, best_b, best_l, lprev, have, _ = st
        new_brl, lnl = one_sweep(brl)
        better = lnl > best_l
        best_l = jnp.where(better, lnl, best_l)
        best_b = jnp.where(better, brl, best_b)
        overshoot = have & (lnl < lprev - 1e-9)
        converged = have & (jnp.abs(lnl - lprev) < tolerance)
        brl_next = jnp.where(overshoot, 0.5 * (best_b + new_brl), new_brl)
        return (i + 1, brl_next, best_b, best_l,
                jnp.where(overshoot, lprev, lnl),
                ~overshoot, converged)

    init = (jnp.asarray(0, jnp.int32), brlens, brlens,
            jnp.asarray(-jnp.inf, ldtype), jnp.asarray(0.0, ldtype),
            jnp.asarray(False), jnp.asarray(False))
    _, brl, best_b, best_l, _, _, _ = jax.lax.while_loop(cond, body, init)

    if n_polish:
        # damped half-step polish from the best iterate (see the host
        # driver: Jacobi sweeps can oscillate around the joint optimum)
        full_mask = jnp.any(color_masks, axis=0)

        def pbody(_, st):
            brl, best_b, best_l = st
            new, lnl = sweep_fn(brl, full_mask)
            better = lnl > best_l
            best_l = jnp.where(better, lnl, best_l)
            best_b = jnp.where(better, brl, best_b)
            return (0.5 * (brl + new), best_b, best_l)

        brl, best_b, best_l = jax.lax.fori_loop(
            0, n_polish, pbody, (brl, best_b, best_l))

    final = final_fn(brl)
    better = final >= best_l
    return (jnp.where(better, brl, best_b),
            jnp.where(better, final, best_l))


@partial(jax.jit, static_argnames=("n_slots", "n_polish",
                                   "max_newton_iters", "fused_nslots",
                                   "fused_interp", "fused_newton",
                                   "axis_name", "safe"))
def _blo_run(partition, levels, offsets, edge_ref, color_masks, edge_mask,
             brlens, min_brlen, max_brlen, tol, tolerance, n_slots: int,
             max_sweeps=32, n_polish: int = 4,
             max_newton_iters: int = 10, fused_idx=None, fused_nslots=None,
             fused_interp=False, eref6=None, fused_newton: bool = False,
             axis_name=None, safe: bool = False):
    """Whole single-partition BLO driver as ONE device program."""
    fargs = dict(fused_idx=fused_idx, fused_nslots=fused_nslots,
                 fused_interp=fused_interp, eref6=eref6,
                 fused_newton=fused_newton, axis_name=axis_name,
                 safe=safe)

    def sweep_fn(brl, cm):
        return _blo_sweep(partition, levels, offsets, edge_ref, cm, brl,
                          min_brlen, max_brlen, tol, n_slots,
                          max_newton_iters=max_newton_iters, **fargs)

    def final_fn(brl):
        return _lnl_at(partition, levels, offsets, edge_ref, edge_mask,
                       brl, n_slots, **fargs)

    return _driver_loop(sweep_fn, final_fn, brlens, color_masks,
                        tolerance, max_sweeps, n_polish)


@partial(jax.jit, static_argnames=("n_slots",
                                   "max_newton_iters", "fused_nslots",
                                   "fused_interp", "fused_newton",
                                   "axis_name", "safe"))
def _blo_run_multi(partitions, scalers, levels, offsets, edge_ref,
                   edge_mask, brlens, min_brlen, max_brlen, tol,
                   tolerance, n_slots: int, max_sweeps=32,
                   max_newton_iters: int = 10, fused_idx=None,
                   fused_nslots=None, fused_interp=False, eref6=None,
                   fused_newton: bool = False, axis_name=None,
                   safe: bool = False):
    """Whole multi-partition (LINKED/SCALED) BLO driver as ONE device
    program (plain Jacobi sweeps, no colors — mirrors the host
    :func:`optimize_branch_lengths_treeinfo` loop)."""
    fargs = dict(fused_idx=fused_idx, fused_nslots=fused_nslots,
                 fused_interp=fused_interp, eref6=eref6,
                 fused_newton=fused_newton, axis_name=axis_name,
                 safe=safe)

    def sweep_fn(brl, cm):
        return _blo_sweep_multi(partitions, scalers, levels, offsets,
                                edge_ref, cm, brl, min_brlen, max_brlen,
                                tol, n_slots,
                                max_newton_iters=max_newton_iters, **fargs)

    def final_fn(brl):
        total = jnp.asarray(0.0, brl.dtype)
        for part, s in zip(partitions, scalers):
            total = total + _lnl_at(part, levels, offsets, edge_ref,
                                    edge_mask, brl * s, n_slots, **fargs)
        return total

    return _driver_loop(sweep_fn, final_fn, brlens, edge_mask[None],
                        tolerance, max_sweeps, n_polish=0)


# shard_map-wrapped on-device BLO drivers for the fused pipeline under a
# site mesh (the XLA fallback path needs no wrapper: GSPMD shards it from
# the partition input shardings). Cached per (mesh, statics) — each entry
# is a compiled whole-smoothing program.
_SHARDED_RUN_CACHE: dict = {}


def _blo_run_sharded(mesh, axis_name, partition, edge_ref, color_masks,
                     edge_mask, brlens, min_brlen, max_brlen, tol,
                     tolerance, max_sweeps, n_polish, max_newton_iters,
                     fused_idx, fused_nslots, fused_interp, eref6,
                     safe=False):
    """:func:`_blo_run` under shard_map: every device runs the whole
    smoothing driver on its pattern shard, with (df, ddf, logL) psums at
    the seams (``axis_name`` plumbed into the sweeps). The fused
    per-edge Newton kernel is disabled (it cannot psum per iteration);
    sharded sweeps use the iterative pipeline."""
    from functools import partial as _partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from pllmod_tpu.parallel.sharding import partition_specs, _spec_sig

    key = ("single", mesh, axis_name, n_polish, max_newton_iters,
           fused_nslots, fused_interp, safe, _spec_sig(partition))
    prog = _SHARDED_RUN_CACHE.get(key)
    if prog is None:
        pspecs = partition_specs(partition, axis_name)

        def run(part, eref, cmasks, emask, brl, mn, mx, tl, tolc, msw,
                fidx, er6):
            return _blo_run(
                part, (), (), eref, cmasks, emask, brl, mn, mx, tl, tolc,
                0, msw, n_polish=n_polish,
                max_newton_iters=max_newton_iters, fused_idx=fidx,
                fused_nslots=fused_nslots, fused_interp=fused_interp,
                eref6=er6, fused_newton=False, axis_name=axis_name,
                safe=safe)

        body = _partial(shard_map, mesh=mesh,
                        in_specs=(pspecs, P(), P(), P(), P(), P(), P(),
                                  P(), P(), P(), (P(), P(), P()), P()),
                        out_specs=(P(), P()), check_vma=False)(run)
        prog = jax.jit(body)
        if len(_SHARDED_RUN_CACHE) > 16:
            _SHARDED_RUN_CACHE.pop(next(iter(_SHARDED_RUN_CACHE)))
        _SHARDED_RUN_CACHE[key] = prog
    return prog(partition, edge_ref, color_masks, edge_mask, brlens,
                min_brlen, max_brlen, tol, tolerance,
                jnp.asarray(max_sweeps, jnp.int32), fused_idx, eref6)


def _blo_run_multi_sharded(mesh, axis_name, partitions, scalers, edge_ref,
                           edge_mask, brlens, min_brlen, max_brlen, tol,
                           tolerance, max_sweeps, max_newton_iters,
                           fused_idx, fused_nslots, fused_interp, eref6,
                           safe=False):
    """:func:`_blo_run_multi` under shard_map (see _blo_run_sharded)."""
    from functools import partial as _partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from pllmod_tpu.parallel.sharding import partition_specs, _spec_sig

    key = ("multi", mesh, axis_name, max_newton_iters, fused_nslots,
           fused_interp, safe, tuple(_spec_sig(p) for p in partitions))
    prog = _SHARDED_RUN_CACHE.get(key)
    if prog is None:
        pspecs = tuple(partition_specs(p, axis_name) for p in partitions)

        def run(parts, scls, eref, emask, brl, mn, mx, tl, tolc, msw,
                fidx, er6):
            return _blo_run_multi(
                parts, scls, (), (), eref, emask, brl, mn, mx, tl, tolc,
                0, msw, max_newton_iters=max_newton_iters, fused_idx=fidx,
                fused_nslots=fused_nslots, fused_interp=fused_interp,
                eref6=er6, fused_newton=False, axis_name=axis_name,
                safe=safe)

        body = _partial(shard_map, mesh=mesh,
                        in_specs=(pspecs,
                                  tuple(P() for _ in partitions),
                                  P(), P(), P(), P(), P(), P(), P(), P(),
                                  (P(), P(), P()), P()),
                        out_specs=(P(), P()), check_vma=False)(run)
        prog = jax.jit(body)
        if len(_SHARDED_RUN_CACHE) > 16:
            _SHARDED_RUN_CACHE.pop(next(iter(_SHARDED_RUN_CACHE)))
        _SHARDED_RUN_CACHE[key] = prog
    return prog(tuple(partitions), tuple(scalers), edge_ref, edge_mask,
                brlens, min_brlen, max_brlen, tol, tolerance,
                jnp.asarray(max_sweeps, jnp.int32), fused_idx, eref6)


def _use_ondevice_driver(on_device, fargs) -> bool:
    """Auto policy for the fused driver: on when running on an
    accelerator (where per-dispatch latency dominates the host loop —
    measured 1012 → 142 ms per BLO call on the remote TPU), whether the
    sweeps use the fast pallas pipeline or the XLA fallback engines.
    ``PLLMOD_BLO_ONDEVICE`` ∈ {0,1} force-overrides (tests use 1 to run
    the fused driver on CPU)."""
    import os
    env = os.environ.get("PLLMOD_BLO_ONDEVICE")
    if env is not None:
        return env != "0"
    if on_device is not None:
        return bool(on_device)
    if fargs:
        return True
    from pllmod_tpu.common import is_tpu
    return is_tpu()


# HBM budget for the full-buffer BLO's working set (directed CLVs
# 3(n−2) slots + per-edge sumtables ~2n rows); past it, whole-tree
# smoothing auto-routes to the O(n log n) bounded sweep.
# PLLMOD_BLO_MEM_BUDGET (bytes) overrides.
BLO_MEM_BUDGET = 8 << 30


def _bounded_blo_auto(partition, tree) -> bool:
    """True when whole-tree smoothing should run the memory-bounded
    sweep: fused-kernel-capable shape AND the full directed-CLV buffer
    + sumtable working set exceeds the budget (e.g. ≥ ~800 taxa at
    100k patterns — PERF_NOTES 'Memory')."""
    import os
    from pllmod_tpu.ops import engine as engine_mod
    if not engine_mod.use_fast_kernel(partition):
        return False
    n = tree.n_tips
    if n < 8:
        return False
    budget = int(os.environ.get("PLLMOD_BLO_MEM_BUDGET", BLO_MEM_BUDGET))
    cs = partition.n_cats * partition.states
    est = (3 * (n - 2) + 2 * (2 * n - 3)) * cs \
        * partition.n_patterns_padded * 4
    return est > budget


def _edges_within_radius(tree, edge: int, radius: int):
    """Edge ids within BFS distance ``radius`` of ``edge``'s endpoints
    (the reference's local-BLO neighborhood, pll_optimize.c:1646-1682)."""
    adj = tree.adjacency()
    u, v = (int(x) for x in tree.edge_nodes[edge])
    seen_edges = {edge}
    frontier = [(u, 0), (v, 0)]
    visited = {u, v}
    while frontier:
        node, d = frontier.pop()
        if d >= radius:
            continue
        for nbr, e in adj[node]:
            seen_edges.add(int(e))
            if nbr not in visited:
                visited.add(nbr)
                frontier.append((nbr, d + 1))
    return sorted(seen_edges)


def optimize_branch_lengths(partition, tree, max_sweeps: int = 32,
                            tolerance: float = 1e-4,
                            min_brlen: float = MIN_BRANCH_LEN,
                            max_brlen: float = MAX_BRANCH_LEN,
                            newton_tol: float = TOL_BRANCH_LEN,
                            write_back: bool = True,
                            edges=None, radius: int | None = None,
                            around_edge: int | None = None,
                            colored: bool = True,
                            on_device: bool | None = None,
                            mesh=None, mesh_axis=None,
                            safe: bool = False):
    """Optimize branch lengths of ``tree`` under ``partition``.

    Driver semantics mirror ``pllmod_opt_optimize_branch_lengths_local``
    (smoothing loop, acceptance threshold, SAFE fallback): sweeps repeat
    until the logL gain drops below ``tolerance`` or ``max_sweeps`` is hit;
    a sweep that worsens logL is retried with half steps (damped Jacobi),
    and the best iterate always wins.

    ``safe=True`` additionally applies the reference's per-edge SAFE
    revert (PLLMOD_OPT_BLO_NEWTON_SAFE, pll_optimize.c:1587-1632) inside
    every sweep: an edge's proposed length is rejected if the tree logL
    with only that edge changed drops (one extra batched per-edge
    evaluation per sweep; see :func:`_safe_accept`). Default off,
    matching the reference's default NEWTON_FAST method.

    ``colored=True`` (default) runs each sweep as 3-4 edge-COLOR
    sub-sweeps (:func:`_edge_colors`): simultaneously updated edges never
    share a node, giving block Gauss-Seidel behavior — the batched analog
    of the reference's serial edge walk (pll_optimize.c:1494-1586), which
    plain Jacobi (``colored=False``) approximates only under damping and
    can oscillate on when branches couple strongly.

    The reference's LOCAL mode (radius-limited optimization around a node
    after an SPR move, pll_optimize.c:1633-1712): pass ``edges`` (an
    iterable of edge ids) or ``around_edge`` + ``radius`` (BFS distance
    over the topology) to optimize only that subset; the rest stay fixed.

    ``mesh``/``mesh_axis``: site-sharded execution (parallel.shard_
    treeinfo): the fused pipeline runs under shard_map with psum'd
    Newton derivatives (pll_optimize.c:1270-1286's per-iteration
    reduce); the XLA fallback shards transparently via GSPMD.

    Returns (brlens [n_edge_slots], logL) — and writes the optimized
    lengths back into ``tree`` unless ``write_back=False``.
    """
    if partition.eigen_lam is None:
        partition = partition.cache_eigen()   # hot path: brlens-only grads
    if (edges is None and around_edge is None and mesh is None
            and _bounded_blo_auto(partition, tree)):
        # whole-tree smoothing past the directed-buffer memory budget:
        # the O(n log n) bounded sweep (optimize/blo_bounded.py — the
        # reference's recomp_iterative regime) replaces the full-buffer
        # Jacobi driver transparently
        from pllmod_tpu.optimize.blo_bounded import \
            optimize_branch_lengths_bounded
        return optimize_branch_lengths_bounded(
            partition, tree, max_sweeps=max_sweeps, tolerance=tolerance,
            min_brlen=min_brlen, max_brlen=max_brlen,
            newton_tol=newton_tol, write_back=write_back)
    trav = DirectedTraversal(tree)
    fargs = _fused_args(partition, trav)
    if fargs:
        # fast pipeline: don't build (or pass) the level schedule at all —
        # its per-level widths are TOPOLOGY-DEPENDENT shapes that would
        # retrace+recompile _blo_sweep after every SPR even though the
        # fast branch never reads them (measured: 35 XLA recompiles /
        # 129 s inside one 40-taxon spr_round). The fast-path arrays
        # (idx8/e1/e2/eref6/edge_ref) have topology-INDEPENDENT shapes,
        # so one compiled sweep serves every topology of the same size.
        levels, offsets, n_slots = (), (), 0
        edge_ref = jnp.asarray(trav.edge_ref)   # original slot numbering
    else:
        levels, offsets, edge_ref, n_slots = trav.schedule()
    mask_np = trav.edge_mask.copy()
    if around_edge is not None:
        edges = _edges_within_radius(tree, around_edge,
                                     radius if radius is not None else 1)
    if edges is not None:
        sel = np.zeros_like(mask_np)
        sel[np.asarray(list(edges), int)] = True
        mask_np &= sel
    edge_mask = jnp.asarray(mask_np)
    if colored:
        # drop color classes emptied by an edge subset: an all-False
        # sub-sweep mask would read its logL from argmax=slot 0, which
        # may be a dead edge slot on pruned/SPR'd trees
        sweep_masks = [jnp.asarray(cm)
                       for m in _edge_colors(tree, mask_np)
                       if (cm := (m & mask_np)).any()] or [edge_mask]
    else:
        sweep_masks = [edge_mask]
    dtype = partition.dtype
    brlens = jnp.asarray(np.clip(tree.lengths, min_brlen, max_brlen), dtype)

    if _use_ondevice_driver(on_device, fargs):
        # whole smoothing driver (sweeps + damping + polish + final eval)
        # as ONE device program — identical semantics to the host loop
        # below, minus ~130 per-sub-sweep dispatch/sync round trips
        if mesh is not None and fargs:
            best_brlens, best_lnl = _blo_run_sharded(
                mesh, mesh_axis, partition, edge_ref,
                jnp.stack(sweep_masks), edge_mask, brlens,
                jnp.asarray(min_brlen, dtype),
                jnp.asarray(max_brlen, dtype),
                jnp.asarray(newton_tol, dtype),
                jnp.asarray(tolerance, dtype), max_sweeps, 4, 10,
                fargs["fused_idx"], fargs["fused_nslots"],
                fargs["fused_interp"], fargs["eref6"], safe=safe)
        else:
            best_brlens, best_lnl = _blo_run(
                partition, levels, offsets, edge_ref,
                jnp.stack(sweep_masks), edge_mask, brlens,
                jnp.asarray(min_brlen, dtype),
                jnp.asarray(max_brlen, dtype),
                jnp.asarray(newton_tol, dtype),
                jnp.asarray(tolerance, dtype),
                n_slots, max_sweeps=max_sweeps, safe=safe, **fargs)
        best_lnl = float(best_lnl)
        if write_back:
            tree.lengths = np.asarray(best_brlens, np.float64).copy()
        return best_brlens, best_lnl

    best_brlens = brlens
    best_lnl = -np.inf
    lnl_prev = None
    for _ in range(max_sweeps):
        brlens_start = brlens
        lnl_here = None
        for cmask in sweep_masks:
            brlens, lnl_sub = _blo_sweep(
                partition, levels, offsets, edge_ref, cmask, brlens,
                jnp.asarray(min_brlen, dtype), jnp.asarray(max_brlen, dtype),
                jnp.asarray(newton_tol, dtype), n_slots, safe=safe,
                **fargs)
            if lnl_here is None:
                lnl_here = float(lnl_sub)    # logL at sweep-START brlens
        new_brlens = brlens
        if lnl_here > best_lnl:
            best_lnl, best_brlens = lnl_here, brlens_start
        if lnl_prev is not None:
            if lnl_here < lnl_prev - 1e-9:
                # overshoot: damp toward the best iterate and retry
                brlens = 0.5 * (best_brlens + new_brlens)
                lnl_prev = None
                continue
            if abs(lnl_here - lnl_prev) < tolerance:
                break
        lnl_prev = lnl_here

    # damped polish: Jacobi sweeps can oscillate around the joint optimum
    # (the coupling the reference's Gauss-Seidel avoids); a few half-step
    # sweeps from the best iterate settle it
    for _ in range(4):
        new_brlens, lnl_here = _blo_sweep(
            partition, levels, offsets, edge_ref, edge_mask, brlens,
            jnp.asarray(min_brlen, dtype), jnp.asarray(max_brlen, dtype),
            jnp.asarray(newton_tol, dtype), n_slots, safe=safe, **fargs)
        lnl_here = float(lnl_here)
        if lnl_here > best_lnl:
            best_lnl, best_brlens = lnl_here, brlens
        brlens = 0.5 * (brlens + new_brlens)

    final_lnl = float(_lnl_at(partition, levels, offsets, edge_ref,
                              edge_mask, brlens, n_slots, **fargs))
    if final_lnl >= best_lnl:
        best_lnl, best_brlens = final_lnl, brlens
    if write_back:
        tree.lengths = np.asarray(best_brlens, np.float64).copy()
    return best_brlens, best_lnl


@partial(jax.jit, static_argnames=("n_slots", "max_newton_iters",
                                   "safe"))
def _blo_window(partition, ops_w, refs_w, edge_ids, win_mask, brlens,
                min_brlen, max_brlen, tol, n_slots: int,
                max_newton_iters: int = 10, safe: bool = False):
    """One Gauss-Seidel WINDOW step of the memory-bounded BLO.

    For each of the W edges in the window, a bounded-slot edge-rooted
    traversal (O(log n) live CLV slots, reference pll_tree.c:1509-1573)
    produces the two CLVs facing the edge; the window then runs one
    batched sumtable + Newton (Jacobi within the window). Live memory is
    O(W·P·C·S) sumtables + O(log n · P·C·S) traversal slots — never the
    3(n−2) directed-CLV buffer of :func:`_blo_sweep`.

    Args:
      ops_w: int32 [W, n_ops, 5] bounded op tables (slot-recycled)
      refs_w: int32 [W, 2] facing-CLV refs (bounded-slot encoding)
      edge_ids: int32 [W] edge ids into ``brlens``
      win_mask: bool [W] live rows (False = padding)
    Returns (new_brlens, logL at incoming brlens).
    """
    P = partition.prob_matrices(brlens)
    eigen = partition.eigen()
    Ppad = partition.n_patterns_padded
    C, S = partition.n_cats, partition.states
    dtype = partition.dtype

    def one_edge(carry, x):
        ops_e, ref_e = x
        init_clvs = jnp.zeros((n_slots + 1, Ppad, C, S), dtype)
        init_scalers = jnp.zeros((n_slots + 1, Ppad), jnp.int32)
        clvs, scalers = clv_mod.update_partials(partition, P, ops_e,
                                                init_clvs, init_scalers)
        cp, sp = clv_mod.gather_node_clvs(partition, clvs, scalers,
                                          ref_e[:1])
        cc, sc = clv_mod.gather_node_clvs(partition, clvs, scalers,
                                          ref_e[1:2])
        st = deriv_mod.sumtable(partition, cp[0], cc[0], eigen)
        return carry, (st, sp[0] + sc[0])

    _, (st_w, sc_w) = jax.lax.scan(one_edge, 0, (ops_w, refs_w))
    t_w = jnp.take(brlens, edge_ids)
    lnl0, _, _ = deriv_mod.edge_derivatives(partition, st_w[0], sc_w[0],
                                            t_w[0], eigen)

    def deriv_fn(t):
        _, df, ddf = deriv_mod.edge_derivatives_batch(
            partition, st_w, sc_w, t, eigen)
        return df, ddf

    t_opt = minimize_newton_multi(deriv_fn, t_w, min_brlen, max_brlen,
                                  tol=tol, max_iters=max_newton_iters)
    if safe:
        # per-edge SAFE revert within the window (see _safe_accept);
        # the window's sumtables hold others-at-incoming by construction
        l_old, _, _ = deriv_mod.edge_derivatives_batch(
            partition, st_w, sc_w, t_w, eigen)
        l_new, _, _ = deriv_mod.edge_derivatives_batch(
            partition, st_w, sc_w, t_opt, eigen)
        eps = 32.0 * jnp.finfo(brlens.dtype).eps * (1.0 + jnp.abs(l_old))
        t_opt = jnp.where(l_new >= l_old - eps, t_opt, t_w)
    # masked write-back via a scratch row (duplicate pad ids all land on
    # the scratch entry — no scatter conflicts on live edges)
    E = brlens.shape[0]
    b_ext = jnp.concatenate([brlens, jnp.zeros((1,), brlens.dtype)])
    idx = jnp.where(win_mask, edge_ids, E)
    return b_ext.at[idx].set(t_opt)[:E], lnl0


def compile_chunked_blo(partition, tree, window: int):
    """Host-side schedule for :func:`optimize_branch_lengths_chunked`:
    one bounded-slot edge-rooted traversal per live edge, stacked into
    windows of ``window`` edges. Windows never mix edge COLORS
    (:func:`_edge_colors`): simultaneously updated edges never share a
    node, so each window is a true block Gauss-Seidel step — without
    this, adjacent edges in one window oscillate under the within-window
    Jacobi and the driver converges to a worse optimum. Each color class
    is padded to a multiple of ``window`` (padding rows masked).

    Returns (ops_w [nWin, W, n_ops, 5], refs_w [nWin, W, 2],
    edge_ids [nWin, W], masks [nWin, W], n_slots)."""
    n_tips = tree.n_tips
    live = []                      # edge id per row; -1 = padding row
    for cmask in _edge_colors(tree):
        cls = [int(e) for e in np.nonzero(cmask)[0]]
        live.extend(cls + [-1] * ((-len(cls)) % window))
    row_live = np.asarray([e >= 0 for e in live])
    pad_src = next(e for e in live if e >= 0)
    live = [pad_src if e < 0 else e for e in live]
    ops_cache: dict[int, tuple] = {}
    ops_all, refs_all, n_slots_max = [], [], 0
    for e in live:
        if e in ops_cache:
            ops_b_c, refs_c = ops_cache[e]
            ops_all.append(ops_b_c)
            refs_all.append(refs_c)
            continue
        ops, (u, v, _e) = tree.traversal_ops(root_edge=e)
        u, v = int(u), int(v)
        ops_b, ns, slot_map = clv_mod.bounded_slot_ops(
            np.asarray(ops), n_tips, root_refs=(u, v))

        def remap(x):
            return x if x < n_tips else n_tips + int(slot_map[x - n_tips])

        ops_b = np.asarray(ops_b, np.int32)
        ops_cache[e] = (ops_b, (remap(u), remap(v)))
        ops_all.append(ops_b)
        refs_all.append(ops_cache[e][1])
        n_slots_max = max(n_slots_max, ns)
    W = window
    n_win = len(live) // W
    n_ops = ops_all[0].shape[0]
    ops_w = np.stack(ops_all)
    refs_w = np.asarray(refs_all, np.int32)
    edge_ids = np.asarray(live, np.int32)
    masks = row_live
    shape = (n_win, W)
    return (jnp.asarray(ops_w.reshape(n_win, W, n_ops, 5)),
            jnp.asarray(refs_w.reshape(n_win, W, 2)),
            jnp.asarray(edge_ids.reshape(shape)),
            jnp.asarray(masks.reshape(shape)), n_slots_max)


def optimize_branch_lengths_chunked(partition, tree, window: int = 16,
                                    max_sweeps: int = 32,
                                    tolerance: float = 1e-4,
                                    min_brlen: float = MIN_BRANCH_LEN,
                                    max_brlen: float = MAX_BRANCH_LEN,
                                    newton_tol: float = TOL_BRANCH_LEN,
                                    write_back: bool = True,
                                    safe: bool = False):
    """Memory-bounded branch-length optimization (capacity mode).

    The full-buffer :func:`optimize_branch_lengths` materializes 3(n−2)
    directed CLV slots — ~200 TB at the north-star scale (10k taxa ×
    100k patterns, BASELINE.md §3). This driver instead sweeps WINDOWS of
    ``window`` edges Gauss-Seidel style (the reference's own edge-by-edge
    regime, pll_optimize.c:1494-1586 recomp_iterative), with each window
    batched Jacobi via :func:`_blo_window`; peak live CLV memory is
    O((window + log n) · P · C · S).

    The trade is recompute: every edge costs one O(n) bounded traversal
    per sweep (the reference pays the same asymptotics through its
    per-edge CLV re-orientations, pll_optimize.c:1532-1560). Use the
    full-buffer driver whenever the directed buffer fits.

    Returns (brlens [n_edge_slots], logL) — writes back into ``tree``
    unless ``write_back=False``.
    """
    if partition.eigen_lam is None:
        partition = partition.cache_eigen()
    ops_w, refs_w, edge_ids, masks, n_slots = compile_chunked_blo(
        partition, tree, window)
    n_win = ops_w.shape[0]
    dtype = partition.dtype
    brlens = jnp.asarray(np.clip(tree.lengths, min_brlen, max_brlen), dtype)
    args = (jnp.asarray(min_brlen, dtype), jnp.asarray(max_brlen, dtype),
            jnp.asarray(newton_tol, dtype))

    best_brlens, best_lnl = brlens, -np.inf
    lnl_prev = None
    for _ in range(max_sweeps):
        brlens_start = brlens
        lnl_sweep = None
        for w in range(n_win):
            brlens, lnl0 = _blo_window(
                partition, ops_w[w], refs_w[w], edge_ids[w], masks[w],
                brlens, *args, n_slots, safe=safe)
            if lnl_sweep is None:
                lnl_sweep = float(lnl0)   # logL at sweep-START brlens
        if lnl_sweep > best_lnl:
            best_lnl, best_brlens = lnl_sweep, brlens_start
        if lnl_prev is not None and abs(lnl_sweep - lnl_prev) < tolerance:
            break
        lnl_prev = lnl_sweep
    # the final iterate was optimized but never scored — evaluate it
    # (bounded engine: same O(log n)-slot memory regime)
    from pllmod_tpu.ops import engine as engine_mod
    final_lnl, _ = engine_mod.loglikelihood_bounded(partition, tree,
                                                    brlens=brlens)
    final_lnl = float(final_lnl)
    if final_lnl >= best_lnl:
        best_lnl, best_brlens = final_lnl, brlens
    if write_back:
        tree.lengths = np.asarray(best_brlens, np.float64).copy()
    return best_brlens, best_lnl


def optimize_branch_lengths_treeinfo(treeinfo, max_sweeps: int = 32,
                                     tolerance: float = 1e-4,
                                     min_brlen: float = MIN_BRANCH_LEN,
                                     max_brlen: float = MAX_BRANCH_LEN,
                                     newton_tol: float = TOL_BRANCH_LEN,
                                     on_device: bool | None = None,
                                     safe: bool = False):
    """Multi-partition BLO across branch-length linkage modes.

    TPU build of ``pllmod_opt_optimize_branch_lengths_local_multi``
    (pll_optimize.c:1739-1951):
    - LINKED: one shared brlen set; per-edge df/ddf summed over partitions
    - SCALED: shared brlens × per-partition scaler (scalers held fixed
      here; optimize them via algorithm.opt_brlen_scalers)
    - UNLINKED: each partition optimizes its own brlen set independently
      (the reference's xnum=partition_count lock-step Newton is just a
      per-partition loop under SPMD)

    Returns total logL after optimization; tree/treeinfo brlens updated.
    """
    from pllmod_tpu.common import BRLEN_UNLINKED, BRLEN_SCALED

    tree = treeinfo.tree
    mesh, mesh_axis = treeinfo.mesh, treeinfo.mesh_axis
    if treeinfo.brlen_linkage == BRLEN_UNLINKED:
        total = 0.0
        for i in treeinfo.local_indices():
            part = treeinfo.partitions[i]
            t = tree.copy()
            t.lengths = treeinfo.brlens[i].copy()
            _, lnl = optimize_branch_lengths(
                part, t, max_sweeps=max_sweeps, tolerance=tolerance,
                min_brlen=min_brlen, max_brlen=max_brlen,
                newton_tol=newton_tol, on_device=on_device,
                mesh=mesh, mesh_axis=mesh_axis, safe=safe)
            treeinfo.brlens[i] = t.lengths
            treeinfo.partition_loglh[i] = lnl
            total += lnl
        return total

    for i in treeinfo.local_indices():
        if treeinfo.partitions[i].eigen_lam is None:
            treeinfo.partitions[i] = treeinfo.partitions[i].cache_eigen()
    parts = tuple(treeinfo.partitions[i] for i in treeinfo.local_indices())
    idxs = list(treeinfo.local_indices())
    if treeinfo.brlen_linkage == BRLEN_SCALED:
        scalers = tuple(float(treeinfo.brlen_scalers[i]) for i in idxs)
    else:
        scalers = tuple(1.0 for _ in idxs)
    dtype = parts[0].dtype

    trav = DirectedTraversal(tree)
    fargs = _fused_args(parts[0], trav, newton_parts=parts) \
        if all(p.dtype == parts[0].dtype for p in parts) else {}
    if fargs:
        # topology-independent shapes only (see optimize_branch_lengths)
        levels, offsets, n_slots = (), (), 0
        edge_ref = jnp.asarray(trav.edge_ref)   # original slot numbering
    else:
        levels, offsets, edge_ref, n_slots = trav.schedule()
    edge_mask = jnp.asarray(trav.edge_mask)
    brlens = jnp.asarray(np.clip(tree.lengths, min_brlen, max_brlen), dtype)

    if _use_ondevice_driver(on_device, fargs):
        if mesh is not None and fargs:
            best_brlens, best_lnl = _blo_run_multi_sharded(
                mesh, mesh_axis, parts,
                tuple(jnp.asarray(s, dtype) for s in scalers),
                edge_ref, edge_mask, brlens,
                jnp.asarray(min_brlen, dtype),
                jnp.asarray(max_brlen, dtype),
                jnp.asarray(newton_tol, dtype),
                jnp.asarray(tolerance, dtype), max_sweeps, 10,
                fargs["fused_idx"], fargs["fused_nslots"],
                fargs["fused_interp"], fargs["eref6"], safe=safe)
        else:
            best_brlens, best_lnl = _blo_run_multi(
                parts, tuple(jnp.asarray(s, dtype) for s in scalers),
                levels, offsets, edge_ref, edge_mask, brlens,
                jnp.asarray(min_brlen, dtype),
                jnp.asarray(max_brlen, dtype),
                jnp.asarray(newton_tol, dtype),
                jnp.asarray(tolerance, dtype),
                n_slots, max_sweeps=max_sweeps, safe=safe, **fargs)
        tree.lengths = np.asarray(best_brlens, np.float64).copy()
        return float(best_lnl)

    best_brlens = brlens
    best_lnl = -np.inf
    lnl_prev = None
    for _ in range(max_sweeps):
        new_brlens, lnl_here = _blo_sweep_multi(
            parts, scalers, levels, offsets, edge_ref, edge_mask, brlens,
            jnp.asarray(min_brlen, dtype), jnp.asarray(max_brlen, dtype),
            jnp.asarray(newton_tol, dtype), n_slots, safe=safe, **fargs)
        lnl_here = float(lnl_here)
        if lnl_here > best_lnl:
            best_lnl, best_brlens = lnl_here, brlens
        if lnl_prev is not None:
            if lnl_here < lnl_prev - 1e-9:
                brlens = 0.5 * (best_brlens + new_brlens)
                lnl_prev = None
                continue
            if abs(lnl_here - lnl_prev) < tolerance:
                brlens = new_brlens
                break
        lnl_prev = lnl_here
        brlens = new_brlens

    # final logL at the final iterate (sum over partitions)
    final = 0.0
    for part, s in zip(parts, scalers):
        final += float(_lnl_at(part, levels, offsets, edge_ref, edge_mask,
                               brlens * s, n_slots, **fargs))
    if final >= best_lnl:
        best_lnl, best_brlens = final, brlens
    tree.lengths = np.asarray(best_brlens, np.float64).copy()
    return best_lnl
