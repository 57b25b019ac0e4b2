"""TreeInfo — partitioned likelihood state over one topology.

TPU build of ``pllmod_treeinfo_t`` (``src/tree/treeinfo.c``, struct at
``pll_tree.h:219-277``): one tree + N partitions with per-partition model
parameters, branch-length linkage (LINKED / SCALED / UNLINKED,
``pllmod_common.h:25-27``), per-partition ``params_to_optimize`` masks, and
total log-likelihood = sum over partitions.

Design differences (deliberate, TPU-first):

- partitions are immutable pytrees; "setting" a parameter swaps the stored
  partition — so there is no eigendecomp-invalidation protocol
  (``algo_callback.c:68``): XLA recomputes/caches the eigendecomp inside
  the jitted evaluation.
- CLV validity masks (treeinfo.c:872-944) are replaced by functional
  recomputation; incremental SPR scoring gets its speed from *batching*
  candidates (algorithm/spr.py), not from invalidation bookkeeping.
- the ``parallel_reduce_cb`` seam (treeinfo.c:215-227) is the device mesh:
  sharded partitions reduce via psum inside jit (parallel/sharding.py).
  "Remote" partitions (``partitions[p] == NULL`` on non-owner ranks) are
  represented as ``None`` entries and simply skipped — under SPMD every
  process holds the same treeinfo, so the reference's skip-local /
  reduce-global dance is unnecessary.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pllmod_tpu.common import (BRLEN_LINKED, BRLEN_SCALED, BRLEN_UNLINKED,
                               PARAM_ALL)
from pllmod_tpu.ops import engine as engine_mod


class TreeInfo:
    """Partitioned likelihood state (pllmod_treeinfo_* API surface).

    Attributes:
      tree: the shared topology (host object, edge-id-stable)
      partitions: list[Partition | None] — None marks a remote partition
      brlen_linkage: LINKED | SCALED | UNLINKED
      brlens: [n_parts, n_edge_slots] per-partition branch lengths
        (UNLINKED) or broadcast views of the shared lengths otherwise
      brlen_scalers: [n_parts] multipliers (SCALED mode)
      params_to_optimize: [n_parts] bitmasks (PLLMOD_OPT_PARAM_*)
    """

    def __init__(self, tree, partitions, brlen_linkage: int = BRLEN_LINKED,
                 params_to_optimize=None):
        if not isinstance(partitions, (list, tuple)):
            partitions = [partitions]
        self.tree = tree
        self.partitions = list(partitions)
        self.brlen_linkage = brlen_linkage
        n = len(self.partitions)
        ne = len(tree.lengths)
        if brlen_linkage == BRLEN_UNLINKED:
            self.brlens = np.tile(tree.lengths, (n, 1))
        else:
            self.brlens = None  # use tree.lengths
        self.brlen_scalers = np.ones(n)
        if params_to_optimize is None:
            params_to_optimize = [PARAM_ALL] * n
        elif isinstance(params_to_optimize, int):
            params_to_optimize = [params_to_optimize] * n
        self.params_to_optimize = list(params_to_optimize)
        # active-partition scoping (treeinfo.c:354-369); -1 = all
        self.active_partition = -1
        self.partition_loglh = np.zeros(n)
        # CLV-op counters (treeinfo->counter analog, treeinfo.c:1017)
        from pllmod_tpu.profile import Counters
        self.counters = Counters()
        # distributed execution: set by parallel.shard_treeinfo — every
        # driver consults these to route Pallas paths through shard_map
        # (the XLA engines shard transparently via GSPMD)
        self.mesh = None
        self.mesh_axis = None

    # ------------------------------------------------------------------
    @property
    def n_partitions(self) -> int:
        return len(self.partitions)

    def local_indices(self):
        ap = self.active_partition
        for i, p in enumerate(self.partitions):
            if p is None:
                continue
            if ap != -1 and i != ap:
                continue
            yield i

    def set_active_partition(self, idx: int) -> None:
        """PLLMOD_TREEINFO_PARTITION_ALL == -1 (treeinfo.c:354-369)."""
        self.active_partition = idx

    # -- branch lengths across linkage modes (treeinfo.c:387-506) ---------
    def partition_brlens(self, idx: int) -> np.ndarray:
        if self.brlen_linkage == BRLEN_UNLINKED:
            return self.brlens[idx]
        if self.brlen_linkage == BRLEN_SCALED:
            return self.tree.lengths * self.brlen_scalers[idx]
        return self.tree.lengths

    def set_branch_length(self, edge: int, value: float,
                          partition: int | None = None) -> None:
        if self.brlen_linkage == BRLEN_UNLINKED and partition is not None:
            self.brlens[partition, edge] = value
        else:
            self.tree.lengths[edge] = value
            if self.brlens is not None:
                self.brlens[:, edge] = value

    def set_partition(self, idx: int, partition) -> None:
        self.partitions[idx] = partition

    def scale_branches_all(self, factor: float) -> None:
        """Multiply every branch length (all partitions) by ``factor``
        (pllmod_treeinfo_scale_branches_all, treeinfo.c:1101-1130)."""
        self.tree.lengths *= factor
        if self.brlens is not None:
            self.brlens *= factor

    def scale_branches_partition(self, idx: int, factor: float) -> None:
        """Multiply one partition's branch lengths by ``factor`` — UNLINKED
        mode only, like the reference
        (pllmod_treeinfo_scale_branches_partition)."""
        if self.brlen_linkage != BRLEN_UNLINKED:
            raise ValueError("per-partition branch scaling requires "
                             "BRLEN_UNLINKED linkage")
        self.brlens[idx] *= factor

    # -- topology snapshot/restore (treeinfo.c:546-719) -------------------
    def get_topology(self):
        snap = self.tree.snapshot()
        brlens = None if self.brlens is None else self.brlens.copy()
        return (snap, brlens, self.brlen_scalers.copy())

    def set_topology(self, topo) -> None:
        snap, brlens, scalers = topo
        self.tree.restore(snap)
        self.brlens = None if brlens is None else brlens.copy()
        self.brlen_scalers = scalers.copy()

    # -- likelihood (treeinfo.c:946-1099; SURVEY §3.1) --------------------
    def compute_loglh(self, incremental: bool = False) -> float:
        """Total log-likelihood over local partitions (sum; under a sharded
        mesh the per-partition site reduction lowers to psum).

        Engine selection: on TPU-class devices with f32 partitions the
        fused Pallas megakernel evaluates each partition, with DYNAMIC
        root refs so successive topologies (tree search) reuse one
        compiled executable; elsewhere the serial-scan XLA engine (the
        f64-capable reference path).

        ``incremental=True`` enables the reference's CLV-validity
        protocol (treeinfo.c:38-61, 872-944) in functional form: CLV
        buffers from the previous evaluation are cached per partition and
        only ops whose branch lengths changed — or that depend on one
        that did — are recomputed (brlens-only updates recompute just the
        path to the root). A topology or model-parameter change falls
        back to a full traversal transparently."""
        ops, root_info = self.tree.traversal_ops()
        ri = tuple(int(x) for x in root_info)
        ops_j = None
        n_inner = int((ops[:, 0] >= 0).sum())
        total = 0.0
        from pllmod_tpu.profile import timed
        with timed(self.counters):
            # ≥2 fast-kernel partitions: ONE combined device program
            # (engine.multi_eval) instead of one dispatch + one host
            # sync per partition — the per-partition loop below costs
            # ~40 ms each on the axon tunnel. Mixed kinds (resident +
            # fused-dyn lanes) share the program, so partitioned
            # DNA+protein analyses stay one dispatch.
            multi = [] if incremental else [
                i for i in self.local_indices()
                if engine_mod.use_fast_kernel(self.partitions[i])]
            # under a site mesh even a single fast partition routes
            # through the (shard_map-wrapped) combined program
            if len(multi) >= 2 or (self.mesh is not None and multi):
                lnls = self._fast_eval_multi(multi, ops, ri)
                for k, i in enumerate(multi):
                    self.partition_loglh[i] = float(lnls[k])
                    total += float(lnls[k])
                    self.counters.add_traversal(
                        n_inner, self.partitions[i].n_patterns_padded)
            else:
                multi = []
            for i in self.local_indices():
                if i in multi:
                    continue
                part = self.partitions[i]
                brl = np.asarray(self.partition_brlens(i), float)
                if incremental:
                    lnl, n_ops_run = self._loglh_incremental(
                        i, part, ops, ri, brl)
                    self.counters.add_traversal(n_ops_run,
                                                part.n_patterns_padded)
                elif engine_mod.use_fast_kernel(part):
                    # CS-gated production kernel (VMEM-resident for small
                    # CS, fused HBM megakernel above the crossover —
                    # engine.compile_fast_eval). idx rows are TRACED args
                    # and the resident slot scratch is padded to a
                    # topology-independent bound, so one compiled
                    # executable serves every topology of this taxon
                    # count. Cached per partition on (topology, alignment
                    # identity): the resident closure embeds the tip
                    # planes, so set_partition must invalidate it; the
                    # planes themselves are topology-invariant and are
                    # cached separately so SPR/NNI loops rebuild only the
                    # cheap index compile per accepted move.
                    ev = self._fast_eval(i, part, ops, ri)
                    lnl = float(ev(part, jnp.asarray(brl, part.dtype)))
                    self.counters.add_traversal(n_inner,
                                                part.n_patterns_padded)
                else:
                    if ops_j is None:
                        ops_j = jnp.asarray(ops)
                    lnl = float(engine_mod.loglikelihood(
                        part, ops_j, jnp.asarray(brl, part.dtype), ri))
                    self.counters.add_traversal(n_inner,
                                                part.n_patterns_padded)
                self.partition_loglh[i] = lnl
                total += lnl
        return total

    def compute_loglh_persite(self, fast: bool | None = None):
        """Per-partition per-pattern log-likelihoods
        (pllmod_treeinfo_compute_loglh_persite, treeinfo.c:1081-1099).

        Returns (total_loglh, [per-pattern lnl array | None per
        partition]) — None for remote/out-of-scope partitions. Entries
        are unweighted per-PATTERN values (multiply by pattern_weights
        and sum to recover each partition's total).

        ``fast``: None (auto) evaluates TPU-class partitions through
        the fused megakernel (the site vector falls out of the fused
        root reduction — engine.loglikelihood_persite_fast), so
        per-site diagnostics stay usable at production scale; other
        partitions (and ``fast=False``) use the f64-capable XLA
        engine."""
        ops, root_info = self.tree.traversal_ops()
        ri = tuple(int(x) for x in root_info)
        ops_j = None
        persite = [None] * self.n_partitions
        total = 0.0
        for i in self.local_indices():
            part = self.partitions[i]
            use_fast = (engine_mod.use_fast_kernel(part) if fast is None
                        else fast)
            if use_fast:
                lnl, site_lnl = engine_mod.loglikelihood_persite_fast(
                    part, self.tree, self.partition_brlens(i))
            else:
                if ops_j is None:
                    ops_j = jnp.asarray(ops)
                brl = jnp.asarray(self.partition_brlens(i), part.dtype)
                lnl, site_lnl = engine_mod.loglikelihood_persite(
                    part, ops_j, brl, ri)
            persite[i] = np.asarray(site_lnl)
            self.partition_loglh[i] = float(lnl)
            total += float(lnl)
        return total, persite

    def _fast_eval_multi(self, idxs, ops, ri):
        """K-partition combined fast-kernel evaluation: build per-lane
        artifacts (engine.fast_lane_args; tip planes come from the
        engine cache) and run :func:`pllmod_tpu.ops.engine.multi_eval`
        — one dispatch, one host sync for all K.

        Lane artifacts (index compiles + their device uploads) are
        cached per partition on (topology, alignment identity), mirroring
        the single-partition ``_fast_eval`` cache: repeated evaluations
        of an unchanged topology skip the host rebuild entirely."""
        lc = getattr(self, "_lane_cache", None)
        if lc is None:
            lc = self._lane_cache = {}
        parts, brls, arts, ks = [], [], [], []
        for i in idxs:
            part = self.partitions[i]
            fkey = (ops.tobytes(), ri, part.n_tips,
                    part.n_cats * part.states, id(part.tip_states),
                    self.mesh)
            ent = lc.get(i)
            if ent is None or ent[0] != fkey:
                ent = (fkey, engine_mod.fast_lane_args(
                    part, self.tree, self.mesh, self.mesh_axis))
                lc[i] = ent
            kind, arr, st = ent[1]
            parts.append(part)
            brls.append(jnp.asarray(np.asarray(
                self.partition_brlens(i), part.dtype)))
            arts.append(arr)
            ks.append((kind, st))
        return np.asarray(engine_mod.multi_eval(
            parts, brls, arts, tuple(ks), self.mesh, self.mesh_axis))

    def _fast_eval(self, i, part, ops, ri):
        """Cached engine.compile_fast_eval closure for partition ``i``.

        Tip planes (alignment-derived, topology-invariant) are cached by
        object identity of ``part.tip_states``; the compiled closure is
        additionally keyed on the traversal, so a topology change
        rebuilds only the index compile while ``set_partition`` (new
        alignment object) rebuilds both."""
        tp = getattr(self, "_tip_planes", None)
        if tp is None:
            tp = self._tip_planes = {}
        tip_hi = None
        if engine_mod.fast_eval_schedule(part) == "resident":
            cached = tp.get(i)
            if cached is None or cached[0] is not part.tip_states:
                from pllmod_tpu.ops import pallas_resident
                cached = (part.tip_states,
                          pallas_resident.expanded_tip_planes(part))
                tp[i] = cached
            tip_hi = cached[1]
        fkey = (ops.tobytes(), ri, part.n_tips,
                part.n_cats * part.states, id(part.tip_states))
        fc = getattr(self, "_fused_cache", None)
        if fc is None:
            fc = self._fused_cache = {}
        if fc.get(i, (None,))[0] != fkey:
            fc[i] = (fkey, engine_mod.compile_fast_eval(
                part, self.tree, tip_hi=tip_hi))
        return fc[i][1]

    @staticmethod
    def _dirty_rows(ops, brl, prev_brl, n_tips):
        """Op rows invalidated by a branch-length change: a row is dirty
        when one of its child edges changed OR a child CLV is dirty
        (the reference's clv_valid propagation, treeinfo.c:872-944).
        Returns (rows list, changed-edge set)."""
        changed = set(np.nonzero(brl != prev_brl)[0])
        invalid_slots = set()
        rows = []
        for r in ops:
            if r[0] < 0:
                continue
            dirty = int(r[2]) in changed or int(r[4]) in changed
            for c in (int(r[1]), int(r[3])):
                if c >= n_tips and (c - n_tips) in invalid_slots:
                    dirty = True
            if dirty:
                invalid_slots.add(int(r[0]))
                rows.append(r)
        return rows, changed

    @staticmethod
    def _bucket_rows(rows, ops):
        """Dirty rows padded (masked) to the next power of two — bounds
        the number of compiled partial-traversal programs. Minimum
        bucket 4: the fused kernel's DMA lookahead wants a few grid
        steps, and 1/2/4-row tables would otherwise each compile."""
        n_run = len(rows)
        bucket = 4
        while bucket < max(n_run, 1):
            bucket *= 2
        sub = np.full((bucket, 5), -1, ops.dtype)
        if rows:
            sub[:n_run] = np.stack(rows)
        return sub

    def _loglh_incremental(self, i, part, ops, ri, brl):
        """One partition's partial-traversal evaluation. Returns
        (logL, number of op rows actually recomputed).

        Engine selection mirrors the full evaluation: TPU-class f32
        partitions run the FUSED megakernel with the prior CS×P buffers
        ALIASED into the kernel outputs (engine.fused_update_eval — only
        dirty rows execute, clean slots are untouched); elsewhere the
        XLA partial-traversal path (f64-capable reference path)."""
        if engine_mod.use_fast_kernel(part):
            return self._loglh_incremental_fast(i, part, ops, ri, brl)
        if not hasattr(self, "_incr_cache"):
            self._incr_cache = {}
        cache = self._incr_cache.get(i)
        key = (ops.tobytes(), ri)
        brl_j = jnp.asarray(brl, part.dtype)
        if (cache is None or cache["key"] != key
                or cache["part"] is not part):
            lnl, (_P, clvs, scalers) = engine_mod.loglikelihood_with_buffers(
                part, jnp.asarray(ops), brl_j, ri)
            self._incr_cache[i] = dict(key=key, part=part, brl=brl.copy(),
                                       clvs=clvs, scalers=scalers,
                                       lnl=float(lnl))
            return float(lnl), int((ops[:, 0] >= 0).sum())

        rows, changed = self._dirty_rows(ops, brl, cache["brl"],
                                         part.n_tips)
        if not rows and not changed:
            # cached logL, NOT partition_loglh: a plain evaluation at
            # different brlens in between may have overwritten the latter
            return cache["lnl"], 0
        n_run = len(rows)
        sub = self._bucket_rows(rows, ops)
        lnl, clvs, scalers = engine_mod.loglikelihood_update(
            part, jnp.asarray(sub), brl_j, ri,
            cache["clvs"], cache["scalers"])
        cache["brl"] = brl.copy()
        cache["clvs"] = clvs
        cache["scalers"] = scalers
        cache["lnl"] = float(lnl)
        return float(lnl), n_run

    def _loglh_incremental_fast(self, i, part, ops, ri, brl):
        """Fused-megakernel partial-traversal evaluation (see
        :func:`pllmod_tpu.ops.engine.fused_update_eval`)."""
        from pllmod_tpu.ops import pallas_clv
        if not hasattr(self, "_incr_cache"):
            self._incr_cache = {}
        cache = self._incr_cache.get(i)
        key = (ops.tobytes(), ri, "fast")
        brl_j = jnp.asarray(np.asarray(brl, np.dtype(part.dtype)))
        rr = jnp.asarray(np.asarray(ri, np.int32))
        interp = engine_mod.fast_kernel_interpret()
        if (cache is None or cache["key"] != key
                or cache["part"] is not part):
            tab10, n_slots = pallas_clv.compile_fused_ops(part, ops,
                                                          as_numpy=True)
            Ppad = part.n_patterns_padded
            CS = part.n_cats * part.states
            z_c = jnp.zeros((n_slots, CS, Ppad), jnp.float32)
            z_s = jnp.zeros((n_slots, 1, Ppad), jnp.int32)
            lnl, clvs, scalers = engine_mod.fused_update_eval(
                part, jnp.asarray(tab10), brl_j, rr, z_c, z_s, n_slots,
                interp)
            self._incr_cache[i] = dict(
                key=key, part=part, brl=brl.copy(), clvs=clvs,
                scalers=scalers, lnl=float(lnl), n_slots=n_slots)
            return float(lnl), int((ops[:, 0] >= 0).sum())

        rows, changed = self._dirty_rows(ops, brl, cache["brl"],
                                         part.n_tips)
        if not rows and not changed:
            return cache["lnl"], 0
        n_run = len(rows)
        sub = self._bucket_rows(rows, ops)
        n_slots = cache["n_slots"]
        tab10, _ns = pallas_clv.compile_fused_ops(
            part, sub, pad_to=len(sub), n_slots_min=n_slots,
            as_numpy=True)
        lnl, clvs, scalers = engine_mod.fused_update_eval(
            part, jnp.asarray(tab10), brl_j, rr, cache["clvs"],
            cache["scalers"], n_slots, interp)
        cache["brl"] = brl.copy()
        cache["clvs"] = clvs
        cache["scalers"] = scalers
        cache["lnl"] = float(lnl)
        return float(lnl), n_run

    # -- ancestral states (treeinfo.c:1558-1718) --------------------------
    def compute_ancestral(self, nodes=None):
        """Marginal ancestral state probabilities per partition
        (pllmod_treeinfo_compute_ancestral). Returns a list of
        (nodes, probs [n_nodes, patterns, states]) per local partition."""
        from pllmod_tpu.algorithm.ancestral import ancestral_probabilities
        out = []
        for i in self.local_indices():
            t = self.tree.copy()
            t.lengths = np.asarray(self.partition_brlens(i))
            out.append(ancestral_probabilities(self.partitions[i], t,
                                               nodes=nodes))
        return out

    # -- brlen-scaler normalization (treeinfo.c:1101-1197) ----------------
    def normalize_brlen_scalers(self) -> None:
        """Rescale so the pattern-weight-weighted mean scaler is 1, pushing
        the factor into the shared branch lengths (SCALED mode)."""
        if self.brlen_linkage != BRLEN_SCALED:
            return
        wsum = np.array([float(jnp.sum(self.partitions[i].pattern_weights))
                         if self.partitions[i] is not None else 0.0
                         for i in range(self.n_partitions)])
        mean = float((self.brlen_scalers * wsum).sum() / wsum.sum())
        if mean <= 0:
            return
        self.brlen_scalers /= mean
        self.tree.lengths *= mean
