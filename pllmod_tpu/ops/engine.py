"""Single-partition end-to-end likelihood evaluation.

The minimal jittable pipeline (SURVEY.md §3.1 call stack, functional form):
P-matrices -> pruning ops -> edge log-likelihood. The multi-partition,
caching, invalidation-aware layer lives in :mod:`pllmod_tpu.tree.treeinfo`.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pllmod_tpu.ops import clv as clv_mod
from pllmod_tpu.ops import likelihood as lk_mod


@jax.jit
def loglikelihood(partition, ops, brlens, root_info):
    """Full-traversal log-likelihood (serial-scan schedule).

    Jitted with EVERY argument traced — including the ``root_info``
    ints — so one compiled program serves every topology of a given
    shape (model-opt objectives across SPR rounds would otherwise
    recompile per topology). Host-level callers also stop paying the
    eager per-op dispatch + compile chain of the axon runtime; calls
    from inside other jitted functions simply inline.

    Args:
      partition: Partition pytree
      ops: int32 [n_inner, 5] from Tree.traversal_ops
      brlens: [n_edges] branch lengths (indexed by edge id)
      root_info: (node_u, node_v, root_edge) from Tree.traversal_ops
        (traced ints — any topology of the same shape shares the program)
    Returns:
      scalar logL
    """
    P = partition.prob_matrices(brlens)
    clvs, scalers = clv_mod.update_partials(partition, P, ops)
    u, v, e = root_info
    return lk_mod.edge_loglikelihood(partition, clvs, scalers, u, v, P[e])


@jax.jit
def loglikelihood_persite(partition, ops, brlens, root_info):
    """(total, per-pattern logL [n_patterns_padded]) — the reference's
    ``persite`` out-array of pll_compute_edge_loglikelihood /
    pllmod_treeinfo_compute_loglh_persite (treeinfo.c:1084-1099). The
    per-pattern entries are UNweighted; total = Σ lnl·pattern_weights
    (padded patterns carry weight 0)."""
    P = partition.prob_matrices(brlens)
    clvs, scalers = clv_mod.update_partials(partition, P, ops)
    u, v, e = root_info
    return lk_mod.edge_loglikelihood(partition, clvs, scalers, u, v, P[e],
                                     persite=True)


def loglikelihood_persite_fast(partition, tree, brlens=None,
                               root_edge=None):
    """(total, per-pattern logL) through the fused megakernel — the
    TPU-class per-site path (the XLA :func:`loglikelihood_persite`
    stays the f64-capable oracle). The root-edge site vector falls out
    of the fused-root epilogue (pallas_clv.root_from_prod_slot), so the
    per-site diagnostic costs the same one kernel dispatch as a plain
    fused evaluation (treeinfo.c:1084-1099's persite out-array)."""
    from pllmod_tpu.ops import pallas_clv
    if brlens is None:
        brlens = tree.lengths
    brlens = jnp.asarray(np.asarray(brlens, np.float64),
                         partition.dtype)
    idx8, e1, e2, ri, n_slots = pallas_clv.compile_fused(
        partition, tree, root_edge, fuse_root=True)
    return pallas_clv.loglikelihood_fused(
        partition, idx8, brlens, e1, e2, ri, n_slots,
        fast_kernel_interpret(), use_split_clv(partition), True)


@partial(jax.jit, static_argnums=(4, 5))
def loglikelihood_levels(partition, levels, brlens, offsets, root_info,
                         n_slots: int):
    """Level-batched log-likelihood: all nodes of a tree level update in
    one batched einsum with contiguous block writes (O(log n) launches on
    balanced trees instead of O(n) scan steps — the TPU-first schedule).

    Args:
      levels: tuple of int32 [W_l, 5] (from clv.LevelSchedule, renumbered)
      offsets: tuple of per-level slot offsets
      root_info: (u, v, e) with u/v already REMAPPED via
        LevelSchedule.remap_node
    """
    P = partition.prob_matrices(brlens)
    clvs, scalers = clv_mod.update_partials_sched(
        partition, P, levels, offsets, n_slots)
    u, v, e = root_info
    return lk_mod.edge_loglikelihood(partition, clvs, scalers, u, v, P[e])


@partial(jax.jit, static_argnums=(4,))
def loglikelihood_asc(partition, asc_partition, ops, brlens, root_info):
    """Log-likelihood with Lewis-type ascertainment-bias correction
    (libpll PLL_ATTRIB_AB_FLAG analog):

        lnL = Σ_p w_p ln L_p − (Σ_p w_p) · ln(1 − Σ_j L_const_j)

    where ``asc_partition`` = :func:`pllmod_tpu.ops.partition.
    make_asc_partition` holds the S constant-site patterns.
    """
    P = partition.prob_matrices(brlens)
    clvs, scalers = clv_mod.update_partials(partition, P, ops)
    u, v, e = root_info
    total, lnl_sites = lk_mod.edge_loglikelihood(
        partition, clvs, scalers, u, v, P[e], persite=True)

    aP = asc_partition.prob_matrices(brlens)
    aclvs, ascalers = clv_mod.update_partials(asc_partition, aP, ops)
    _, lnl_const = lk_mod.edge_loglikelihood(
        asc_partition, aclvs, ascalers, u, v, aP[e], persite=True)
    sel = asc_partition.pattern_weights          # 1 on the S patterns
    p_const = jnp.sum(jnp.exp(lnl_const) * sel)
    W = jnp.sum(partition.pattern_weights)
    return total - W * jnp.log1p(-p_const)


@partial(jax.jit, static_argnums=(3, 4))
def _loglikelihood_bounded(partition, ops, brlens, root_info, n_slots: int):
    P = partition.prob_matrices(brlens)
    Ppad = partition.n_patterns_padded
    C, S = partition.n_cats, partition.states
    init_clvs = jnp.zeros((n_slots + 1, Ppad, C, S), partition.dtype)
    init_scalers = jnp.zeros((n_slots + 1, Ppad), jnp.int32)
    clvs, scalers = clv_mod.update_partials(partition, P, ops,
                                            init_clvs, init_scalers)
    u, v, e = root_info
    return lk_mod.edge_loglikelihood(partition, clvs, scalers, u, v, P[e])


@partial(jax.jit, static_argnums=(3,))
def loglikelihood_update(partition, ops, brlens, root_info, init_clvs,
                         init_scalers):
    """Partial-traversal evaluation: run only the given (masked-padded)
    op rows on top of CACHED buffers — the reference's
    cb_partial_traversal / CLV-validity protocol (treeinfo.c:38-61,
    872-944) in functional form. Returns (logL, clvs, scalers) for
    further incremental reuse."""
    P = partition.prob_matrices(brlens)
    clvs, scalers = clv_mod.update_partials(partition, P, ops,
                                            init_clvs, init_scalers)
    u, v, e = root_info
    lnl = lk_mod.edge_loglikelihood(partition, clvs, scalers, u, v, P[e])
    return lnl, clvs, scalers


@partial(jax.jit, static_argnames=("n_slots", "interpret"),
         donate_argnums=(4, 5))
def fused_update_eval(partition, tab10, brlens, rr, init_clvs,
                      init_scalers, n_slots: int, interpret: bool):
    """Partial-traversal evaluation on the FUSED megakernel: run only
    the (masked/bucketed) dirty op rows on top of CACHED CS×P buffers —
    the CLV-validity protocol (treeinfo.c:872-944) on the production
    TPU kernel. The prior buffers alias into the kernel outputs, so
    clean slots are never touched (no copy, no recompute); the root
    reduction uses TRACED refs so any root placement shares the
    program. Buffers run exact-f32 (split storage would force a
    whole-buffer plane merge at the root — defeating incrementality).

    The prior buffers are DONATED (donate_argnums): without donation
    XLA defensively copies the whole aliased CLV buffer every call
    (measured 178-439 ms/eval at 512-1024 taxa — slower than a full
    eval), with it the kernel writes in place. Callers must treat the
    passed buffers as consumed and keep only the returned ones.

    ``tab10``: ONE packed int32 [10, B] table (idx8.T | e1 | e2) from
    ``compile_fused_ops(..., as_numpy=True)`` — per-call tables reach
    the device in a single transfer instead of three.

    Returns (logL, clvs, scalers) for further incremental reuse.
    """
    from pllmod_tpu.ops import pallas_clv
    idx8 = tab10[:8].T
    e1 = tab10[8]
    e2 = tab10[9]
    if partition.eigen_lam is not None:
        P12 = pallas_clv.fused_p12(partition, brlens, e1, e2)
        clvs, scalers = pallas_clv.update_partials_fused(
            partition, None, idx8, e1, e2, n_slots, interpret, P12=P12,
            split=False, init=(init_clvs, init_scalers))
    else:
        P = partition.prob_matrices(brlens)
        clvs, scalers = pallas_clv.update_partials_fused(
            partition, P, idx8, e1, e2, n_slots, interpret,
            split=False, init=(init_clvs, init_scalers))
    P_root = partition.prob_matrices(jnp.take(brlens, rr[2])[None])[0]
    lnl = pallas_clv.root_loglikelihood_csp_dyn(
        partition, clvs, scalers, rr[0], rr[1], P_root)
    return lnl, clvs, scalers


def loglikelihood_bounded_fused(partition, tree, brlens=None,
                                root_edge=None, interpret=None):
    """Memory-bounded full-tree logL on the FUSED megakernel: the
    Sethi-Ullman slot-recycled serial schedule (O(log n) live slots —
    reference pll_tree.c:1509-1573) compiled for the kernel in SERIAL
    order (compile_fused_ops(serial=True): per-row fences cover the
    2-deep write pipeline's RAW hazards). This is the NORTH-STAR
    capacity+speed mode (BASELINE.md §3): at 10k taxa × 100k patterns
    the CLV buffer is ~18 slots ≈ 115 MB instead of 64 TB full-buffer,
    and the whole traversal stays one pallas dispatch instead of an
    O(n)-step XLA scan. Returns (logL, n_slots)."""
    from pllmod_tpu.ops import pallas_clv
    if brlens is None:
        brlens = tree.lengths
    brlens = jnp.asarray(np.asarray(brlens, np.dtype(partition.dtype)))
    ops, root_info = tree.traversal_ops(root_edge)
    u, v, e = (int(x) for x in root_info)
    n_tips = partition.n_tips
    # pipelined variant: ~56 spare slots buy a near-fence-free order
    # (the tight SU order fences ~75% of rows at 10k taxa, stalling the
    # kernel's DMA prefetch pipeline on every one)
    ops_b, n_slots_b, slot_map = clv_mod.bounded_slot_ops_pipelined(
        np.asarray(ops), n_tips, root_refs=(u, v))

    def remap(x):
        return x if x < n_tips else n_tips + int(slot_map[x - n_tips])

    idx8, e1, e2, n_slots = pallas_clv.compile_fused_ops(
        partition, np.asarray(ops_b), serial=True)
    if interpret is None:
        interpret = fast_kernel_interpret()
    rr = jnp.asarray(np.asarray((remap(u), remap(v), e), np.int32))
    lnl = _bounded_fused_eval(partition, idx8, brlens, e1, e2, rr,
                              n_slots, interpret)
    return lnl, n_slots


@partial(jax.jit, static_argnames=("n_slots", "interpret"))
def _bounded_fused_eval(partition, idx8, brlens, e1, e2, rr,
                        n_slots: int, interpret: bool):
    from pllmod_tpu.ops import pallas_clv
    if partition.eigen_lam is not None:
        P12 = pallas_clv.fused_p12(partition, brlens, e1, e2)
        clvs, scalers = pallas_clv.update_partials_fused(
            partition, None, idx8, e1, e2, n_slots, interpret, P12=P12,
            split=False)
    else:
        P = partition.prob_matrices(brlens)
        clvs, scalers = pallas_clv.update_partials_fused(
            partition, P, idx8, e1, e2, n_slots, interpret, split=False)
    P_root = partition.prob_matrices(jnp.take(brlens, rr[2])[None])[0]
    return pallas_clv.root_loglikelihood_csp_dyn(
        partition, clvs, scalers, rr[0], rr[1], P_root)


def loglikelihood_bounded(partition, tree, brlens=None, root_edge=None):
    """Memory-bounded full-tree logL: the CLV buffer holds only the
    O(log n) slots concurrently live under a Sethi-Ullman-ordered serial
    schedule with slot recycling (the reference's reusable CLV slots,
    pll_tree.c:1509-1573) — ~16 slots for 10,000 taxa instead of one per
    inner node. Returns (logL, n_slots)."""
    if brlens is None:
        brlens = tree.lengths
    brlens = jnp.asarray(brlens, partition.dtype)
    ops, root_info = tree.traversal_ops(root_edge)
    u, v, e = (int(x) for x in root_info)
    n_tips = partition.n_tips
    ops_b, n_slots, slot_map = clv_mod.bounded_slot_ops(
        ops, n_tips, root_refs=(u, v))

    def remap(x):
        return x if x < n_tips else n_tips + slot_map[x - n_tips]

    lnl = _loglikelihood_bounded(partition, jnp.asarray(ops_b), brlens,
                                 (remap(u), remap(v), e), n_slots)
    return lnl, n_slots


def compile_schedule(partition, tree, root_edge=None):
    """Host-side: compile a tree into the level schedule + remapped root
    info. Returns (levels tuple, offsets tuple, root_info, n_slots)."""
    ops, root_info = tree.traversal_ops(root_edge)
    sched = clv_mod.LevelSchedule(ops, partition.n_tips)
    u, v, e = (int(x) for x in root_info)
    ri = (sched.remap_node(u), sched.remap_node(v), e)
    levels = tuple(jnp.asarray(l) for l in sched.levels)
    return levels, tuple(sched.offsets), ri, sched.n_slots


def loglikelihood_with_buffers(partition, ops, brlens, root_info):
    """As :func:`loglikelihood` but also returns (P, clvs, scalers) for
    incremental reuse."""
    P = partition.prob_matrices(brlens)
    clvs, scalers = clv_mod.update_partials(partition, P, ops)
    u, v, e = root_info
    lnl = lk_mod.edge_loglikelihood(partition, clvs, scalers, u, v, P[e])
    return lnl, (P, clvs, scalers)


# None = auto (TPU + f32); True/False = forced (tests force True on CPU,
# where the kernel runs in interpret mode)
FORCE_FAST_KERNEL: bool | None = None


def use_fast_kernel(partition) -> bool:
    """True when the Pallas kernels are the right engine: TPU-class
    device + f32 partition (the kernels' rescaling is f32-exponent based)
    + CS = cats·states aligned to the Mosaic sublane tiling (8): the
    kernels DMA per-row [CS, T] slices of tiled buffers, which real-TPU
    Mosaic rejects when a partial slice of the sublane dim is neither
    8-aligned nor inside one tile — measured: CS ∈ {16,32,40,64,80} and
    CS=4 (DNA, 1 rate category; fused + deriv kernels bit-checked vs
    XLA on-chip) compile; CS=20 (e.g. 5-state ×4 cats, or 20-state
    cats=1) is rejected and routes to the XLA engines. Interpret mode
    does not enforce tiling, so FORCE_FAST_KERNEL (tests) keeps
    exercising unaligned shapes on CPU."""
    if FORCE_FAST_KERNEL is not None:
        if FORCE_FAST_KERNEL and partition.dtype != jnp.float32:
            # loud, not silent: the kernels are f32-only (rescaling is
            # f32-exponent based) — a forced-on override meeting an f64
            # partition would otherwise quietly run the slow path and
            # blind the test to the kernel it meant to exercise
            import warnings
            warnings.warn(
                "FORCE_FAST_KERNEL=True ignored for non-f32 partition "
                f"(dtype={partition.dtype}); running the XLA engine",
                RuntimeWarning, stacklevel=2)
            return False
        return FORCE_FAST_KERNEL
    from pllmod_tpu.common import is_tpu
    cs = partition.n_cats * partition.states
    return (is_tpu() and partition.dtype == jnp.float32
            and (cs % 8 == 0 or cs == 4))


def fast_kernel_interpret() -> bool:
    """Interpret mode for the fused kernel when forced onto CPU (tests)."""
    from pllmod_tpu.common import is_tpu
    return not is_tpu()


# Measured resident-vs-fused crossover on the v5e (64 taxa × 4096
# patterns, ms/eval): CS=16 resident 0.56-0.60 vs fused 0.82; CS=32
# 0.581 vs 0.566 (tie); CS=40 0.673 vs 0.634; CS=64 0.767 vs 0.720;
# CS=80 1.18 vs 0.98. Bigger CS forces smaller VMEM pattern tiles for
# the resident slot set, so the HBM fused kernel overtakes it around
# CS=32 (PERF_NOTES).
RESIDENT_CS_MAX = 32


def fast_eval_schedule(partition) -> str:
    """The production evaluation kernel for this partition's shape.

    The resident kernel additionally requires CS ≡ 0 (mod 8): it
    partially slices the sublane-tiled CS dim of its VMEM scratch
    (measured: CS=4 is rejected by Mosaic where the fused kernel
    compiles and is bit-identical to XLA)."""
    cs = partition.n_cats * partition.states
    return "resident" if (cs <= RESIDENT_CS_MAX and cs % 8 == 0) \
        else "fused"


class LruCache(dict):
    """Bounded insertion-ordered cache: a plain dict plus eviction of the
    least-recently-USED entry past ``maxsize``. Module-level program /
    plane caches use this so every alignment or callable ever seen does
    not pin device memory (or a compiled executable) for process
    lifetime."""

    def __init__(self, maxsize: int):
        super().__init__()
        self.maxsize = maxsize

    def get(self, key, default=None):
        if key in self:
            val = super().pop(key)     # move-to-end on hit
            super().__setitem__(key, val)
            return val
        return default

    def __setitem__(self, key, val):
        if key in self:
            super().pop(key)
        super().__setitem__(key, val)
        while len(self) > self.maxsize:
            super().pop(next(iter(self)))


# Pre-expanded resident-kernel tip planes, cached per alignment: the
# planes are model- and topology-invariant but ~tens of MB (n_tips × CS
# × Ppad bf16), so per-optimizer-call rebuilds would device_put the
# whole alignment expansion every time. Keyed by the identity of the
# alignment arrays (strong refs keep ids stable for live entries) plus
# the C·S expansion shape; LRU-bounded so retired alignments (e.g. a
# bootstrap-replicate sweep) release their device memory.
_TIP_PLANES_CACHE: LruCache = LruCache(maxsize=4)


def tip_planes_cached(partition, mesh=None, axis_name=None):
    """Cached :func:`pllmod_tpu.ops.pallas_resident.expanded_tip_planes`
    for this partition's alignment (see cache note above). Under a site
    mesh the planes are committed pattern-sharded ([tips, CS, Ppad] on
    the last axis) so the shard_map programs don't reshard them per
    call."""
    key = (id(partition.tip_states), id(partition.code_clv),
           partition.n_cats, partition.states, mesh, axis_name)
    ent = _TIP_PLANES_CACHE.get(key)
    if (ent is None or ent[0] is not partition.tip_states
            or ent[1] is not partition.code_clv):
        from pllmod_tpu.ops import pallas_resident
        planes = pallas_resident.expanded_tip_planes(partition)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            planes = jax.device_put(
                planes, NamedSharding(mesh, P(None, None, axis_name)))
        ent = (partition.tip_states, partition.code_clv, planes)
        _TIP_PLANES_CACHE[key] = ent
    return ent[2]


# ONE device program evaluating K partitions' full-tree logL through the
# fast kernels. treeinfo.compute_loglh's per-partition loop costs one
# tunnel dispatch (~40 ms on axon) + one host sync EACH — partitioned
# analyses (the reference's core use case) pay K× per evaluation. The
# program takes partitions / branch lengths / traversal index rows /
# root refs as TRACED pytrees, so one compile serves every topology of a
# taxon count (the fused kind uses loglikelihood_fused_dyn with in-trace
# root rows); keyed on the per-partition (kind, statics) tuples only.
# LRU-bounded: each entry pins a compiled executable.
_MULTI_EVAL_PROGRAMS: LruCache = LruCache(maxsize=32)


def fast_lane_args(partition, tree, mesh=None, axis_name=None):
    """(kind, arrays, statics) for one partition's lane of a combined
    fast-kernel program (multi_eval here; the cached whole-Brent
    optimizer programs reuse the same layout). ``arrays`` are traced
    program inputs, ``statics`` the jit-cache key components.
    ``mesh``/``axis_name``: commit pattern-indexed lane arrays (the
    resident tip planes) to their mesh sharding."""
    from pllmod_tpu.ops import pallas_clv, pallas_resident
    interp = fast_kernel_interpret()
    split = use_split_clv(partition)
    if fast_eval_schedule(partition) == "resident":
        idx8, e1, e2, n_slots = pallas_resident.compile_resident(
            partition, tree,
            n_slots_min=pallas_resident.resident_slot_bound(
                partition.n_tips))
        tip_hi = tip_planes_cached(partition, mesh, axis_name)
        return ("resident", (idx8, e1, e2, tip_hi),
                (n_slots, interp, split))
    # fuse_root=False + DYNAMIC root refs: the root row is appended
    # in-trace by loglikelihood_fused_dyn, keeping the lane
    # topology-independent like the resident kind
    idx8, e1, e2, ri, n_slots = pallas_clv.compile_fused(
        partition, tree, fuse_root=False)
    import numpy as _np
    rr = jnp.asarray(_np.asarray(ri, _np.int32))
    return "fused", (idx8, e1, e2, rr), (n_slots, interp, split)


def lane_ev(kind, statics):
    """The evaluation closure for one (kind, statics) lane."""
    if kind == "resident":
        from pllmod_tpu.ops import pallas_resident
        n_slots, interp, split = statics

        def ev(p, brl, arrays):
            idx8, e1, e2, tip_hi = arrays
            return pallas_resident.loglikelihood_resident(
                p, idx8, brl, (e1, e2), tip_hi, n_slots, interp, split)
    elif kind == "fused":
        from pllmod_tpu.ops import pallas_clv
        n_slots, interp, split = statics

        def ev(p, brl, arrays):
            idx8, e1, e2, rr = arrays
            return pallas_clv.loglikelihood_fused_dyn(
                p, idx8, brl, e1, e2, rr, n_slots, interp, split,
                fuse_root=True)
    else:

        def ev(p, brl, arrays):
            ops, ri = arrays
            return loglikelihood(p, ops, brl, (ri[0], ri[1], ri[2]))
    return ev


def lane_arr_specs(kind, axis_name):
    """shard_map in_specs for one lane's artifact arrays: everything
    replicated except pattern-indexed planes (the resident tip planes,
    [tips, CS, Ppad] sharded on patterns)."""
    from jax.sharding import PartitionSpec as P
    if kind == "resident":
        return (P(), P(), P(), P(None, None, axis_name))
    if kind == "fused":
        return (P(), P(), P(), P())
    return (P(), P())            # scan: (ops, root-ref ints)


def multi_eval(parts, brls, artifacts, kinds_statics, mesh=None,
               axis_name=None):
    """Evaluate K fast-kernel partitions in one jitted program.

    Args:
      parts: list of Partition pytrees (shapes/kinds may differ)
      brls: list of per-partition branch-length arrays
      artifacts: list of per-lane arrays from :func:`fast_lane_args`
      kinds_statics: tuple of per-partition (kind, statics) — the
        program-cache key
      mesh/axis_name: when given, the program runs under shard_map on
        the site mesh — each device evaluates every lane's kernels on
        its local pattern shard, and the per-lane site sums psum over
        the mesh (the reference's parallel_reduce_cb seam,
        treeinfo.c:1061-1067)
    Returns:
      [K] per-partition logL (one dispatch, one sync)
    """
    key = (kinds_statics, mesh, axis_name,
           tuple(_mesh_spec_sig(p) for p in parts) if mesh else None)
    prog = _MULTI_EVAL_PROGRAMS.get(key)
    if prog is None:
        evs = [lane_ev(kind, st) for kind, st in kinds_statics]

        def run(parts, brls, arrays):
            lnls = jnp.stack([ev(parts[k], brls[k], arrays[k])
                              for k, ev in enumerate(evs)])
            if mesh is not None:
                lnls = jax.lax.psum(lnls, axis_name)
            return lnls

        if mesh is not None:
            from functools import partial as _partial
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            from pllmod_tpu.parallel.sharding import partition_specs
            pspecs = tuple(partition_specs(p, axis_name) for p in parts)
            aspecs = tuple(lane_arr_specs(kind, axis_name)
                           for kind, _ in kinds_statics)
            run = _partial(shard_map, mesh=mesh,
                           in_specs=(pspecs, tuple(P() for _ in parts),
                                     aspecs),
                           out_specs=P(), check_vma=False)(run)
        prog = jax.jit(run)
        _MULTI_EVAL_PROGRAMS[key] = prog
    return prog(tuple(parts), tuple(brls), tuple(artifacts))


def _mesh_spec_sig(partition):
    """Optional-field signature for shard_map spec pytrees (the in_specs
    structure must match the partition pytree structure)."""
    return tuple(f for f in ("eigen_lam", "eigen_V", "eigen_Vinv")
                 if getattr(partition, f) is not None)


def compile_fast_eval(partition, tree, root_edge=None, n_slots_min=None,
                      tip_hi=None):
    """Compile the production fast evaluation path (CS-gated resident or
    fused megakernel) for this (partition shape, topology).

    Returns ``eval(part, brl) -> logL`` where ``part`` is traced (the
    model-opt drivers close over topology but differentiate/search over
    partition parameters) and ``brl`` are the edge branch lengths.

    ``tip_hi``: optional precomputed ``expanded_tip_planes(partition)``
    (topology- and model-invariant, so callers evaluating many
    topologies should build it once per partition). NOTE the resident
    closure embeds the tip data — it is only valid for partitions
    sharing ``partition``'s alignment (the fused closure takes all
    partition data from the traced ``part`` argument instead).
    """
    from pllmod_tpu.ops import pallas_clv, pallas_resident

    interp = fast_kernel_interpret()
    split = use_split_clv(partition)
    if fast_eval_schedule(partition) == "resident":
        if n_slots_min is None:
            n_slots_min = pallas_resident.resident_slot_bound(
                partition.n_tips)
        idx8, e1, e2, n_slots = pallas_resident.compile_resident(
            partition, tree, root_edge, n_slots_min=n_slots_min)
        if tip_hi is None:
            tip_hi = tip_planes_cached(partition)

        def ev(part, brl):
            return pallas_resident.loglikelihood_resident(
                part, idx8, brl, (e1, e2), tip_hi, n_slots, interp, split)

        return ev

    idx8, e1, e2, ri, n_slots = pallas_clv.compile_fused(
        partition, tree, root_edge, fuse_root=True)

    def ev(part, brl):
        return pallas_clv.loglikelihood_fused(part, idx8, brl, e1, e2,
                                              ri, n_slots, interp, split)

    return ev


# None = auto; True/False/"read" = forced. Split modes replace the one
# 6-pass HIGHEST child dot with single-pass DEFAULT dots:
#   True   — split-STORAGE bf16x2 CLVs, 2 dots (drops Pl@lo ~2^-18).
#   "read" — exact f32 storage + READ-TIME hi/lo casts + 3 dots: same
#            dot scheme without the per-node storage quantization, so
#            errors do not accumulate along tree depth. ~2% slower than
#            storage mode (protein 64x4096: 0.989 vs 0.969 ms/eval).
# Measured on-chip vs the f64 oracle AFTER the round-2 pack fix (the
# XLA bf16-propagation pass silently zeroed device-built Pl planes —
# see pallas_clv._bf16_residual): DNA+G4 6.9e-8, CS=4 1.1e-7, GT10
# 7.6e-8, GT16 6.1e-8, protein True 1.6e-7 / "read" 6.5e-8 relative —
# all far inside the 1e-6 reference-parity bar, and split is the
# fastest mode at EVERY fast-kernel shape (protein 0.969 vs 1.331
# exact; CS=4 0.534 vs 0.878). Auto picks storage mode for small state
# counts and "read" for wide ones (states > 8), where the per-node
# quantization sum is larger and deep trees erode the margin —
# f32 storage removes that accumulation term for ~2% cost.
SPLIT_CLV: bool | str | None = None
SPLIT_STATES_MAX = 8


def use_split_clv(partition=None) -> bool | str:
    if SPLIT_CLV is not None:
        return SPLIT_CLV
    from pllmod_tpu.common import is_tpu
    if partition is None:
        return is_tpu()
    cs = partition.n_cats * partition.states
    if not (is_tpu() and (cs % 8 == 0 or cs == 4)):
        return False
    return True if partition.states <= SPLIT_STATES_MAX else "read"


def tree_loglikelihood(partition, tree, brlens=None, root_edge=None,
                       schedule: str = "auto"):
    """Convenience host-level wrapper: compile traversal + evaluate.

    ``schedule``: "auto" (VMEM-resident megakernel on TPU f32, serial
    scan elsewhere), "resident" (whole traversal + root reduction with
    the live CLV set held in VMEM under bounded-slot recycling — the
    fastest evaluation path, PERF_NOTES), "fused" (whole-traversal HBM
    megakernel — the path that also materializes CLV buffers), "pallas"
    (per-level kernels, kept for comparison), "levels" (level-batched
    XLA), "scan" (one node per step — the reference-equivalent serial
    schedule, kept for kernel-equivalence testing) or "repeats" (host
    numpy float64, computes only each node's unique site classes — the
    PLL_ATTRIB_SITE_REPEATS analog, ops/repeats.py; returns a Python
    float)."""
    if brlens is None:
        brlens = tree.lengths
    brlens = jnp.asarray(brlens, partition.dtype)
    if schedule == "auto":
        if use_fast_kernel(partition):
            schedule = fast_eval_schedule(partition)
        else:
            # TPU shapes the kernels can't take (CS % 8, f64): the
            # level-batched XLA engine is ~20× the serial scan there;
            # on CPU the scan stays the f64 reference path
            from pllmod_tpu.common import is_tpu
            schedule = "levels" if is_tpu() else "scan"
    if schedule == "resident":
        from pllmod_tpu.ops import pallas_resident
        idx8, e1, e2, n_slots = pallas_resident.compile_resident(
            partition, tree, root_edge)
        tip_hi = pallas_resident.expanded_tip_planes(partition)
        return pallas_resident.loglikelihood_resident(
            partition, idx8, brlens, (e1, e2), tip_hi, n_slots,
            fast_kernel_interpret(), use_split_clv(partition))
    if schedule == "fused":
        from pllmod_tpu.ops import pallas_clv
        idx8, e1, e2, ri, n_slots = pallas_clv.compile_fused(
            partition, tree, root_edge, fuse_root=True)
        return pallas_clv.loglikelihood_fused(partition, idx8, brlens,
                                              e1, e2, ri, n_slots,
                                              fast_kernel_interpret(),
                                              use_split_clv(partition))
    if schedule == "repeats":
        from pllmod_tpu.ops import repeats
        return repeats.loglikelihood_repeats(partition, tree, brlens,
                                             root_edge)
    if schedule == "pallas":
        from pllmod_tpu.ops import pallas_clv
        levels, offsets, ri, n_slots = compile_schedule(partition, tree,
                                                        root_edge)
        return pallas_clv.loglikelihood_pallas(partition, levels, brlens,
                                               offsets, ri, n_slots)
    if schedule == "levels":
        levels, offsets, ri, n_slots = compile_schedule(partition, tree,
                                                        root_edge)
        return loglikelihood_levels(partition, levels, brlens, offsets,
                                    ri, n_slots)
    ops, root_info = tree.traversal_ops(root_edge)
    ri = tuple(int(x) for x in root_info)
    return loglikelihood(partition, jnp.asarray(ops), brlens, ri)
