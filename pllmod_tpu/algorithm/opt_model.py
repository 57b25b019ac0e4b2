"""Model-parameter optimization drivers over a TreeInfo.

TPU build of ``pllmod_algorithm.c`` (single + treeinfo families,
:51-480 and :729-1870) and its target callbacks (``algo_callback.c``).
The reference's shape: pack parameters → L-BFGS-B/Brent/EM with
*finite-difference* gradients, each evaluation re-entering the full C
likelihood. Here every objective is a jitted JAX function of the packed
parameters, so

- gradients are **analytic** (``jax.grad`` through eigendecomp + pruning;
  kills the (nmax+1)-evaluations-per-iteration loop of SURVEY §3.3),
- eigendecomposition "invalidation" is just recomputation inside the
  traced graph,
- the parameterizations match the reference: rates packed by symmetry
  class with the last class pinned to 1 (pllmod_algorithm.c:1043-1099),
  frequencies as ratios to the last state (:1137-1311), alpha/pinv/scaler
  by Brent within the reference bounds, free rates+weights by EM +
  alternating L-BFGS with the Σwr=1 renormalization pushed into branch
  lengths (:1434-1840).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pllmod_tpu import common
from pllmod_tpu.common import (
    PARAM_ALPHA, PARAM_PINV, PARAM_SUBST_RATES, PARAM_FREQUENCIES,
    PARAM_FREE_RATES, PARAM_RATE_WEIGHTS, PARAM_BRANCHES_ITERATIVE,
    PARAM_BRANCH_LEN_SCALER, BRLEN_SCALED,
)
from pllmod_tpu.ops import engine as engine_mod
from pllmod_tpu.optimize.brent import minimize_brent_multi
from pllmod_tpu.optimize.lbfgsb import minimize_lbfgsb, minimize_lbfgsb_multi
from pllmod_tpu.optimize.em import em_rates_weights
from pllmod_tpu.optimize.blo import optimize_branch_lengths_treeinfo
from pllmod_tpu.ops import clv as clv_mod
from pllmod_tpu.ops import likelihood as lk_mod


# ---------------------------------------------------------------------------
# Module-level, TOPOLOGY-TRACED analytic-gradient objectives: ops / brlens /
# root ints are traced arguments, so ONE compiled (value, grad) program per
# parameter family serves every topology of a given shape — ml_search's
# interleaved model-opt rounds previously recompiled each objective per
# round (~4 multi-second remote compiles per round on axon; the objectives
# embedded the topology as constants).
# ---------------------------------------------------------------------------
def _neg_alpha_pinv_fn(x, part, ops, brl, ri):
    p = part.with_alpha(x[0]).replace(
        prop_invar=jnp.full_like(part.prop_invar, x[1]))
    return -engine_mod.loglikelihood(p, ops, brl, ri)


_vg_alpha_pinv = jax.jit(jax.value_and_grad(_neg_alpha_pinv_fn))


def _neg_freqs_fn(ratios, part, ops, brl, ri):
    raw = jnp.concatenate([ratios, jnp.ones((1,), ratios.dtype)])
    freqs = raw / jnp.sum(raw)
    p = part.with_model_params(
        freqs=jnp.broadcast_to(freqs, part.freqs.shape))
    return -engine_mod.loglikelihood(p, ops, brl, ri)


_vg_freqs = jax.jit(jax.value_and_grad(_neg_freqs_fn))


def _expand_sym(free, remap, pinned: int):
    """Symmetry-class free params -> full rate vector (pinned class = 1)."""
    ones = jnp.ones((1,), free.dtype)
    vals = jnp.concatenate([free[:pinned], ones, free[pinned:]])
    return vals[remap]


def _neg_rates_fn(free, part, remap, pinned, ops, brl, ri):
    full = _expand_sym(free, remap, pinned)
    p = part.with_model_params(
        subst_rates=jnp.broadcast_to(full, part.subst_rates.shape))
    return -engine_mod.loglikelihood(p, ops, brl, ri)


_vg_rates = jax.jit(jax.value_and_grad(_neg_rates_fn), static_argnums=(3,))


def _neg_cats_fn(r, part, ops, brl, ri):
    return -engine_mod.loglikelihood(part.replace(rate_cats=r), ops, brl, ri)


_vg_cats = jax.jit(jax.value_and_grad(_neg_cats_fn))


# ---------------------------------------------------------------------------
# Lock-step L-BFGS lanes: K selected partitions optimize one parameter
# family as K independent instances whose objective evaluations are
# batched into ONE jitted (value, grad) program per step — the
# reference's pllmod_opt_minimize_lbfgsb_multi shape
# (opt_algorithms.c:542-807: one collective evaluation per iteration for
# all partition instances), completing the round-3 Brent-lane program
# for the gradient families. Per-lane trajectories are identical to
# standalone runs: lanes only share evaluation TIMING, never state
# (optimize/lbfgsb.py minimize_lbfgsb_multi).
# ---------------------------------------------------------------------------
_VG_LANE_FNS = {
    "alpha_pinv": _neg_alpha_pinv_fn,
    "freqs": _neg_freqs_fn,
    "cats": _neg_cats_fn,
}


# ---------------------------------------------------------------------------
# EDGE-DECOMPOSITION (value, grad): the TPU-fast model-parameter
# objective. Autodiff through the full pruning recursion forces the
# slow differentiable XLA traversal (the serial scan — measured 0.4-3 s
# per (value,grad) at 246 taxa × 4480 patterns; ~97% of a flagship
# ml_search round sat in opt_model, tools/probe_search246_decomp.out).
#
# The likelihood is MULTILINEAR in the per-edge transition matrices
# {P_e} (each edge's P appears exactly once in every site's pruning
# product — the identity behind the reference's sumtable derivatives,
# pll_optimize.c:1223-1287, applied to MODEL parameters instead of
# branch lengths):
#
#     dlogL/dθ = Σ_e ⟨ ∂logL/∂P_e |_{CLVs fixed}, dP_e/dθ ⟩
#                + ∂logL/∂(root freqs / pinv / weights) · d(...)/dθ.
#
# So the gradient needs only (a) the directed CLVs facing every edge —
# PRIMAL data, computed by the fused Pallas megakernel with
# stop_gradient (the kernel needs no VJP rule), and (b) autodiff
# through the SMALL maps θ → P [E,C,S,S] (eigendecomp, gamma cats) and
# the θ-dependent root reduction at ONE designated edge e0.
#
# Formulation (exact value + exact gradient, no fp accumulation across
# edges): with per-edge logLs lnl_e(θ) computed against CONSTANT CLVs
# and CONSTANT root factors,
#
#     h(θ) = lnl_e0^{θ-root}(θ) + Σ_{e≠e0} [ lnl_e(θ) − sg(lnl_e(θ)) ]
#
# Every bracket has primal value 0 (sg = stop_gradient changes no
# values), so h's VALUE is exactly the tree logL evaluated through e0,
# while its gradient collects every edge's P-term plus the root term.
# ---------------------------------------------------------------------------
def _edge_decomp_neg_loglh(p_theta, brl, idx8, e1, e2, eref, swap,
                           emask, e0, n_slots: int, interp: bool):
    """-logL(θ) with exact edge-decomposition gradients (see above).

    ``idx8/e1/e2``: fused-megakernel tables (blo._fused_args layout);
    ``eref`` int32 [E, 2]: directed-CLV refs facing each edge
    (DirectedTraversal.edge_ref, original slot numbering); ``swap``
    bool [E]: True when eref column 1 (not 0) is the ROOT side of the
    edge; ``e0``: traced index of the designated live edge.

    The root-frequency factor must ride the ROOT side of every edge's
    contraction: the two side choices give the same VALUE by
    reversibility (π_i P_ij = π_j P_ji), but their ∂/∂P_e partials are
    transposes of each other, and frequency tangents leave the
    π-reversible family — only the root-sided form's partial equals the
    fixed-rooting ∂logL/∂P_e (the same reason libpll folds freqs into
    the PARENT side of its sumtables, pll.c core_update_sumtable)."""
    from pllmod_tpu.optimize import blo as blo_mod

    sg = jax.lax.stop_gradient
    p_const = jax.tree_util.tree_map(sg, p_theta)
    dtype = p_theta.dtype
    prec = jax.lax.Precision.HIGHEST

    P_theta = p_theta.prob_matrices(brl)                  # [E, C, S, S]
    clvs, scalers = blo_mod._directed_clvs(
        p_const, sg(P_theta), (), (), n_slots,
        (idx8, e1, e2, n_slots, interp))
    clvs = sg(clvs)
    clvU, sU = clv_mod.gather_node_clvs(p_const, clvs, scalers,
                                        eref[:, 0])
    clvV, sV = clv_mod.gather_node_clvs(p_const, clvs, scalers,
                                        eref[:, 1])
    clvU, clvV = sg(clvU), sg(clvV)
    sc = sU + sV                                          # [E, P] int

    sw = swap[:, None, None, None]
    clvR = jnp.where(sw, clvV, clvU)        # root side (fc rides here)
    clvS = jnp.where(sw, clvU, clvV)        # subtree side
    # NOTE: P is NOT transposed on swapped edges — the stored matrix is
    # ancestor→descendant in whichever role it is applied (the root
    # side always plays ancestor): Σ_ij fc_i clvR_i P[i,j] clvS_j.

    right = jnp.einsum("epcj,ecij->epci", clvS, P_theta,
                       preferred_element_type=dtype, precision=prec)
    fc_const = p_const.freqs_per_cat()
    per_cat = jnp.einsum("epci,ci,epci->epc", clvR, fc_const, right,
                         preferred_element_type=dtype, precision=prec)
    site_lnl = jax.vmap(lk_mod._site_lnl, in_axes=(None, 0, 0))
    lnl_e = jnp.einsum("ep,p->e", site_lnl(p_const, per_cat, sc),
                       p_const.pattern_weights, precision=prec)   # [E]
    grad_only = jnp.where(emask, lnl_e - sg(lnl_e), 0.0)
    grad_only = jnp.sum(grad_only) - (lnl_e[e0] - sg(lnl_e[e0]))

    # designated edge: full θ-dependence (P_e0 AND root factors)
    per_cat0 = jnp.einsum("pci,ci,pci->pc", clvR[e0],
                          p_theta.freqs_per_cat(), right[e0],
                          preferred_element_type=dtype, precision=prec)
    lnl0 = jnp.einsum("p,p->", lk_mod._site_lnl(p_theta, per_cat0,
                                                sc[e0]),
                      p_const.pattern_weights, precision=prec)
    return -(lnl0 + grad_only)


_EDGE_VG_ARGS = engine_mod.LruCache(maxsize=16)


def _edge_vg_args(treeinfo, idx):
    """Per-(topology, partition-shape) artifacts for the edge-decomp
    objectives: fused tables + directed edge refs + live mask + a
    designated live edge. Cached on (edge_nodes bytes, shape sig) —
    SPR rounds revisit topologies only through fresh applies, and the
    arrays are topology-sized uploads worth reusing across the families
    of one opt_model call. Returns None when the partition can't run
    the fused kernel (caller falls back to the autodiff objectives)."""
    from pllmod_tpu.optimize.blo import DirectedTraversal, _fused_args

    part = treeinfo.partitions[idx]
    if not engine_mod.use_fast_kernel(part):
        return None
    tree = treeinfo.tree
    key = (tree.edge_nodes.tobytes(), part.n_tips, str(part.dtype),
           part.n_cats, part.states, part.n_patterns_padded)
    hit = _EDGE_VG_ARGS.get(key)
    if hit is None:
        trav = DirectedTraversal(tree)
        fargs = _fused_args(part, trav)
        if not fargs:
            return None
        idx8, e1, e2 = fargs["fused_idx"]
        emask_np = trav.edge_mask
        # per-edge root-sidedness: BFS depth from the traversal's root
        # tip; the shallower endpoint is the root side (see the swap
        # docstring in _edge_decomp_neg_loglh)
        adj = tree.adjacency()
        depth = np.full(2 * tree.n_tips, -1, np.int64)
        depth[0] = 0
        stack = [0]
        while stack:
            node = stack.pop()
            for nbr, _e in adj[node]:
                if depth[nbr] < 0:
                    depth[nbr] = depth[node] + 1
                    stack.append(nbr)
        en = np.asarray(tree.edge_nodes, np.int64)
        u = np.where(emask_np, en[:, 0], 0)
        v = np.where(emask_np, en[:, 1], 0)
        swap_np = depth[v] < depth[u]
        hit = dict(idx8=idx8, e1=e1, e2=e2,
                   eref=jnp.asarray(trav.edge_ref),
                   swap=jnp.asarray(swap_np),
                   emask=jnp.asarray(emask_np),
                   e0=jnp.asarray(int(np.argmax(emask_np)), jnp.int32),
                   n_slots=fargs["fused_nslots"],
                   interp=fargs["fused_interp"])
        _EDGE_VG_ARGS[key] = hit
    brl = jnp.asarray(np.asarray(treeinfo.partition_brlens(idx),
                                 part.dtype))
    return dict(hit, brl=brl)


def _neg_rates_fn_edge(free, part, remap, pinned, brl, idx8, e1, e2,
                       eref, swap, emask, e0, n_slots, interp):
    full = _expand_sym(free, remap, pinned)
    p = part.with_model_params(
        subst_rates=jnp.broadcast_to(full, part.subst_rates.shape))
    return _edge_decomp_neg_loglh(p, brl, idx8, e1, e2, eref, swap,
                                  emask, e0, n_slots, interp)


def _neg_freqs_fn_edge(ratios, part, brl, idx8, e1, e2, eref, swap,
                       emask, e0, n_slots, interp):
    raw = jnp.concatenate([ratios, jnp.ones((1,), ratios.dtype)])
    freqs = raw / jnp.sum(raw)
    p = part.with_model_params(
        freqs=jnp.broadcast_to(freqs, part.freqs.shape))
    return _edge_decomp_neg_loglh(p, brl, idx8, e1, e2, eref, swap,
                                  emask, e0, n_slots, interp)


def _neg_alpha_pinv_fn_edge(x, part, brl, idx8, e1, e2, eref, swap,
                            emask, e0, n_slots, interp):
    p = part.with_alpha(x[0]).replace(
        prop_invar=jnp.full_like(part.prop_invar, x[1]))
    return _edge_decomp_neg_loglh(p, brl, idx8, e1, e2, eref, swap,
                                  emask, e0, n_slots, interp)


def _neg_cats_fn_edge(r, part, brl, idx8, e1, e2, eref, swap, emask, e0,
                      n_slots, interp):
    return _edge_decomp_neg_loglh(part.replace(rate_cats=r), brl, idx8,
                                  e1, e2, eref, swap, emask, e0, n_slots,
                                  interp)


_VG_LANE_FNS_EDGE = {
    "alpha_pinv_edge": _neg_alpha_pinv_fn_edge,
    "freqs_edge": _neg_freqs_fn_edge,
    "cats_edge": _neg_cats_fn_edge,
}

_VG_LANE_PROGRAMS = engine_mod.LruCache(maxsize=32)


def _vg_lane_program(family: str, lane_statics: tuple):
    """One jitted program computing (value, grad) for K lanes of one
    family in one dispatch. ``lane_statics``: per-lane static tuples
    (the rates family bakes its ``pinned`` index per lane; others are
    empty). All array aux (partition pytree, op table, brlens, root
    ints) is TRACED, so one program serves every topology."""
    key = (family, lane_statics)
    prog = _VG_LANE_PROGRAMS.get(key)
    if prog is not None:
        return prog
    if family == "rates":
        vgs = [jax.value_and_grad(
            lambda x, part, remap, ops, brl, ri, _p=st[0]:
            _neg_rates_fn(x, part, remap, _p, ops, brl, ri))
            for st in lane_statics]
    elif family == "rates_edge":
        vgs = [jax.value_and_grad(
            lambda x, part, remap, brl, i8, a, b, er, sw, em, e0,
            _p=st[0], _ns=st[1], _it=st[2]:
            _neg_rates_fn_edge(x, part, remap, _p, brl, i8, a, b, er,
                               sw, em, e0, _ns, _it))
            for st in lane_statics]
    elif family.endswith("_edge"):
        base = _VG_LANE_FNS_EDGE[family]
        vgs = [jax.value_and_grad(
            lambda x, part, brl, i8, a, b, er, sw, em, e0,
            _f=base, _ns=st[0], _it=st[1]:
            _f(x, part, brl, i8, a, b, er, sw, em, e0, _ns, _it))
            for st in lane_statics]
    else:
        vgs = [jax.value_and_grad(_VG_LANE_FNS[family])] * len(lane_statics)

    def run(xs, auxs):
        return tuple(vg(xs[k], *auxs[k]) for k, vg in enumerate(vgs))

    prog = jax.jit(run)
    _VG_LANE_PROGRAMS[key] = prog
    return prog


def _use_ondevice_lbfgs() -> bool:
    """Whole-L-BFGS-on-device policy: on for accelerators (each host
    evaluation step pays ~40 ms dispatch ISSUE on the remote runtime —
    ~40 steps × 2-3 families per opt_model call), off on CPU where the
    host driver is the f64 reference. ``PLLMOD_LBFGS_ONDEVICE`` ∈ {0,1}
    force-overrides (tests use 1 to run the device driver on CPU)."""
    import os
    env = os.environ.get("PLLMOD_LBFGS_ONDEVICE")
    if env is not None:
        return env != "0"
    from pllmod_tpu.common import is_tpu
    return is_tpu()


def _lbfgsb_lanes(family: str, lanes: list, max_iters: int, pgtol: float):
    """Run K lanes through the lock-step L-BFGS against the cached
    combined (value, grad) program. Each lane dict: x0 / lo / hi
    (numpy), aux (traced array tuple), statics (program-key tuple),
    dtype. Returns the per-lane (x_opt, f_opt, n_evals) list.

    On accelerators the WHOLE multi-lane trajectory runs as one device
    program (optimize/lbfgsb.py minimize_lbfgsb_multi_device — the
    L-BFGS member of the whole-Brent / on-device-BLO family); the host
    loop remains the CPU/f64 reference path."""
    statics = tuple(l["statics"] for l in lanes)
    prog = _vg_lane_program(family, statics)
    auxs = tuple(l["aux"] for l in lanes)
    dtypes = [l["dtype"] for l in lanes]

    if _use_ondevice_lbfgs():
        from pllmod_tpu.optimize.lbfgsb import minimize_lbfgsb_multi_device

        def vg_traced(xs, auxs_):
            return prog(tuple(x.astype(dtypes[k])
                              for k, x in enumerate(xs)), auxs_)

        key = ("lbfgs_dev", family, statics,
               tuple(str(d) for d in dtypes),
               tuple(np.shape(l["x0"]) for l in lanes), max_iters,
               pgtol)
        return minimize_lbfgsb_multi_device(
            vg_traced, [l["x0"] for l in lanes],
            [l["lo"] for l in lanes], [l["hi"] for l in lanes],
            max_iters=max_iters, pgtol=pgtol, cache_key=key, auxs=auxs)

    def vg_multi(xs):
        outs = prog(tuple(jnp.asarray(np.asarray(x, dtypes[k]))
                          for k, x in enumerate(xs)), auxs)
        # ONE host transfer for all lanes' (f, g)
        return jax.device_get(outs)

    return minimize_lbfgsb_multi(
        vg_multi, [l["x0"] for l in lanes], [l["lo"] for l in lanes],
        [l["hi"] for l in lanes], max_iters=max_iters, pgtol=pgtol)


def _grad_args(treeinfo, idx):
    """(ops_j, brl, ri) for the traced objectives above."""
    part = treeinfo.partitions[idx]
    ops, root_info = treeinfo.tree.traversal_ops()
    ri = tuple(int(x) for x in root_info)
    brl = jnp.asarray(np.asarray(treeinfo.partition_brlens(idx),
                                 part.dtype))
    return jnp.asarray(ops), brl, ri


def _loglh_fn(treeinfo, idx, need_grad: bool = False):
    """A jitted partition-logL closure: partition -> logL (topology and
    branch lengths fixed at current treeinfo state). On TPU f32 this
    routes through the fused Pallas megakernel (pll_optimize.c's inner
    loops served by the fast CLV kernels); elsewhere the serial scan.

    ``need_grad=True`` forces the XLA engine: the Pallas kernel has no
    VJP, and the analytic-gradient optimizers (rates/freqs/alpha+pinv/
    free rates) differentiate through the returned closure."""
    part0 = treeinfo.partitions[idx]
    brl = jnp.asarray(treeinfo.partition_brlens(idx), part0.dtype)
    if not need_grad and engine_mod.use_fast_kernel(part0):
        if treeinfo.mesh is not None:
            # sharded: the Pallas kernels run under the shard_map-wrapped
            # combined program (K=1 lane)
            kind, arr, st = engine_mod.fast_lane_args(
                part0, treeinfo.tree, treeinfo.mesh, treeinfo.mesh_axis)

            def f(part):
                return engine_mod.multi_eval(
                    [part], [brl], [arr], ((kind, st),),
                    treeinfo.mesh, treeinfo.mesh_axis)[0]

            return f
        ev = engine_mod.compile_fast_eval(part0, treeinfo.tree)

        def f(part):
            return ev(part, brl)

        return f
    ops, root_info = treeinfo.tree.traversal_ops()
    ri = tuple(int(x) for x in root_info)
    ops_j = jnp.asarray(ops)

    def f(part):
        return engine_mod.loglikelihood(part, ops_j, brl, ri)

    return f


# ---------------------------------------------------------------------------
# one-dimensional treeinfo optimizations (Brent): alpha, pinv, brlen scaler
#
# The WHOLE optimization (partition-eval objective + the Brent while
# loop) runs as ONE cached jitted program per (family, engine statics):
# :func:`pllmod_tpu.optimize.brent.minimize_brent_multi` is a
# ``lax.while_loop``, so invoking it eagerly around a per-call objective
# closure retraced AND remote-recompiled the full Brent program on EVERY
# opt_alpha / opt_pinv / opt_brlen_scalers call — ml_search paid a
# multi-second axon compile after every improved round (CLAUDE.md: fresh
# jit objects per call are the known trap). Topology (idx8/e1/e2 or the
# op table), branch lengths, starting point, bounds and tolerance are
# all TRACED, so every SPR round of a search reuses one executable (the
# fused-megakernel schedule keeps its static root refs, matching
# compile_fast_eval).
#
# K selected partitions run as K LANES of one vectorized Brent inside the
# same program — the reference's lock-step minimize_brent_multi over
# per-partition scalars (opt_algorithms.c:1043-1252, one collective
# objective evaluation per iteration). Lane updates depend only on their
# own lane and converged lanes are frozen by masks, so per-partition
# trajectories are identical to separate runs; partitioned analyses pay
# one dispatch per Brent ITERATION SET instead of one whole-Brent
# dispatch per partition.
#
# LRU-bounded: stock families contribute a handful of keys, but
# opt_onedim_custom keys on the make_partition CALLABLE — callers
# passing a fresh lambda per call would otherwise grow the cache (and
# its pinned executables) without bound.
# ---------------------------------------------------------------------------
_BRENT_PROGRAMS = engine_mod.LruCache(maxsize=32)

# family -> (partition, brlens, x) -> (partition', brlens'): where the
# optimized scalar lands (alpha / prop_invar / a brlen scale factor —
# the three stock onedim targets of pllmod_algo_opt_onedim_treeinfo and
# opt_brlen_scaler, pllmod_algorithm.c:729-941)
_BRENT_FAMILIES = {
    "alpha": lambda p, brl, x: (p.with_alpha(x), brl),
    "pinv": lambda p, brl, x: (
        p.replace(prop_invar=jnp.full_like(p.prop_invar, x)), brl),
    "scaler": lambda p, brl, x: (p, brl * x),
}


def _onedim_eval_args(treeinfo, part):
    """(kind, arrays, statics) selecting the production evaluation path
    for the cached Brent programs (engine.fast_lane_args layout; the
    scan fallback serves CPU/f64 partitions)."""
    if engine_mod.use_fast_kernel(part):
        return engine_mod.fast_lane_args(part, treeinfo.tree,
                                         treeinfo.mesh, treeinfo.mesh_axis)
    ops, root_info = treeinfo.tree.traversal_ops()
    return ("scan", (jnp.asarray(ops),
                     jnp.asarray(np.asarray(root_info, np.int32))), ())


def _brent_onedim_program(family_key, make_fn, kinds_statics, parts,
                          mesh=None, axis_name=None):
    """One jitted program running K lock-step Brent lanes, lane k
    evaluating partition k through its own engine kind (unrolled, not
    vmapped: the TPU paths are pallas kernels with manual DMA — no
    batching rule; K is small).

    Under a site mesh with Pallas lanes the whole program (lane
    objectives + the Brent while-loop) runs under shard_map: every
    device advances the SAME lock-step Brent against psum'd objective
    values — the reference's all-ranks-evaluate-in-the-same-order
    invariant (opt_algorithms.c:1043-1252) by construction. XLA-engine
    lanes need no wrapper (GSPMD shards them from the input shardings).
    """
    wrap_mesh = mesh is not None and any(
        kind in ("resident", "fused") for kind, _ in kinds_statics)
    key = (family_key, kinds_statics, mesh if wrap_mesh else None,
           axis_name if wrap_mesh else None,
           tuple(engine_mod._mesh_spec_sig(p) for p in parts)
           if wrap_mesh else None)
    prog = _BRENT_PROGRAMS.get(key)
    if prog is not None:
        return prog
    evs = [engine_mod.lane_ev(kind, st) for kind, st in kinds_statics]

    def run(parts, brls, arrays, x0, xmin, xmax, tol):
        def obj(xs):
            vals = []
            for k, ev in enumerate(evs):
                p2, b2 = make_fn(parts[k], brls[k], xs[k])
                vals.append(ev(p2, b2, arrays[k]))
            v = -jnp.stack(vals)
            if wrap_mesh:
                v = jax.lax.psum(v, axis_name)
            return v

        return minimize_brent_multi(obj, xmin, xmax, x0=x0, tol=tol)

    if wrap_mesh:
        from functools import partial as _partial
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from pllmod_tpu.parallel.sharding import partition_specs
        pspecs = tuple(partition_specs(p, axis_name) for p in parts)
        aspecs = tuple(engine_mod.lane_arr_specs(kind, axis_name)
                       for kind, _ in kinds_statics)
        run = _partial(shard_map, mesh=mesh,
                       in_specs=(pspecs, tuple(P() for _ in parts), aspecs,
                                 P(), P(), P(), P()),
                       out_specs=(P(), P()), check_vma=False)(run)
    prog = jax.jit(run)
    _BRENT_PROGRAMS[key] = prog
    return prog


def _opt_onedim(treeinfo, make_partition, get_x0, xmin, xmax, mask_bit,
                tol=1e-4, family=None, brl_of=None, collect_x=None,
                get_x0_i=None):
    """Generic per-partition scalar Brent (pllmod_algo_opt_onedim_treeinfo,
    pllmod_algorithm.c:729-853). All selected partitions optimize their
    scalars as lock-step lanes of one cached device program (see above).

    ``family``: a stock `_BRENT_FAMILIES` name; None (custom callbacks)
    keys the program cache on the ``make_partition`` callable itself —
    callers that reuse the callable object reuse the compile.
    ``brl_of(i) -> [n_edges]``: override the per-partition branch-length
    source (the scaler family evaluates at base lengths × x).
    ``collect_x``: optional list receiving (partition_index, x_opt)
    pairs (the scaler caller stores them in ``brlen_scalers``)."""
    sel = []
    for i in treeinfo.local_indices():
        if mask_bit is not None and \
                not (treeinfo.params_to_optimize[i] & mask_bit):
            continue
        part = treeinfo.partitions[i]
        # alpha/pinv/scaler leave rates+freqs fixed: cache the eigendecomp
        # once so TPU Brent iterations skip the (dominant) eigh
        if part.reversible and part.eigen_lam is None:
            part = part.cache_eigen()
            treeinfo.partitions[i] = part
        sel.append((i, part))
    if not sel:
        return 0.0
    if family is not None:
        make_fn, fam_key = _BRENT_FAMILIES[family], family
    else:
        def make_fn(p, b, x, mk=make_partition):
            return mk(p, x), b
        fam_key = make_partition
    dtype = sel[0][1].dtype
    parts, brls, arrays, ks = [], [], [], []
    for i, part in sel:
        kind, arr, st = _onedim_eval_args(treeinfo, part)
        parts.append(part)
        src = brl_of(i) if brl_of is not None \
            else treeinfo.partition_brlens(i)
        brls.append(jnp.asarray(np.asarray(src, part.dtype)))
        arrays.append(arr)
        ks.append((kind, st))
    prog = _brent_onedim_program(fam_key, make_fn, tuple(ks), parts,
                                 treeinfo.mesh, treeinfo.mesh_axis)
    if get_x0_i is not None:
        x0 = jnp.stack([jnp.asarray(get_x0_i(i), dtype) for i, _ in sel])
    else:
        x0 = jnp.stack([jnp.asarray(get_x0(p), dtype) for _, p in sel])
    x_opt, f_opt = prog(tuple(parts), tuple(brls), tuple(arrays), x0,
                        jnp.full((len(sel),), xmin, dtype),
                        jnp.full((len(sel),), xmax, dtype),
                        jnp.asarray(tol, dtype))
    # one host transfer for both result vectors: eager per-lane getitem
    # (x_opt[k]) compiles a tiny remote program per index on axon
    f_np = np.asarray(f_opt)
    x_np = np.asarray(x_opt)
    total = 0.0
    for k, (i, part) in enumerate(sel):
        new_part, _ = make_fn(part, brls[k],
                              jnp.asarray(x_np[k], part.dtype))
        treeinfo.partitions[i] = new_part
        treeinfo.partition_loglh[i] = -float(f_np[k])
        total += -float(f_np[k])
        if collect_x is not None:
            collect_x.append((i, float(x_np[k])))
    return total


def opt_onedim_custom(treeinfo, make_partition, get_x0, xmin, xmax,
                      mask_bit=None, tol=1e-4):
    """Public generic one-dimensional treeinfo optimization with
    user-supplied getter/setter callbacks
    (pllmod_algo_opt_onedim_treeinfo_custom, pllmod_algorithm.c:803-853):
    ``make_partition(partition, x) -> partition`` writes the scalar into
    a partition, ``get_x0(partition) -> x`` reads the starting point.
    ``mask_bit=None`` optimizes the scalar on every local partition
    regardless of ``params_to_optimize``. Returns the total logL.

    Compile-reuse contract: the whole Brent program is cached on the
    ``make_partition`` CALLABLE's identity — pass the SAME function
    object across calls (a module-level function, or a closure you
    keep) to reuse the compiled optimizer; a fresh lambda per call
    recompiles every time (the cache is LRU-bounded, so it will not
    leak, but each miss pays a trace + compile)."""
    return _opt_onedim(treeinfo, make_partition=make_partition,
                       get_x0=get_x0, xmin=xmin, xmax=xmax,
                       mask_bit=mask_bit, tol=tol)


def opt_alpha(treeinfo, min_alpha=common.MIN_ALPHA,
              max_alpha=common.MAX_ALPHA, tol=1e-4):
    """Brent on the Gamma shape (pllmod_algo_opt_alpha /
    opt_onedim_treeinfo ALPHA)."""
    return _opt_onedim(
        treeinfo,
        make_partition=lambda p, a: p.with_alpha(a),
        get_x0=lambda p: p.alpha,
        xmin=min_alpha, xmax=max_alpha, mask_bit=PARAM_ALPHA, tol=tol,
        family="alpha")


def opt_pinv(treeinfo, min_pinv=1e-9, max_pinv=common.MAX_PINV, tol=1e-4):
    """Brent on proportion of invariant sites (opt_onedim_treeinfo PINV)."""

    def make(p, x):
        return p.replace(prop_invar=jnp.full_like(p.prop_invar, x))

    return _opt_onedim(
        treeinfo, make_partition=make,
        get_x0=lambda p: jnp.maximum(p.pinv_mix(), 0.02),
        xmin=min_pinv, xmax=max_pinv, mask_bit=PARAM_PINV, tol=tol,
        family="pinv")


def opt_brlen_scalers(treeinfo, min_scaler=1e-3, max_scaler=100.0, tol=1e-4):
    """Brent on per-partition branch-length scalers (SCALED mode;
    pllmod_algo_opt_brlen_scalers_treeinfo, pllmod_algorithm.c:855-941),
    followed by normalization."""
    if treeinfo.brlen_linkage != BRLEN_SCALED:
        return treeinfo.compute_loglh()
    found = []
    total = _opt_onedim(
        treeinfo,
        make_partition=None,
        get_x0=None,
        get_x0_i=lambda i, ti=treeinfo: ti.brlen_scalers[i],
        xmin=min_scaler, xmax=max_scaler,
        mask_bit=PARAM_BRANCH_LEN_SCALER, tol=tol, family="scaler",
        brl_of=lambda i, ti=treeinfo: ti.tree.lengths,
        collect_x=found)
    for i, x in found:
        treeinfo.brlen_scalers[i] = x
    treeinfo.normalize_brlen_scalers()
    return total


def opt_alpha_pinv(treeinfo, tol=1e-4):
    """2-D L-BFGS on (alpha, pinv) jointly (pllmod_algo_opt_alpha_pinv,
    pllmod_algorithm.c:296-342, :1313-1432). All selected partitions run
    as lock-step lanes of one combined (value, grad) program — one
    dispatch per L-BFGS evaluation step for the whole treeinfo."""
    sel, lanes, eas = [], [], []
    for i in treeinfo.local_indices():
        mask = treeinfo.params_to_optimize[i]
        if not ((mask & PARAM_ALPHA) and (mask & PARAM_PINV)):
            continue
        part = treeinfo.partitions[i]
        eas.append(_edge_vg_args(treeinfo, i))
        lanes.append(dict(
            x0=np.array([float(part.alpha),
                         max(float(part.pinv_mix()), 0.02)]),
            lo=np.array([common.MIN_ALPHA, 1e-9]),
            hi=np.array([common.MAX_ALPHA, common.MAX_PINV]),
            dtype=part.dtype))
        sel.append((i, part))
    if not sel:
        return 0.0
    if all(ea is not None for ea in eas):
        for ln, ea, (i, part) in zip(lanes, eas, sel):
            ln["aux"] = (part, ea["brl"], ea["idx8"], ea["e1"],
                         ea["e2"], ea["eref"], ea["swap"], ea["emask"],
                         ea["e0"])
            ln["statics"] = (ea["n_slots"], ea["interp"])
        family = "alpha_pinv_edge"
    else:
        for ln, (i, part) in zip(lanes, sel):
            ops_j, brl, ri = _grad_args(treeinfo, i)
            ln["aux"] = (part, ops_j, brl, ri)
            ln["statics"] = ()
        family = "alpha_pinv"
    results = _lbfgsb_lanes(family, lanes, max_iters=100, pgtol=tol)
    total = 0.0
    for (i, part), (x, fv, _) in zip(sel, results):
        treeinfo.partitions[i] = part.with_alpha(x[0]).replace(
            prop_invar=jnp.full_like(part.prop_invar, x[1]))
        treeinfo.partition_loglh[i] = -float(fv)
        total += -float(fv)
    return total


# ---------------------------------------------------------------------------
# substitution rates / frequencies (L-BFGS with analytic gradients)
# ---------------------------------------------------------------------------
def opt_subst_rates(treeinfo, symmetries=None,
                    min_rate=common.MIN_SUBST_RATE,
                    max_rate=common.MAX_SUBST_RATE, tol=1e-4):
    """Optimize exchangeability rates per partition with symmetry-class
    packing (pllmod_algo_opt_subst_rates_treeinfo,
    pllmod_algorithm.c:944-1135).

    Args:
      symmetries: optional list of per-partition rate-symmetry int vectors
        (None entries = all-free GTR). SubstModel.rate_sym values fit here.

    All selected partitions optimize as lock-step L-BFGS lanes of one
    combined program (one dispatch per evaluation step; the per-lane
    ``pinned`` symmetry index is a program static).
    """
    sel, lanes, eas = [], [], []
    for i in treeinfo.local_indices():
        if not (treeinfo.params_to_optimize[i] & PARAM_SUBST_RATES):
            continue
        part = treeinfo.partitions[i]
        n_rates = part.states * (part.states - 1) // 2
        sym = None if symmetries is None else symmetries[i]
        if sym is None:
            sym = np.arange(n_rates, dtype=np.int32)
        sym = np.asarray(sym, np.int32)
        uniq, remap = np.unique(sym, return_inverse=True)
        pinned = int(remap[-1])
        k = len(uniq)
        if k < 2:
            continue
        remap_j = jnp.asarray(remap)
        cur = np.asarray(part.subst_rates[0])
        first = np.zeros(k, np.int64)
        seen = np.zeros(k, bool)
        for j, c in enumerate(remap):
            if not seen[c]:
                first[c], seen[c] = j, True
        x0 = cur[first] / cur[first][pinned]
        x0 = np.delete(x0, pinned)
        eas.append(_edge_vg_args(treeinfo, i))
        lanes.append(dict(
            x0=np.clip(x0, min_rate, max_rate),
            lo=np.full(k - 1, min_rate), hi=np.full(k - 1, max_rate),
            dtype=part.dtype))
        sel.append((i, part, remap_j, pinned))
    if not sel:
        return 0.0
    if all(ea is not None for ea in eas):
        for ln, ea, (i, part, remap_j, pinned) in zip(lanes, eas, sel):
            ln["aux"] = (part, remap_j, ea["brl"], ea["idx8"], ea["e1"],
                         ea["e2"], ea["eref"], ea["swap"], ea["emask"],
                         ea["e0"])
            ln["statics"] = (pinned, ea["n_slots"], ea["interp"])
        family = "rates_edge"
    else:
        for ln, (i, part, remap_j, pinned) in zip(lanes, sel):
            ops_j, brl, ri = _grad_args(treeinfo, i)
            ln["aux"] = (part, remap_j, ops_j, brl, ri)
            ln["statics"] = (pinned,)
        family = "rates"
    results = _lbfgsb_lanes(family, lanes, max_iters=200, pgtol=tol)
    total = 0.0
    for (i, part, remap_j, pinned), (x, fv, _) in zip(sel, results):
        full = _expand_sym(jnp.asarray(np.asarray(x, part.dtype)),
                           remap_j, pinned)
        treeinfo.partitions[i] = part.with_model_params(
            subst_rates=jnp.broadcast_to(full, part.subst_rates.shape))
        treeinfo.partition_loglh[i] = -float(fv)
        total += -float(fv)
    return total


def opt_frequencies(treeinfo, min_freq=common.MIN_FREQ, tol=1e-4):
    """Optimize stationary frequencies as ratios to the last state
    (pllmod_algo_opt_frequencies_treeinfo, pllmod_algorithm.c:1137-1311).
    All selected partitions run as lock-step L-BFGS lanes of one
    combined program (one dispatch per evaluation step)."""
    sel, lanes, eas = [], [], []
    for i in treeinfo.local_indices():
        if not (treeinfo.params_to_optimize[i] & PARAM_FREQUENCIES):
            continue
        part = treeinfo.partitions[i]
        s = part.states
        cur = np.asarray(part.freqs[0])
        x0 = np.clip(cur[:-1] / cur[-1], min_freq, common.MAX_FREQ)
        eas.append(_edge_vg_args(treeinfo, i))
        lanes.append(dict(
            x0=x0, lo=np.full(s - 1, min_freq),
            hi=np.full(s - 1, common.MAX_FREQ), dtype=part.dtype))
        sel.append((i, part))
    if not sel:
        return 0.0
    if all(ea is not None for ea in eas):
        for ln, ea, (i, part) in zip(lanes, eas, sel):
            ln["aux"] = (part, ea["brl"], ea["idx8"], ea["e1"],
                         ea["e2"], ea["eref"], ea["swap"], ea["emask"],
                         ea["e0"])
            ln["statics"] = (ea["n_slots"], ea["interp"])
        family = "freqs_edge"
    else:
        for ln, (i, part) in zip(lanes, sel):
            ops_j, brl, ri = _grad_args(treeinfo, i)
            ln["aux"] = (part, ops_j, brl, ri)
            ln["statics"] = ()
        family = "freqs"
    results = _lbfgsb_lanes(family, lanes, max_iters=200, pgtol=tol)
    total = 0.0
    for (i, part), (x, fv, _) in zip(sel, results):
        raw = np.concatenate([x, [1.0]])
        freqs = raw / raw.sum()
        treeinfo.partitions[i] = part.with_model_params(
            freqs=jnp.broadcast_to(jnp.asarray(freqs, part.dtype),
                                   part.freqs.shape))
        treeinfo.partition_loglh[i] = -float(fv)
        total += -float(fv)
    return total


# ---------------------------------------------------------------------------
# free rates + weights (EM + L-BFGS, renormalization into brlens)
# ---------------------------------------------------------------------------
def _site_cat_likelihood(part, ops_j, brl, ri):
    """Per-site per-category scaled likelihood [P, C] + log-scaler [P]
    (for the EM E-step). Shares the pruning engine."""
    P = part.prob_matrices(brl)
    clvs, scalers = clv_mod.update_partials(part, P, ops_j)
    u, v, e = ri
    clv_p, s_p = clv_mod.get_node_clv(part, clvs, scalers, u)
    clv_c, s_c = clv_mod.get_node_clv(part, clvs, scalers, v)
    fc = part.freqs_per_cat()
    right = jnp.einsum("pcj,cij->pci", clv_c, P[e],
                       preferred_element_type=part.dtype,
                       precision=jax.lax.Precision.HIGHEST)
    per_cat = jnp.einsum("pci,ci,pci->pc", clv_p, fc, right,
                         preferred_element_type=part.dtype,
                         precision=jax.lax.Precision.HIGHEST)
    return per_cat, s_p + s_c


# one python-level jit cache for the EM E-step across calls/rounds
_site_cat_jit = jax.jit(_site_cat_likelihood, static_argnums=3)

_EM_LANE_PROGRAMS = engine_mod.LruCache(maxsize=8)


def _em_lane_program(K: int):
    """One jitted program running K lanes' EM weight updates (E-step
    per-site-per-category likelihoods + the EM while-loop) in one
    dispatch."""
    prog = _EM_LANE_PROGRAMS.get(K)
    if prog is not None:
        return prog

    def run(parts, opss, brls, ris):
        out = []
        for k in range(K):
            sc, _ = _site_cat_likelihood(parts[k], opss[k], brls[k],
                                         ris[k])
            out.append(em_rates_weights(sc, parts[k].pattern_weights,
                                        parts[k].rate_weights))
        return tuple(out)

    prog = jax.jit(run)
    _EM_LANE_PROGRAMS[K] = prog
    return prog


def opt_rates_weights(treeinfo, min_rate=common.MIN_RATE,
                      max_rate=common.MAX_RATE, tol=1e-4,
                      max_rounds: int = 10):
    """Free-rate model: alternate EM on category weights and L-BFGS on
    category rates until converged, then renormalize so Σ wᵢrᵢ = 1 and push
    the factor into branch lengths (pllmod_algo_opt_rates_weights_treeinfo,
    pllmod_algorithm.c:1434-1840).

    The jitted objectives take the CURRENT partition as a traced argument
    and are built ONCE per partition, outside the alternation loop — a
    fresh ``jax.jit`` per round retraces AND recompiles every round
    (measured: ~10 extra multi-second remote compiles per call on axon).

    Round structure is ROUND-MAJOR across partitions: every alternation
    round runs all still-unconverged partitions as lock-step lanes — one
    combined EM dispatch, one combined L-BFGS program per evaluation
    step, one combined convergence evaluation — instead of completing
    each partition's whole alternation serially (the reference's
    lock-step multi shape, opt_algorithms.c:1612-1840). Per-lane
    trajectories are unchanged: each lane reads its branch lengths at
    entry and its Σwr=1 factor is pushed into branch lengths at exit
    (under UNLINKED linkage, only into that partition's own lengths)."""
    from pllmod_tpu.common import BRLEN_UNLINKED
    ops, root_info = treeinfo.tree.traversal_ops()
    ri = tuple(int(x) for x in root_info)
    ops_j = jnp.asarray(ops)
    lanes = []
    for i in treeinfo.local_indices():
        mask = treeinfo.params_to_optimize[i]
        if not ((mask & PARAM_FREE_RATES) or (mask & PARAM_RATE_WEIGHTS)):
            continue
        part = treeinfo.partitions[i]
        brl = jnp.asarray(np.asarray(treeinfo.partition_brlens(i),
                                     part.dtype))
        if (mask & PARAM_FREE_RATES) and part.n_cats > 1 and \
                np.allclose(np.asarray(part.rate_cats),
                            float(part.rate_cats[0])):
            # all-equal rates are a SYMMETRIC SADDLE: every category sees
            # the same gradient, so EM/L-BFGS cannot break the tie. Seed
            # from a gamma(1) discretization like RAxML-NG initializes
            # +R models from +G quantiles.
            from pllmod_tpu.ops import gamma as gamma_mod
            init = gamma_mod.compute_gamma_cats_host(1.0, part.n_cats,
                                                     part.gamma_mode)
            part = part.replace(
                rate_cats=jnp.asarray(np.asarray(init, part.dtype)))
        lanes.append(dict(i=i, part=part, mask=mask, brl=brl,
                          prev=-np.inf, active=True))
    if not lanes:
        return 0.0
    for _ in range(max_rounds):
        act = [st for st in lanes if st["active"]]
        if not act:
            break
        em_sel = [st for st in act if st["mask"] & PARAM_RATE_WEIGHTS]
        if em_sel:
            prog = _em_lane_program(len(em_sel))
            ws = prog(tuple(st["part"] for st in em_sel),
                      tuple(ops_j for _ in em_sel),
                      tuple(st["brl"] for st in em_sel),
                      tuple(ri for _ in em_sel))
            for st, w in zip(em_sel, ws):
                st["part"] = st["part"].replace(rate_weights=w)
        lb_sel = [st for st in act if st["mask"] & PARAM_FREE_RATES]
        if lb_sel:
            eas = [_edge_vg_args(treeinfo, st["i"]) for st in lb_sel]
            if all(ea is not None for ea in eas):
                lb_lanes = [dict(
                    x0=np.asarray(st["part"].rate_cats, np.float64),
                    lo=np.full(st["part"].n_cats, min_rate),
                    hi=np.full(st["part"].n_cats, max_rate),
                    aux=(st["part"], st["brl"], ea["idx8"], ea["e1"],
                         ea["e2"], ea["eref"], ea["swap"], ea["emask"],
                         ea["e0"]),
                    statics=(ea["n_slots"], ea["interp"]),
                    dtype=st["part"].dtype)
                    for st, ea in zip(lb_sel, eas)]
                fam = "cats_edge"
            else:
                lb_lanes = [dict(
                    x0=np.asarray(st["part"].rate_cats, np.float64),
                    lo=np.full(st["part"].n_cats, min_rate),
                    hi=np.full(st["part"].n_cats, max_rate),
                    aux=(st["part"], ops_j, st["brl"], ri), statics=(),
                    dtype=st["part"].dtype) for st in lb_sel]
                fam = "cats"
            results = _lbfgsb_lanes(fam, lb_lanes, max_iters=100,
                                    pgtol=tol)
            for st, (x, _fv, _n) in zip(lb_sel, results):
                st["part"] = st["part"].replace(
                    rate_cats=jnp.asarray(np.asarray(x, st["part"].dtype)))
        # combined convergence evaluation: one dispatch for all lanes
        ri_arr = jnp.asarray(np.asarray(ri, np.int32))
        lnls = np.asarray(engine_mod.multi_eval(
            [st["part"] for st in act], [st["brl"] for st in act],
            [(ops_j, ri_arr) for _ in act],
            tuple(("scan", ()) for _ in act)))
        for st, lnl in zip(act, lnls):
            lnl = float(lnl)
            if abs(lnl - st["prev"]) < tol:
                st["active"] = False
            st["prev"] = lnl
    total = 0.0
    for st in lanes:
        i, part = st["i"], st["part"]
        # renormalize: sum w*r = 1, factor goes into branch lengths
        factor = float(np.asarray(part.rate_weights) @
                       np.asarray(part.rate_cats))
        part = part.replace(rate_cats=part.rate_cats / factor)
        if treeinfo.brlen_linkage == BRLEN_UNLINKED:
            # the factor is this partition's alone — scaling the shared
            # topology lengths would leak it into other partitions
            treeinfo.brlens[i] *= factor
        else:
            treeinfo.tree.lengths = treeinfo.tree.lengths * factor
            if treeinfo.brlens is not None:
                treeinfo.brlens[i] *= factor
        lnl = float(_loglh_fn(treeinfo, i)(part))
        treeinfo.partitions[i] = part
        treeinfo.partition_loglh[i] = lnl
        total += lnl
    return total


def opt_brlen(treeinfo, **kwargs):
    """Branch-length optimization (pllmod_algo_opt_brlen_treeinfo,
    pllmod_algorithm.c:1842-1870) — delegates to the batched Newton BLO."""
    return optimize_branch_lengths_treeinfo(treeinfo, **kwargs)


def opt_model(treeinfo, symmetries=None, tol=1e-4, blo_kwargs=None):
    """Optimize all flagged parameters once, in the reference's order
    (RAxML-NG round: rates, freqs, alpha(+pinv), free rates/weights,
    brlen scalers, branches). Returns final total logL.

    Two guards (both reference semantics):

    - **Rate-model arbitration**: ALPHA and FREE_RATES/RATE_WEIGHTS are
      mutually exclusive rate-heterogeneity families (+G vs +R); with a
      blanket mask like PARAM_ALL each partition follows its DECLARED
      model — finite ``alpha`` ⇒ gamma (free-rate bits dropped), NaN
      ``alpha`` ⇒ free rates (alpha bit dropped). Without this,
      alternating rounds thrash between the families: opt_alpha_pinv
      overwrites optimized free rates with gamma cats and can DEGRADE
      the likelihood (observed oscillating ml_search rounds).
    - **Rollback on worse** per family (the reference's
      opt_rates_weights_treeinfo rollback, pllmod_algorithm.c:1434-1840,
      applied uniformly): a family whose result lowers the total logL is
      reverted.
    """
    masks = list(treeinfo.params_to_optimize)
    eff = list(masks)
    for i in treeinfo.local_indices():
        part = treeinfo.partitions[i]
        if bool(np.isnan(np.asarray(part.alpha))):
            eff[i] = eff[i] & ~PARAM_ALPHA
        else:
            eff[i] = eff[i] & ~(PARAM_FREE_RATES | PARAM_RATE_WEIGHTS)
    treeinfo.params_to_optimize = eff
    any_has = lambda bit: any(eff[i] & bit for i in treeinfo.local_indices())

    lnl = None

    def guarded(step):
        """Run one family; revert it if the TOTAL logL got worse. Totals
        come from compute_loglh (drivers return sums over the partitions
        they touched, which are not comparable across families under
        heterogeneous masks)."""
        nonlocal lnl
        if lnl is None:
            lnl = treeinfo.compute_loglh()
        snap = (list(treeinfo.partitions),
                treeinfo.tree.lengths.copy(),
                None if treeinfo.brlens is None else treeinfo.brlens.copy(),
                treeinfo.brlen_scalers.copy())
        step()
        new = treeinfo.compute_loglh()
        if new < lnl - 1e-9 * abs(lnl):
            treeinfo.partitions = snap[0]
            treeinfo.tree.lengths = snap[1]
            treeinfo.brlens = snap[2]
            treeinfo.brlen_scalers = snap[3]
            return
        lnl = new

    try:
        if any_has(PARAM_SUBST_RATES):
            guarded(lambda: opt_subst_rates(treeinfo, symmetries=symmetries,
                                            tol=tol))
        if any_has(PARAM_FREQUENCIES):
            guarded(lambda: opt_frequencies(treeinfo, tol=tol))
        both = (PARAM_ALPHA | PARAM_PINV)
        if any(eff[i] & both == both for i in treeinfo.local_indices()):
            guarded(lambda: opt_alpha_pinv(treeinfo, tol=tol))
        else:
            if any_has(PARAM_ALPHA):
                guarded(lambda: opt_alpha(treeinfo, tol=tol))
            if any_has(PARAM_PINV):
                guarded(lambda: opt_pinv(treeinfo, tol=tol))
        if any_has(PARAM_FREE_RATES) or any_has(PARAM_RATE_WEIGHTS):
            guarded(lambda: opt_rates_weights(treeinfo, tol=tol))
        if any_has(PARAM_BRANCH_LEN_SCALER):
            guarded(lambda: opt_brlen_scalers(treeinfo, tol=tol))
        if any_has(PARAM_BRANCHES_ITERATIVE):
            guarded(lambda: opt_brlen(treeinfo, **(blo_kwargs or {})))
    finally:
        treeinfo.params_to_optimize = masks
    return treeinfo.compute_loglh() if lnl is None else lnl
