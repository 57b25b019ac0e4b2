"""Mesh construction + partition sharding rules.

The single parallelism axis of the workload (SURVEY.md §2.10) is the
alignment site/pattern axis: CLVs are embarrassingly parallel across
patterns given replicated P-matrices, and log-likelihood / derivative
evaluation reduces over patterns exactly once. We therefore:

- build a 1-D ``Mesh`` with axis ``"sites"`` over all devices,
- shard every pattern-indexed array of the :class:`Partition` pytree on its
  pattern axis (``tip_states[:, P]``, ``pattern_weights[P]``,
  ``inv_indicator[P, :]``),
- replicate model parameters, trees, ops and P-matrices,

and let ``jit`` propagate the shardings: the per-site products stay local,
the one ``jnp.sum(lnl * weights)`` at the end lowers to a psum over ICI —
the direct analog of the reference's single ``parallel_reduce_cb(...,
REDUCE_SUM)`` per evaluation (``treeinfo.c:1061-1067``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SITES_AXIS = "sites"


def make_mesh(devices=None, axis_name: str = SITES_AXIS) -> Mesh:
    """1-D mesh over the site axis (all local devices by default)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_partition(partition, mesh: Mesh, axis_name: str = SITES_AXIS):
    """Shard a Partition's pattern axis across the mesh; replicate the rest.

    The padded pattern count must be divisible by the mesh size (guaranteed
    when ``pattern_pad`` is a multiple of the device count; default 128).
    """
    n = partition.n_patterns_padded
    size = mesh.shape[axis_name]
    if n % size:
        raise ValueError(
            f"padded pattern count {n} not divisible by mesh size {size}; "
            f"use pattern_pad that is a multiple of the device count")
    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(axis_name))            # [patterns, ...]
    col = NamedSharding(mesh, P(None, axis_name))      # [tips, patterns]
    return partition.replace(
        tip_states=jax.device_put(partition.tip_states, col),
        pattern_weights=jax.device_put(partition.pattern_weights, row),
        inv_indicator=jax.device_put(partition.inv_indicator, row),
        code_clv=jax.device_put(partition.code_clv, rep),
        subst_rates=jax.device_put(partition.subst_rates, rep),
        freqs=jax.device_put(partition.freqs, rep),
        rate_cats=jax.device_put(partition.rate_cats, rep),
        rate_weights=jax.device_put(partition.rate_weights, rep),
        prop_invar=jax.device_put(partition.prop_invar, rep),
        alpha=jax.device_put(partition.alpha, rep),
        param_indices=jax.device_put(partition.param_indices, rep),
    )


def shard_treeinfo(treeinfo, mesh: Mesh, axis_name: str = SITES_AXIS):
    """Distribute a TreeInfo over a site mesh: every local partition's
    pattern axis is sharded across the devices and the mesh is recorded
    on the treeinfo — from then on EVERY driver (compute_loglh,
    opt_model's Brent/L-BFGS lane programs, the BLO smoothing driver,
    spr_round, ml_search) executes against the sharded arrays with the
    per-evaluation site reduction riding a psum, the reference's single
    distributed contract threaded through all its drivers
    (parallel_reduce_cb at treeinfo.c:1061-1067; per-Newton-iteration
    reduces at pll_optimize.c:1270-1286; lock-step optimizer instances at
    opt_algorithms.c:542-807, algo_callback.c:353-359).

    The XLA engines need no wrappers — jit propagates the input
    shardings and GSPMD inserts the collectives; the Pallas production
    kernels run under shard_map wrappers keyed off ``treeinfo.mesh``
    (engine.multi_eval / the Brent lane programs / the on-device BLO
    driver). Returns the treeinfo (modified in place).
    """
    for i in range(treeinfo.n_partitions):
        if treeinfo.partitions[i] is not None:
            treeinfo.partitions[i] = shard_partition(
                treeinfo.partitions[i], mesh, axis_name)
    treeinfo.mesh = mesh
    treeinfo.mesh_axis = axis_name
    return treeinfo


def partition_specs(partition, axis_name: str = SITES_AXIS):
    """PartitionSpec pytree for a Partition: pattern axes sharded on
    ``axis_name``, model parameters replicated."""
    specs = {f: P() for f in (
        "code_clv", "subst_rates", "freqs", "rate_cats", "rate_weights",
        "prop_invar", "alpha", "param_indices",
        "eigen_lam", "eigen_V", "eigen_Vinv")}
    specs["tip_states"] = P(None, axis_name)
    specs["pattern_weights"] = P(axis_name)
    specs["inv_indicator"] = P(axis_name, None)
    return partition.replace(**{
        k: (specs[k] if getattr(partition, k) is not None else None)
        for k in specs} | {
        k: specs[k] for k in ("tip_states", "pattern_weights",
                              "inv_indicator")})


def _check_local_shard(partition, mesh: Mesh, axis_name: str):
    """Pallas kernels need lane-aligned local shards."""
    n_dev = mesh.shape[axis_name]
    local = partition.n_patterns_padded // n_dev
    if partition.n_patterns_padded % n_dev or local % 128:
        raise ValueError(
            f"local pattern shard ({partition.n_patterns_padded}/{n_dev} ="
            f" {local}) must be a multiple of 128 lanes; create the "
            f"partition with pattern_pad=128*{n_dev}")


def _spec_sig(partition):
    """Cache key part: which optional Partition fields are present (the
    PartitionSpec pytree structure depends on it)."""
    return tuple(f for f in ("eigen_lam", "eigen_V", "eigen_Vinv")
                 if getattr(partition, f) is not None)


# jitted shard_map bodies are memoized: a fresh closure per call would
# re-trace (and on the remote TPU compiler potentially re-compile) the
# whole pallas program on every invocation
_BODY_CACHE: dict = {}


def _cached_body(key, build):
    fn = _BODY_CACHE.get(key)
    if fn is None:
        fn = _BODY_CACHE[key] = build()
    return fn


def loglikelihood_fused_sharded(partition, tree, brlens, mesh: Mesh,
                                axis_name: str = SITES_AXIS,
                                interpret: bool = False):
    """Site-sharded evaluation through the fused Pallas megakernel: every
    device runs the WHOLE-tree kernel on its local pattern shard
    (patterns are embarrassingly parallel given replicated P-matrices)
    and the one site reduction becomes a psum riding ICI — the
    multi-chip production path (SURVEY §2.10 + the scaling-book recipe:
    shard the data axis, replicate the small state, one collective).

    The local shard width must stay a multiple of 128 lanes
    (pattern_pad 128 × power-of-two meshes up to 128 satisfy this).
    """
    from functools import partial as _partial
    from jax import shard_map
    from pllmod_tpu.ops import pallas_clv

    _check_local_shard(partition, mesh, axis_name)
    idx8, e1, e2, ri, n_slots = pallas_clv.compile_fused(partition, tree)
    u, v, e = ri
    brlens = jnp.asarray(brlens, partition.dtype)

    def build():
        pspecs = partition_specs(partition, axis_name)

        @jax.jit
        @_partial(shard_map, mesh=mesh,
                  in_specs=(pspecs, P(), P(), P(), P()),
                  out_specs=P(), check_vma=False)
        def body(part_local, brl, idx8, e1, e2):
            Pm = part_local.prob_matrices(brl)
            clvs, scalers = pallas_clv.update_partials_fused(
                part_local, Pm, idx8, e1, e2, n_slots, interpret=interpret)
            lnl = pallas_clv.root_loglikelihood_csp(
                part_local, clvs, scalers, u, v, Pm[e])
            return jax.lax.psum(lnl, axis_name)

        return body

    body = _cached_body(("fused", mesh, axis_name, interpret, n_slots,
                         u, v, e, _spec_sig(partition)), build)
    return body(partition, brlens, idx8, e1, e2)


def loglikelihood_resident_sharded(partition, tree, brlens, mesh: Mesh,
                                   axis_name: str = SITES_AXIS,
                                   interpret: bool = False,
                                   split: bool = False):
    """Site-sharded evaluation through the VMEM-RESIDENT megakernel (the
    single-chip production evaluation path): every device runs the whole
    serial bounded traversal on its local pattern shard — patterns are
    embarrassingly parallel, the resident slot scratch is per-device —
    and the one site reduction is a psum riding ICI. Same seam as
    :func:`loglikelihood_fused_sharded` (the reference's
    parallel_reduce_cb, treeinfo.c:1061)."""
    from functools import partial as _partial
    from jax import shard_map
    from pllmod_tpu.ops import pallas_resident

    _check_local_shard(partition, mesh, axis_name)
    idx8, e1, e2, n_slots = pallas_resident.compile_resident(
        partition, tree,
        n_slots_min=pallas_resident.resident_slot_bound(partition.n_tips))
    tip_hi = pallas_resident.expanded_tip_planes(partition)
    brlens = jnp.asarray(brlens, partition.dtype)

    def build():
        pspecs = partition_specs(partition, axis_name)

        @jax.jit
        @_partial(shard_map, mesh=mesh,
                  in_specs=(pspecs, P(), P(), P(), P(),
                            P(None, None, axis_name)),
                  out_specs=P(), check_vma=False)
        def body(part_local, brl, idx8, e1, e2, tip_local):
            lnl = pallas_resident.loglikelihood_resident(
                part_local, idx8, brl, (e1, e2), tip_local, n_slots,
                interpret, split)
            return jax.lax.psum(lnl, axis_name)

        return body

    body = _cached_body(("resident", mesh, axis_name, interpret, split,
                         n_slots, _spec_sig(partition)), build)
    return body(partition, brlens, idx8, e1, e2, tip_hi)


def blo_sweep_fast_sharded(partition, tree, brlens, mesh: Mesh,
                           axis_name: str = SITES_AXIS,
                           min_brlen: float = 1e-4, max_brlen: float = 100.0,
                           newton_tol: float = 1e-6,
                           max_newton_iters: int = 10,
                           interpret: bool = False):
    """Site-sharded Newton BLO sweep through the FUSED derivative
    pipeline (megakernel directed CLVs → pallas sumtables → pallas
    per-edge derivatives): each device builds sumtables over its local
    pattern shard; every Newton iteration's (df, ddf) are psum-reduced —
    the reference's per-iteration collective
    (``pll_optimize.c:1270-1286``), with every shard advancing the same
    lock-step bracketed Newton so the collective count is identical on
    all ranks (SPMD gives the reference's all-ranks-same-order invariant
    for free).

    Returns (new_brlens [n_edge_slots] replicated, logL at the incoming
    brlens).
    """
    from functools import partial as _partial
    from jax import shard_map
    from pllmod_tpu.optimize import blo as blo_mod
    from pllmod_tpu.optimize.newton import minimize_newton_multi
    from pllmod_tpu.ops import pallas_clv, pallas_deriv

    _check_local_shard(partition, mesh, axis_name)
    if partition.eigen_lam is None:
        partition = partition.cache_eigen()

    trav = blo_mod.DirectedTraversal(tree)
    idx8, e1, e2, n_slots = pallas_clv.compile_fused_ops(partition,
                                                         trav.ops)
    eref6 = pallas_deriv.compile_edge_refs(trav.edge_ref, trav.edge_mask,
                                           partition.n_tips)
    edge_mask = jnp.asarray(trav.edge_mask)
    dtype = partition.dtype
    brl = jnp.asarray(jnp.clip(jnp.asarray(brlens, dtype),
                               min_brlen, max_brlen))

    def build():
        pspecs = partition_specs(partition, axis_name)

        @jax.jit
        @_partial(shard_map, mesh=mesh,
                  in_specs=(pspecs, P(), P(), P(), P(), P(), P()),
                  out_specs=(P(), P()), check_vma=False)
        def body(part_local, brl, idx8j, e1j, e2j, eref6j, emask):
            st, sc, eigen, lnB = blo_mod._deriv_pipeline_fast(
                part_local, brl, (idx8j, e1j, e2j), n_slots, interpret,
                eref6j)
            lnl_all, _, _ = pallas_deriv.edge_derivatives_pallas(
                part_local, st, sc, brl, eigen, lnB, interpret)
            lnl0 = jax.lax.psum(lnl_all[jnp.argmax(emask)], axis_name)

            def deriv_fn(t):
                _, df, ddf = pallas_deriv.edge_derivatives_pallas(
                    part_local, st, sc, t, eigen, lnB, interpret)
                return (jax.lax.psum(df, axis_name).astype(t.dtype),
                        jax.lax.psum(ddf, axis_name).astype(t.dtype))

            t_opt = minimize_newton_multi(
                deriv_fn, brl, jnp.asarray(min_brlen, brl.dtype),
                jnp.asarray(max_brlen, brl.dtype),
                tol=jnp.asarray(newton_tol, brl.dtype),
                max_iters=max_newton_iters)
            return jnp.where(emask, t_opt, brl), lnl0.astype(brl.dtype)

        return body

    body = _cached_body(
        ("blo", mesh, axis_name, interpret, n_slots, max_newton_iters,
         float(min_brlen), float(max_brlen), float(newton_tol),
         _spec_sig(partition)), build)
    return body(partition, brl, idx8, e1, e2, eref6, edge_mask)
