"""The Partition pytree — TPU-native equivalent of ``pll_partition_t``.

Where libpll's partition is a mutable C struct owning CLV/P-matrix buffers
(created by ``pll_partition_create(tips, clv_buffers, states, sites, ...)``,
SURVEY.md §2.9), the TPU partition is an immutable JAX pytree holding

- the *data*: encoded tip states + the per-code tip-CLV lookup table
  (the PATTERN_TIP analog — tips are never materialized as full CLVs),
  compressed site-pattern weights, and the invariant-site indicator,
- the *model*: exchangeability rates, frequencies, rate categories/weights,
  proportion of invariant sites, alpha — all traced leaves, so every model
  parameter is differentiable through the likelihood.

CLVs themselves are **not** stored here: the pruning engine
(:mod:`pllmod_tpu.ops.clv`) computes them functionally and returns them,
which is what makes topology moves / rollback trivial (no invalidation
protocol needed at this layer; see ``tree/treeinfo.py`` for the cached
incremental layer).

The pattern axis is padded to a multiple of ``pattern_pad`` (default 128 =
one TPU lane tile); padding sites use the all-gap code (CLV rows of ones)
and weight 0, so they contribute exactly zero to the log-likelihood.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from pllmod_tpu.common import GAMMA_RATES_MEAN
from pllmod_tpu.ops import charmap as charmap_mod
from pllmod_tpu.ops import gamma as gamma_mod
from pllmod_tpu.ops import eigen as eigen_mod


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class Partition:
    # --- data (static content, traced storage) -----------------------------
    tip_states: jnp.ndarray        # int32 [tips, patterns_padded]
    code_clv: jnp.ndarray          # [n_codes, states] 0/1 tip-CLV rows
    pattern_weights: jnp.ndarray   # [patterns_padded] (0 on padding)
    inv_indicator: jnp.ndarray     # [patterns_padded, states] 0/1 — site can
                                   # be invariant in state s (gamma.invariant_sites_mask)
    # --- model parameters (all differentiable) -----------------------------
    subst_rates: jnp.ndarray       # [n_matrices, states*(states-1)/2]
    freqs: jnp.ndarray             # [n_matrices, states]
    rate_cats: jnp.ndarray         # [cats] category rates (mean 1)
    rate_weights: jnp.ndarray      # [cats] category weights (sum 1)
    prop_invar: jnp.ndarray        # [n_matrices]
    alpha: jnp.ndarray             # scalar (Gamma shape; NaN = free rates)
    param_indices: jnp.ndarray     # int32 [cats] rate-matrix index per category
    # --- static metadata ----------------------------------------------------
    n_tips: int = struct.field(pytree_node=False)
    states: int = struct.field(pytree_node=False)
    n_patterns: int = struct.field(pytree_node=False)       # unpadded count
    gamma_mode: int = struct.field(pytree_node=False, default=GAMMA_RATES_MEAN)
    # reversible=False switches P-matrices to the expm path (custom
    # non-reversible models); the eigendecomposition-based fast paths
    # (sumtable BLO) are unavailable then
    reversible: bool = struct.field(pytree_node=False, default=True)
    # --- cached eigendecomposition (libpll eigen_decomp_valid analog) -------
    # None = recompute inside the trace (differentiable w.r.t. rates/freqs);
    # set via cache_eigen() for brlens-only hot paths (eval/BLO/SPR): the
    # TPU eigh is by far the most expensive op of a likelihood evaluation.
    eigen_lam: jnp.ndarray | None = None     # [M, S]
    eigen_V: jnp.ndarray | None = None       # [M, S, S]
    eigen_Vinv: jnp.ndarray | None = None    # [M, S, S]

    # ------------------------------------------------------------------
    @property
    def n_patterns_padded(self) -> int:
        return self.tip_states.shape[1]

    @property
    def n_cats(self) -> int:
        return self.rate_cats.shape[0]

    @property
    def n_matrices(self) -> int:
        return self.subst_rates.shape[0]

    @property
    def dtype(self):
        return self.freqs.dtype

    # ------------------------------------------------------------------
    def eigen(self):
        """Batched eigendecomposition over rate matrices — the cache if
        set, else recomputed in-trace (lazy in the reference via
        eigen_decomp_valid flags, algo_callback.c:68)."""
        if not self.reversible:
            from pllmod_tpu.common import PllModError, ERROR_UNSUPPORTED
            raise PllModError(
                ERROR_UNSUPPORTED,
                "eigendecomposition paths (sumtable BLO) require a "
                "reversible model; use autodiff-based optimization")
        if self.eigen_lam is not None:
            return self.eigen_lam, self.eigen_V, self.eigen_Vinv
        return eigen_mod.eigen_reversible_batched(self.subst_rates, self.freqs)

    def cache_eigen(self):
        """Return a partition with the eigendecomposition materialized.
        Use on hot brlens-only paths (likelihood eval, BLO, SPR): on TPU
        the eigh dominates a full evaluation otherwise. The cache is
        cleared automatically by :meth:`with_model_params`.

        Deliberately EAGER, not jitted: jitting fuses differently and
        perturbs the eigenbasis at machine epsilon — numerically just as
        valid, but it breaks bit-compatibility with the in-jit eigen the
        XLA paths compute, and a measured BLO hard case
        (test_blo_end_to_end_fast) sits on a knife edge where that eps
        flip lands the Jacobi Newton sweep in a 1.8-logL-worse optimum.
        The cost is ~15 one-time tiny-op compiles on the axon runtime
        (~6 s/process) — correctness contract wins."""
        lam, V, Vinv = eigen_mod.eigen_reversible_batched(
            self.subst_rates, self.freqs)
        return self.replace(eigen_lam=lam, eigen_V=V, eigen_Vinv=Vinv)

    def with_model_params(self, subst_rates=None, freqs=None):
        """Replace rates/freqs AND invalidate the eigen cache."""
        kw = dict(eigen_lam=None, eigen_V=None, eigen_Vinv=None)
        if subst_rates is not None:
            kw["subst_rates"] = subst_rates
        if freqs is not None:
            kw["freqs"] = freqs
        return self.replace(**kw)

    def prob_matrices(self, brlens):
        """P-matrices for all edges × categories: [E, C, S, S].

        Cached-eigen path when available (brlens-differentiable);
        otherwise the degenerate-eigenvalue-safe fully-differentiable path
        (eigen.prob_matrices_params custom JVP); expm for non-reversible
        models."""
        if not self.reversible:
            return eigen_mod.prob_matrices_expm_multi(
                self.subst_rates, self.freqs,
                jnp.asarray(brlens, self.dtype), self.rate_cats,
                self.param_indices, self.prop_invar)
        if self.eigen_lam is not None:
            return eigen_mod.prob_matrices_multi(
                (self.eigen_lam, self.eigen_V, self.eigen_Vinv),
                jnp.asarray(brlens, self.dtype), self.rate_cats,
                self.param_indices, self.prop_invar)
        return eigen_mod.prob_matrices_params(
            self.subst_rates, self.freqs, jnp.asarray(brlens, self.dtype),
            self.rate_cats, self.param_indices, self.prop_invar)

    def with_alpha(self, alpha):
        """Return a partition with alpha set and category rates recomputed
        (the whole chain is differentiable w.r.t. alpha)."""
        alpha = jnp.asarray(alpha, self.dtype)
        cats = gamma_mod.compute_gamma_cats(alpha, self.n_cats, self.gamma_mode)
        return self.replace(alpha=alpha, rate_cats=cats.astype(self.dtype))

    def freqs_per_cat(self):
        return self.freqs[self.param_indices]       # [C, S]

    def pinv_mix(self):
        """Scalar p-inv convenience (matrix 0) — used only as an optimizer
        starting point. The likelihood/derivative paths index
        ``prop_invar[param_indices]`` per category (see
        :func:`pllmod_tpu.ops.likelihood._site_lnl`)."""
        return self.prop_invar[0]

    def pinv_per_cat(self):
        """Per-category proportion of invariant sites: prop_invar indexed by
        param_indices (libpll core_likelihood indexing)."""
        return self.prop_invar[self.param_indices]


def create_partition(
    sequences,
    states: int | None = None,
    n_rate_cats: int = 4,
    alpha: float = 1.0,
    subst_rates=None,
    freqs=None,
    prop_invar: float = 0.0,
    n_matrices: int = 1,
    param_indices=None,
    rate_weights=None,
    charmap: "charmap_mod.Charmap | None" = None,
    pattern_weights=None,
    compress: bool = True,
    pattern_pad: int = 128,
    dtype=jnp.float32,
    gamma_mode: int = GAMMA_RATES_MEAN,
    reversible: bool = True,
) -> Partition:
    """Build a Partition from raw sequences (list of str/bytes, equal length).

    Equivalent of pll_partition_create + pll_set_tip_states +
    pll_set_pattern_weights + pll_compress_site_patterns +
    pll_update_invariant_sites (SURVEY.md §2.9).
    """
    if charmap is None:
        if states is None:
            raise ValueError("need states or charmap")
        charmap = charmap_mod.for_states(states)
    states = charmap.states

    codes, code_masks = charmap.encode(sequences)   # [tips, sites]
    n_tips, n_sites = codes.shape

    if pattern_weights is None:
        pattern_weights = np.ones(n_sites, dtype=np.float64)
    else:
        pattern_weights = np.asarray(pattern_weights, dtype=np.float64)

    if compress:
        codes, pattern_weights = compress_patterns(codes, pattern_weights)
    n_patterns = codes.shape[1]
    padded = round_up(max(n_patterns, 1), pattern_pad)

    tip_states = np.zeros((n_tips, padded), dtype=np.int32)  # code 0 = gap
    tip_states[:, :n_patterns] = codes
    w = np.zeros(padded, dtype=np.float64)
    w[:n_patterns] = pattern_weights

    inv_mask = gamma_mod.invariant_sites_mask(code_masks, tip_states)
    bits = (inv_mask[:, None] >> np.arange(states, dtype=np.uint64)[None, :]) & np.uint64(1)
    inv_indicator = bits.astype(np.float64)
    inv_indicator[n_patterns:] = 0.0   # padding can never be invariant

    code_clv = charmap.mask_to_clv_rows(code_masks)

    if subst_rates is None:
        subst_rates = np.ones(states * (states - 1) // 2, dtype=np.float64)
    subst_rates = np.broadcast_to(np.asarray(subst_rates, np.float64),
                                  (n_matrices, states * (states - 1) // 2)).copy()
    if freqs is None:
        freqs = np.full(states, 1.0 / states)
    freqs = np.broadcast_to(np.asarray(freqs, np.float64), (n_matrices, states)).copy()

    if param_indices is None:
        param_indices = np.zeros(n_rate_cats, dtype=np.int32)
    if rate_weights is None:
        rate_weights = np.full(n_rate_cats, 1.0 / n_rate_cats)

    # Convert to the target dtype on HOST (numpy), then device_put: an
    # eager jnp.asarray with a dtype change compiles a tiny
    # convert_element_type program PER SHAPE — on the axon runtime each
    # remote compile costs ~0.45 s, and partition creation alone paid ~8
    # of them (measured: tools/probe_spr_compiles.py).
    def dev(x, dt=dtype):
        return jnp.asarray(np.asarray(x, dt))

    alpha_arr = dev(float("nan") if alpha is None else alpha)
    if n_rate_cats > 1 and alpha is not None:
        # host-side float64 discretization: asking the device for f64 under
        # a default-f32 runtime silently truncates category rates
        cats = dev(gamma_mod.compute_gamma_cats_host(alpha, n_rate_cats,
                                                     gamma_mode))
    else:
        cats = dev(np.ones(n_rate_cats))

    # ship tip codes int8 over the wire (codes < 128 always: ≤ 23 for
    # the widest charmap) and upcast ON DEVICE — the remote tunnel
    # moves ~28 MB/s, so the int32 form cost 142 s at 10k × 100k
    # (tools/probe_capacity_eval.out); downstream consumers keep the
    # int32 contract unchanged
    return Partition(
        tip_states=jnp.asarray(tip_states.astype(np.int8)
                               ).astype(jnp.int32),
        code_clv=dev(code_clv),
        pattern_weights=dev(w),
        inv_indicator=dev(inv_indicator),
        subst_rates=dev(subst_rates),
        freqs=dev(freqs),
        rate_cats=cats,
        rate_weights=dev(rate_weights),
        prop_invar=dev(np.full((n_matrices,), prop_invar)),
        alpha=alpha_arr,
        param_indices=dev(param_indices, np.int32),
        n_tips=n_tips,
        states=states,
        n_patterns=n_patterns,
        gamma_mode=gamma_mode,
        reversible=reversible,
    )


def make_asc_partition(partition) -> Partition:
    """Companion partition of the S constant-site patterns, for Lewis-type
    ascertainment-bias correction (libpll PLL_ATTRIB_AB_FLAG: the reference
    allocates ``sites + states`` dummy sites, treeinfo.c:333-335).

    Pattern j has every tip in state j; evaluating the same tree on it
    yields the probabilities L_j of observing a constant column, and the
    corrected log-likelihood is ``Σ_p w_p [ln L_p − ln(1 − Σ_j L_j)]``
    (Lewis 2001).
    """
    S = partition.states
    pad = partition.n_patterns_padded  # keep mesh-divisible padding
    codes = np.zeros((partition.n_tips, pad), np.int32)
    # code_clv rows for pure states may not exist in the observed code
    # table; build a dedicated pure-state table: code j+1 = state j,
    # code 0 = gap (padding)
    n_codes = S + 1
    code_clv = np.zeros((n_codes, S))
    code_clv[0] = 1.0
    for j in range(S):
        code_clv[j + 1, j] = 1.0
        codes[:, j] = j + 1
    w = np.zeros(pad)
    w[:S] = 1.0  # acts as a selector, not a weight
    inv_ind = np.zeros((pad, S))
    return partition.replace(
        tip_states=jnp.asarray(codes),
        code_clv=jnp.asarray(code_clv, partition.dtype),
        pattern_weights=jnp.asarray(w, partition.dtype),
        inv_indicator=jnp.asarray(inv_ind, partition.dtype),
        # ASC correction is defined for the variable-rates process only
        prop_invar=jnp.zeros_like(partition.prop_invar),
    )


def compress_patterns(codes: np.ndarray, weights: np.ndarray):
    """Site-pattern compression: identical alignment columns collapse into
    one pattern with summed weight (libpll ``pll_compress_site_patterns``,
    SURVEY.md §5 "long-context analog"). Native C++ hash-dedup when the
    runtime library is built; numpy fallback otherwise.
    """
    from pllmod_tpu import native
    if native.available():
        return native.compress_patterns(codes, weights)
    cols = np.ascontiguousarray(codes.T)
    view = cols.view([("", cols.dtype)] * cols.shape[1]).ravel()
    uniq, inverse = np.unique(view, return_inverse=True)
    n_pat = len(uniq)
    w = np.zeros(n_pat, dtype=weights.dtype)
    np.add.at(w, inverse, weights)
    # keep first-occurrence order for reproducibility
    first_idx = np.full(n_pat, len(view), dtype=np.int64)
    np.minimum.at(first_idx, inverse, np.arange(len(view)))
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(n_pat)
    new_codes = cols[np.sort(first_idx)].T.copy()
    return new_codes.astype(codes.dtype), w[order]
