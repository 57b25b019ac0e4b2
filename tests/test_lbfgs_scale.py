"""Projected L-BFGS at reference scale: the 189-free-parameter protein
GTR rate optimization (SURVEY §3.3 headline cost case — the reference
spends (nmax+1) likelihood evaluations per L-BFGS-B iteration on this;
VERDICT round-1 item 10 asks for parity against scipy's L-BFGS-B on the
same jitted objective)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pllmod_tpu.optimize.lbfgsb import minimize_lbfgsb
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops import engine as engine_mod
from tests import reference_impl as ref

AA20 = "ARNDCQEGHILKMFPSTWYV"


def _protein_gtr_objective(rng):
    """Jitted (-logL, grad) of the 189 free exchangeabilities (last rate
    pinned to 1) on a 6-taxon protein alignment."""
    n, sites = 6, 80
    tree = ref.random_binary_tree(rng, n)
    seqs = ref.random_sequences(rng, n, sites, alphabet=AA20, gap_frac=0.0)
    part = create_partition(seqs, states=20, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float64)
    ops, root_info = tree.traversal_ops()
    ri = tuple(int(x) for x in root_info)
    ops_j = jnp.asarray(ops)
    brl = jnp.asarray(tree.lengths, part.dtype)

    @jax.jit
    def neg(free):
        rates = jnp.concatenate([free, jnp.ones(1, free.dtype)])
        p = part.with_model_params(
            subst_rates=jnp.broadcast_to(rates, part.subst_rates.shape))
        return -engine_mod.loglikelihood(p, ops_j, brl, ri)

    vg = jax.jit(jax.value_and_grad(neg))
    return lambda z: tuple(map(np.asarray, vg(jnp.asarray(z)))), part


def test_lbfgs_189dim_protein_gtr_vs_scipy(rng):
    from scipy.optimize import minimize as sp_minimize

    fn, part = _protein_gtr_objective(rng)
    d = 189
    x0 = np.full(d, 1.0)
    lo = np.full(d, 1e-4)
    hi = np.full(d, 1e3)

    x_ours, f_ours, n_evals = minimize_lbfgsb(fn, x0, lo, hi,
                                              max_iters=400, pgtol=1e-5,
                                              factr=0)
    res = sp_minimize(fn, x0, jac=True, method="L-BFGS-B",
                      bounds=list(zip(lo, hi)),
                      options={"maxiter": 400, "gtol": 1e-7})
    # same basin, and we must MATCH OR BEAT scipy's final -logL
    # (measured: ours 1497.4805 vs scipy 1497.4906 on this fixture)
    assert f_ours <= float(res.fun) + 1e-4, (f_ours, res.fun)
    assert abs(f_ours - float(res.fun)) < 0.1
    # and must actually improve from the JC-like start
    f0, _ = fn(x0)
    assert f_ours < float(f0) - 1.0
    # bounded work for a 189-dim problem (the reference's FD scheme would
    # cost 190 evaluations per iteration)
    assert n_evals <= 500, n_evals
