"""North-star on-chip measurement (BASELINE.md §3 / VERDICT r3 item 2):
full-tree logL at up to 10k taxa × 100k patterns GTR+Γ4 through the
serial-fused bounded megakernel (capacity+speed mode), plus the
derivative path (sumtable + Newton on an edge) at the same scale, with
HBM accounting vs the PERF_NOTES budget. Writes tools/probe_northstar.out.

Methodology per CLAUDE.md: marginal ms/eval from a varying-brlens timed
loop after two warmups (the axon runtime memoizes identical executions);
background run with staged flush prints.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from functools import partial

OUT = open("/root/repo/tools/probe_northstar.out", "w")


def p(*a):
    print(*a, file=OUT, flush=True)
    print(*a, flush=True)


def hbm():
    try:
        st = jax.devices()[0].memory_stats()
        return f"{st['bytes_in_use']/2**30:.2f} GiB in use"
    except Exception:
        return "n/a"


def make_case(n_taxa, sites, rng):
    """Random codes directly (a 10k x 100k random_sequences string array
    costs ~8 GB host RAM; build int codes + uniform weights instead)."""
    from pllmod_tpu.ops.partition import create_partition
    from tests import reference_impl as ref
    tree = ref.random_binary_tree(rng, n_taxa, 0.02, 0.8)
    pad = -(-sites // 128) * 128
    # pure-state codes 1..4 against an explicit 5-row code table
    # (row 0 = gap/all-ones, rows 1-4 = one-hot ACGT): the template's
    # observed-code table would be too small for synthetic codes
    codes = rng.integers(1, 5, size=(n_taxa, pad), dtype=np.int64)
    weights = np.zeros(pad)
    weights[:sites] = 1.0
    ctab = np.zeros((5, 4), np.float32)
    ctab[0] = 1.0
    ctab[1:5] = np.eye(4, dtype=np.float32)
    part = create_partition(
        ["A"], states=4, n_rate_cats=4, alpha=0.8,
        compress=False, dtype=jnp.float32)     # template for model params
    big = part.replace(
        n_tips=n_taxa,
        tip_states=jnp.asarray(codes.astype(np.int32)),
        pattern_weights=jnp.asarray(weights.astype(np.float32)),
        inv_indicator=jnp.zeros((pad, 4), jnp.float32),
        code_clv=jnp.asarray(ctab),
    )
    return tree, big


def main():
    from pllmod_tpu.ops import engine, clv as clv_mod
    from pllmod_tpu.ops import pallas_clv
    from pllmod_tpu.ops import derivatives as deriv_mod
    from pllmod_tpu.optimize.newton import minimize_newton_multi

    p("devices:", jax.devices())
    rng = np.random.default_rng(3)

    for n_taxa, sites in ((1000, 16384), (4000, 49152), (10000, 99968)):
        t_host0 = time.perf_counter()
        tree, part = make_case(n_taxa, sites, rng)
        part = part.cache_eigen()
        pad = part.n_patterns_padded
        p(f"--- {n_taxa} taxa x {sites} patterns (pad {pad}); host build "
          f"{time.perf_counter()-t_host0:.1f}s; HBM {hbm()}")

        # ---- bounded-fused eval ----
        lnl, n_slots = engine.loglikelihood_bounded_fused(part, tree)
        p(f"eval#1 logL {float(lnl):.2f} n_slots {n_slots}; HBM {hbm()}")
        brl0 = np.asarray(tree.lengths, np.float64)
        N = 5
        engine.loglikelihood_bounded_fused(
            part, tree, brlens=brl0 * 1.000001)   # second warm
        t0 = time.perf_counter()
        for it in range(N):
            lnl, _ = engine.loglikelihood_bounded_fused(
                part, tree, brlens=brl0 * (1 + 1e-6 * (it + 2)))
            float(lnl)
        dt = (time.perf_counter() - t0) / N
        ups = (n_taxa - 2) * sites / dt
        p(f"bounded-fused eval: {dt*1e3:.1f} ms/eval = {ups/1e9:.3f}e9 "
          f"pattern-node updates/s; HBM {hbm()}")

        # parity vs the XLA bounded scan (small shape only — the scan is
        # the O(n)-dispatch-step reference path)
        if n_taxa <= 1000:
            l_f0, _ = engine.loglikelihood_bounded_fused(part, tree,
                                                         brlens=brl0)
            t0 = time.perf_counter()
            l_scan, _ = engine.loglikelihood_bounded(part, tree)
            p(f"xla bounded scan: {time.perf_counter()-t0:.1f} s "
              f"(cold, incl compile), logL {float(l_scan):.2f}, "
              f"|d|={abs(float(l_scan)-float(l_f0)):.3g}")

        # ---- derivative path at scale: sumtable + Newton on the root
        # edge from the bounded buffers (the BASELINE §3 "logL +
        # derivative evals") ----
        ops, root_info = tree.traversal_ops()
        u, v, e = (int(x) for x in root_info)
        n_tips = part.n_tips
        ops_b, ns_b, slot_map = clv_mod.bounded_slot_ops(
            np.asarray(ops), n_tips, root_refs=(u, v))

        def remap(x):
            return x if x < n_tips else n_tips + int(slot_map[x - n_tips])

        idx8, e1, e2, ns_f = pallas_clv.compile_fused_ops(
            part, np.asarray(ops_b), serial=True)
        rr = jnp.asarray(np.asarray((remap(u), remap(v), e), np.int32))

        ru, rv = remap(u), remap(v)

        @partial(jax.jit, static_argnames=("n_slots", "refs"))
        def newton_edge(part, idx8, brl, e1, e2, rr, n_slots, refs):
            P12 = pallas_clv.fused_p12(part, brl, e1, e2)
            clvs, scalers = pallas_clv.update_partials_fused(
                part, None, idx8, e1, e2, n_slots, False, P12=P12,
                split=False)
            C, S = part.n_cats, part.states
            Ppad = part.n_patterns_padded

            def fetch(r):
                if r < n_tips:     # static: root faces a tip
                    codes = part.tip_states[r]
                    c = part.code_clv[codes].astype(jnp.float32)
                    c = jnp.broadcast_to(c[:, None, :], (Ppad, C, S))
                    return c, jnp.zeros((Ppad,), jnp.int32)
                sl = r - n_tips
                c = clvs[sl]
                s = scalers[sl]
                return (c.reshape(C, S, -1).transpose(2, 0, 1), s[0])

            cp, sp = fetch(refs[0])
            cc, sc = fetch(refs[1])
            eigen = part.eigen()
            st = deriv_mod.sumtable(part, cp, cc, eigen)
            sc_tot = sp + sc
            t0e = jnp.take(brl, rr[2])

            def deriv(t):
                _, df, ddf = deriv_mod.edge_derivatives(part, st, sc_tot,
                                                        t, eigen)
                return df, ddf

            t_new = minimize_newton_multi(
                deriv, t0e, jnp.asarray(1e-4, brl.dtype),
                jnp.asarray(100.0, brl.dtype), tol=1e-6, max_iters=8)
            lnl2, _, _ = deriv_mod.edge_derivatives(part, st, sc_tot,
                                                    t_new, eigen)
            return t_new, lnl2

        brlj = jnp.asarray(brl0.astype(np.float32))
        t_new, lnl2 = newton_edge(part, idx8, brlj, e1, e2, rr, ns_f, (ru, rv))
        p(f"edge Newton (bounded buffers): t {float(jnp.take(brlj, rr[2])):.4f}"
          f" -> {float(t_new):.4f}, logL at opt {float(lnl2):.2f}")
        newton_edge(part, idx8, brlj * 1.000001, e1, e2, rr, ns_f, (ru, rv))
        t0 = time.perf_counter()
        for it in range(3):
            tn, l2 = newton_edge(part, idx8, brlj * (1 + 1e-6 * (it + 2)),
                                 e1, e2, rr, ns_f, (ru, rv))
            float(l2)
        p(f"edge Newton: {(time.perf_counter()-t0)/3*1e3:.1f} ms per "
          f"(traversal + sumtable + bracketed Newton); HBM {hbm()}")


main()
