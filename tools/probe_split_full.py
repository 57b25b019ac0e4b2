"""TPU probe: wide-state split modes (gap #7 — STATUS round-3 queue).

Measures the fused megakernel at protein (CS=80) and GT16 (CS=64)
shapes with split in {False (exact HIGHEST), True (fast 2-dot),
"full" (3-dot, Pl@lo restored)}: marginal ms/eval (on-device fori_loop,
iters=50, best-of-5) + the on-chip logL of each mode vs the exact
kernel. Decides whether "full" becomes the wide-state production mode
(engine.use_split_clv).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops import pallas_clv
from pllmod_tpu.ops import charmap
from tests import reference_impl as ref

OUT = open("/root/repo/tools/probe_split_full.out", "w")


def log(msg):
    print(msg, file=OUT, flush=True)
    print(msg, flush=True)


def case(states, cats, n, sites, seed=3):
    rng = np.random.default_rng(seed)
    tree = ref.random_binary_tree(rng, n)
    if states == 20:
        seqs = ref.random_sequences(rng, n, sites, alphabet=charmap.AA_ORDER,
                                    gap_frac=0.0)
        cm = None
    else:
        syms = charmap.MULTI_SYMBOLS[:states]
        seqs = ["".join(np.array(list(syms))[rng.integers(0, states, sites)])
                for _ in range(n)]
        cm = charmap.multistate(states)
    nr = states * (states - 1) // 2
    kw = dict(charmap=cm) if cm is not None else {}
    part = create_partition(seqs, states=states, n_rate_cats=cats,
                            alpha=0.8, subst_rates=rng.uniform(0.5, 2.0, nr),
                            freqs=rng.dirichlet([8] * states),
                            dtype=jnp.float32, **kw)
    return part.cache_eigen(), tree


def measure(part, tree, split, iters=50):
    brl = jnp.asarray(tree.lengths, jnp.float32)
    i2, f1, f2, ri2, ns2 = pallas_clv.compile_fused(part, tree,
                                                    fuse_root=True)

    def one(b):
        return pallas_clv.loglikelihood_fused(
            part, i2, b, f1, f2, ri2, ns2, False, split)

    lnl = float(one(brl))

    @jax.jit
    def many(b0):
        def body(i, acc):
            return acc + one(b0 * (1.0 + 1e-7 * i))
        return jax.lax.fori_loop(0, iters, body, 0.0)

    many(brl).block_until_ready()
    many(brl * 1.00005).block_until_ready()
    dt = float("inf")
    for k in range(5):
        t0 = time.perf_counter()
        many(brl * (1.0001 + 1e-5 * k)).block_until_ready()
        dt = min(dt, time.perf_counter() - t0)
    return lnl, dt / iters * 1e3


def run(states, cats, n, sites, label):
    part, tree = case(states, cats, n, sites)
    log(f"--- {label}: {n} taxa x {sites} patterns, states={states} "
        f"cats={cats} CS={states * cats}")
    res = {}
    for split in (False, True, "full"):
        t0 = time.perf_counter()
        lnl, ms = measure(part, tree, split)
        res[split] = (lnl, ms)
        log(f"  split={split!r:7}: {ms:7.3f} ms/eval  logL={lnl:.6f} "
            f"(wall incl compile {time.perf_counter() - t0:.0f}s)")
    l_ex = res[False][0]
    for split in (True, "full"):
        rel = abs(res[split][0] - l_ex) / abs(l_ex)
        log(f"  accuracy split={split!r}: {rel:.2e} relative vs exact "
            f"(bar 1e-6)")


if __name__ == "__main__":
    log(f"platform: {jax.devices()[0].platform}")
    run(20, 4, 64, 4096, "protein CS=80")
    run(16, 4, 64, 4096, "GT16 CS=64")
    run(10, 4, 64, 4096, "GT10 CS=40")
    log("DONE")
