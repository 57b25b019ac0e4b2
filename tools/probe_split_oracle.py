"""TPU probe: which on-chip kernel mode deviates from the f64 oracle?

CPU interpret mode shows exact/True/"read" all within ~4e-8 of the f64
host oracle on 64-taxon protein, yet the on-chip probe measured
split-True 8.3e-6 away from on-chip exact. This probe evaluates the
SAME case on the TPU in all three modes and compares each against the
host f64 oracle (ops/repeats.py) — separating "the split kernel is
wrong" from "the on-chip exact kernel is wrong" (e.g. a HIGHEST-dot
or P12-build difference on real hardware).
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops import pallas_clv, charmap
from tests import reference_impl as ref


def log(m):
    print(m, flush=True)


def run(states, cats, n, sites, label):
    rng = np.random.default_rng(3)
    tree = ref.random_binary_tree(rng, n)
    if states == 20:
        seqs = ref.random_sequences(rng, n, sites,
                                    alphabet=charmap.AA_ORDER, gap_frac=0.0)
        cm = None
    else:
        syms = charmap.MULTI_SYMBOLS[:states]
        seqs = ["".join(np.array(list(syms))[rng.integers(0, states, sites)])
                for _ in range(n)]
        cm = charmap.multistate(states)
    nr = states * (states - 1) // 2
    kw = dict(charmap=cm) if cm is not None else {}
    part = create_partition(seqs, states=states, n_rate_cats=cats, alpha=0.8,
                            subst_rates=rng.uniform(0.5, 2.0, nr),
                            freqs=rng.dirichlet([8] * states),
                            dtype=jnp.float32, **kw).cache_eigen()
    brl = jnp.asarray(tree.lengths, jnp.float32)
    i2, f1, f2, ri2, ns2 = pallas_clv.compile_fused(part, tree,
                                                    fuse_root=True)
    from pllmod_tpu.ops import repeats
    l64 = repeats.loglikelihood_repeats(part, tree, brl)
    log(f"--- {label}: f64 oracle = {l64:.6f}")
    for split in (False, True, "read"):
        l = float(pallas_clv.loglikelihood_fused(
            part, i2, brl, f1, f2, ri2, ns2, False, split))
        log(f"  split={split!r:7}: logL={l:.6f}  rel vs f64="
            f"{abs(l - l64) / abs(l64):.2e}")


if __name__ == "__main__":
    log(f"platform: {jax.devices()[0].platform}")
    run(20, 4, 64, 1024, "protein CS=80 64x1024")
    run(16, 4, 64, 1024, "GT16 CS=64 64x1024")
    run(20, 4, 64, 4096, "protein CS=80 64x4096")
    log("DONE")
