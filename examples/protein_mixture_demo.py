#!/usr/bin/env python
"""Protein mixture-model demo: the full 37-model registry, LG4X free-rate
mixture fitting, incremental evaluation, memory-bounded evaluation and
partition-distributed parallelism — the round-2 feature surface.
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from pllmod_tpu import common
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops.engine import tree_loglikelihood, loglikelihood_bounded
from pllmod_tpu.tree import Tree
from pllmod_tpu.tree.treeinfo import TreeInfo
from pllmod_tpu.utils import models_aa
from pllmod_tpu.utils.aa_data import LG4X_RATES_DEFAULT, LG4X_WEIGHTS_DEFAULT
from pllmod_tpu.algorithm.opt_model import opt_rates_weights

AA = "ARNDCQEGHILKMFPSTWYV"
rng = np.random.default_rng(1)
n, sites = 8, 120
seqs = ["".join(rng.choice(list(AA), sites)) for _ in range(n)]
newick = ("((t0:0.12,t1:0.18):0.05,((t2:0.21,t3:0.09):0.07,"
          "(t4:0.16,t5:0.11):0.04):0.06,(t6:0.25,t7:0.14):0.08);")
tree = Tree.from_newick(newick.replace("t", "s").replace("s", "t"))

# -- every registry model evaluates ------------------------------------
print(f"protein registry: {models_aa.count()} models")
for name in ("LG", "Q.PFAM", "MTART", "HIVB"):
    m = models_aa.info(name)
    part = create_partition(seqs, states=20, n_rate_cats=4, alpha=0.8,
                            subst_rates=m.rates, freqs=m.freqs,
                            dtype=jnp.float64)
    print(f"  {name:9s} logL = {float(tree_loglikelihood(part, tree)):.4f}")

# -- LG4X: per-category matrices + free rates/weights ------------------
part = create_partition(seqs, states=20, n_rate_cats=4, alpha=None,
                        n_matrices=4, dtype=jnp.float64)
part = models_aa.set_protmix(part, "LG4X")
part = part.replace(rate_cats=jnp.asarray(LG4X_RATES_DEFAULT),
                    rate_weights=jnp.asarray(LG4X_WEIGHTS_DEFAULT))
ti = TreeInfo(tree.copy(), [part],
              params_to_optimize=(common.PARAM_FREE_RATES
                                  | common.PARAM_RATE_WEIGHTS))
l0 = ti.compute_loglh()
l1 = opt_rates_weights(ti, max_rounds=2)
print(f"LG4X: start {l0:.4f} -> optimized rates/weights {l1:.4f}")

# -- incremental evaluation --------------------------------------------
ti.compute_loglh(incremental=True)
before = ti.counters.clv_updates
ti.set_branch_length(2, 0.3)
ti.compute_loglh(incremental=True)
partial_ops = (ti.counters.clv_updates - before) // \
    ti.partitions[0].n_patterns_padded
print(f"incremental: brlen change recomputed {partial_ops} of "
      f"{n - 2} CLV ops")

# -- memory-bounded evaluation -----------------------------------------
lb, n_slots = loglikelihood_bounded(ti.partitions[0], tree)
lf = float(tree_loglikelihood(ti.partitions[0], tree))
print(f"bounded: logL {float(lb):.4f} with {n_slots} CLV slots "
      f"(full mode {n - 2} slots: {lf:.4f})")
assert abs(float(lb) - lf) < 1e-8 * abs(lf)
