"""Brent-program cache probe: 3 opt_alpha calls on DIFFERENT topologies
of one taxon count. Pre-round-3-fix each call retraced + remote-compiled
a fresh Brent while program; with the cached family programs only call 1
compiles. Writes tools/probe_brent_cache.out."""
import time, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import importlib
import jax.numpy as jnp
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.tree.treeinfo import TreeInfo
om = importlib.import_module("pllmod_tpu.algorithm.opt_model")
from tests import reference_impl as ref

OUT = open("/root/repo/tools/probe_brent_cache.out", "w")
rng = np.random.default_rng(5)
seqs = ref.random_sequences(rng, 24, 1024)
part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                        dtype=jnp.float32)
for k in range(3):
    tree = ref.random_binary_tree(np.random.default_rng(k), 24, 0.02, 0.8)
    ti = TreeInfo(tree, [part])
    t0 = time.perf_counter()
    lnl = om.opt_alpha(ti)
    print(f"opt_alpha topology {k}: {time.perf_counter()-t0:7.2f}s "
          f"logL {lnl:.3f} alpha {float(ti.partitions[0].alpha):.4f}",
          file=OUT, flush=True)
print("done", file=OUT, flush=True)
