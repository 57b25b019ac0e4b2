"""Log every XLA compile during one cold fast spr_round (48 taxa x 2048)
with timestamps, to find where the ~40 s cold-round cost lives.
"""
import sys
import time
import logging

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_log_compiles", True)

OUT = open("/root/repo/tools/probe_spr_compiles.out", "w")


class H(logging.Handler):
    def emit(self, record):
        msg = record.getMessage()
        if "Compiling" in msg or "compil" in msg.lower():
            print(f"[{time.perf_counter()-T0:8.2f}s] {msg[:200]}",
                  file=OUT, flush=True)


T0 = time.perf_counter()
logging.getLogger("jax").addHandler(H())
logging.getLogger("jax").setLevel(logging.WARNING)


def main():
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.algorithm import spr as spr_mod
    from tests import reference_impl as ref

    rng = np.random.default_rng(7)
    tree = ref.random_binary_tree(rng, 48, 0.02, 0.8)
    seqs = ref.random_sequences(rng, 48, 2048)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float32)
    ti = TreeInfo(tree.copy(), [part])
    t0 = time.perf_counter()
    lnl, n_applied, _ = spr_mod.spr_round(ti, radius_min=1, radius_max=10,
                                          thorough=False)
    print(f"[{time.perf_counter()-T0:8.2f}s] round done: wall "
          f"{time.perf_counter()-t0:.1f}s logL {lnl:.3f}", file=OUT,
          flush=True)


main()
