"""Compile-log probe for the model-opt + search entry points (the same
eager-tiny-op hunt tools/probe_spr_compiles.py ran for spr_round).
24 taxa x 1024 patterns GTR+G4 f32: opt_model round, then a short
ml_search. Writes tools/probe_opt_compiles.out.
"""
import sys
import time
import logging

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_log_compiles", True)

OUT = open("/root/repo/tools/probe_opt_compiles.out", "w")
TINY = {"convert_element_type", "broadcast_in_dim", "multiply", "add",
        "subtract", "true_divide", "reshape", "select_n", "less",
        "gather", "_squeeze", "_broadcast_arrays", "maximum", "cumsum",
        "concatenate", "_reduce_sum", "_einsum", "_diag", "triu",
        "transpose", "squeeze", "sqrt", "scatter", "scatter-add",
        "remainder", "floor_divide", "clip", "not_equal", "_reduce_max",
        "_reduce_min", "exp", "log", "negative", "power", "equal",
        "greater", "where", "copy", "_take", "dynamic_slice"}


class H(logging.Handler):
    def emit(self, record):
        msg = record.getMessage()
        if msg.startswith("Compiling"):
            print(f"[{time.perf_counter()-T0:8.2f}s] {msg[:160]}",
                  file=OUT, flush=True)


T0 = time.perf_counter()
logging.getLogger("jax").addHandler(H())
logging.getLogger("jax").setLevel(logging.WARNING)


def main():
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.algorithm.opt_model import opt_model
    from pllmod_tpu.algorithm.search import ml_search
    from tests import reference_impl as ref

    rng = np.random.default_rng(5)
    tree = ref.random_binary_tree(rng, 24, 0.02, 0.8)
    seqs = ref.random_sequences(rng, 24, 1024)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float32)
    ti = TreeInfo(tree.copy(), [part])
    t0 = time.perf_counter()
    lnl = opt_model(ti)
    print(f"[{time.perf_counter()-T0:8.2f}s] opt_model done "
          f"{time.perf_counter()-t0:.1f}s logL {lnl:.3f}",
          file=OUT, flush=True)

    ti2 = TreeInfo(tree.copy(), [part])
    t0 = time.perf_counter()
    res = ml_search(ti2, radius_max=5, max_rounds=2, thorough=False)
    print(f"[{time.perf_counter()-T0:8.2f}s] ml_search done "
          f"{time.perf_counter()-t0:.1f}s logL {res.loglh:.3f}",
          file=OUT, flush=True)


main()
