"""On-chip partitioned DNA+protein end-to-end search (VERDICT r3 item
7): a 2-partition treeinfo (DNA+G4 resident-kind + protein(LG)+G4
fused-kind) drives the round-3/4 combined-lane programs through a whole
ml_search with interleaved model optimization, exercising mid-search
checkpoint + resume ON-CHIP. Writes tools/probe_multipart_search.out."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

OUT = open("/root/repo/tools/probe_multipart_search.out", "w")
T0 = time.perf_counter()


def p(*a):
    print(f"[{time.perf_counter()-T0:7.1f}s]", *a, file=OUT, flush=True)
    print(*a, flush=True)


def main():
    import jax
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.ops import charmap as cm
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.algorithm.search import ml_search
    from pllmod_tpu.utils import models_aa
    from pllmod_tpu.common import (PARAM_SUBST_RATES, PARAM_FREQUENCIES,
                                   PARAM_ALPHA, PARAM_BRANCHES_ITERATIVE)
    from tests import reference_impl as ref

    p("devices:", jax.devices())
    rng = np.random.default_rng(24)
    n = 24
    tree = ref.random_binary_tree(rng, n, 0.02, 0.7)
    dna = create_partition(
        ref.random_sequences(rng, n, 2048), states=4, n_rate_cats=4,
        alpha=0.7, dtype=jnp.float32)
    lg = models_aa.info("LG")
    aa_chars = np.array(list("ARNDCQEGHILKMFPSTWYV"))
    aa_seqs = ["".join(r) for r in aa_chars[rng.integers(0, 20, (n, 512))]]
    prot = create_partition(
        aa_seqs, states=20, n_rate_cats=4, alpha=0.9, charmap=cm.AA,
        subst_rates=np.asarray(lg.rates), freqs=np.asarray(lg.freqs),
        dtype=jnp.float32)
    masks = [PARAM_SUBST_RATES | PARAM_FREQUENCIES | PARAM_ALPHA
             | PARAM_BRANCHES_ITERATIVE,
             PARAM_ALPHA | PARAM_BRANCHES_ITERATIVE]   # protein: fixed LG

    ck = "/tmp/multipart_search.ck"
    if os.path.exists(ck):
        os.unlink(ck)

    def on_round(rec):
        p(f"round {rec.mode:8s} r={rec.radius:2d} logL {rec.loglh:.3f} "
          f"applied {rec.n_applied}")

    ti = TreeInfo(tree.copy(), [dna, prot], params_to_optimize=masks)
    t0 = time.perf_counter()
    res1 = ml_search(ti, radius_max=8, max_rounds=2, thorough=False,
                     checkpoint_path=ck, on_round=on_round)
    p(f"stage-1 (interrupted at 2 rounds): logL {res1.loglh:.3f} in "
      f"{time.perf_counter()-t0:.0f}s; checkpoint at {ck}")

    # resume into a FRESH treeinfo mid-search, on-chip
    ti2 = TreeInfo(tree.copy(), [dna, prot], params_to_optimize=masks)
    t0 = time.perf_counter()
    res2 = ml_search(ti2, radius_max=8, max_rounds=10, thorough=True,
                     checkpoint_path=ck, resume=True, on_round=on_round)
    p(f"resumed search: start {res2.start_loglh:.3f} -> final "
      f"{res2.loglh:.3f} in {res2.n_rounds} rounds "
      f"({time.perf_counter()-t0:.0f}s)")
    # the checkpoint holds the state AFTER the last round (stage-1's
    # RETURN additionally ran a final model-opt that is not part of the
    # checkpointed state): the resumed search must beat the last
    # checkpointed round
    assert res2.loglh >= res1.rounds[-1].loglh - 1e-3, \
        "resume lost progress"
    p("OK multipart search + mid-search resume on-chip")


main()
