"""On-chip A/B: incremental (fused partial-traversal) vs full fused
evaluation at >=512 taxa (VERDICT r3 item 6 done-criterion). A
brlen-only update dirties only the path from the changed edge to the
root (~log-depth rows), so the incremental kernel runs a handful of
rows against the aliased buffers instead of all 3(n-2)... the full
evaluation. Writes tools/probe_incremental.out. Every timed call varies
the branch length (the axon runtime memoizes identical executions)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

OUT = open("/root/repo/tools/probe_incremental.out", "w")


def p(*a):
    print(*a, file=OUT, flush=True)
    print(*a, flush=True)


def main():
    import jax
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from tests import reference_impl as ref

    p("devices:", jax.devices())
    for n_taxa, sites in ((512, 4096), (2048, 8192), (4096, 16384)):
        rng = np.random.default_rng(11)
        tree = ref.random_binary_tree(rng, n_taxa, 0.02, 0.8)
        seqs = ref.random_sequences(rng, n_taxa, sites)
        part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                                dtype=jnp.float32).cache_eigen()
        ti = TreeInfo(tree, [part])
        edges = np.nonzero(tree.edge_nodes[:, 0] >= 0)[0]
        # warm both paths (compiles + first-exec costs); the incremental
        # program recompiles per dirty-row BUCKET (pow-2 — path length
        # to the root differs per edge), so warm with one full pass over
        # the same edge cycle the timed loop uses
        l_full = ti.compute_loglh()
        l_inc = ti.compute_loglh(incremental=True)
        for it in range(12):
            e = int(edges[5 + (it % 10)])
            ti.set_branch_length(e, float(tree.lengths[e]) * 1.001)
            ti.compute_loglh(incremental=True)
            ti.compute_loglh()
        p(f"{n_taxa}x{sites}: full {l_full:.3f} inc-seed {l_inc:.3f}")

        N = 20
        # full evaluations, brlens varied per call
        t0 = time.perf_counter()
        for it in range(N):
            e = int(edges[5 + (it % 10)])
            ti.set_branch_length(e, float(tree.lengths[e]) * 1.001)
            ti.compute_loglh()
        t_full = (time.perf_counter() - t0) / N * 1e3
        # incremental evaluations, one changed edge per call (cache was
        # invalidated by the full calls? no: separate caches — reseed)
        ti.compute_loglh(incremental=True)
        t0 = time.perf_counter()
        for it in range(N):
            e = int(edges[5 + (it % 10)])
            ti.set_branch_length(e, float(tree.lengths[e]) * 1.001)
            ti.compute_loglh(incremental=True)
        t_inc = (time.perf_counter() - t0) / N * 1e3
        lf = ti.compute_loglh()
        li = ti.compute_loglh(incremental=True)
        p(f"{n_taxa}x{sites}: full {t_full:.2f} ms/eval, "
          f"incremental {t_inc:.2f} ms/eval ({t_full/t_inc:.2f}x); "
          f"parity |d|={abs(lf-li):.2e}")


main()
