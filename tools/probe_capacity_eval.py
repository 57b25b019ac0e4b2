"""Capacity-eval throughput at 10k taxa x 100k patterns (round-5
item 2): marginal per-eval time via an ON-DEVICE fori_loop over varying
brlens (per PERF_NOTES methodology: the axon runtime memoizes identical
executions and adds ~40 ms dispatch + first-exec costs), A/B of the
Sethi-Ullman serial order (75% fenced rows) vs the pipelined peephole
order (0.5% fences, +24 slots). Also decomposes the partition-build
wall (encode / compress / device upload). Writes
tools/probe_capacity_eval.out."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def p(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial as fpartial
    from jax import lax
    from pllmod_tpu.ops.partition import create_partition, compress_patterns
    from pllmod_tpu.ops import clv as clv_mod, engine, charmap
    from tests import reference_impl as ref

    import os
    n_taxa, n_sites = 10_000, 100_000
    rng = np.random.default_rng(3)
    tree = ref.random_binary_tree(rng, n_taxa, min_len=0.02, max_len=0.4)
    cache = f"/tmp/blo_bounded_{n_taxa}x{n_sites}_s3.npz"
    ascii4 = np.frombuffer(b"ACGT", np.uint8)
    if not os.path.exists(cache):      # /tmp survives only per-boot
        t0 = time.perf_counter()
        seqs = ref.simulated_sequences(rng, tree, n_sites)
        lut = np.zeros(256, np.int8)
        lut[ascii4] = np.arange(4)
        codes = np.stack([lut[np.frombuffer(s.encode(), np.uint8)]
                          for s in seqs])
        np.savez_compressed(cache, codes=codes, lengths=tree.lengths)
        p(f"simulated + cached in {time.perf_counter()-t0:.0f}s")
    dat = np.load(cache)
    codes = np.ascontiguousarray(dat["codes"])
    tree.lengths = dat["lengths"]
    t0 = time.perf_counter()
    blob = ascii4[codes].tobytes()
    seqs = [blob[i * n_sites:(i + 1) * n_sites].decode("ascii")
            for i in range(n_taxa)]
    p(f"decode: {time.perf_counter()-t0:.1f}s")
    # ---- partition build decomposition --------------------------------
    t0 = time.perf_counter()
    cmap = charmap.DNA
    enc, code_masks = cmap.encode(seqs)
    p(f"charmap encode: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    enc_c, w_c = compress_patterns(enc, np.ones(n_sites))
    p(f"compress ({enc_c.shape[1]} patterns): "
      f"{time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    dev = jax.device_put(jnp.asarray(np.ascontiguousarray(
        enc_c.astype(np.int8)))).astype(jnp.int32)
    jax.block_until_ready(dev)
    dt = time.perf_counter() - t0
    gb = dev.size / 1e9
    p(f"tip upload int8+upcast (production, ops/partition.py): "
      f"{gb:.1f} GB wire in {dt:.1f}s ({gb/dt*1000:.0f} MB/s)")
    del dev
    t0 = time.perf_counter()
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.9,
                            dtype=jnp.float32, pattern_pad=256)
    part = part.cache_eigen()
    p(f"create_partition total: {time.perf_counter()-t0:.1f}s")
    if "--build-only" in sys.argv:
        p("done (build-only)")
        return
    tree.lengths = np.clip(tree.lengths * 2.5 + 0.03, 1e-4, 10.0)

    # ---- eval A/B -----------------------------------------------------
    from pllmod_tpu.ops import pallas_clv
    ops, root_info = tree.traversal_ops()
    u, v, e = (int(x) for x in root_info)
    brlens0 = jnp.asarray(tree.lengths.astype(np.float32))

    @fpartial(jax.jit, static_argnames=("n_slots", "iters"))
    def timed(partition, idx8, brlens, e1, e2, rr, n_slots, iters):
        def body(i, acc):
            lnl = engine._bounded_fused_eval(
                partition, idx8, brlens * (1.0 + 1e-6 * i), e1, e2, rr,
                n_slots, False)
            return acc + lnl
        return lax.fori_loop(0, iters, body, jnp.float32(0))

    for name, builder in (
            ("SU-order ", clv_mod.bounded_slot_ops),
            ("pipelined", clv_mod.bounded_slot_ops_pipelined)):
        ops_b, ns, sm = builder(np.asarray(ops), n_taxa,
                                root_refs=(u, v))
        idx8, e1, e2, n_slots = pallas_clv.compile_fused_ops(
            part, np.asarray(ops_b), serial=True)
        fences = int(np.asarray(idx8)[:, 7].sum())

        def remap(x):
            return x if x < n_taxa else n_taxa + int(sm[x - n_taxa])

        rr = jnp.asarray(np.asarray((remap(u), remap(v), e), np.int32))
        t0 = time.perf_counter()
        r = timed(part, idx8, brlens0, e1, e2, rr, n_slots, 1)
        jax.block_until_ready(r)
        p(f"{name}: slots={ns} fences={fences} "
          f"compile+1: {time.perf_counter()-t0:.0f}s")
        for trial in range(2):
            t0 = time.perf_counter()
            r = timed(part, idx8, brlens0 * (1.01 + trial / 100),
                      e1, e2, rr, n_slots, 20)
            jax.block_until_ready(r)
            dt20 = time.perf_counter() - t0
            ups = 20 * (n_taxa - 2) * part.n_patterns / dt20
            p(f"{name}: 20 evals {dt20:.2f}s = {dt20/20*1000:.0f} "
              f"ms/eval -> {ups:.2e} updates/s")
    p("done")


if __name__ == "__main__":
    main()
