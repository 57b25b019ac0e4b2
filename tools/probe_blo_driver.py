"""On-chip A/B: host BLO driver (one dispatch+sync per sub-sweep) vs the
fused on-device driver (_blo_run: whole smoothing loop in one program).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_blo_driver.py
"""
import time
import numpy as np


def main():
    import jax.numpy as jnp
    from tests import reference_impl as ref
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.optimize import blo

    rng = np.random.default_rng(11)
    n, sites = 64, 4096
    tree = ref.random_binary_tree(rng, n, 0.02, 0.6)
    seqs = ref.random_sequences(rng, n, sites)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.9,
                            subst_rates=rng.uniform(0.5, 3.0, 6),
                            freqs=rng.dirichlet([8, 8, 8, 8]),
                            dtype=jnp.float32).cache_eigen()

    for mode, od in (("host", False), ("ondevice", True)):
        # compile + warm
        t = tree.copy()
        blo.optimize_branch_lengths(part, t, on_device=od)
        times = []
        for k in range(3):
            t = tree.copy()
            t.lengths = t.lengths * (1.0 + 0.01 * k)
            t0 = time.perf_counter()
            b, lnl = blo.optimize_branch_lengths(part, t, on_device=od)
            times.append(time.perf_counter() - t0)
        print(f"{mode:9s} best-wall {min(times)*1e3:8.1f} ms  "
              f"logL {lnl:.4f}", flush=True)


if __name__ == "__main__":
    main()
