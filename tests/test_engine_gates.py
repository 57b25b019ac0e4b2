"""Shape gates for the production kernels (engine.use_fast_kernel /
fast_eval_schedule / use_split_clv) — rules measured on-chip (PERF_NOTES
"CS crossover + kernel-shape constraints"): Mosaic rejects partial
sublane slices with CS % 8 != 0 (except CS=4 on the fused kernel), the
resident/fused crossover sits at CS=32, and split runs storage mode
(bf16x2 CLVs) for states ≤ 8 and read-time mode (f32 CLVs) for wider
models — every fast-kernel shape measured inside the 1e-6 parity bar
on-chip after the _bf16_residual pack fix."""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops import engine
from pllmod_tpu.ops import charmap
from pllmod_tpu.ops.partition import create_partition


def _part(states, cats):
    rng = np.random.default_rng(0)
    syms = charmap.MULTI_SYMBOLS[:states]
    seqs = ["".join(np.array(list(syms))[rng.integers(0, states, 16)])
            for _ in range(4)]
    nr = states * (states - 1) // 2
    return create_partition(seqs, states=states, n_rate_cats=cats,
                            charmap=charmap.multistate(states),
                            alpha=0.8 if cats > 1 else None,
                            subst_rates=np.ones(nr),
                            freqs=np.full(states, 1.0 / states),
                            dtype=jnp.float32)


@pytest.mark.parametrize("states,cats,fast,sched,split", [
    (4, 4, True, "resident", True),     # DNA+G4, CS=16
    (4, 8, True, "resident", True),     # CS=32 (crossover tie)
    (4, 1, True, "fused", True),        # CS=4: fused-only, split ok
    (10, 4, True, "fused", "read"),     # GT10+G4, CS=40: read-time split
    (16, 4, True, "fused", "read"),     # GT16+G4, CS=64
    (20, 4, True, "fused", "read"),     # protein+G4, CS=80
    (20, 1, False, None, False),        # CS=20: Mosaic-rejected -> XLA
    (5, 4, False, None, False),         # CS=20 odd-state
])
def test_kernel_shape_gates(monkeypatch, states, cats, fast, sched, split):
    from pllmod_tpu import common
    monkeypatch.setattr(common, "is_tpu", lambda: True)
    monkeypatch.setattr(engine, "FORCE_FAST_KERNEL", None)
    part = _part(states, cats)
    assert engine.use_fast_kernel(part) is fast
    if fast:
        assert engine.fast_eval_schedule(part) == sched
    assert engine.use_split_clv(part) == split


def test_force_and_zero_arg_behavior(monkeypatch):
    from pllmod_tpu import common
    monkeypatch.setattr(common, "is_tpu", lambda: True)
    part = _part(20, 1)                  # CS=20
    monkeypatch.setattr(engine, "FORCE_FAST_KERNEL", True)
    assert engine.use_fast_kernel(part) is True   # tests override the gate
    monkeypatch.setattr(engine, "SPLIT_CLV", False)
    assert engine.use_split_clv(part) is False
    monkeypatch.setattr(engine, "SPLIT_CLV", None)
    assert engine.use_split_clv() is True         # zero-arg = platform only
