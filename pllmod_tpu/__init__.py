"""pllmod_tpu — a TPU-native phylogenetic likelihood framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ddarriba/pll-modules + libpll-2 (the compute core of RAxML-NG):

- Felsenstein-pruning conditional likelihood vectors (CLVs) as batched
  tensor ops over ``[patterns, rate_categories, states]`` arrays, with
  exact power-of-two rescaling,
- eigendecomposed GTR-family transition matrices computed in XLA,
- analytic first/second branch-length derivatives (sumtable form),
- Newton / Brent / L-BFGS-B / EM parameter optimization with *analytic*
  gradients via autodiff,
- SPR-round tree search with batched regraft candidate scoring,
- model registries (DNA / protein / genotype / multistate),
- MSA statistics, RF distance / consensus / transfer bootstrap utilities,
- checkpointing,
- site-pattern data parallelism over a ``jax.sharding.Mesh`` (psum over ICI).

Layer map (mirrors SURVEY.md section 1):

- ``pllmod_tpu.ops``        — L1: the compute kernels (libpll-2 equivalent)
- ``pllmod_tpu.tree``       — L2/L3: topology, splits, consensus, treeinfo
- ``pllmod_tpu.msa``        — L2: alignment IO / statistics
- ``pllmod_tpu.utils``      — L2: substitution-model registry
- ``pllmod_tpu.binary``     — L2: checkpointing
- ``pllmod_tpu.optimize``   — L3: minimizers + branch-length optimization
- ``pllmod_tpu.algorithm``  — L4: model-parameter optimization + SPR search
- ``pllmod_tpu.parallel``   — device-mesh sharding helpers
"""

__version__ = "0.1.0"

from pllmod_tpu import common  # noqa: F401

# convenience top-level API (heavier modules import lazily underneath)
from pllmod_tpu.ops.partition import (  # noqa: F401
    Partition,
    create_partition,
    make_asc_partition,
)
from pllmod_tpu.ops.engine import tree_loglikelihood  # noqa: F401
from pllmod_tpu.tree import Tree, TreeInfo, RTree, Constraint  # noqa: F401
