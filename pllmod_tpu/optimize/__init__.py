"""Optimization layer (TPU build of the reference's ``src/optimize/``).

- :mod:`pllmod_tpu.optimize.newton` — vectorized bracketed Newton-Raphson
  (``pllmod_opt_minimize_newton_multi``, opt_algorithms.c:133-261)
- :mod:`pllmod_tpu.optimize.blo` — branch-length optimization on all edges
  at once from directed CLVs (``pllmod_opt_optimize_branch_lengths_*``)
- :mod:`pllmod_tpu.optimize.blo_bounded` — memory-bounded O(n log n)
  whole-tree BLO (the reference's recomp_iterative regime,
  pll_optimize.c:778-926, as a segmented heavy-path Euler walk on the
  fused megakernel — the north-star capacity mode)
- :mod:`pllmod_tpu.optimize.brent` — vectorized Brent 1-D minimization
  (opt_algorithms.c:809-1467)
- :mod:`pllmod_tpu.optimize.lbfgsb` — bound-constrained L-BFGS with
  analytic gradients (replaces the vendored f2c lbfgsb + finite
  differences, opt_algorithms.c:418-807)
- :mod:`pllmod_tpu.optimize.em` — EM for rate/weight mixtures
  (opt_algorithms.c:1473-1546)
- :mod:`pllmod_tpu.optimize.params` — generic masked parameter-vector
  optimization, one L-BFGS/Brent run over any PARAM_* combination
  (``pllmod_opt_optimize_onedim/multidim``, pll_optimize.c:411-742)
"""

from pllmod_tpu.optimize.newton import minimize_newton_multi  # noqa: F401
from pllmod_tpu.optimize.blo import (  # noqa: F401
    DirectedTraversal,
    optimize_branch_lengths,
    optimize_branch_lengths_chunked,
)
from pllmod_tpu.optimize.blo_bounded import (  # noqa: F401
    BoundedSweepSchedule,
    optimize_branch_lengths_bounded,
)
from pllmod_tpu.optimize.brent import minimize_brent_multi  # noqa: F401
from pllmod_tpu.optimize.lbfgsb import minimize_lbfgsb  # noqa: F401
from pllmod_tpu.optimize.em import em_rates_weights  # noqa: F401
from pllmod_tpu.optimize.params import (  # noqa: F401
    optimize_onedim,
    optimize_multidim,
)
