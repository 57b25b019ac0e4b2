"""High-level drivers (TPU build of the reference's ``src/algorithm/``).

- :mod:`pllmod_tpu.algorithm.opt_model` — model-parameter optimization over
  treeinfo partitions (``pllmod_algorithm.c`` + ``algo_callback.c``)
- :mod:`pllmod_tpu.algorithm.spr` — SPR-round topology search with batched
  regraft candidate scoring (``algo_search.c``)
"""

from pllmod_tpu.algorithm.opt_model import (  # noqa: F401
    opt_alpha,
    opt_onedim_custom,
    opt_pinv,
    opt_alpha_pinv,
    opt_subst_rates,
    opt_frequencies,
    opt_rates_weights,
    opt_brlen_scalers,
    opt_brlen,
    opt_model,
)
from pllmod_tpu.algorithm.spr import spr_round  # noqa: F401
from pllmod_tpu.algorithm.search import (  # noqa: F401
    ml_search,
    SearchResult,
    SearchRound,
)
from pllmod_tpu.algorithm.ancestral import (  # noqa: F401
    ancestral_probabilities,
    ancestral_states,
)
