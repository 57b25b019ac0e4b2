"""L1 compute core — the TPU-native equivalent of libpll-2 (SURVEY.md §2.9).

Submodules:

- ``charmap``     — character-state encodings (DNA/AA/genotype/multistate)
- ``gamma``       — discrete Gamma rate heterogeneity + p-inv
- ``eigen``       — rate-matrix build, eigendecomposition, P-matrices
- ``clv``         — Felsenstein-pruning CLV update engine
- ``likelihood``  — edge/root log-likelihood (+ per-site, ancestral)
- ``derivatives`` — sumtable + analytic (dlogL/dt, d2logL/dt2)
- ``partition``   — the Partition pytree (pll_partition_t equivalent)
"""

from pllmod_tpu.ops import charmap, gamma, eigen  # noqa: F401
