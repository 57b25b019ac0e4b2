"""Constrained ML tree search.

The RAxML-NG ``--tree-constraint`` workflow on pllmod_tpu primitives
(reference machinery: utree_constraint.c + the clv_index_map plumbing of
pll_tree.c:1110-1200):

1. a multifurcating, possibly non-comprehensive constraint tree defines
   the split set every visited topology must contain,
2. the starting tree resolves the constraint by PARSIMONY
   (resolve_multi_parsimony: random resolution + constrained parsimony
   SPR rounds),
3. ml_search restricts every SPR to constraint-compatible topologies
   (fast single-split filter + apply-time full check with rollback).
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from pllmod_tpu.ops.charmap import DNA  # noqa: E402
from pllmod_tpu.ops.partition import create_partition  # noqa: E402
from pllmod_tpu.tree import Tree, TreeInfo  # noqa: E402
from pllmod_tpu.tree.constraint import Constraint  # noqa: E402
from pllmod_tpu.tree.starting import resolve_multi_parsimony  # noqa: E402
from pllmod_tpu.algorithm.search import ml_search  # noqa: E402


def main():
    rng = np.random.default_rng(7)
    n = 10
    labels = [f"t{i}" for i in range(n)]
    seqs = ["".join(rng.choice(list("ACGT"), 200)) for _ in range(n)]

    # constraint: {t0..t3} and {t6..t9} must each stay monophyletic
    cons = Tree.from_newick(
        "((t0:1,t1:1,t2:1,t3:1):1,(t4:1,t5:1):1,(t6:1,t7:1,t8:1,t9:1):1);")

    start, steps = resolve_multi_parsimony(cons, [(seqs, DNA, None)],
                                           seed=1, max_spr_rounds=3)
    print(f"constrained parsimony start: {steps} steps")

    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8)
    constraint = Constraint(cons, start.labels)
    assert constraint.check_tree(start)

    ti = TreeInfo(start, [part])
    res = ml_search(ti, radius_max=6, max_rounds=6, thorough=True,
                    constraint=constraint)
    ok = constraint.check_tree(ti.tree)
    print(f"final logL {res.loglh:.4f} after {res.n_rounds} rounds; "
          f"constraint satisfied: {ok}")
    assert ok
    print(ti.tree.to_newick())


if __name__ == "__main__":
    main()
