#!/usr/bin/env python
"""RF-distance demo (reference: examples/rf-distance).

Usage: python examples/rf_distance_demo.py trees.nwk
       computes the pairwise RF matrix over all trees in the file;
       without arguments runs a small built-in demo.
"""

import sys

sys.path.insert(0, ".")

import numpy as np
from pllmod_tpu.tree import Tree
from pllmod_tpu.tree.splits import (tree_splits, rf_distance_splits,
                                    max_rf_distance)
from pllmod_tpu.tree.topology import set_tip_order


def main():
    if len(sys.argv) >= 2:
        with open(sys.argv[1]) as fh:
            newicks = [l.strip() for l in fh if l.strip()]
    else:
        newicks = [
            "((a:1,b:1):1,(c:1,d:1):1,e:1);",
            "((a:1,b:1):1,(c:1,e:1):1,d:1);",
            "((a:1,c:1):1,(b:1,d:1):1,e:1);",
        ]
    trees = [Tree.from_newick(n) for n in newicks]
    ref = trees[0]
    splits = []
    for t in trees:
        if t.labels != ref.labels:
            t = set_tip_order(t, ref.labels)
        splits.append(tree_splits(t)[0])
    n = len(trees)
    mat = np.zeros((n, n), int)
    for i in range(n):
        for j in range(i + 1, n):
            mat[i, j] = mat[j, i] = rf_distance_splits(splits[i], splits[j])
    print(f"{n} trees, {ref.n_tips} taxa, max RF = "
          f"{max_rf_distance(ref.n_tips)}")
    print(mat)
    rel = mat / max_rf_distance(ref.n_tips)
    print("relative:")
    print(np.round(rel, 3))


if __name__ == "__main__":
    main()
