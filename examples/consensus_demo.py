#!/usr/bin/env python
"""Consensus-tree demo (reference: examples/consensus + weight-consensus).

Usage: python examples/consensus_demo.py trees.nwk [threshold]
       python examples/consensus_demo.py            # built-in demo
"""

import sys

sys.path.insert(0, ".")

from pllmod_tpu.tree import Tree
from pllmod_tpu.tree.consensus import consensus, consensus_from_file
from pllmod_tpu.tree.utils import newick_with_support


def main():
    if len(sys.argv) >= 2:
        threshold = float(sys.argv[2]) if len(sys.argv) >= 3 else 0.5
        tree, supports = consensus_from_file(sys.argv[1], threshold)
    else:
        newicks = [
            "(((a:1,b:1):1,c:1):1,(d:1,e:1):1,f:1);",
            "(((a:1,b:1):1,c:1):1,(d:1,f:1):1,e:1);",
            "(((a:1,b:1):1,d:1):1,(c:1,e:1):1,f:1);",
        ]
        trees = [Tree.from_newick(n) for n in newicks]
        threshold = 0.5
        # weighted consensus: first tree counts double
        tree, supports = consensus(trees, threshold,
                                   weights=[0.5, 0.25, 0.25])
        print("weighted majority-rule consensus (w = .5/.25/.25):")
    print(newick_with_support(tree, supports, as_fraction=True))
    print(f"threshold: {threshold}, splits kept: {len(supports)}")


if __name__ == "__main__":
    main()
