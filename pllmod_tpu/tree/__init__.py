"""Tree layer: topology, moves, splits, consensus, constraints, treeinfo.

TPU-native equivalent of the reference's ``src/tree/`` (SURVEY.md §2.4):
trees are array-encoded (edge lists + node indices) instead of
pointer-chasing roundabout nodes; topology manipulation happens host-side
in numpy (cheap), and every topology compiles to static-shape ``ops``
index arrays consumed by the jitted likelihood engine.
"""

from pllmod_tpu.tree.topology import Tree  # noqa: F401
