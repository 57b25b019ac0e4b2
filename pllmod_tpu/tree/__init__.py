"""Tree layer: topology, moves, splits, consensus, constraints, treeinfo.

TPU-native equivalent of the reference's ``src/tree/`` (SURVEY.md §2.4):
trees are array-encoded (edge lists + node indices) instead of
pointer-chasing roundabout nodes; topology manipulation happens host-side
in numpy (cheap), and every topology compiles to static-shape ``ops``
index arrays consumed by the jitted likelihood engine.
"""

from pllmod_tpu.tree.topology import Tree, parse_newick, set_tip_order  # noqa: F401
from pllmod_tpu.tree.treeinfo import TreeInfo  # noqa: F401
from pllmod_tpu.tree.rtree import RTree  # noqa: F401
from pllmod_tpu.tree.constraint import Constraint  # noqa: F401
from pllmod_tpu.tree import moves, splits, consensus, tbe, starting, utils  # noqa: F401
