"""Device-mesh sharding for site-pattern data parallelism.

TPU-native replacement of the reference's abstract allreduce seam
(``parallel_reduce_cb``, ``pll_tree.h:275-276``; SURVEY.md §2.10): instead of
a user-supplied MPI/pthreads callback, the pattern axis of every partition is
sharded over a ``jax.sharding.Mesh`` and XLA inserts ``psum``-style
collectives over ICI for the final site reductions. SPMD guarantees the
reference's critical invariant (every rank executes every collective in the
same order) by construction.
"""

from pllmod_tpu.parallel.sharding import (  # noqa: F401
    SITES_AXIS,
    make_mesh,
    shard_partition,
    shard_treeinfo,
    replicate,
)
from pllmod_tpu.parallel.partition_dp import (  # noqa: F401
    PARTS_AXIS,
    SITES_AXIS,
    make_parts_mesh,
    make_2d_mesh,
    stack_partitions,
    total_loglh_partition_dp,
    total_loglh_partition_dp_2d,
    treeinfo_loglh_partition_dp,
)
