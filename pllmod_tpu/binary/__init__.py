"""Binary checkpointing (TPU build of ``src/binary/``)."""

from pllmod_tpu.binary.binary import (  # noqa: F401
    BinaryFile,
    attach_skeleton,
    save_treeinfo,
    load_treeinfo,
    ACCESS_SEQUENTIAL,
    ACCESS_RANDOM,
    BLOCK_PARTITION,
    BLOCK_CLV,
    BLOCK_TREE,
    BLOCK_CUSTOM,
)
