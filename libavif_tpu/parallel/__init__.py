"""Multi-chip sharding: grid cells and animation frames over a device mesh.

The reference is single-process; its concurrency axes (SURVEY.md §2.4) map
to mesh axes here:

  AV1 tiles within a frame   -> intra-chip blocking (Pallas grid, kernels)
  grid image cells           -> "cells" mesh axis (spatial parallelism)
  animation frames / GOPs    -> "frames" mesh axis (data parallelism)

Collectives ride ICI via jax.sharding + shard_map (no NCCL/MPI — the
reference has none either; pthreads row-slicing reformat.c:1611-1748 is
replaced by whole-array device ops).
"""

from .shard import (  # noqa: F401
    CODEC_MESH_AXES,
    encode_cells_sharded,
    decode_cells_sharded,
    exchange_cell_boundaries,
    make_codec_mesh,
)
