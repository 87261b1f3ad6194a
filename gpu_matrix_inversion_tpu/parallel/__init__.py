"""Multi-chip execution: device meshes and panel-sharded inversion.

The reference runs on exactly one GPU (``platforms[0]/devices[0]``,
matrix_inversion_FP32.cpp:293; SURVEY.md section 2 parallelism checklist).
This package is the scaling story the reference never had: the augmented
system column-sharded over an ICI mesh via ``shard_map``, one pivot-panel
broadcast (``psum``) per panel, trailing updates as local MXU GEMMs
(BASELINE.md configs[4], 16384^2 beyond single-chip HBM).
"""

from gpu_matrix_inversion_tpu.parallel.mesh import make_device_mesh
from gpu_matrix_inversion_tpu.parallel.sharded import (
    sharded_blocked_inverse,
    sharded_batched_inverse,
)

__all__ = [
    "make_device_mesh",
    "sharded_blocked_inverse",
    "sharded_batched_inverse",
]
