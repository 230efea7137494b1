"""Pure geometry / sampling / splatting ops.

Everything here is a pure jnp function (plus Pallas kernels for hot
paths), batch-first, fp32 unless stated otherwise.
"""

from dir_tpu.ops.rotation import (
    quat_to_rotmat,
    batch_rodrigues,
    rodrigues,
    rot6d_to_rotmat,
    robust_rot6d_to_rotmat,
    rot6d_to_rotmat_gs,
    rotmat_to_axis_angle,
    posemap_axisang,
    subtract_flat_id,
)
from dir_tpu.ops.projection import (
    ortho_project,
    uvd_to_xyz,
    xyz_to_uvd,
    xyz_to_uv,
)
from dir_tpu.ops.sampling import grid_sample_nhwc
from dir_tpu.ops.bone_splat import bone_splat

__all__ = [
    "quat_to_rotmat",
    "batch_rodrigues",
    "rodrigues",
    "rot6d_to_rotmat",
    "robust_rot6d_to_rotmat",
    "rot6d_to_rotmat_gs",
    "rotmat_to_axis_angle",
    "posemap_axisang",
    "subtract_flat_id",
    "ortho_project",
    "uvd_to_xyz",
    "xyz_to_uvd",
    "xyz_to_uv",
    "grid_sample_nhwc",
    "bone_splat",
]
