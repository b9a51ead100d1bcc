"""Differentiable geometry kernels (pure JAX, vmap/jit/shard-friendly).

Everything here is dtype-polymorphic, statically shaped, and free of Python
control flow on traced values, so it composes under jit/vmap/pjit.
"""

from caliscope_tpu.ops.lie import (  # noqa: F401
    so3_exp,
    so3_log,
    quat_from_matrix,
    matrix_from_quat,
    quaternion_average,
    se3_compose,
    se3_inverse,
    se3_apply,
    se3_matrix,
    rotation_geodesic_angle,
)
from caliscope_tpu.ops.projection import (  # noqa: F401
    distort_normalized,
    project_points,
    undistort_points,
    normalized_to_pixels,
    pixels_to_normalized,
)
from caliscope_tpu.ops.triangulate import triangulate_dlt, triangulate_groups  # noqa: F401
from caliscope_tpu.ops.similarity import (  # noqa: F401
    umeyama,
    SimilarityParams,
    apply_similarity_to_points,
)
