from .afm import afm
from .bilinear import bilinear_interpolate
from .crossfield import (
    angle_to_z,
    c0c2_to_uv,
    closest_in_uv,
    crossfield_to_c0c2,
    framefield_align_error,
    laplacian_penalty,
    uv_to_c0c2,
)
from .segment import (
    rank_in_run,
    run_starts,
    segment_max,
    segment_mean,
    segment_sum,
)
from .sinkhorn import log_optimal_transport, log_sinkhorn
from .spatial_grad import spatial_gradient
from .voxelize import PillarAssignment, assign_pillars, scatter_pillars, voxelize_batch

__all__ = [
    "afm",
    "bilinear_interpolate",
    "angle_to_z",
    "c0c2_to_uv",
    "closest_in_uv",
    "crossfield_to_c0c2",
    "framefield_align_error",
    "laplacian_penalty",
    "uv_to_c0c2",
    "rank_in_run",
    "run_starts",
    "segment_max",
    "segment_mean",
    "segment_sum",
    "log_optimal_transport",
    "log_sinkhorn",
    "spatial_gradient",
    "PillarAssignment",
    "assign_pillars",
    "scatter_pillars",
    "voxelize_batch",
]
