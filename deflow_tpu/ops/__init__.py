from .pose import cal_pose0to1, transform_points
from .voxel import (
    VoxelConfig,
    PillarInfo,
    compute_pillar_info,
    pillar_centroids,
    pillar_mean_scatter,
    pillar_max_scatter,
    pseudoimage_gather,
)
from .chamfer import NNSpec, chamfer_distance, truncated_chamfer_loss
