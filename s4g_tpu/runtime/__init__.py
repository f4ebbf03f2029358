from .host_ops import (native_available, voxel_downsample_trace,
                       radius_outlier_mask, nearest_neighbor_match)
from .loader import AsyncSceneLoader
