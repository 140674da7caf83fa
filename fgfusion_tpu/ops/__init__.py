from .voxel import grid_subsample  # noqa: F401
from .neighbors import radius_knn  # noqa: F401
from .pyramid import build_pyramid, PyramidSpec  # noqa: F401
