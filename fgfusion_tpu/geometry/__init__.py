from .se3 import (  # noqa: F401
    se3_init,
    se3_cat,
    se3_inv,
    se3_transform,
    se3_compare,
    compute_rigid_transform,
    fast_compute_rigid_transform,
    sinkhorn,
)
