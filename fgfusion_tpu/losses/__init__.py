from .feature_loss import InfoNCELossFull, CircleLossFull  # noqa: F401
from .corr_loss import corr_criterion  # noqa: F401
