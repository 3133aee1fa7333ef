from .loss_wrappers import CombinedLoss, MultipleLossWrapper  # noqa: F401
from .ae_loss import AssociativeEmbeddingLoss
from .bbox_loss import IoULoss
from .classification_loss import (
    BCELoss,
    InfoNCELoss,
    JSDiscretLoss,
    KLDiscretLoss,
    VariFocalLoss,
)
from .heatmap_loss import (
    AdaptiveWingLoss,
    CalibrationLoss,
    CombinedTargetMSELoss,
    FocalHeatmapLoss,
    KeypointMSELoss,
    KeypointOHKMMSELoss,
    MLECCLoss,
    OKSHeatmapLoss,
)
from .regression_loss import (
    L1Loss,
    OKSLoss,
    L1LogLoss,
    MPJPELoss,
    MPJPEVelocityJointLoss,
    MSELoss,
    RLELoss,
    SmoothL1Loss,
    SoftWeightSmoothL1Loss,
    SoftWingLoss,
    WingLoss,
)

__all__ = [
    "AdaptiveWingLoss",
    "IoULoss",
    "MLECCLoss",
    "OKSLoss",
    "AssociativeEmbeddingLoss",
    "BCELoss",
    "CalibrationLoss",
    "CombinedTargetMSELoss",
    "FocalHeatmapLoss",
    "InfoNCELoss",
    "JSDiscretLoss",
    "KLDiscretLoss",
    "KeypointMSELoss",
    "KeypointOHKMMSELoss",
    "L1Loss",
    "L1LogLoss",
    "MPJPELoss",
    "MPJPEVelocityJointLoss",
    "MSELoss",
    "OKSHeatmapLoss",
    "RLELoss",
    "SmoothL1Loss",
    "CombinedLoss",
    "MultipleLossWrapper",
    "SoftWeightSmoothL1Loss",
    "SoftWingLoss",
    "VariFocalLoss",
    "WingLoss",
]
