from . import data_preprocessors  # noqa: F401  (registers batch augs)
from . import losses  # noqa: F401  (registers loss modules)
from . import necks  # noqa: F401  (registers neck modules)
from .backbones.classic import (  # noqa: F401
    AlexNet,
    MobileNetV3,
    RegNet,
    SCNet,
    SEResNet,
    SEResNeXt,
    ShuffleNetV1,
    ShuffleNetV2,
    VGG,
)
from .backbones.csp_darknet import CSPDarknet  # noqa: F401
from .backbones.litehrnet import LiteHRNet, ResNeSt  # noqa: F401
from .backbones.multistage import CPM, MSPN, RSN, HourglassAENet, HourglassNet  # noqa: F401
from .backbones.nas_and_3d import (  # noqa: F401
    HRFormer,
    V2VNet,
    ViPNAS_MobileNetV3,
    ViPNAS_ResNet,
)
from .backbones.transformers import (  # noqa: F401
    DSTFormer,
    PyramidVisionTransformer,
    PyramidVisionTransformerV2,
    SwinTransformer,
)
from .backbones.cspnext import CSPNeXt  # noqa: F401
from .backbones.hrnet import HRNet  # noqa: F401
from .backbones.mobilenet_v2 import MobileNetV2  # noqa: F401
from .backbones.resnet import ResNet, ResNetV1d, ResNeXt  # noqa: F401
from .backbones.tcn import TCN  # noqa: F401
from .backbones.vit import VisionTransformer  # noqa: F401
from .builder import PoseModel, build_loss_modules, build_pose_estimator  # noqa: F401
from .data_preprocessors import PoseDataPreprocessor  # noqa: F401
from .detectors import RTMDet, RTMDetSepBNHead  # noqa: F401
from .distillers import DWPoseDistiller, FeaLoss, KDLoss  # noqa: F401
from .heads.heatmap_head import HeatmapHead  # noqa: F401
from .heads.cid_head import CIDHead  # noqa: F401
from .heads.edpose_head import EDPoseTPUHead  # noqa: F401
from .heads.edpose_legacy import EDPoseHead  # noqa: F401
from .heads.internet_head import InternetHead, PoseWarperNeck  # noqa: F401
from .heads.multistage_heads import CPMHead, MSPNHead, ViPNASHead  # noqa: F401
from .heads.probmap_head import DoubleProbMapHead, ProbMapHead  # noqa: F401
from .heads.regression_heads import (  # noqa: F401
    DSNTHead,
    IntegralRegressionHead,
    MotionRegressionHead,
    RLEHead,
    RegressionHead,
    VisPredictHead,
)
from .heads.rtmcc_head import RTMCCHead, RTMWHead, SimCCHead  # noqa: F401
from .heads.rtmo_head import DCC, RTMOHead, RTMOHeadModule  # noqa: F401
from .heads.yoloxpose_head import YOLOXPoseHead, YOLOXPoseHeadModule  # noqa: F401
from .necks.hybrid_encoder import HybridEncoder, YOLOXPAFPN  # noqa: F401
from . import task_modules  # noqa: F401  (registers assigners/prior generators)
from .pose_estimators.bottomup import (  # noqa: F401
    AssociativeEmbeddingHead,
    BottomupPoseEstimator,
    DEKRHead,
)
from .pose_estimators.pose_lifter import (  # noqa: F401
    PoseLifter,
    TemporalRegressionHead,
    TrajectoryRegressionHead,
)
from .pose_estimators.topdown import TopdownPoseEstimator  # noqa: F401

__all__ = [
    "CSPNeXt",
    "HRNet",
    "HeatmapHead",
    "PoseModel",
    "ProbMapHead",
    "DoubleProbMapHead",
    "RTMCCHead",
    "SimCCHead",
    "TopdownPoseEstimator",
    "VisionTransformer",
    "build_loss_modules",
    "build_pose_estimator",
]
