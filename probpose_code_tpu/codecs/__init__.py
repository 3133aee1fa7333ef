from .associative_embedding import AssociativeEmbedding
from .base import BaseKeypointCodec
from .decoupled_heatmap import DecoupledHeatmap
from .double_probmap import DoubleProbMap
from .misc_codecs import EDPoseLabel, Hand3DHeatmap, MotionBERTLabel, YOLOXPoseAnnotationProcessor  # noqa: F401
from .image_pose_lifting import ImagePoseLifting, VideoPoseLifting
from .integral_regression_label import IntegralRegressionLabel
from .megvii_heatmap import MegviiHeatmap
from .msra_heatmap import MSRAHeatmap
from .probmap import ArgMaxProbMap, ProbMap, UDPExpMaxHeatmap
from .regression_label import RegressionLabel
from .simcc_label import SimCCLabel
from .spr import SPR
from .udp_heatmap import UDPHeatmap

__all__ = [
    "ArgMaxProbMap",
    "AssociativeEmbedding",
    "BaseKeypointCodec",
    "DecoupledHeatmap",
    "DoubleProbMap",
    "ImagePoseLifting",
    "VideoPoseLifting",
    "IntegralRegressionLabel",
    "MSRAHeatmap",
    "MegviiHeatmap",
    "ProbMap",
    "RegressionLabel",
    "SPR",
    "SimCCLabel",
    "UDPExpMaxHeatmap",
    "UDPHeatmap",
]
