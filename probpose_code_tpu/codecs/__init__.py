from .base import BaseKeypointCodec
from .msra_heatmap import MSRAHeatmap
from .probmap import ArgMaxProbMap, ProbMap, UDPExpMaxHeatmap
from .regression_label import RegressionLabel
from .simcc_label import SimCCLabel
from .udp_heatmap import UDPHeatmap

__all__ = [
    "ArgMaxProbMap",
    "BaseKeypointCodec",
    "MSRAHeatmap",
    "ProbMap",
    "RegressionLabel",
    "SimCCLabel",
    "UDPExpMaxHeatmap",
    "UDPHeatmap",
]
