from .base_metric import BaseMetric, Evaluator, MultiDatasetEvaluator
from .cocoeval import COCOeval, Params
from .functional.keypoint_eval import (
    keypoint_auc,
    keypoint_epe,
    keypoint_nme,
    keypoint_pck_accuracy,
    multilabel_classification_accuracy,
    pose_pck_accuracy,
    simcc_pck_accuracy,
)
from .functional.nms import (
    bbox_nms_np,
    bbox_overlaps_np,
    nearby_joints_nms,
    nms,
    oks_iou,
    oks_nms,
    soft_oks_nms,
)
from .metrics.coco_metric import CocoMetric
from .metrics.keypoint_3d_metrics import MPJPE, SimpleMPJPE
from .metrics.keypoint_2d_metrics import AUC, EPE, NME, JhmdbPCKAccuracy, MpiiPCKAccuracy, PCKAccuracy
from .metrics.wholebody_and_more import (
    CocoWholeBodyMetric,
    InterHandMetric,
    KeypointPartitionMetric,
    PoseTrack18Metric,
)

__all__ = [
    "AUC",
    "BaseMetric",
    "EPE",
    "JhmdbPCKAccuracy",
    "MPJPE",
    "SimpleMPJPE",
    "MpiiPCKAccuracy",
    "NME",
    "PCKAccuracy",
    "COCOeval",
    "CocoMetric",
    "CocoWholeBodyMetric",
    "InterHandMetric",
    "KeypointPartitionMetric",
    "PoseTrack18Metric",
    "Evaluator",
    "MultiDatasetEvaluator",
    "Params",
    "bbox_nms_np",
    "bbox_overlaps_np",
    "keypoint_auc",
    "keypoint_epe",
    "keypoint_nme",
    "keypoint_pck_accuracy",
    "multilabel_classification_accuracy",
    "nearby_joints_nms",
    "nms",
    "oks_iou",
    "oks_nms",
    "pose_pck_accuracy",
    "simcc_pck_accuracy",
    "soft_oks_nms",
]
