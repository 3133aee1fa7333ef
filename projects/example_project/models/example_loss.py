"""Example custom loss (counterpart of reference
``projects/example_project/models/example_loss.py``)."""

from probpose_code_tpu.models.losses.heatmap_loss import KeypointMSELoss
from probpose_code_tpu.registry import MODELS


@MODELS.register_module()
class ExampleLoss(KeypointMSELoss):
    """KeypointMSELoss under a project-local name; pure jittable callable."""
