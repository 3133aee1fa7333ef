"""Example custom head (counterpart of reference
``projects/example_project/models/example_head.py``): subclass a zoo head,
register it, and reference it from a config via ``custom_imports``."""

from probpose_code_tpu.models.heads.heatmap_head import HeatmapHead
from probpose_code_tpu.registry import MODELS


@MODELS.register_module()
class ExampleHead(HeatmapHead):
    """A HeatmapHead clone registered under a project-local name.

    Implement the head as a normal flax module; the estimator resolves its
    losses/decoder from the config exactly like for built-in heads.
    """

    def __call__(self, feats, train: bool = False):
        return super().__call__(feats, train=train)
