"""Loss wrappers (reference ``mmpose/models/losses/loss_wrappers.py``):

- ``MultipleLossWrapper``: a list of losses applied pairwise to lists of
  (input, target) — multi-output heads (e.g. integral regression with a
  heatmap auxiliary) configure one loss per output.
- ``CombinedLoss``: a name->loss bag whose members are invoked
  individually (attribute access), for heads mixing representation types.
"""

from __future__ import annotations

from typing import Dict, List

from probpose_code_tpu.registry import MODELS


@MODELS.register_module()
class MultipleLossWrapper:
    def __init__(self, losses: List[dict]):
        self.num_losses = len(losses)
        self.loss_modules = [MODELS.build(cfg) for cfg in losses]

    def __call__(self, input_list, target_list, keypoint_weights=None):
        assert isinstance(input_list, (list, tuple))
        assert isinstance(target_list, (list, tuple))
        assert len(input_list) == len(target_list)
        return [
            loss(inp, tgt, keypoint_weights)
            for loss, inp, tgt in zip(self.loss_modules, input_list, target_list)
        ]


@MODELS.register_module()
class CombinedLoss:
    def __init__(self, losses: Dict[str, dict]):
        self._names = list(losses)
        for name, cfg in losses.items():
            setattr(self, name, MODELS.build(cfg))

    def items(self):
        return [(n, getattr(self, n)) for n in self._names]
