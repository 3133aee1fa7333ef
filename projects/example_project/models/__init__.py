from .example_head import ExampleHead
from .example_loss import ExampleLoss

__all__ = ["ExampleHead", "ExampleLoss"]
