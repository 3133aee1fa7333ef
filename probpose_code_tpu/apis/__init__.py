from .inference import inference_bottomup, inference_topdown, init_model, load_weights

__all__ = ["inference_bottomup", "inference_topdown", "init_model", "load_weights"]
