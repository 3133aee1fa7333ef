from .mesh import make_mesh, shard_batch
from .train_step import TrainState, create_train_state, make_train_step

__all__ = ["TrainState", "create_train_state", "make_mesh", "make_train_step", "shard_batch"]
