from .camera import SimpleCamera
from .misc import (
    RunningAverage,
    StopWatch,
    collect_env,
    reduce_mean,
    register_all_modules,
    to_numpy,
)

__all__ = [
    "RunningAverage",
    "SimpleCamera",
    "StopWatch",
    "collect_env",
    "reduce_mean",
    "register_all_modules",
    "to_numpy",
]
