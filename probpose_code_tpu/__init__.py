"""probpose_code_tpu — a TPU-native 2D human pose estimation framework.

A from-scratch rebuild of the capabilities of ProbPose (CVPR 2025) / MMPose
v1.3.1 designed for TPU hardware: JAX/XLA/Pallas compute programs, pjit/mesh
data parallelism, host-side NumPy data pipeline, and a config-driven,
registry-decoupled model zoo.

Top-level layout:
- ``structures``  data contracts + bbox/keypoint geometry
- ``codecs``      keypoint <-> target encode/decode (host + device paths)
- ``ops``         jitted device programs (decode, warp, sparsemax, tta, ...)
- ``models``      flax modules: backbones / necks / heads / estimators / losses
- ``datasets``    COCO-style datasets, transform pipeline, metainfo
- ``evaluation``  CocoMetric + Ex-OKS COCOeval (host)
- ``engine``      training loop, optimizers, schedulers, hooks, checkpoints
- ``parallel``    mesh construction + sharded train/predict steps
- ``apis``        init_model / inference_topdown / inferencers
"""

__version__ = "0.1.0"

from .config import Config  # noqa: F401
from .registry import (  # noqa: F401
    DATASETS,
    EVALUATORS,
    HOOKS,
    INFERENCERS,
    KEYPOINT_CODECS,
    METRICS,
    MODELS,
    OPTIMIZERS,
    PARAM_SCHEDULERS,
    TRANSFORMS,
    VISUALIZERS,
)

# Eagerly import subpackages that register components, so that
# Registry.build() finds everything without location-based lazy imports.
from . import codecs  # noqa: F401,E402
from . import structures  # noqa: F401,E402


def register_all_modules() -> None:
    """Import every component subpackage (idempotent).

    Counterpart of the reference ``mmpose/utils/setup_env.py:55``; here it
    simply forces the remaining registration imports (models, datasets,
    evaluation) which are deferred to keep bare-structures imports light.
    """
    from . import datasets  # noqa: F401
    from . import evaluation  # noqa: F401
    from . import models  # noqa: F401
