"""TPU-native adversarial-patch attack & defense framework for object detection.

A ground-up JAX/Flax/XLA/Pallas rebuild of the capabilities of
tiiuae/MLAdversarialObjectDetection:

- EfficientDet(-lite) person detector (Flax; BiFPN; anchor decode; on-device
  fixed-shape NMS)
- differentiable Expectation-over-Transformation adversarial-patch pipeline
  (print jitter, scene brightness matching, inverse-warp rotate/scale/translate
  composite) with gradients flowing into a trainable patch tensor + scale
- self-supervised attention U-Net defender (patch detection + background
  recovery)
- host data pipeline, streaming video demos, benchmarking

See SURVEY.md at the repo root for the structural map of the reference and
where each subsystem here corresponds to it.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
from .config import get_efficientdet_config, get_detection_config, Config  # noqa: F401
