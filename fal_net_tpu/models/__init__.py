"""FAL-net model family (flax, NHWC, TPU-native)."""

from fal_net_tpu.models.backbone import VariantSpec, FalNetBackbone, VARIANTS
from fal_net_tpu.models.falnet import FalNet, create_model
from fal_net_tpu.models import registry

__all__ = [
    "VariantSpec",
    "FalNetBackbone",
    "FalNet",
    "VARIANTS",
    "create_model",
    "registry",
]
