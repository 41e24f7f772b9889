"""Loss functions and perceptual network."""

from fal_net_tpu.losses.vgg import Vgg19Features, load_torch_vgg19, init_vgg19
from fal_net_tpu.losses.photometric import rec_loss, perceptual_loss
from fal_net_tpu.losses.smoothness import smoothness
from fal_net_tpu.losses.epe import epe, real_epe

__all__ = [
    "Vgg19Features",
    "load_torch_vgg19",
    "init_vgg19",
    "rec_loss",
    "perceptual_loss",
    "smoothness",
    "epe",
    "real_epe",
]
