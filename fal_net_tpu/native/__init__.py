"""Native (C++) host-runtime components: GIL-free image decode/encode."""

from fal_net_tpu.native import io  # noqa: F401
