"""Model components: DiT transformer stack, object & scene denoisers."""

from . import denoiser  # noqa: F401
from . import denoiser_scene  # noqa: F401
