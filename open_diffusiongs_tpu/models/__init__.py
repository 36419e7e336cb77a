"""Model components: DiT transformer stack and the unified DGS denoiser
(object + scene variants via `ray_pe_type`)."""

from . import denoiser  # noqa: F401
