from .sh import eval_sh_basis, masked_sh_basis, SUPPORTED_BASIS_DIMS
from .rays import screen2worlddir, rodrigues
from .render import (render_rays, render_frame, composite_background,
                     to_rgba8, RenderResult)

__all__ = [
    "eval_sh_basis", "masked_sh_basis", "SUPPORTED_BASIS_DIMS",
    "screen2worlddir", "rodrigues",
    "render_rays", "render_frame", "composite_background", "to_rgba8",
    "RenderResult",
]
