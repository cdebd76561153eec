from .mesh import make_mesh, default_mesh, RAY_AXIS, MODEL_AXIS
from .render import (render_frame_sharded, render_rays_sharded,
                     render_frame_fast_sharded, render_rays_fast_sharded,
                     render_frame_fast_segmented_sharded)
from .model import tp_param_specs, mlp_forward_tp, mlp_forward_all_tp
from .step import make_frame_refine_step
from .guided import guided_frame_sharded
from .motion import (motion_episode_layout, render_frame_motion_sharded)
from . import multihost

__all__ = [
    "make_mesh", "default_mesh", "RAY_AXIS", "MODEL_AXIS",
    "render_frame_sharded", "render_rays_sharded",
    "render_frame_fast_sharded", "render_rays_fast_sharded",
    "render_frame_fast_segmented_sharded",
    "tp_param_specs", "mlp_forward_tp", "mlp_forward_all_tp",
    "make_frame_refine_step", "guided_frame_sharded",
    "motion_episode_layout", "render_frame_motion_sharded",
    "multihost",
]
