from .mesh import make_mesh, default_mesh
from .render import render_frame_sharded, render_rays_sharded

__all__ = ["make_mesh", "default_mesh",
           "render_frame_sharded", "render_rays_sharded"]
