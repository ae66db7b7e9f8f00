from .cast import Hit, make_brute_cast, make_culled_cast, hit_shading_attrs
from .engine import (auto_static_tile_cap, auto_tile_caps, frame_to_u8,
                     make_cast, radiance, render_frame,
                     render_frame_with_stats, render_rays, render_rays_stats)
from .geometry import WorldGeometry, camera_rays, expand_geometry
from .shading import illuminate

__all__ = [
    "Hit",
    "WorldGeometry",
    "camera_rays",
    "expand_geometry",
    "frame_to_u8",
    "hit_shading_attrs",
    "illuminate",
    "make_brute_cast",
    "make_culled_cast",
    "radiance",
    "render_frame",
]
