from .cast import Hit, make_brute_cast, make_culled_cast, hit_shading_attrs
from .engine import frame_to_u8, make_cast, radiance, render_frame, render_rays
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
