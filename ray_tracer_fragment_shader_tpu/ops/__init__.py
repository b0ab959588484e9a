from .intersect import Hit, intersect_scene, group_prune_mask
from .rays import Camera, primary_rays, sample_jitter, screen_points
from .shading import shade_local

__all__ = ["Hit", "intersect_scene", "group_prune_mask", "Camera",
           "primary_rays", "sample_jitter", "screen_points", "shade_local"]
