from .cameras import (
    PerspectiveCameras,
    camera_centers,
    join_cameras,
    look_at_view_transform,
    so3_exp_map,
    transform_points_world_to_camera,
    transform_points_camera_to_world,
    project_points_ndc,
    unproject_ndc_points,
)
from .harmonic import HarmonicEmbedding, harmonic_embedding_dim
from .rays import (
    RayBundle,
    ray_bundle_to_ray_points,
    adaptive_depth_bounds,
    sample_rays_full_grid,
    sample_rays_from_mask,
    stratify_lengths,
    importance_sample_lengths,
)
