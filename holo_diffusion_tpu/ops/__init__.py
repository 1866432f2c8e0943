from .voxel import sample_voxel_grid_world, voxel_coord_grid
from .splat import rasterize_sparse_rays
from .image import bilinear_sample_ndc, resize_image
