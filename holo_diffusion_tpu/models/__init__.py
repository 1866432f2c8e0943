from . import diffusion
from .unet3d import UNetModel3D, timestep_embedding
from .mlp import MLPWithInputSkips
from .render_mlp import RenderMLP
from .implicit import VoxelGridImplicitFunction
from .renderer import (
    RendererOutput,
    emission_absorption_raymarcher,
    multipass_ea_render,
)
