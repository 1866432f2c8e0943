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
from .unet_variants import AttentionPool2d, EncoderUNetModel, SuperResModel
from .feature_extractor import ResNetFeatureExtractor
from .view_pooler import (
    AngleWeightedReductionFeatureAggregator,
    MLPMeanFeatureAggregator,
    ViewPooler,
)
from .holo_model import HoloDiffusionModel
from .metrics import preprocess_input, view_metrics
