from .frame_data import FrameData
from .synthetic import make_synthetic_scene
