"""Generate MLPWithInputSkips + RenderMLP goldens by running the reference's
custom_modules.py / holo_voxel_grid_implicit_function.py with the small set of
pytorch3d symbols they import stubbed out (pytorch3d itself is not installed;
the stubs reproduce only trivial public API surface: enum values, xavier init,
harmonic embedding). Run once offline:

    python tests/make_goldens_mlp.py
"""
import enum
import math
import os
import sys
import types

import numpy as np
import torch

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "goldens")


def _install_pytorch3d_stubs():
    def _xavier_init(linear):
        torch.nn.init.xavier_uniform_(linear.weight.data)

    class DecoderActivation(enum.Enum):
        RELU = "relu"
        SOFTPLUS = "softplus"
        SIGMOID = "sigmoid"
        IDENTITY = "identity"

    class HarmonicEmbedding(torch.nn.Module):
        # public API per pytorch3d docs (n harmonics, logspace, append input)
        def __init__(self, n_harmonic_functions=6, omega_0=1.0, logspace=True,
                     append_input=True):
            super().__init__()
            if logspace:
                freqs = 2.0 ** torch.arange(n_harmonic_functions)
            else:
                freqs = torch.linspace(
                    1.0, 2.0 ** max(n_harmonic_functions - 1, 0), n_harmonic_functions
                )
            self.register_buffer("_frequencies", omega_0 * freqs)
            self.append_input = append_input

        def get_output_dim(self, input_dims=3):
            n = self._frequencies.numel()
            return input_dims * (2 * n + int(self.append_input))

        def forward(self, x):
            if self._frequencies.numel() == 0:
                return x if self.append_input else x[..., :0]
            embed = (x[..., None] * self._frequencies).reshape(*x.shape[:-1], -1)
            parts = [embed.sin(), embed.cos()]
            if self.append_input:
                parts.append(x)
            return torch.cat(parts, dim=-1)

    class Configurable:
        # Implicitron Configurable: dataclass-style init from annotated class
        # attrs + __post_init__ hook.
        def __init__(self, **kwargs):
            if isinstance(self, torch.nn.Module):
                torch.nn.Module.__init__(self)
            for klass in reversed(type(self).__mro__):
                # only Configurable-derived classes carry config fields — do
                # NOT copy torch.nn.Module's annotated class attrs (forward!)
                if not (isinstance(klass, type) and issubclass(klass, Configurable)):
                    continue
                for name in getattr(klass, "__annotations__", {}):
                    if hasattr(klass, name):
                        object.__setattr__(self, name, getattr(klass, name))
            for k, v in kwargs.items():
                setattr(self, k, v)
            if hasattr(self, "__post_init__"):
                self.__post_init__()

    class _Registry:
        def register(self, cls):
            return cls

        def get(self, *a):
            raise NotImplementedError

    def run_auto_creation(obj):
        raise NotImplementedError

    class _Stub:
        pass

    mods = {}

    def mod(name):
        m = mods.get(name)
        if m is None:
            m = types.ModuleType(name)
            mods[name] = m
            sys.modules[name] = m
        return m

    mod("pytorch3d")
    mod("pytorch3d.implicitron")
    mod("pytorch3d.implicitron.models")
    mod("pytorch3d.implicitron.models.implicit_function")
    df = mod("pytorch3d.implicitron.models.implicit_function.decoding_functions")
    df._xavier_init = _xavier_init
    df.DecoderActivation = DecoderActivation
    fa = mod("pytorch3d.implicitron.models.view_pooler.feature_aggregator")
    mod("pytorch3d.implicitron.models.view_pooler")
    fa.FeatureAggregatorBase = _Stub
    fa._mask_target_view_features = lambda f: f
    fa._get_view_sampling_mask = lambda *a, **k: None
    fa._avgmaxstd_reduction_function = None
    fa.ReductionFunction = None
    vs = mod("pytorch3d.implicitron.models.view_pooler.view_sampler")
    vs.cameras_points_cartesian_product = None
    r = mod("pytorch3d.renderer")
    r.HarmonicEmbedding = HarmonicEmbedding
    r.ray_bundle_to_ray_points = None
    rc = mod("pytorch3d.renderer.cameras")
    rc.CamerasBase = _Stub
    cfgm = mod("pytorch3d.implicitron.tools.config")
    mod("pytorch3d.implicitron.tools")
    cfgm.Configurable = Configurable
    cfgm.registry = _Registry()
    cfgm.run_auto_creation = run_auto_creation
    st = mod("pytorch3d.structures.volumes")
    mod("pytorch3d.structures")
    st.VolumeLocator = _Stub
    base = mod("pytorch3d.implicitron.models.renderer.base")
    mod("pytorch3d.implicitron.models.renderer")
    base.ImplicitronRayBundle = _Stub
    base.ImplicitFunctionBase = _Stub
    vg = mod("pytorch3d.implicitron.models.implicit_function.voxel_grid")
    vg.VoxelGridBase = _Stub
    vg.VoxelGridValuesBase = _Stub
    vg.FullResolutionVoxelGrid = _Stub
    vg.FullResolutionVoxelGridValues = _Stub
    ifb = mod("pytorch3d.implicitron.models.implicit_function.base")
    ifb.ImplicitFunctionBase = _Stub


def main():
    _install_pytorch3d_stubs()
    sys.path.insert(0, REF)
    from holo_diffusion.custom_modules import MLPWithInputSkips, HiddenActivation
    from pytorch3d.implicitron.models.implicit_function.decoding_functions import (
        DecoderActivation,
    )

    torch.manual_seed(21)
    rng = np.random.RandomState(5)
    out = {}

    # --- bare MLP with a skip — captures the reference activation-order quirk
    mlp = MLPWithInputSkips(
        n_layers=4,
        input_dim=16,
        output_dim=8,
        skip_dim=16,
        hidden_dim=32,
        input_skips=(2,),
        hidden_activation=HiddenActivation.LEAKYRELU,
        last_activation=DecoderActivation.IDENTITY,
    )
    # DecoderActivation stub: custom_modules looks it up by enum member
    x = torch.tensor(rng.randn(6, 16), dtype=torch.float32)
    with torch.no_grad():
        y = mlp(x)
    out["mlp_x"] = x.numpy()
    out["mlp_y"] = y.numpy()
    for k, v in mlp.state_dict().items():
        out[f"mlp_sd::{k}"] = v.numpy()

    # --- full RenderMLP
    from holo_diffusion.holo_voxel_grid_implicit_function import RenderMLP

    torch.manual_seed(31)
    rmlp = RenderMLP(
        input_dims=32,
        output_feature_dims=3,
        output_vp_independent_feature_dims=0,
        feat_emb_dims=0,
        dir_emb_dims=4,
        dnet_num_layers=4,
        dnet_hidden_dim=64,
        dnet_input_skips=(2,),
        rnet_num_layers=1,
        rnet_hidden_dim=48,
    )
    feats = torch.tensor(rng.randn(4, 10, 32), dtype=torch.float32)
    dirs = torch.nn.functional.normalize(
        torch.tensor(rng.randn(4, 10, 3), dtype=torch.float32), dim=-1
    )
    with torch.no_grad():
        dens, rad, vp = rmlp(feats, dirs)
    assert vp is None
    out["rmlp_feats"] = feats.numpy()
    out["rmlp_dirs"] = dirs.numpy()
    out["rmlp_densities"] = dens.numpy()
    out["rmlp_radiance"] = rad.numpy()
    for k, v in rmlp.state_dict().items():
        out[f"rmlp_sd::{k}"] = v.numpy()

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "mlp_goldens.npz"), **out)
    print(f"wrote {len(out)} arrays")


if __name__ == "__main__":
    main()
