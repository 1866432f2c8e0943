"""RenderMLP — NeRF-style voxel-feature decoder
(reference: holo_voxel_grid_implicit_function.py:48-145).

Density net (4 layers, hidden 256, skip at 2) outputs [hidden | density];
density has NO activation here — ReLU is applied inside the EA raymarcher
(`density_relu: true`, configs/base.yaml:158). Radiance net (1 layer,
hidden 128) consumes [hidden | harmonic(view_dir)] with a sigmoid for RGB.
Optional viewpoint-independent feature head (disabled in the release model:
holo_diffusion_model.py:157 forces feature_dim=0).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..geometry.harmonic import HarmonicEmbedding
from .mlp import MLPWithInputSkips

COLOUR_DIMS = 3


class RenderMLP(nn.Module):
    input_dims: int = 128
    output_feature_dims: int = COLOUR_DIMS
    output_vp_independent_feature_dims: int = 64
    feat_emb_dims: int = 0
    dir_emb_dims: int = 4
    dnet_num_layers: int = 4
    dnet_hidden_dim: int = 256
    dnet_input_skips: Tuple[int, ...] = (2,)
    rnet_num_layers: int = 1
    rnet_hidden_dim: int = 128
    rnet_input_skips: Tuple[int, ...] = ()
    activation_fn: str = "LEAKYRELU"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self._feats_encoder = HarmonicEmbedding(self.feat_emb_dims)
        self._dir_encoder = HarmonicEmbedding(self.dir_emb_dims)
        self._density_net = MLPWithInputSkips(
            n_layers=self.dnet_num_layers,
            output_dim=self.dnet_hidden_dim + 1,  # +1 for density
            hidden_dim=self.dnet_hidden_dim,
            input_skips=self.dnet_input_skips,
            hidden_activation=self.activation_fn,
            last_activation="IDENTITY",
            dtype=self.dtype,
        )
        self._radiance_net = MLPWithInputSkips(
            n_layers=self.rnet_num_layers,
            output_dim=self.output_feature_dims,
            hidden_dim=self.rnet_hidden_dim,
            input_skips=self.rnet_input_skips,
            hidden_activation=self.activation_fn,
            last_activation="IDENTITY",
            dtype=self.dtype,
        )
        if self.output_vp_independent_feature_dims > 0:
            self._feature_net = MLPWithInputSkips(
                n_layers=self.rnet_num_layers,
                output_dim=self.output_vp_independent_feature_dims,
                hidden_dim=self.rnet_hidden_dim,
                input_skips=self.rnet_input_skips,
                hidden_activation=self.activation_fn,
                last_activation="IDENTITY",
                dtype=self.dtype,
            )

    def __call__(self, features: jnp.ndarray, view_dirs: jnp.ndarray):
        """features: (..., input_dims); view_dirs: (..., 3) unit vectors.

        Returns (densities (..., 1), radiance (..., out_dims),
        vp_independent_features or None).
        """
        pe_features = self._feats_encoder(features)
        out = self._density_net(pe_features)
        return self._decode_tail(out, view_dirs)

    def _decode_tail(self, out: jnp.ndarray, view_dirs: jnp.ndarray):
        """Everything after the density net: split [hidden | density], run the
        radiance / vp-feature heads."""
        mlp_feats, densities = out[..., :-1], out[..., -1:]

        pe_viewdirs = self._dir_encoder(view_dirs)
        radiance = self._radiance_net(
            jnp.concatenate([mlp_feats, pe_viewdirs], axis=-1)
        )
        if self.output_feature_dims == COLOUR_DIMS:
            radiance = nn.sigmoid(radiance)

        vp_feats = None
        if self.output_vp_independent_feature_dims > 0:
            vp_feats = self._feature_net(mlp_feats)
        return densities, radiance, vp_feats

    @property
    def density_net_is_collapsible(self) -> bool:
        """True when the density net is an affine map of the raw features
        followed by one activation — which it IS in the release configs:
        feat_emb_dims=0 makes the feature encoding the identity, and the
        reference's swapped activation order (custom_modules.py:108-113;
        see models/mlp.py docstring) applies IDENTITY to every non-last
        layer, so layers 0..n-2 are pure linear maps."""
        from .mlp import MLPWithInputSkips  # noqa: F401 (doc anchor)

        return (
            self.feat_emb_dims == 0
            and self._density_net.reference_activation_order
            and self._density_net.last_activation == "IDENTITY"
        )

    def density_affine(self):
        """Collapse the (linear-cascade) density net into ONE affine map:
        density_net(s) == hidden_act(s @ A + c), A (input_dims, hidden+1).

        The collapse is exact linear algebra over the layer kernels (skip
        concatenations become [A | I] block rows), so gradients to the
        original per-layer kernels flow through the products unchanged.
        """
        assert self.density_net_is_collapsible
        p = self.variables["params"]["_density_net"]
        d_in = self.input_dims
        A = jnp.eye(d_in)
        c = jnp.zeros((d_in,))[None]  # row vector for uniform matmul
        skips = set(self.dnet_input_skips)
        for li in range(self.dnet_num_layers):
            if li > 0 and li in skips:
                A = jnp.concatenate([A, jnp.eye(d_in)], axis=1)
                c = jnp.concatenate([c, jnp.zeros((1, d_in))], axis=1)
            K = p[f"linear_{li}"]["kernel"]
            b = p[f"linear_{li}"]["bias"]
            A = A @ K
            c = c @ K + b[None]
        return A, c[0]

    @property
    def decode_is_fusable(self) -> bool:
        """True when the whole decode matches the fused Pallas kernel's
        shape: collapsible density net + single-layer LEAKYRELU radiance head
        producing sigmoid RGB, no vp-feature head — the release config."""
        return (
            self.density_net_is_collapsible
            and self.output_vp_independent_feature_dims == 0
            and self.output_feature_dims == COLOUR_DIMS
            and self.rnet_num_layers == 1
            and tuple(self.rnet_input_skips) == ()
            and self.activation_fn == "LEAKYRELU"
            and self._radiance_net.reference_activation_order
        )

    def encode_dirs(self, view_dirs: jnp.ndarray) -> jnp.ndarray:
        """Harmonic embedding of unit view directions (the radiance input)."""
        return self._dir_encoder(view_dirs)

    def radiance_linear(self):
        """(kernel (hidden+pe_dim, 3), bias (3,)) of the single radiance layer."""
        p = self.variables["params"]["_radiance_net"]["linear_0"]
        return p["kernel"], p["bias"]

    def decode_from_preactivation(
        self, pre: jnp.ndarray, view_dirs: jnp.ndarray
    ):
        """Decode from `s @ A + c` pre-activations (density_affine fast path):
        apply the density net's output activation, then the standard tail."""
        from .mlp import _HIDDEN_ACTS

        out = _HIDDEN_ACTS[self._density_net.hidden_activation](pre)
        return self._decode_tail(out, view_dirs)

    def density(self, features: jnp.ndarray) -> jnp.ndarray:
        """Density head only — used for normals via autodiff
        (get_normals, holo_voxel_grid_implicit_function.py:131-145)."""
        return self._density_net(self._feats_encoder(features))[..., -1:]
