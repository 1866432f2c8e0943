"""Emission-absorption raymarching + multi-pass renderer.

TPU-native rebuild of Implicitron's EmissionAbsorptionRaymarcher +
HoloMultiPassEmissionAbsorptionRenderer + RayPointRefiner (reference use:
holo_multipass_ea.py:15-125, configs/base.yaml:141-159). Pure jnp — fuses
cleanly into the surrounding jit program; the Pallas fused kernel
(ops/pallas/fused_render.py) implements the same math for the hot path.

EA semantics (density_relu, additive noise std 1.0 in training, background
opacity 1e10 appended as the last delta, cap fn 1 - exp(-x)):

    delta_i  = l_{i+1} - l_i           (last delta = background_opacity)
    sigma_i  = relu(raw_sigma_i + noise)
    cap_i    = 1 - exp(-sigma_i * delta_i)
    T_i      = exp(-sum_{j<i} sigma_j * delta_j)   [surface_thickness shift]
    w_i      = cap_i * T_i
    feature  = sum_i w_i f_i ; depth = sum_i w_i l_i ; mask = cap(sum sigma*delta)
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..geometry.rays import (
    RayBundle,
    importance_sample_lengths,
    ray_bundle_to_ray_points,
)


@struct.dataclass
class RendererOutput:
    features: jnp.ndarray  # (B, N, C)
    depths: jnp.ndarray  # (B, N, 1)
    masks: jnp.ndarray  # (B, N, 1)
    normals: Optional[jnp.ndarray] = None  # (B, N, 3)
    weights: Optional[jnp.ndarray] = None  # (B, N, P)
    prev_stage: Optional["RendererOutput"] = None
    aux: Dict[str, Any] = struct.field(default_factory=dict)


def emission_absorption_raymarcher(
    densities: jnp.ndarray,
    features: jnp.ndarray,
    lengths: jnp.ndarray,
    density_noise_std: float = 0.0,
    rng: Optional[jax.Array] = None,
    surface_thickness: int = 1,
    background_opacity: float = 1e10,
    replicate_last_interval: bool = False,
    density_relu: bool = True,
    eps: float = 1e-10,
):
    """densities: (B, N, P, 1); features: (B, N, P, C); lengths: (B, N, P).

    Returns (features (B,N,C), depths (B,N,1), masks (B,N,1), weights (B,N,P)).
    """
    raw = densities[..., 0]
    diffs = jnp.diff(lengths, axis=-1)
    if replicate_last_interval:
        last = diffs[..., -1:]
    else:
        last = jnp.full_like(lengths[..., :1], background_opacity)
    deltas = jnp.concatenate([diffs, last], axis=-1)

    if density_noise_std > 0.0 and rng is not None:
        raw = raw + density_noise_std * jax.random.normal(rng, raw.shape, raw.dtype)
    if density_relu:
        raw = jax.nn.relu(raw)

    weighted = deltas * raw  # sigma * delta
    capped = 1.0 - jnp.exp(-weighted)
    cumsum = jnp.cumsum(weighted, axis=-1)
    opacity = 1.0 - jnp.exp(-cumsum[..., -1:])
    # absorption shifted by surface_thickness (implicitron roll + fill-1)
    trans = jnp.exp(-cumsum)
    shifted = jnp.concatenate(
        [jnp.ones_like(trans[..., :surface_thickness]), trans[..., :-surface_thickness]],
        axis=-1,
    )
    weights = capped * shifted

    feat_out = jnp.einsum("bnp,bnpc->bnc", weights, features)
    depth_out = jnp.sum(weights * lengths, axis=-1, keepdims=True)
    return feat_out, depth_out, opacity, weights


def multipass_ea_render(
    implicit_fn: Callable,
    ray_bundle: RayBundle,
    n_pts_per_ray_fine: int,
    rng: Optional[jax.Array],
    training: bool,
    density_noise_std_train: float = 1.0,
    stratified_sampling_coarse: Optional[bool] = None,
    append_coarse_samples_to_fine: bool = True,
    surface_thickness: int = 1,
    background_opacity: float = 1e10,
    replicate_last_interval: bool = False,
    density_relu: bool = True,
    return_weights: bool = False,
    num_passes: int = 2,
) -> RendererOutput:
    """Coarse -> (importance refine -> fine)^(num_passes-1) with the SAME
    implicit function each pass (holo_diffusion_model.py:165-169); each pass
    receives `pass_number` (holo_multipass_ea.py:94-97).

    implicit_fn(points (B,N,P,3), directions (B,N,3), pass_number)
        -> (densities (B,N,P,1), features (B,N,P,C), aux dict)
    """
    if stratified_sampling_coarse is None:
        stratified_sampling_coarse = training
    density_noise_std = density_noise_std_train if training else 0.0

    lengths = ray_bundle.lengths
    output = None
    for pass_number in range(num_passes):
        if pass_number > 0:
            refine_rng = None
            if rng is not None and stratified_sampling_coarse:
                rng, refine_rng = jax.random.split(rng)
            lengths = importance_sample_lengths(
                lengths,
                jax.lax.stop_gradient(output.weights),
                n_pts_per_ray_fine,
                refine_rng,
                append_coarse=append_coarse_samples_to_fine,
            )
        bundle = ray_bundle.replace(lengths=lengths)
        points = ray_bundle_to_ray_points(bundle)
        densities, features, aux = implicit_fn(
            points, bundle.directions, pass_number
        )
        noise_rng = None
        if rng is not None and density_noise_std > 0:
            rng, noise_rng = jax.random.split(rng)
        feat, depth, mask, weights = emission_absorption_raymarcher(
            densities,
            features,
            lengths,
            density_noise_std=density_noise_std,
            rng=noise_rng,
            surface_thickness=surface_thickness,
            background_opacity=background_opacity,
            replicate_last_interval=replicate_last_interval,
            density_relu=density_relu,
        )
        normals = None
        if "normals" in aux:
            normals = jnp.einsum("bnp,bnpc->bnc", weights, aux.pop("normals"))
        output = RendererOutput(
            features=feat,
            depths=depth,
            masks=mask,
            normals=normals,
            weights=weights,
            prev_stage=output,
            aux=aux,
        )

    if not return_weights:
        def strip(o):
            if o is None:
                return None
            return o.replace(weights=None, prev_stage=strip(o.prev_stage))

        output = strip(output)
    return output
