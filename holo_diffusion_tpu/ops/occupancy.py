"""Occupancy-grid empty-space skipping for EVAL rendering.

The classic voxel-NeRF acceleration (VaxNeRF / Plenoxels / DVGO family —
PAPERS.md): most of a bounding-sphere ray interval is empty, so dense eval
renders waste their per-ray sample budget. Training must keep dense sampling
(the reference trains with density noise std 1.0, which makes empty space
contribute — the round-2 analysis in BASELINE.md), but at eval the density
field is deterministic:

  1. decode RAW densities once per voxel grid at a probe lattice
     (`HoloDiffusionModel.query_density`, one batched implicit-fn call);
  2. threshold + dilate into an occupancy bitmask (`occupancy_from_density`);
  3. per ray, probe the bitmask along [near, far] (pure nearest-cell gathers,
     no MLP) and tighten the interval to first..last occupied probe ± one
     step (`tighten_ray_bundle`), falling back to the full interval for rays
     that never hit;
  4. stratify the SAME n_pts inside the tightened interval.

Everything is static-shape (TPU/XLA-friendly): no per-ray point counts, just
per-ray bounds — the speed/quality lever is that a fixed point budget now
covers only the occupied segment, so eval configs can cut
`n_pts_per_ray_evaluation` at equal effective sample density. The raymarcher
itself is untouched; rays that miss the mask render exactly as before.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.rays import RayBundle


def occupancy_from_density(
    raw_density: jnp.ndarray, threshold: float = 0.0, dilate: int = 1
) -> jnp.ndarray:
    """(r, r, r) raw (pre-relu) densities -> (r, r, r) bool occupancy.

    `threshold` is in raw-density units (the EA raymarcher applies
    relu(raw), so raw <= 0 contributes nothing; 0.0 is exact-conservative).
    `dilate` grows the mask by that many cells (3³ max pool per step) so
    trilinear interpolation tails and probe quantization stay inside."""
    occ = (raw_density > threshold).astype(jnp.float32)
    for _ in range(max(dilate, 0)):
        occ = jax.lax.reduce_window(
            occ[None, ..., None],
            -jnp.inf,
            jax.lax.max,
            (1, 3, 3, 3, 1),
            (1, 1, 1, 1, 1),
            "SAME",
        )[0, ..., 0]
    return occ > 0.0


def tighten_ray_bundle(
    bundle: RayBundle,
    occupancy: jnp.ndarray,
    extent: float,
    n_probe: int = 128,
    outside_occupied=False,
) -> RayBundle:
    """Re-concentrate each ray's lengths onto the occupied segment.

    occupancy: (r, r, r) bool over the volume (same world mapping as the
    voxel grid: cell centers at (i - (r-1)/2) * extent/r, x->W, y->H, z->D —
    ops/voxel.py::voxel_coord_grid). Keeps the per-ray POINT COUNT and the
    stratification structure; only the interval changes. Rays with no
    occupied probe keep their original interval (conservative: background
    renders identically).

    outside_occupied: whether space OUTSIDE the voxel volume counts as
    occupied. Features sample to zero out there (grid_sample zero padding)
    but the density net's bias can still emit positive density — when it
    does (`compute_occupancy` probes it), outside segments must be kept or
    the render changes. True degenerates the tightening toward [near, far]
    (honest no-op) instead of silently clipping real contributions."""
    r = occupancy.shape[0]
    voxel_size = extent / r
    lengths = bundle.lengths
    n_pts = lengths.shape[-1]
    near = lengths.min(axis=-1)
    far = lengths.max(axis=-1)

    t = jnp.linspace(0.0, 1.0, n_probe)
    probe_len = near[..., None] + t * (far - near)[..., None]  # (B, N, n_probe)
    pts = (
        bundle.origins[..., None, :]
        + probe_len[..., None] * bundle.directions[..., None, :]
    )
    idx = jnp.round(pts / voxel_size + (r - 1) / 2.0).astype(jnp.int32)
    inside = jnp.all((idx >= 0) & (idx <= r - 1), axis=-1)
    ic = jnp.clip(idx, 0, r - 1)
    lin = (ic[..., 2] * r + ic[..., 1]) * r + ic[..., 0]  # (z*H + y)*W + x
    hits = (occupancy.reshape(-1)[lin] & inside) | (
        jnp.asarray(outside_occupied) & ~inside
    )
    any_hit = jnp.any(hits, axis=-1)

    i0 = jnp.argmax(hits, axis=-1)  # first occupied probe
    i1 = (n_probe - 1) - jnp.argmax(hits[..., ::-1], axis=-1)  # last
    step = (far - near) / (n_probe - 1)
    t0 = near + jnp.maximum(i0 - 1, 0) * step
    t1 = near + jnp.minimum(i1 + 1, n_probe - 1) * step
    t0 = jnp.where(any_hit, t0, near)
    t1 = jnp.where(any_hit, t1, far)

    tt = jnp.linspace(0.0, 1.0, n_pts)
    new_lengths = t0[..., None] + tt * (t1 - t0)[..., None]
    return bundle.replace(lengths=new_lengths)
