"""Chunked full-image evaluation rendering.

Rebuild of GenericModel's chunked eval path (`chunk_size_grid` 40960/163840,
hydrant.yaml:112, SURVEY.md §5 "ray chunking"): dense H x W renders are split
into fixed-size ray chunks processed by ONE jitted chunk renderer in a host
loop — constant device memory regardless of render size, one compilation.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .geometry.cameras import PerspectiveCameras
from .geometry.rays import RayBundle, sample_rays_full_grid
from .models.holo_model import HoloDiffusionModel


def make_chunk_render_fn(model: HoloDiffusionModel):
    """Jitted fn(variables, voxel_grid, ray_bundle_chunk) -> RendererOutput.
    Create ONCE and reuse across batches/epochs — each call to this factory
    compiles a fresh program. Variables are threaded as a jit argument
    (closures would embed the param tree as program constants)."""

    @jax.jit
    def chunk_render(variables, voxel_grid, bundle: RayBundle):
        return model.apply(
            variables,
            voxel_grid,
            bundle,
            False,
            None,
            method=HoloDiffusionModel.render_rays,
        )

    return chunk_render


def make_chunk_renderer(model: HoloDiffusionModel, variables):
    """make_chunk_render_fn with `variables` bound."""
    fn = make_chunk_render_fn(model)
    return lambda voxel_grid, bundle: fn(variables, voxel_grid, bundle)


# Measured on v5e (see render_image_chunked docstring): the smallest chunk on
# the compute-bound plateau. Dispatch overhead amortizes ~100x vs the
# reference's 640-ray chunks while per-chunk memory stays tiny.
_TPU_MIN_RAYS_PER_CHUNK = 2560


def _on_accelerator() -> bool:
    return jax.default_backend() != "cpu"


def compute_occupancy(
    model: HoloDiffusionModel,
    variables,
    voxel_grid: jnp.ndarray,
    resolution: int = 64,
    threshold: float = 0.0,
    dilate: int = 1,
) -> jnp.ndarray:
    """Probe pass of the eval-only empty-space skip (ops/occupancy.py):
    ((r, r, r) bool occupancy of the decoded density field, scalar bool
    `outside_occupied` — the density of zero features, i.e. whether space
    outside the voxel volume contributes). One implicit-fn call over a
    voxel-center lattice; compute once per grid, reuse across views."""
    from .ops.occupancy import occupancy_from_density
    from .ops.voxel import voxel_coord_grid

    @jax.jit
    def probe(variables, voxel_grid):
        pts = voxel_coord_grid(resolution, model.volume_extent)
        # last probe point sits far outside the volume: features sample to
        # zero there, so its raw density is the constant the density net
        # emits for empty space (the bias path)
        far_out = jnp.full((1, 3), 1e6, jnp.float32)
        raw = model.apply(
            variables, voxel_grid,
            jnp.concatenate([pts.reshape(-1, 3), far_out]),
            method=HoloDiffusionModel.query_density,
        )
        lattice = raw[:-1].reshape(resolution, resolution, resolution)
        outside_occupied = raw[-1] > threshold
        return occupancy_from_density(lattice, threshold, dilate), outside_occupied

    return probe(variables, voxel_grid)


def render_image_chunked(
    model: HoloDiffusionModel,
    variables,
    camera: PerspectiveCameras,
    voxel_grid: jnp.ndarray,
    image_height: Optional[int] = None,
    image_width: Optional[int] = None,
    chunk_size_grid: Optional[int] = None,
    chunk_renderer=None,
    chunk_autoscale: bool = True,
    empty_space_skip: bool = False,
    occupancy: Optional[jnp.ndarray] = None,
    occupancy_resolution: int = 64,
    occupancy_threshold: float = 0.0,
    occupancy_probes: int = 128,
) -> Dict[str, np.ndarray]:
    """Render one camera densely in ray chunks.

    voxel_grid: (r, r, r, C). Returns dict of (H, W, c) numpy images
    (images/depths/masks[/normals]_render).

    `chunk_size_grid` (reference semantics: max points per chunk,
    GenericModel's chunked eval / hydrant.yaml:112) is a CUDA-memory bound.
    On TPU the same bound is dispatch-suicide: 40960 pts -> 640-ray chunks ->
    ~410 programs per 512^2 image over a ~20 ms-latency transport. When the
    chunk size comes from model config (not the explicit argument) and we are
    on an accelerator backend, `chunk_autoscale` raises the chunk to at least
    `_TPU_MIN_RAYS_PER_CHUNK` rays — swept on a v5e at the release eval scale
    (two-pass 64+64 pts, normals on, 512^2):

        rays/chunk   640   2560   8192   16384  32768  65536
        s/image      5.42  2.54   2.55   2.79   2.66   2.85

    2560 rays saturates the chip (~103k rays/s, compute-bound plateau); the
    measured default stays modest so per-chunk memory keeps far from HBM
    limits at larger `n_pts_per_ray_evaluation`. Pass `chunk_size_grid`
    explicitly or `chunk_autoscale=False` for exact reference chunking.
    """
    H = image_height or model.render_image_height
    W = image_width or model.render_image_width
    n_pts = model.n_pts_per_ray_evaluation
    chunk_size = chunk_size_grid or model.chunk_size_grid or (H * W * n_pts)
    rays_per_chunk = max(chunk_size // max(n_pts, 1), 1)
    if chunk_autoscale and chunk_size_grid is None and _on_accelerator():
        rays_per_chunk = max(rays_per_chunk, min(_TPU_MIN_RAYS_PER_CHUNK, H * W))

    bundle = sample_rays_full_grid(
        camera[:1], H, W, n_pts, model.scene_center, model.scene_extent
    )
    n_rays = H * W
    n_pad = -n_rays % rays_per_chunk
    padded = jax.tree.map(
        lambda x: jnp.pad(x, ((0, 0), (0, n_pad)) + ((0, 0),) * (x.ndim - 2),
                          mode="edge"),
        bundle,
    )
    n_chunks = (n_rays + n_pad) // rays_per_chunk

    if chunk_renderer is None:
        chunk_renderer = make_chunk_renderer(model, variables)

    # eval-only empty-space skip (ops/occupancy.py): tighten each chunk's
    # per-ray interval to the occupied segment before rendering. `occupancy`
    # can be passed in precomputed (flyaround reuses one mask for all poses).
    tighten = None
    if empty_space_skip or occupancy is not None:
        if occupancy is None:
            occupancy = compute_occupancy(
                model, variables, voxel_grid,
                occupancy_resolution, occupancy_threshold,
            )
        # accept a bare (r, r, r) mask (outside treated empty) or the
        # (mask, outside_occupied) pair compute_occupancy returns
        occ_mask, outside_occ = (
            occupancy if isinstance(occupancy, tuple) else (occupancy, False)
        )
        from .ops.occupancy import tighten_ray_bundle

        tighten = jax.jit(
            lambda b, occ, out_occ: tighten_ray_bundle(
                b, occ, model.volume_extent, n_probe=occupancy_probes,
                outside_occupied=out_occ,
            )
        )

    # keep chunk outputs ON DEVICE and fetch once at the end: jax's async
    # dispatch then pipelines all chunk programs through the (high-latency)
    # transport instead of a blocking host round-trip per chunk
    feats, depths, masks, normals = [], [], [], []
    for ci in range(n_chunks):
        sl = slice(ci * rays_per_chunk, (ci + 1) * rays_per_chunk)
        chunk = jax.tree.map(lambda x: x[:, sl], padded)
        if tighten is not None:
            chunk = tighten(chunk, occ_mask, outside_occ)
        out = chunk_renderer(voxel_grid, chunk)
        feats.append(out.features[0])
        depths.append(out.depths[0])
        masks.append(out.masks[0])
        if out.normals is not None:
            normals.append(out.normals[0])

    def assemble(parts, c):
        flat = np.asarray(jnp.concatenate(parts, axis=0))[:n_rays]
        return flat.reshape(H, W, c)

    result = {
        "images_render": assemble(feats, feats[0].shape[-1])[..., :3],
        "depths_render": assemble(depths, 1),
        "masks_render": assemble(masks, 1),
    }
    if normals:
        result["normals_render"] = assemble(normals, 3)
    return result


def render_image_sharded(
    model: HoloDiffusionModel,
    variables,
    camera: PerspectiveCameras,
    voxel_grid: jnp.ndarray,
    mesh,
    image_height: Optional[int] = None,
    image_width: Optional[int] = None,
    axis_name: str = "data",
) -> Dict[str, np.ndarray]:
    """Dense render with RAYS SHARDED over the device mesh (grid replicated) —
    near-linear eval speedup; beyond-reference scaling (the reference only
    chunks rays serially, SURVEY.md §5)."""
    from jax.sharding import PartitionSpec as P

    H = image_height or model.render_image_height
    W = image_width or model.render_image_width
    n_pts = model.n_pts_per_ray_evaluation
    n_dev = mesh.devices.size

    bundle = sample_rays_full_grid(
        camera[:1], H, W, n_pts, model.scene_center, model.scene_extent
    )
    n_rays = H * W
    n_pad = -n_rays % n_dev
    padded = jax.tree.map(
        lambda x: jnp.pad(
            x, ((0, 0), (0, n_pad)) + ((0, 0),) * (x.ndim - 2), mode="edge"
        ),
        bundle,
    )

    def shard_render(variables, voxel_grid, bundle_shard):
        out = model.apply(
            variables,
            voxel_grid,
            bundle_shard,
            False,
            None,
            method=HoloDiffusionModel.render_rays,
        )
        return out.features, out.depths, out.masks

    fn = jax.jit(
        jax.shard_map(
            shard_render,
            mesh=mesh,
            in_specs=(P(), P(), P(None, axis_name)),
            out_specs=(P(None, axis_name),) * 3,
            check_vma=False,
        )
    )
    feats, depths, masks = fn(variables, voxel_grid, padded)
    return {
        "images_render": np.asarray(feats[0, :n_rays, :3]).reshape(H, W, -1),
        "depths_render": np.asarray(depths[0, :n_rays]).reshape(H, W, 1),
        "masks_render": np.asarray(masks[0, :n_rays]).reshape(H, W, 1),
    }
