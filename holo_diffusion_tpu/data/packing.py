"""Single-buffer H2D packing for dispatch groups.

The host->device path of a high-latency transport is LATENCY-bound per
transferred array: a release dispatch group (a FrameData pytree of ~11
leaves, ~39 MB at K=2) measures ~550 ms whether it carries 2 or 4 batches —
~50 ms per leaf, not bandwidth (scripts/profile_e2e_residual_r4.py).
`BatchPacker` collapses the whole pytree into ONE uint8 buffer on the host
(contiguous byte views + concat — a plain memcpy, run in the AsyncLoader
worker thread) and rebuilds the leaves INSIDE the jitted train step with
static slices + bitcasts, which XLA fuses into the consumers. The group then
costs a single latency payment plus the bandwidth term.

No reference counterpart: the reference's CUDA-local dataloader workers
(train CLI, num_workers in configs/base.yaml:61) never pay a per-tensor
dispatch latency — they pin memory instead. This is the TPU-tunnel-aware
replacement.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class BatchPacker:
    """Pack/unpack a fixed-structure pytree through one flat uint8 buffer.

    The spec (treedef, shapes, dtypes, byte offsets) is captured from the
    first packed pytree (or an `example` passed to the constructor); every
    later `pack` must match it — true for dispatch groups, whose shapes are
    static by construction. `pack` runs on the host; `unpack` is pure jnp
    and is meant to run inside jit as the first op of the step (see
    parallel.train_step.make_train_step(packer=...)).

    Bit-exact: non-uint8 leaves round-trip through `.view(uint8)` on the
    host and `lax.bitcast_convert_type` on the device (both little-endian);
    bool leaves are stored as their 0/1 bytes and compared back.
    """

    def __init__(self, example=None):
        self.treedef = None
        if example is not None:
            self._build_spec(example)

    def _build_spec(self, tree) -> None:
        leaves, self.treedef = jax.tree.flatten(tree)
        self._shapes = tuple(tuple(np.shape(l)) for l in leaves)
        self._dtypes = tuple(np.dtype(np.asarray(l).dtype) for l in leaves)
        sizes = [
            int(np.prod(s, dtype=np.int64)) * d.itemsize
            for s, d in zip(self._shapes, self._dtypes)
        ]
        bounds = np.concatenate([[0], np.cumsum(sizes, dtype=np.int64)])
        self._bounds = [int(b) for b in bounds]
        self.nbytes = self._bounds[-1]

    def pack(self, tree) -> np.ndarray:
        """Host-side: flatten `tree` into one (nbytes,) uint8 buffer."""
        if self.treedef is None:
            self._build_spec(tree)
        leaves, treedef = jax.tree.flatten(tree)
        if treedef != self.treedef:
            raise ValueError(
                f"BatchPacker: tree structure changed — spec was built for "
                f"{self.treedef}, got {treedef}"
            )
        buf = np.empty((self.nbytes,), np.uint8)
        for leaf, dt, sh, lo, hi in zip(
            leaves, self._dtypes, self._shapes, self._bounds, self._bounds[1:]
        ):
            a = np.asarray(leaf)
            if a.dtype != dt or tuple(a.shape) != sh:
                raise ValueError(
                    f"BatchPacker: leaf changed from {dt}{sh} to "
                    f"{a.dtype}{tuple(a.shape)}"
                )
            buf[lo:hi] = np.ascontiguousarray(a).view(np.uint8).ravel()
        return buf

    def unpack(self, buf: jnp.ndarray):
        """Device-side (jit-traceable): rebuild the pytree from the buffer."""
        if self.treedef is None:
            raise ValueError("BatchPacker.unpack before any pack/example")
        leaves = []
        for sh, dt, lo, hi in zip(
            self._shapes, self._dtypes, self._bounds, self._bounds[1:]
        ):
            seg = jax.lax.slice(buf, (lo,), (hi,))
            if dt == np.uint8:
                leaf = seg.reshape(sh)
            elif dt == np.bool_:
                leaf = (seg != 0).reshape(sh)
            else:
                leaf = jax.lax.bitcast_convert_type(
                    seg.reshape((-1, dt.itemsize)), jnp.dtype(dt)
                ).reshape(sh)
            leaves.append(leaf)
        return jax.tree.unflatten(self.treedef, leaves)


def packed_transfer(packer: BatchPacker, device=None):
    """AsyncLoader `transfer` fn: pack on the host, one device_put."""

    def _transfer(tree):
        buf = packer.pack(tree)
        return jax.device_put(buf, device)

    return _transfer


def make_packer_for_groups(
    example_batch=None, steps_per_call: int = 1
) -> Optional[BatchPacker]:
    """A packer whose spec self-initializes from the first packed group
    (shapes are unknown until the loader yields; jit traces the unpack only
    at the first step call, which necessarily follows the first pack)."""
    if example_batch is None:
        return BatchPacker()
    if steps_per_call > 1:
        example_batch = jax.tree.map(
            lambda x: np.broadcast_to(
                np.asarray(x)[None], (steps_per_call,) + np.shape(x)
            ),
            example_batch,
        )
    return BatchPacker(example_batch)
