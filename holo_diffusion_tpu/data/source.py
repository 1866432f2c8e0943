"""Data sources: same-sequence batch loaders feeding FrameData to the model.

Rebuild of Implicitron's SequenceDataLoaderMapProvider contract (reference
configs/base.yaml:59-71): every batch contains `batch_size` frames FROM ONE
SEQUENCE (conditioning SAME, images_per_seq_options=[batch_size]) — the
model's static target/source split relies on it (holo_model.py).

Providers:
  * SyntheticDataProvider — analytic sphere scenes (no external data);
  * CO3DDataProvider — CO3Dv2 jgz annotations (data/co3d.py).
"""
from __future__ import annotations

from typing import Iterator, List

import jax
import jax.numpy as jnp
import numpy as np

from .frame_data import FrameData
from .synthetic import make_synthetic_scene


class SceneDataset:
    """A list of scenes; each scene is a FrameData holding all its views."""

    def __init__(self, scenes: List[FrameData]):
        self.scenes = scenes

    def __len__(self):
        return len(self.scenes)

    def get_scene(self, idx: int) -> FrameData:
        return self.scenes[idx]

    def iter_scenes(self, limit: int = -1):
        """Lazily yield scenes (never materializes the whole split — for
        CO3DSceneDataset `.scenes` builds a list of every sequence, defeating
        its LRU host-cache bound: ~600 MB/sequence at the release scale)."""
        n = len(self) if limit < 0 else min(limit, len(self))
        for i in range(n):
            yield self.get_scene(i)

    def first_scenes(self, k: int):
        return list(self.iter_scenes(k))

    def sample_batch(self, rng: np.random.RandomState, batch_size: int) -> FrameData:
        """One same-sequence batch: `batch_size` frames of one random scene
        (with replacement when the scene has fewer frames)."""
        scene = self.scenes[rng.randint(len(self.scenes))]
        n = scene.batch_size
        replace = n < batch_size
        idx = rng.choice(n, size=min(batch_size, n) if not replace else batch_size,
                         replace=replace)
        return jax.tree.map(lambda x: x[jnp.asarray(idx)], scene)


class SyntheticDataProvider:
    def __init__(
        self,
        n_scenes: int = 8,
        n_views_per_scene: int = 8,
        image_size: int = 64,
        seed: int = 0,
        **_,
    ):
        self.train = SceneDataset(
            [
                make_synthetic_scene(n_views_per_scene, image_size, seed=seed + i)
                for i in range(n_scenes)
            ]
        )
        # val reuses held-out seeds
        self.val = SceneDataset(
            [
                make_synthetic_scene(n_views_per_scene, image_size, seed=seed + 1000 + i)
                for i in range(max(1, n_scenes // 4))
            ]
        )


def epoch_loader(
    dataset: SceneDataset,
    batch_size: int,
    n_batches: int,
    seed: int,
) -> Iterator[FrameData]:
    """Deterministic per-epoch batch stream (the reference reseeds every epoch
    with seed + epoch, training_loop.py:232-234 — pass that seed here)."""
    rng = np.random.RandomState(seed)
    for _ in range(n_batches):
        yield dataset.sample_batch(rng, batch_size)


def device_batched_loader(
    dataset: SceneDataset,
    batch_size: int,
    n_batches: int,
    seed: int,
    n_devices: int,
    process_index: int = 0,
    process_count: int = 1,
    transform=None,
) -> Iterator[FrameData]:
    """Stacks same-sequence batches along a leading device axis for the SPMD
    train step (one scene per device).

    Multi-host sharding: `n_devices` is the GLOBAL device count; each process
    materializes ONLY its own devices' slice (disjoint contiguous blocks of
    the device axis, matching jax's device order for a 1-axis mesh). The
    per-(batch, device) RNG is derived deterministically from (seed, batch,
    global device index), so every process agrees on the global batch without
    building it — the reference instead gives every DDP rank its own seed
    stream (experiment.py:167); here determinism is global by construction.

    transform: optional per-scene-batch FrameData transform (e.g. the
    compact-source preprocessor, data/compact.py) applied BEFORE the device
    stack, so it sees plain (B, ...) batches.
    """
    assert n_devices % process_count == 0, (n_devices, process_count)
    local = n_devices // process_count
    first = process_index * local
    for b in range(n_batches):
        batches = [
            # SeedSequence hashes the (seed, batch, device) key — unlike the
            # previous linear arithmetic, no (seed, b, d) pair can collide
            # with another epoch's stream (ADVICE r2: b*7919 used to wrap
            # into the next seed's stride at b >= 127)
            dataset.sample_batch(
                np.random.RandomState(
                    np.random.SeedSequence((seed, b, first + d)).generate_state(1)[0]
                ),
                batch_size,
            )
            for d in range(local)
        ]
        if transform is not None:
            batches = [transform(b) for b in batches]
        yield jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


class AsyncLoader:
    """Background-thread prefetcher around any batch iterator — the TPU-side
    replacement for the reference's dataloader worker processes (num_workers,
    configs/base.yaml:61): overlap host-side decode/crop/collate (incl. the
    native C++ kernels, which release the GIL) with device steps."""

    def __init__(self, iterator, prefetch: int = 2, transfer=None):
        """transfer: optional fn applied to each item IN the worker thread —
        pass `jax.device_put` (or a mesh shard_batch closure) to overlap the
        host->device copy with the device step running on the main thread.
        jax dispatch is thread-safe; the queue then holds device-committed
        batches and the main loop never blocks on H2D."""
        import queue
        import threading

        self._q = queue.Queue(maxsize=prefetch)
        self._err = None

        def worker():
            try:
                for item in iterator:
                    if transfer is not None:
                        item = transfer(item)
                    self._q.put(item)
            except BaseException as e:  # noqa: BLE001
                self._err = e
            finally:
                self._q.put(_SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is _SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item


_SENTINEL = object()


class WholeDatasetLoader:
    """`whole_dataset_batch` mode (training_loop.py:127, 715-739): collate the
    ENTIRE dataset once and replay the same device-resident batch
    `n_batches_in_epoch` times per epoch — zero host IO in the hot loop."""

    def __init__(self, dataset: SceneDataset, batch_size: int,
                 n_batches_in_epoch: int, seed: int = 0):
        rng = np.random.RandomState(seed)
        self._batch = dataset.sample_batch(rng, batch_size)
        self.n_batches_in_epoch = n_batches_in_epoch

    def __iter__(self):
        for _ in range(self.n_batches_in_epoch):
            yield self._batch
