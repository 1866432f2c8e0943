"""Golden fixtures for world-space trilinear voxel sampling, generated with
torch.nn.functional.grid_sample (the CUDA/C++ kernel under pytorch3d
FullResolutionVoxelGrid.evaluate_world; align_corners=True, zeros padding).

    python tests/make_goldens_gridsample.py
"""
import os

import numpy as np
import torch
import torch.nn.functional as F

OUT = os.path.join(os.path.dirname(__file__), "goldens")


def main():
    rng = np.random.RandomState(9)
    D = H = W = 6
    C = 5
    extent = 8.0
    voxel_size = extent / D

    grid = rng.randn(1, C, D, H, W).astype(np.float32)
    # local coords in [-1.2, 1.2] (some out of bounds), xyz order
    local = (rng.rand(1, 257, 3).astype(np.float32) * 2.4) - 1.2
    # world coords per pytorch3d Volumes: world = local * (n-1)*voxel_size/2
    half = np.array(
        [(W - 1) * voxel_size / 2, (H - 1) * voxel_size / 2, (D - 1) * voxel_size / 2],
        np.float32,
    )
    world = local * half

    sampled = F.grid_sample(
        torch.tensor(grid),
        torch.tensor(local).reshape(1, 1, 1, -1, 3),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    )  # (1, C, 1, 1, N)
    sampled = sampled[0, :, 0, 0, :].T.numpy()  # (N, C)

    np.savez_compressed(
        os.path.join(OUT, "gridsample_goldens.npz"),
        grid=grid,
        world=world,
        sampled=sampled,
        extent=np.float32(extent),
    )
    print("wrote gridsample goldens")


if __name__ == "__main__":
    main()
