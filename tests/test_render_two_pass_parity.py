"""Two-pass render + MC-splat pixel parity vs torch-composed reference
semantics (VERDICT r2 #7).

The golden (goldens/render2pass_goldens.npz, make_goldens_render2pass.py)
runs the REAL reference RenderMLP + torch grid_sample through the full
coarse -> deterministic importance refine (append_coarse) -> fine EA
structure of holo_multipass_ea.py:79-123, plus the training-path MC splat
(holo_diffusion_model.py:499-513). The framework's multipass_ea_render with
imported weights must reproduce every stage."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from holo_diffusion_tpu.geometry.cameras import PerspectiveCameras
from holo_diffusion_tpu.geometry.rays import sample_rays_full_grid
from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel
from holo_diffusion_tpu.ops.splat import rasterize_sparse_rays
from holo_diffusion_tpu.utils.torch_import import convert_render_mlp, merge_params

GOLD = np.load(
    os.path.join(
        os.path.dirname(__file__), "goldens", "render2pass_goldens.npz"
    )
)
H_IMG = W_IMG = 16
N_PTS = 10
N_FINE = 6


def _setup():
    camera = PerspectiveCameras(
        R=jnp.asarray(GOLD["cam_R"]),
        T=jnp.asarray(GOLD["cam_T"]),
        focal_length=jnp.asarray(GOLD["cam_focal"]),
        principal_point=jnp.asarray(GOLD["cam_pp"]),
    )
    grid = jnp.asarray(GOLD["grid"])
    model = HoloDiffusionModel(
        resol=8,
        volume_extent=8.0,
        feature_size=16,
        num_passes=2,
        net_3d_enabled=False,
        diffusion_enabled=False,
        view_pooler_enabled=False,
        render_image_height=H_IMG,
        render_image_width=W_IMG,
        n_pts_per_ray_evaluation=N_PTS,
        n_pts_per_ray_fine_evaluation=N_FINE,
        append_coarse_samples_to_fine=True,
        scene_extent=3.0,
        render_mlp_args=dict(
            feat_emb_dims=0, dir_emb_dims=4, dnet_num_layers=4,
            dnet_hidden_dim=32, dnet_input_skips=(2,), rnet_num_layers=1,
            rnet_hidden_dim=24,
        ),
    )
    bundle = sample_rays_full_grid(
        camera, H_IMG, W_IMG, N_PTS, (0.0, 0.0, 0.0), 3.0
    )
    variables = model.init(
        jax.random.PRNGKey(0), grid, bundle, False, None,
        method=HoloDiffusionModel.render_rays,
    )
    sd = {
        k[len("rmlp_sd::"):]: GOLD[k]
        for k in GOLD.files if k.startswith("rmlp_sd::")
    }
    imported = {
        "params": {"implicit_function": {"render_mlp": convert_render_mlp(sd)}}
    }
    variables = merge_params(
        jax.tree.map(np.asarray, jax.device_get(variables)), imported
    )
    return model, variables, camera, grid, bundle


def test_two_pass_render_matches_torch_golden():
    model, variables, camera, grid, bundle = _setup()
    out = model.apply(
        variables, grid, bundle, False, None,
        method=HoloDiffusionModel.render_rays,
    )
    fine_img = np.asarray(out.features).reshape(H_IMG, W_IMG, 3)
    fine_dep = np.asarray(out.depths).reshape(H_IMG, W_IMG, 1)
    fine_msk = np.asarray(out.masks).reshape(H_IMG, W_IMG, 1)
    coarse_img = np.asarray(out.prev_stage.features)
    assert np.abs(coarse_img - GOLD["coarse_image"]).max() < 1e-4
    assert np.abs(fine_img - GOLD["fine_image"]).max() < 1e-4
    assert np.abs(fine_dep - GOLD["fine_depth"]).max() < 1e-3
    assert np.abs(fine_msk - GOLD["fine_mask"]).max() < 1e-4


def test_mc_splat_matches_torch_golden():
    """rasterize_sparse_rays == reference average-collision splat on the
    recorded fine-pass outputs."""
    camera = PerspectiveCameras(
        R=jnp.asarray(GOLD["cam_R"]),
        T=jnp.asarray(GOLD["cam_T"]),
        focal_length=jnp.asarray(GOLD["cam_focal"]),
        principal_point=jnp.asarray(GOLD["cam_pp"]),
    )
    xys = sample_rays_full_grid(
        camera, H_IMG, W_IMG, N_PTS, (0.0, 0.0, 0.0), 3.0
    ).xys
    imgs, deps, msks = rasterize_sparse_rays(
        xys,
        jnp.asarray(GOLD["fine_image"].reshape(1, -1, 3)),
        (H_IMG, W_IMG),
        jnp.asarray(GOLD["fine_depth"].reshape(1, -1, 1)),
        jnp.asarray(GOLD["fine_mask"].reshape(1, -1, 1)),
    )
    assert np.abs(np.asarray(imgs[0]) - GOLD["splat_image"]).max() < 1e-4
    assert np.abs(np.asarray(deps[0]) - GOLD["splat_depth"]).max() < 1e-3
    assert np.abs(np.asarray(msks[0]) - GOLD["splat_mask"]).max() < 1e-4
