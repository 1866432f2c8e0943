"""Torch-checkpoint import shim: reference `.pth` state_dicts -> flax params.

Enables pixel-level parity validation against reference checkpoints
(SURVEY.md §7 "Checkpoint compatibility shim"; BASELINE.md north-star). Works
on plain numpy-array dicts so tests can use .npz fixtures without torch.

Layout conversions:
  * Conv3d (O, I, kD, kH, kW)   -> flax Conv kernel (kD, kH, kW, I, O)
  * Conv1d (O, I, 1)            -> flax Dense kernel (I, O)
  * Linear (O, I)               -> flax Dense kernel (I, O)
  * GroupNorm weight/bias       -> scale/bias
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _conv1d(w):
    return np.transpose(w[..., 0], (1, 0))


def _linear(w):
    return np.transpose(w, (1, 0))


def _strip_prefix(sd: Mapping[str, np.ndarray], prefix: str):
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = np.asarray(v)
    return out if out else {k: np.asarray(v) for k, v in sd.items()}


def convert_unet_state_dict(
    state_dict: Mapping[str, np.ndarray],
    num_res_blocks: int = 2,
    channel_mult=(1, 1, 2, 4, 8),
    attention_resolutions=(4, 8),
) -> Dict:
    """Map a reference SimpleUnet3D/UNetModel state_dict onto
    `models.unet3d.UNetModel3D` params (same construction order as
    unet.py:655-798; our block naming mirrors the torch indices).
    """
    sd = _strip_prefix(state_dict, "_net.")

    params: Dict = {}

    def put(path, leaf):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def conv(dst, src):
        path = tuple(dst.split("."))
        put(path + ("kernel",), _conv3d(sd[f"{src}.weight"]))
        put(path + ("bias",), sd[f"{src}.bias"])

    def gn(dst, src):
        put((dst, "gn", "scale"), sd[f"{src}.weight"])
        put((dst, "gn", "bias"), sd[f"{src}.bias"])

    def dense(dst, src, conv1d=False):
        w = sd[f"{src}.weight"]
        put((dst, "kernel"), _conv1d(w) if conv1d else _linear(w))
        put((dst, "bias"), sd[f"{src}.bias"])

    def resblock(dst, src):
        d = params.setdefault(dst, {})

        def put_in(path, leaf):
            node = d
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = leaf

        put_in(("in_gn", "gn", "scale"), sd[f"{src}.in_layers.0.weight"])
        put_in(("in_gn", "gn", "bias"), sd[f"{src}.in_layers.0.bias"])
        put_in(("in_conv", "kernel"), _conv3d(sd[f"{src}.in_layers.2.weight"]))
        put_in(("in_conv", "bias"), sd[f"{src}.in_layers.2.bias"])
        put_in(("emb_dense", "kernel"), _linear(sd[f"{src}.emb_layers.1.weight"]))
        put_in(("emb_dense", "bias"), sd[f"{src}.emb_layers.1.bias"])
        put_in(("out_gn", "gn", "scale"), sd[f"{src}.out_layers.0.weight"])
        put_in(("out_gn", "gn", "bias"), sd[f"{src}.out_layers.0.bias"])
        put_in(("out_conv", "kernel"), _conv3d(sd[f"{src}.out_layers.3.weight"]))
        put_in(("out_conv", "bias"), sd[f"{src}.out_layers.3.bias"])
        if f"{src}.skip_connection.weight" in sd:
            put_in(("skip_conv", "kernel"), _conv3d(sd[f"{src}.skip_connection.weight"]))
            put_in(("skip_conv", "bias"), sd[f"{src}.skip_connection.bias"])

    def attention(dst, src):
        # AttentionBlock3D's norm is a GroupNorm32 submodule named "gn"
        put((dst, "gn", "gn", "scale"), sd[f"{src}.norm.weight"])
        put((dst, "gn", "gn", "bias"), sd[f"{src}.norm.bias"])
        # qkv/proj are nn.Conv1d in torch (unet.py:383-391)
        w = sd[f"{src}.qkv.weight"]
        put((dst, "qkv", "kernel"), _conv1d(w))
        put((dst, "qkv", "bias"), sd[f"{src}.qkv.bias"])
        put((dst, "proj", "kernel"), _conv1d(sd[f"{src}.proj_out.weight"]))
        put((dst, "proj", "bias"), sd[f"{src}.proj_out.bias"])

    dense("time_dense_0", "time_embed.0")
    dense("time_dense_1", "time_embed.2")
    conv("in_conv", "input_blocks.0.0")

    # encoder — mirror the torch construction loop (unet.py:661-714)
    idx = 1
    ds = 1
    for level in range(len(channel_mult)):
        for _ in range(num_res_blocks):
            resblock(f"input_{idx}_res", f"input_blocks.{idx}.0")
            if ds in attention_resolutions:
                attention(f"input_{idx}_attn", f"input_blocks.{idx}.1")
            idx += 1
        if level != len(channel_mult) - 1:
            conv(f"input_{idx}_down.conv", f"input_blocks.{idx}.0.op")
            idx += 1
            ds *= 2

    resblock("middle_res_0", "middle_block.0")
    attention("middle_attn", "middle_block.1")
    resblock("middle_res_1", "middle_block.2")

    # decoder (unet.py:743-790)
    idx = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res_blocks + 1):
            resblock(f"output_{idx}_res", f"output_blocks.{idx}.0")
            sub = 1
            if ds in attention_resolutions:
                attention(f"output_{idx}_attn", f"output_blocks.{idx}.{sub}")
                sub += 1
            if level and i == num_res_blocks:
                conv(f"output_{idx}_up.conv", f"output_blocks.{idx}.{sub}.conv")
                ds //= 2
            idx += 1

    gn("out_gn", "out.0")
    conv("out_conv", "out.2")
    return {"params": params}


def convert_mlp_with_input_skips(
    state_dict: Mapping[str, np.ndarray], prefix: str, n_layers: int
) -> Dict:
    """Map a reference MLPWithInputSkips (custom_modules.py:44-160):
    `{prefix}.mlp.{i}.0.weight/bias` -> linear_{i}."""
    out = {}
    for i in range(n_layers):
        out[f"linear_{i}"] = {
            "kernel": _linear(np.asarray(state_dict[f"{prefix}.mlp.{i}.0.weight"])),
            "bias": np.asarray(state_dict[f"{prefix}.mlp.{i}.0.bias"]),
        }
    return out


def convert_render_mlp(
    state_dict: Mapping[str, np.ndarray],
    prefix: str = "",
    dnet_num_layers: int = 4,
    rnet_num_layers: int = 1,
    has_feature_net: bool = False,
) -> Dict:
    """Map a reference RenderMLP (holo_voxel_grid_implicit_function.py:48-145)."""
    p = prefix + "." if prefix and not prefix.endswith(".") else prefix
    out = {
        "_density_net": convert_mlp_with_input_skips(
            state_dict, f"{p}_density_net", dnet_num_layers
        ),
        "_radiance_net": convert_mlp_with_input_skips(
            state_dict, f"{p}_radiance_net", rnet_num_layers
        ),
    }
    if has_feature_net:
        out["_feature_net"] = convert_mlp_with_input_skips(
            state_dict, f"{p}_feature_net", rnet_num_layers
        )
    return out


def convert_resnet_state_dict(
    state_dict: Mapping[str, np.ndarray],
    layers=(3, 4, 6, 3),
    stages=(1, 2, 3, 4),
    prefix: str = "",
) -> Dict:
    """Map a torchvision resnet18/34 state_dict onto
    `models.feature_extractor.ResNetFeatureExtractor` variables — imports the
    ImageNet-pretrained stem the reference uses (`pretrained: true`,
    hydrant.yaml:168). Returns {"params": ..., "batch_stats": ...}; the
    projection convs (proj_layer{i}) are NOT in torchvision and keep their
    random init — merge with an `init`ed variable tree via `merge_params`.

    torchvision keys: conv1, bn1, layer{i}.{j}.conv{1,2}, .bn{1,2},
    .downsample.{0,1}.
    """
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    params: Dict = {}
    stats: Dict = {}

    def conv2d(w):
        return np.transpose(w, (2, 3, 1, 0))

    def put_conv(dst, src):
        params[dst] = {"kernel": conv2d(sd[f"{src}.weight"])}

    def put_bn(dst, src):
        params[dst] = {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}
        stats[dst] = {
            "mean": sd[f"{src}.running_mean"],
            "var": sd[f"{src}.running_var"],
        }

    put_conv("stem_conv", "conv1")
    put_bn("stem_bn", "bn1")
    max_stage = max(stages)
    for li, n_blocks in enumerate(layers, start=1):
        if li > max_stage:
            break
        for bi in range(n_blocks):
            blk: Dict = {}
            bst: Dict = {}
            base = f"layer{li}.{bi}"
            blk["conv1"] = {"kernel": conv2d(sd[f"{base}.conv1.weight"])}
            blk["conv2"] = {"kernel": conv2d(sd[f"{base}.conv2.weight"])}
            for bn_name, src in (("bn1", f"{base}.bn1"), ("bn2", f"{base}.bn2")):
                blk[bn_name] = {
                    "scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]
                }
                bst[bn_name] = {
                    "mean": sd[f"{src}.running_mean"],
                    "var": sd[f"{src}.running_var"],
                }
            if f"{base}.downsample.0.weight" in sd:
                blk["down_conv"] = {
                    "kernel": conv2d(sd[f"{base}.downsample.0.weight"])
                }
                blk["down_bn"] = {
                    "scale": sd[f"{base}.downsample.1.weight"],
                    "bias": sd[f"{base}.downsample.1.bias"],
                }
                bst["down_bn"] = {
                    "mean": sd[f"{base}.downsample.1.running_mean"],
                    "var": sd[f"{base}.downsample.1.running_var"],
                }
            params[f"layer{li}_block{bi}"] = blk
            stats[f"layer{li}_block{bi}"] = bst
    return {"params": params, "batch_stats": stats}


def merge_params(base_variables: Dict, imported: Dict) -> Dict:
    """Deep-merge imported leaves over an initialized variable tree (keeps
    layers absent from the import, e.g. the proj convs)."""
    import copy

    out = copy.deepcopy(base_variables)

    def rec(dst, src):
        for k, v in src.items():
            if isinstance(v, Mapping) and k in dst and isinstance(dst[k], Mapping):
                rec(dst[k], v)
            else:
                dst[k] = v

    rec(out, imported)
    return out


def convert_holo_model_state_dict(
    state_dict: Mapping[str, np.ndarray],
    base_variables: Dict,
    num_res_blocks: int = 2,
    channel_mult=(1, 1, 2, 4, 8),
    attention_resolutions=(4, 8),
    dnet_num_layers: int = 4,
    rnet_num_layers: int = 1,
    resnet_layers=(3, 4, 6, 3),
    resnet_stages=(1, 2, 3, 4),
) -> Dict:
    """Best-effort full-model import: a reference HoloDiffusionModel `.pth`
    state_dict -> our HoloDiffusionModel variables (BASELINE.md north-star:
    pixel-level fidelity renders from reference checkpoints).

    Reference submodule prefixes (holo_diffusion_model.py:110-171):
      * `net_3d._net.*`                    -> params.net_3d
      * `_implicit_functions.0._fn.render_mlp.*` -> params.implicit_function.render_mlp
      * `pooled_feature_mapper.*`          -> params.pooled_feature_mapper
      * `image_feature_extractor.*resnet*` -> params.feature_extractor (torchvision layout)
      * `view_pooler.feature_aggregator.*` -> params.view_pooler (MLPMean only)

    Unknown/missing pieces keep their values from `base_variables` (pass an
    `init`ed tree). Returns the merged variables.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out = merge_params(base_variables, {})  # deep copy

    def subset(prefix):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    # --- UNet
    unet_sd = subset("net_3d._net.")
    if unet_sd:
        unet = convert_unet_state_dict(
            unet_sd, num_res_blocks, channel_mult, attention_resolutions
        )
        out = merge_params(out, {"params": {"net_3d": unet["params"]}})

    # --- RenderMLP (shared across passes, holo_diffusion_model.py:165-169)
    for if_prefix in (
        "_implicit_functions.0._fn.render_mlp.",
        "implicit_function.render_mlp.",
    ):
        rmlp_sd = subset(if_prefix)
        if rmlp_sd:
            rmlp = convert_render_mlp(
                rmlp_sd, "", dnet_num_layers, rnet_num_layers,
                has_feature_net=any(k.startswith("_feature_net") for k in rmlp_sd),
            )
            out = merge_params(
                out,
                {"params": {"implicit_function": {"render_mlp": rmlp}}},
            )
            break

    # --- pooled feature mapper (LazyLinear, holo_diffusion_model.py:113)
    if "pooled_feature_mapper.weight" in sd:
        out = merge_params(
            out,
            {
                "params": {
                    "pooled_feature_mapper": {
                        "kernel": _linear(sd["pooled_feature_mapper.weight"]),
                        "bias": sd["pooled_feature_mapper.bias"],
                    }
                }
            },
        )

    # --- ResNet feature extractor (torchvision-layout keys nested under the
    # Implicitron wrapper; try known nestings)
    for fe_prefix in (
        "image_feature_extractor.net.",
        "image_feature_extractor._net.",
        "image_feature_extractor.resnet.",
    ):
        fe_sd = subset(fe_prefix)
        if any(k.startswith("conv1") for k in fe_sd):
            resnet = convert_resnet_state_dict(
                fe_sd, layers=resnet_layers, stages=resnet_stages
            )
            out = merge_params(
                out,
                {
                    "params": {"feature_extractor": resnet["params"]},
                    "batch_stats": {"feature_extractor": resnet["batch_stats"]},
                },
            )
            # per-stage projection convs (Implicitron `proj` layers)
            for li in resnet_stages:
                for key in (
                    f"image_feature_extractor.proj_layers.{li - 1}.weight",
                    f"image_feature_extractor.layer_proj.{li - 1}.weight",
                ):
                    if key in sd:
                        out = merge_params(
                            out,
                            {
                                "params": {
                                    "feature_extractor": {
                                        f"proj_layer{li}": {
                                            "kernel": np.transpose(
                                                sd[key], (2, 3, 1, 0)
                                            ),
                                            "bias": sd[
                                                key.replace(".weight", ".bias")
                                            ],
                                        }
                                    }
                                }
                            },
                        )
            break

    # --- MLPMean aggregator (custom_modules.py:162-293)
    agg_prefix = "view_pooler.feature_aggregator."
    if f"{agg_prefix}_first_sampled.weight" in sd:
        agg = {
            "first_sampled": {
                "kernel": _linear(sd[f"{agg_prefix}_first_sampled.weight"]),
                "bias": sd[f"{agg_prefix}_first_sampled.bias"],
            },
            "first_mean": {
                "kernel": _linear(sd[f"{agg_prefix}_first_mean.weight"]),
                "bias": sd[f"{agg_prefix}_first_mean.bias"],
            },
            "last": {
                "kernel": _linear(sd[f"{agg_prefix}_last.weight"]),
                "bias": sd[f"{agg_prefix}_last.bias"],
            },
            "mlp": convert_mlp_with_input_skips(sd, f"{agg_prefix}_mlp", 1),
        }
        out = merge_params(
            out, {"params": {"view_pooler": {"aggregator": agg}}}
        )

    return out
