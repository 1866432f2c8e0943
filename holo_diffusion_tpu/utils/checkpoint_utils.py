"""Experiment re-hydration from a trained exp_dir.

Rebuild of the reference `load_experiment` (utils/checkpoint_utils.py:23-76):
merge the stored `expconfig.yaml` snapshot with overrides, rebuild the model,
and restore the latest checkpoint.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

from ..config import apply_dotted_overrides, load_config
from ..experiment import Experiment
from ..parallel import TrainState
from ..train.checkpoint import restore_checkpoint


def load_experiment(
    exp_dir: str,
    overrides: Optional[List[str]] = None,
    render_size: Optional[Tuple[int, int]] = None,
    use_ema: bool = False,
) -> Tuple[Experiment, TrainState]:
    """Returns (experiment, restored TrainState); raises when no checkpoint
    exists (force_resume semantics, checkpoint_utils.py:58-64).

    use_ema: swap the EMA parameters (tracked when training ran with
    `ema_rate > 0`; guided_diffusion's update_ema, nn.py:61-71) into
    `state.params`, so every downstream `state.variables()` consumer —
    sampling, flyaround, evaluation — renders through the averaged weights."""
    cfg_path = os.path.join(exp_dir, "expconfig.yaml")
    cfg = load_config(cfg_path)
    cfg["exp_dir"] = exp_dir
    if overrides:
        apply_dotted_overrides(cfg, overrides)
    if render_size is not None:
        m = cfg.setdefault("model_factory_ImplicitronModelFactory_args", {}).setdefault(
            "model_HoloDiffusionModel_args", {}
        )
        m["render_image_height"], m["render_image_width"] = render_size

    exp = Experiment(cfg)
    state = exp.init_state()
    restored, ep = restore_checkpoint(exp_dir, state)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint found in {exp_dir}")
    if use_ema:
        if restored.ema_params is None:
            raise ValueError(
                f"use_ema requested but {exp_dir} was trained without EMA "
                "(set ema_rate > 0 in the training config)"
            )
        restored = restored.replace(params=restored.ema_params)
    return exp, restored
