"""Checkpoint save / find / purge / resume.

Rebuild of the reference's model_io + factory-resume path (SURVEY.md §3.5:
training_loop.py:617-674 save + purge; model_factory.py:96-126 and
optimizer_factory.py:153-247 resume; epoch-numbered names `model_epoch_%08d`).
Uses orbax with step-numbered directories plus the stats json and the
`expconfig.yaml` snapshot as the re-hydration key (checkpoint_utils.py:17-37).
Host-side writes happen on process 0 only (jax.process_index() gating —
the TPU analog of rank gating at training_loop.py:635-637).
"""
from __future__ import annotations

import os
import re
import shutil
from typing import List, Optional, Tuple

import jax
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"^model_epoch_(\d{8})$")


def checkpoint_dir(exp_dir: str, epoch: int) -> str:
    return os.path.join(exp_dir, f"model_epoch_{epoch:08d}")


def list_checkpoints(exp_dir: str) -> List[Tuple[int, str]]:
    if not os.path.isdir(exp_dir):
        return []
    out = []
    for name in os.listdir(exp_dir):
        m = _CKPT_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(exp_dir, name)))
    return sorted(out)


def find_last_checkpoint(exp_dir: str) -> Optional[Tuple[int, str]]:
    cps = list_checkpoints(exp_dir)
    return cps[-1] if cps else None


def save_checkpoint(exp_dir: str, epoch: int, state, stats=None, purge: int = 1):
    """Save TrainState (+stats) at `exp_dir/model_epoch_{epoch:08d}`; purge all
    but the last `purge` checkpoints (training_loop.py:660-670). Never raises
    on IO errors (disk-full resilience, training_loop.py:643-657)."""
    if jax.process_index() != 0:
        return
    try:
        path = checkpoint_dir(exp_dir, epoch)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        ckptr.wait_until_finished()
        if stats is not None:
            stats.save(os.path.join(exp_dir, "train_stats.json"))
        if purge and purge > 0:
            for ep, p in list_checkpoints(exp_dir)[:-purge]:
                shutil.rmtree(p, ignore_errors=True)
    except Exception as e:  # noqa: BLE001 — keep training alive on IO errors
        print(f"WARNING: checkpoint save failed: {e}")


def restore_checkpoint(exp_dir: str, state_like, epoch: int = -1):
    """Restore the given (or last) epoch checkpoint into the structure of
    `state_like`. Returns (state, epoch) or (None, -1) when absent."""
    if epoch >= 0:
        path = checkpoint_dir(exp_dir, epoch)
        if not os.path.isdir(path):
            return None, -1
        found = (epoch, path)
    else:
        found = find_last_checkpoint(exp_dir)
        if found is None:
            return None, -1
    ep, path = found
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(path), state_like)
    return state, ep
