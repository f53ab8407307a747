"""Checkpointing (orbax) — reference semantics: ``load_from`` = weights-only
warm start (e.g. FuseTrack from the image-panoptic Fuse checkpoint,
configs/cityscapes/fusetrack.py:249), ``resume_from`` = weights + optimizer
+ epoch; checkpoint meta embeds the config text and CLASSES
(tools/train.py:90-96)."""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


def save_checkpoint(
    work_dir: str,
    step: int,
    params,
    opt_state=None,
    batch_stats=None,
    meta: Optional[Dict[str, Any]] = None,
    keep: int = 5,
):
    path = osp.join(osp.abspath(work_dir), f"ckpt_{step}")
    os.makedirs(osp.abspath(work_dir), exist_ok=True)
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if batch_stats is not None:
        payload["batch_stats"] = batch_stats
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump({k: str(v) for k, v in meta.items()}, f)
    latest = osp.join(osp.abspath(work_dir), "latest.txt")
    with open(latest, "w") as f:
        f.write(osp.basename(path))
    _gc(work_dir, keep)
    return path


def _gc(work_dir: str, keep: int):
    ckpts = sorted(
        (d for d in os.listdir(work_dir) if d.startswith("ckpt_") and
         not d.endswith(".meta.json")),
        key=lambda d: int(d.split("_")[1]),
    )
    import shutil

    for d in ckpts[:-keep]:
        shutil.rmtree(osp.join(work_dir, d), ignore_errors=True)


def latest_checkpoint(work_dir: str) -> Optional[str]:
    latest = osp.join(osp.abspath(work_dir), "latest.txt")
    if not osp.exists(latest):
        return None
    with open(latest) as f:
        return osp.join(osp.abspath(work_dir), f.read().strip())


def load_checkpoint(path: str, target=None):
    """Restore a checkpoint. ``target``: a pytree of like-shaped arrays;
    None restores as saved.

    Lenient at the TOP level: a training checkpoint (params + opt_state +
    batch_stats) loads into an inference template (params only) — the
    reference's load_checkpoint(strict=False) behavior that the test tools
    rely on. Unknown template keys fall back to the template's own values
    (e.g. a model with batch_stats restoring a checkpoint without them).
    """
    ckptr = ocp.StandardCheckpointer()
    path = osp.abspath(path)
    if target is None:
        return ckptr.restore(path)
    try:
        return ckptr.restore(path, target)
    except ValueError as first_err:
        raw = ckptr.restore(path)
        out = dict(target)
        fallback_keys = []
        for k in target:
            if k in raw and raw[k] is not None:
                _check_tree_compat(k, raw[k], target[k], first_err)
                out[k] = raw[k]
            else:
                fallback_keys.append(k)
        if fallback_keys:
            import logging

            logging.getLogger("vps_tpu").warning(
                "load_checkpoint(%s): keys %s absent from checkpoint; "
                "keeping template values", path, fallback_keys
            )
        return out


def _check_tree_compat(key: str, restored, template, first_err):
    """A checkpoint from a different model must not load silently: validate
    the restored subtree's structure and leaf shapes against the template
    (empty-dict templates accept anything — the 'model without batch_stats'
    lenient case)."""
    t_leaves, t_def = jax.tree.flatten(template)
    if not t_leaves:
        return
    r_leaves, r_def = jax.tree.flatten(restored)
    if r_def != t_def:
        raise ValueError(
            f"load_checkpoint: restored '{key}' tree structure does not "
            f"match the target model: {r_def} vs {t_def}"
        ) from first_err
    for rl, tl in zip(r_leaves, t_leaves):
        rs = tuple(np.shape(rl))
        ts = tuple(np.shape(tl))
        if rs != ts:
            raise ValueError(
                f"load_checkpoint: shape mismatch in '{key}': "
                f"restored {rs} vs target {ts}"
            ) from first_err
