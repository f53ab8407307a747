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
    except ValueError:
        raw = ckptr.restore(path)
        out = dict(target)
        for k in target:
            if k in raw and raw[k] is not None:
                out[k] = raw[k]
        return out
