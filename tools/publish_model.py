"""Strip optimizer state from a checkpoint and append a content hash
(reference tools/publish_model.py).

Usage: python tools/publish_model.py IN_CKPT OUT_DIR
"""

from __future__ import annotations

import argparse
import hashlib
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_ckpt")
    p.add_argument("out_dir")
    args = p.parse_args()

    from vps_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    import jax

    from vps_tpu.utils.platform import apply_env_platforms
    apply_env_platforms()
    import numpy as np

    restored = load_checkpoint(args.in_ckpt)
    params = restored["params"]
    batch_stats = restored.get("batch_stats")
    path = save_checkpoint(args.out_dir, 0, params, batch_stats=batch_stats,
                           meta=dict(published=True, source=args.in_ckpt))

    h = hashlib.sha256()
    for leaf in jax.tree.leaves(params):
        h.update(np.asarray(leaf).tobytes())
    digest = h.hexdigest()[:8]
    final = path + f"-{digest}"
    os.rename(path, final)
    with open(osp.join(args.out_dir, "latest.txt"), "w") as f:
        f.write(osp.basename(final))
    print(f"published {final}")


if __name__ == "__main__":
    main()
