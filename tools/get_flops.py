"""FLOPs/params reporter (reference tools/get_flops.py +
mmdet/utils/flops_counter.py) — uses XLA's cost analysis of the jitted
forward instead of per-module hooks.

Usage: python tools/get_flops.py CONFIG [--shape 1024 2048]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--shape", type=int, nargs=2, default=[1024, 2048])
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    from vps_tpu.utils.platform import apply_env_platforms
    apply_env_platforms()
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vps_tpu.config import Config
    from vps_tpu.models import build_detector
    from vps_tpu.models.detectors import empty_track_state

    cfg = Config.fromfile(args.config)
    det = build_detector(cfg.model, train_cfg=cfg.train_cfg, test_cfg=cfg.test_cfg)
    h, w = args.shape
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    state = empty_track_state(cap=256)

    shapes = jax.eval_shape(
        lambda: det.init({"params": jax.random.PRNGKey(0)}, img, img, state,
                         method=det.predict)
    )
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))
    print(f"params: {n_params / 1e6:.2f} M")

    def fwd(variables):
        out, _ = det.apply(variables, img, img, state, method=det.predict)
        return out["panoptic_outputs"]

    lowered = jax.jit(fwd).lower(shapes)
    try:
        cost = lowered.compile().cost_analysis()
        flops = cost.get("flops", float("nan"))
        print(f"forward flops: {flops / 1e9:.2f} GFLOPs @ {h}x{w}")
        print(f"bytes accessed: {cost.get('bytes accessed', float('nan')) / 1e9:.2f} GB")
    except Exception as e:  # cost analysis is backend-dependent
        print(f"cost analysis unavailable: {e}")


if __name__ == "__main__":
    main()
