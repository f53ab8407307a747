"""Video panoptic inference + VPS artifact generation (reference
tools/test_vpq.py): runs the detector over every frame of every val video
(sequential — tracking state), builds unified 3-channel panoptic maps, and
writes pan_pred/*.png + pred.json for eval_vpq.

Usage: python tools/test_vpq.py CONFIG --checkpoint CKPT --out OUT.pkl
       [--pan_im_json_file data/cityscapes_vps/panoptic_im_val_city_vps.json]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True, help="output pickle path")
    p.add_argument("--pan_im_json_file", default=None,
                   help="categories json (panoptic gt im json)")
    p.add_argument("--mode", default="val", choices=["val", "test"])
    p.add_argument("--n_video", type=int, default=0)
    p.add_argument("--track_cap", type=int, default=256)
    p.add_argument("--chunk", type=int, default=8,
                   help="frames per on-device lax.scan dispatch (1 = "
                        "per-frame host loop)")
    p.add_argument("--aug", action="store_true",
                   help="test-time augmentation: horizontal-flip variants "
                        "merged with the reference aug-test semantics "
                        "(test_mixins.py merge_aug_*); forces the per-frame "
                        "host loop")
    p.add_argument("--aug-scales", default=None,
                   help="comma-separated extra TTA scales as WxH (e.g. "
                        "'1024x512'); the config's test scale is always "
                        "variant 0. Implies --aug")
    p.add_argument("--lambda", dest="lambda_", type=int, default=5,
                   help="frame subsampling stride of the annotated frames "
                        "(reference inference_panoptic_video: every 5th "
                        "Cityscapes-VPS frame is labeled; 1 = all frames)")
    p.add_argument("--labeled_fid", type=int, default=20)
    p.add_argument("--nframes_per_video", type=int, default=6)
    p.add_argument("--preset", default=None,
                   help="inference preset applied to the model cfg "
                        "(vps_tpu.zoo.PRESETS: exact / half-flow / "
                        "lowres-sem / fast / fast-lowres); presets are "
                        "param-free, so any checkpoint loads unchanged")
    p.add_argument("--streams", type=int, default=0,
                   help="parallel video streams round-robined over local "
                        "devices (0 = one per local device; videos are "
                        "independent, so this scales eval throughput "
                        "near-linearly with chips)")
    p.add_argument("--show_dir", default=None,
                   help="save per-frame visualizations (detections drawn on "
                        "the frame + colorized panoptic map side by side) — "
                        "the reference tools/test.py --show surface")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from vps_tpu.utils.platform import apply_env_platforms
    apply_env_platforms()

    from vps_tpu.utils.platform import configure_compile_cache
    configure_compile_cache()
    import jax.numpy as jnp

    from vps_tpu.config import Config
    from vps_tpu.data import build_dataset
    from vps_tpu.models import build_detector
    from vps_tpu.models.detectors import empty_track_state
    from vps_tpu.utils.checkpoint import load_checkpoint
    from vps_tpu.eval.unified import get_unified_pan_result, save_panoptic_outputs

    cfg = Config.fromfile(args.config)
    if args.preset:
        from vps_tpu import zoo
        cfg.model = zoo.preset_overrides(cfg.model, args.preset)
    detector = build_detector(cfg.model, train_cfg=cfg.train_cfg,
                              test_cfg=cfg.test_cfg)
    dataset = build_dataset(cfg.data["test"])

    # init + restore
    img0, ref0, meta0 = dataset.prepare_test(0)
    state0 = empty_track_state(cap=args.track_cap)
    variables = detector.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(img0[None]), jnp.asarray(ref0[None]), state0,
        method=detector.predict,
    )
    restored = load_checkpoint(args.checkpoint, {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    })
    variables = dict(variables)
    variables["params"] = restored["params"]
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]

    shape_nopad = tuple(meta0["img_shape_withoutpad"])

    # params passed as an argument: closure-captured device arrays become
    # MLIR constants that trigger a device→host weight fetch at lowering.
    @jax.jit
    def step_first(variables, img, ref_img, tstate):
        return detector.apply(
            variables, img, ref_img, tstate,
            img_shape_withoutpad=shape_nopad, method=detector.predict,
        )

    # steady-state frames reuse the previous frame's FPN pyramid (the
    # fpn_feats carry) instead of re-running the backbone on ref_img
    @jax.jit
    def step(variables, img, ref_img, tstate, ref_feats):
        return detector.apply(
            variables, img, ref_img, tstate,
            img_shape_withoutpad=shape_nopad, ref_feats=ref_feats,
            method=detector.predict,
        )

    results = dict(all_names=[], all_ssegs=[], all_panos=[],
                   all_pano_cls_inds=[], all_pano_obj_ids=[])
    t0 = time.time()

    if args.show_dir:
        os.makedirs(args.show_dir, exist_ok=True)

    def show_frame(outputs_np, meta):
        # reference tools/test.py --show (BaseDetector.show_result): dets
        # drawn on the frame, plus the colorized panoptic id map
        import cv2

        from vps_tpu.utils.visualize import draw_detections, panoptic_to_color

        raw = cv2.imread(osp.join(dataset.img_prefix, meta["filename"]))
        h, w = shape_nopad[:2]
        frame = cv2.resize(raw, (w, h))[..., ::-1]
        valid = outputs_np["det_valid"].astype(bool)
        boxes = np.concatenate(
            [outputs_np["det_bboxes"][valid],
             outputs_np["det_probs"][valid, None]], -1)
        drawn = draw_detections(
            frame, boxes, outputs_np["det_labels"][valid],
            class_names=getattr(dataset, "CLASSES", None))
        pan = outputs_np["panoptic_outputs"]
        # the raw map is a dense small-int id (cls-or-instance slot), not
        # cat*1000+inst — color each id with its own hue (divisor=1)
        pan_col = panoptic_to_color(
            (pan[0] if pan.ndim == 3 else pan).astype(np.int64), divisor=1)
        pan_col = cv2.resize(pan_col, (w, h),
                             interpolation=cv2.INTER_NEAREST)
        out = np.concatenate([drawn, pan_col], axis=1)
        name = meta["filename"].split("/")[-1].replace(".jpg", ".png")
        cv2.imwrite(osp.join(args.show_dir, name), out[..., ::-1])

    def record(outputs_np, meta):
        nk = int(outputs_np["num_keep"])
        if args.show_dir:
            show_frame(outputs_np, meta)
        results["all_names"].append(meta["filename"].split("/")[-1])
        results["all_ssegs"].append(outputs_np["fcn_outputs"].astype(np.uint8))
        results["all_panos"].append(
            outputs_np["panoptic_outputs"].astype(np.uint8))
        results["all_pano_cls_inds"].append(outputs_np["panoptic_cls_inds"][:nk])
        results["all_pano_obj_ids"].append(
            outputs_np["panoptic_det_obj_ids"][:nk])
        done = len(results["all_names"])
        if done % 50 == 0:
            fps = done / (time.time() - t0)
            print(f"[{done}/{len(dataset)}] {fps:.2f} fps", file=sys.stderr)

    if args.aug or args.aug_scales:
        # TTA path: (scale × flip) variants enumerated by the data
        # pipeline's MultiScaleFlipAug (reference
        # datasets/pipelines/test_aug.py) and merged on-device by
        # detector.predict_aug (the reference's aug-test merge,
        # test_mixins.py:43-110). Variant 0 = the plain test-pipeline
        # output; every variant's content sits at the top-left of ONE
        # shared canvas (smaller scales zero-padded up to it).
        aug_metas = None
        tta_scales = None
        if args.aug_scales:
            base = tuple(dataset.pipeline.img_scale)
            extra = [tuple(int(x) for x in s.split("x"))
                     for s in args.aug_scales.split(",")]
            tta_scales = [base] + extra

        def pack(variants):
            hc = max(v["img"].shape[0] for v in variants)
            wc = max(v["img"].shape[1] for v in variants)
            out_i = np.zeros((len(variants), 1, hc, wc, 3), np.float32)
            out_r = np.zeros_like(out_i)
            for i, v in enumerate(variants):
                hh, ww = v["img"].shape[:2]
                out_i[i, 0, :hh, :ww] = v["img"]
                out_r[i, 0, :hh, :ww] = v["ref_img"]
            return out_i, out_r

        @jax.jit
        def step_aug(variables, imgs, ref_imgs, tstate):
            return detector.apply(
                variables, imgs, ref_imgs, tstate, aug_metas,
                img_shape_withoutpad=shape_nopad,
                method=detector.predict_aug,
            )

        tstate = state0
        for idx in range(len(dataset)):
            variants, meta = dataset.prepare_test_aug(
                idx, flip=True, scales=tta_scales)
            metas_i = tuple(
                dict(flip=v["flip"],
                     scale_ratio=v["scale_factor"]
                     / variants[0]["scale_factor"],
                     img_shape=v["img_shape_withoutpad"])
                for v in variants
            )
            if aug_metas is None:
                aug_metas = metas_i  # captured by step_aug at first trace
            elif metas_i != aug_metas:
                raise ValueError(
                    f"aug meta changed mid-run (frame {idx}): {metas_i} != "
                    f"{aug_metas}; mixed raw image sizes need one jit "
                    "specialization per shape"
                )
            if meta["is_first"]:
                tstate = empty_track_state(cap=args.track_cap)
            imgs, ref_imgs = pack(variants)
            outputs, tstate = step_aug(
                variables, jnp.asarray(imgs), jnp.asarray(ref_imgs), tstate
            )
            record({k: np.asarray(v) for k, v in outputs.items()}, meta)
    elif args.chunk > 1:
        # on-device lax.scan over chunks of frames, whole videos
        # round-robined over per-device streams (vps_tpu
        # run_video_streams): one dispatch per chunk, eval throughput
        # scales with local devices.
        from vps_tpu.models.detectors import run_video_streams

        def frames():
            for idx in range(len(dataset)):
                img, _ref_img, meta = dataset.prepare_test(idx)
                yield img[None], bool(meta["is_first"]), meta

        run_video_streams(
            detector, variables, frames(), chunk=args.chunk, record=record,
            img_shape_withoutpad=shape_nopad, track_cap=args.track_cap,
            n_streams=args.streams or None,
        )
    else:
        tstate = state0
        ref_feats = None
        for idx in range(len(dataset)):
            img, ref_img, meta = dataset.prepare_test(idx)
            if meta["is_first"]:
                tstate = empty_track_state(cap=args.track_cap)
                ref_feats = None
            if ref_feats is None:
                outputs, tstate = step_first(
                    variables, jnp.asarray(img[None]),
                    jnp.asarray(ref_img[None]), tstate,
                )
            else:
                outputs, tstate = step(
                    variables, jnp.asarray(img[None]),
                    jnp.asarray(ref_img[None]), tstate, ref_feats,
                )
            ref_feats = outputs["fpn_feats"]
            record({k: np.asarray(v) for k, v in outputs.items()
                    if k != "fpn_feats"}, meta)

    os.makedirs(osp.dirname(osp.abspath(args.out)), exist_ok=True)
    with open(args.out.replace(".pkl", "_pano.pkl"), "wb") as f:
        pickle.dump(results, f, protocol=2)

    # unified 2ch maps + encoded artifacts
    pano_cfg = cfg.test_cfg.get("panoptic", {})
    stuff_area = pano_cfg.get("stuff_area_limit", 4 * 64 * 64)
    pcfg = cfg.model.get("panoptic", {})
    num_stuff = pcfg.get("num_classes", 19) - pcfg.get("num_things_classes", 8)
    pred_pans_2ch = get_unified_pan_result(
        results["all_ssegs"], results["all_panos"],
        results["all_pano_cls_inds"], results["all_pano_obj_ids"],
        names=results["all_names"], stuff_area_limit=stuff_area,
        num_stuff=num_stuff,
    )
    if args.pan_im_json_file:
        with open(args.pan_im_json_file) as f:
            categories = {c["id"]: c for c in json.load(f)["categories"]}
    else:
        categories = {
            i: dict(id=i, isthing=1 if i >= 11 else 0,
                    color=[(i * 37 + 29) % 256, (i * 91 + 7) % 256,
                           (i * 173 + 83) % 256])
            for i in range(19)
        }
    output_dir = args.out.replace(".pkl", "_pans_unified")
    os.makedirs(output_dir, exist_ok=True)
    save_panoptic_outputs(pred_pans_2ch, categories, output_dir,
                          lambda_=args.lambda_, labeled_fid=args.labeled_fid,
                          nframes_per_video=args.nframes_per_video)
    print(f"VPS outputs written to {output_dir}")


if __name__ == "__main__":
    main()
