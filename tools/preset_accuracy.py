"""Preset accuracy harness: train a tiny FuseTrack to convergence on the
synthetic VPS fixture, then score every inference preset with the
framework's own VPQ toolchain.

The reference's quality bar is VPQ over trained weights
(reference tools/eval_vpq.py:315-330); with no released checkpoints
available, this harness is the accuracy gate for every semantics-changing
perf direction (PERF.md): a preset is only promoted if its fixture-VPQ
delta justifies its fps win. The whole chain runs through the real CLIs —
tools/train.py -> tools/test_vpq.py --preset -> tools/eval_vpq.py —
with nothing mocked (SURVEY.md §4: the eval scripts ARE the test harness).

Usage:
  python tools/preset_accuracy.py --work_dir /tmp/preset_acc \
      [--epochs 40] [--train_videos 10] [--val_videos 2] [--frames 4] \
      [--presets exact,half-flow,lowres-sem,fast,fast-lowres] \
      [--skip_train]  # reuse an existing checkpoint in work_dir

Emits {work_dir}/preset_accuracy.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import re
import subprocess
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIG_TMPL = """
from vps_tpu import zoo

model = zoo.tiny_overrides(zoo.fusetrack_model_cfg())
train_cfg = zoo.tiny_train_cfg()
test_cfg = zoo.tiny_test_cfg()

_pipe = dict(img_scale=({W}, {H}), ratio_range=(1.0, 1.0), flip_ratio=0.5,
             crop_size=({H}, {W}), max_gt=8)
data = dict(
    imgs_per_gpu=1,
    workers_per_gpu=0,
    train=dict(type="CityscapesVPSDataset", ann_file=r"{train_ann}",
               img_prefix=r"{train_img}", seg_prefix=r"{train_seg}",
               ref_ann_file=r"{train_ann}", offsets=[-1, 1], pipeline=_pipe),
    test=dict(type="CityscapesVPSDataset", ann_file=r"{val_ann}",
              img_prefix=r"{val_img}", nframes_span_test={frames},
              test_mode=True, pipeline=dict(img_scale=({W}, {H}))),
)
optimizer = dict(type="SGD", lr={lr}, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="step", warmup="linear", warmup_iters=50,
                 warmup_ratio=0.333, step=[{step_epoch}])
checkpoint_config = dict(interval={epochs})
log_config = dict(interval=10)
total_epochs = {epochs}
work_dir = r"{work}"
"""


def run(cmd, env, timeout, tag):
    print(f"[preset_accuracy] {tag}: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=timeout)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + r.stderr[-4000:])
        raise RuntimeError(f"{tag} failed (rc={r.returncode})")
    return r


def epoch_losses(log_path):
    """Per-epoch mean total loss from train.log lines
    'Epoch [e][i/n] ... loss: X'."""
    by_epoch = {}
    pat = re.compile(r"Epoch \[(\d+)\].*?[, ]loss: ([0-9.eE+-]+)")
    with open(log_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                by_epoch.setdefault(int(m.group(1)), []).append(
                    float(m.group(2)))
    return {e: sum(v) / len(v) for e, v in sorted(by_epoch.items())}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work_dir", required=True)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--lr", type=float, default=0.002)
    p.add_argument("--train_videos", type=int, default=10)
    p.add_argument("--val_videos", type=int, default=2)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--size", default="256x128", help="WxH")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--presets",
                   default="exact,half-flow,lowres-sem,fast,fast-lowres")
    p.add_argument("--skip_train", action="store_true",
                   help="reuse work_dir fixture + checkpoint")
    p.add_argument("--platform", default=None,
                   help="JAX_PLATFORMS for the child processes "
                        "(default: inherit; the TPU is ~100x faster/step)")
    args = p.parse_args()

    W, H = (int(x) for x in args.size.split("x"))
    work = osp.abspath(args.work_dir)
    os.makedirs(work, exist_ok=True)
    env = dict(os.environ)
    if args.platform:
        env["JAX_PLATFORMS"] = args.platform
    # child processes must not inherit the test conftest's 8-device flag
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)

    fix = osp.join(work, "fixture")
    cfg_path = osp.join(work, "cfg.py")
    train_work = osp.join(work, "train")
    if not args.skip_train:
        from vps_tpu.data.synth import make_synth_vps

        train_ann, train_img, train_seg = make_synth_vps(
            fix, mode="train", n_videos=args.train_videos,
            n_frames=args.frames, H=H, W=W, seed=args.seed,
            first_video=101)
        val_ann, val_img, _ = make_synth_vps(
            fix, mode="val", n_videos=args.val_videos,
            n_frames=args.frames, H=H, W=W, seed=args.seed + 1,
            first_video=1)
        # eval-side GT through the real prepare_data scripts
        for script, extra in (("create_panoptic_labels.py",
                               ["--workers", "1"]),
                              ("create_panoptic_video_labels.py", [])):
            run([sys.executable, osp.join(REPO, "prepare_data", script),
                 "--mode", "val", "--root_dir", fix] + extra,
                dict(env, JAX_PLATFORMS="cpu"), 600, script)
        with open(cfg_path, "w") as f:
            f.write(CONFIG_TMPL.format(
                W=W, H=H, frames=args.frames, train_ann=train_ann,
                train_img=train_img, train_seg=train_seg, val_ann=val_ann,
                val_img=val_img, lr=args.lr, epochs=args.epochs,
                step_epoch=max(1, int(args.epochs * 0.75)),
                work=train_work))
        run([sys.executable, osp.join(REPO, "tools", "train.py"), cfg_path],
            env, 7200, "train")

    losses = epoch_losses(osp.join(train_work, "train.log"))
    if not losses:
        raise RuntimeError(
            "no 'Epoch [e][i] ... loss:' lines in train.log — steps/epoch "
            "is probably below log_config interval (10); raise "
            "--train_videos/--frames or lower the interval in CONFIG_TMPL")
    tail = list(losses.values())[-5:]
    head = list(losses.values())[:1]
    print(f"[preset_accuracy] loss: first epoch {head[0]:.3f} -> last 5 "
          f"epochs {[f'{v:.3f}' for v in tail]}", flush=True)

    with open(osp.join(train_work, "latest.txt")) as f:
        ckpt = osp.join(train_work, f.read().strip())

    gt_json = osp.join(fix, "panoptic_gt_val_city_vps.json")
    truth_dir = osp.join(fix, "val", "panoptic_video")
    table = {}
    for preset in args.presets.split(","):
        out_pkl = osp.join(work, f"out_{preset}.pkl")
        run([sys.executable, osp.join(REPO, "tools", "test_vpq.py"),
             cfg_path, "--checkpoint", ckpt, "--out", out_pkl,
             "--preset", preset, "--chunk", str(args.frames),
             "--lambda", "1", "--labeled_fid", "0",
             "--nframes_per_video", str(args.frames),
             "--pan_im_json_file", gt_json],
            env, 3600, f"test_vpq[{preset}]")
        r = run([sys.executable, osp.join(REPO, "tools", "eval_vpq.py"),
                 "--submit_dir", out_pkl.replace(".pkl", "_pans_unified"),
                 "--truth_dir", truth_dir, "--pan_gt_json_file", gt_json,
                 "--nframes_per_video", str(args.frames)],
                dict(env, JAX_PLATFORMS="cpu"), 1200, f"eval_vpq[{preset}]")
        line = [l for l in r.stdout.splitlines()
                if l.startswith("vpq_all")][-1]
        nums = re.findall(r"([0-9.]+)", line)
        table[preset] = dict(vpq_all=float(nums[0]), vpq_thing=float(nums[1]),
                             vpq_stuff=float(nums[2]))
        print(f"[preset_accuracy] {preset}: {line}", flush=True)

    result = dict(presets=table, epochs=args.epochs,
                  epoch_losses={str(k): v for k, v in losses.items()},
                  fixture=dict(train_videos=args.train_videos,
                               val_videos=args.val_videos,
                               frames=args.frames, size=f"{W}x{H}"),
                  checkpoint=ckpt)
    with open(osp.join(work, "preset_accuracy.json"), "w") as f:
        json.dump(result, f, indent=1)

    print("\n| preset | fixture VPQ | VPQ-thing | VPQ-stuff |")
    print("|---|---|---|---|")
    for k, v in table.items():
        print(f"| {k} | {v['vpq_all']:.2f} | {v['vpq_thing']:.2f} "
              f"| {v['vpq_stuff']:.2f} |")


if __name__ == "__main__":
    main()
