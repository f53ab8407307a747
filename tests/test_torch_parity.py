"""Composed-subgraph parity vs independent torch formulations.

Round-1 VERDICT asked for parity evidence above the single-op level. Each
test here drives a COMPOSED vps_tpu subgraph (module + params) against an
independently-written torch reference built from torch primitives
(F.grid_sample, torch sort/IoU loops) — not a port of our own gather
formulations — on random weights. torchvision is not in the image, so the
deformable-conv reference samples with F.grid_sample per tap.

References for semantics: UPSNetFPN tower
(/root/reference/mmdet/models/backbones upsnetFPN via panoptic_fpn.py),
FlowNetC cost volume (/root/reference/mmdet/models/utils/correlation_package),
MaskROI box selection (/root/reference/mmdet/models/utils/mask_roi.py:24-147).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vps_tpu.models.panoptic_fpn import DeformConvWithOffset
from vps_tpu.models.detectors.panoptic_ops import panoptic_dets
from vps_tpu.ops.correlation import correlation


def torch_deform_conv_v1(x, offset, weight, padding=1):
    """Deformable conv v1 via per-tap F.grid_sample (torch's own bilinear,
    padding_mode='zeros'). x (1, C, H, W); offset (1, 2K, H, W) y-first
    pairs; weight (Cout, Cin, kh, kw)."""
    _, c, h, w = x.shape
    cout, cin, kh, kw = weight.shape
    out = torch.zeros(1, cout, h, w, dtype=torch.float64)
    ys, xs = torch.meshgrid(
        torch.arange(h, dtype=torch.float64),
        torch.arange(w, dtype=torch.float64),
        indexing="ij",
    )
    for ki in range(kh * kw):
        dy, dx = ki // kw, ki % kw
        sy = ys - padding + dy + offset[0, 2 * ki]
        sx = xs - padding + dx + offset[0, 2 * ki + 1]
        # normalize to [-1, 1] (align_corners=True: -1 ↔ 0, 1 ↔ size-1)
        gy = 2 * sy / max(h - 1, 1) - 1
        gx = 2 * sx / max(w - 1, 1) - 1
        grid = torch.stack([gx, gy], dim=-1)[None]
        sampled = F.grid_sample(
            x, grid, mode="bilinear", padding_mode="zeros",
            align_corners=True,
        )  # (1, C, H, W)
        w_k = weight[:, :, dy, dx]  # (Cout, Cin)
        out = out + torch.einsum("oc,bchw->bohw", w_k, sampled)
    return out


class TestDeformConvTowerVsTorch:
    def _run(self, multilevel):
        rng = np.random.RandomState(0)
        shapes = [(10, 14), (5, 7)] if multilevel else [(10, 14)]
        xs = [rng.randn(1, h, w, 6).astype(np.float32) for h, w in shapes]
        mod = DeformConvWithOffset(features=4, compute_dtype=None)
        inp = [jnp.asarray(x) for x in xs]
        v = mod.init(jax.random.PRNGKey(3), inp if multilevel else inp[0])
        # randomize the zero-init offset conv so sampling is non-trivial
        p = jax.tree.map(lambda a: a, v["params"])
        ok = rng.randn(*p["conv_offset"]["Conv_0"]["kernel"].shape) * 0.4
        p["conv_offset"]["Conv_0"]["kernel"] = jnp.asarray(
            ok, jnp.float32
        )
        v = {"params": p}
        got = mod.apply(v, inp if multilevel else inp[0])
        got = [np.asarray(g) for g in (got if multilevel else [got])]

        # torch reference from the SAME weights (NHWC/HWIO → NCHW/OIHW)
        ow = np.asarray(p["conv_offset"]["Conv_0"]["kernel"], np.float64)
        ob = np.asarray(p["conv_offset"]["Conv_0"]["bias"], np.float64)
        dw = np.asarray(p["weight"], np.float64)
        t_ow = torch.from_numpy(ow.transpose(3, 2, 0, 1))
        t_ob = torch.from_numpy(ob)
        t_dw = torch.from_numpy(dw.transpose(3, 2, 0, 1))
        for x, g in zip(xs, got):
            tx = torch.from_numpy(
                x.transpose(0, 3, 1, 2).astype(np.float64)
            )
            toff = F.conv2d(tx, t_ow, t_ob, padding=1)
            want = torch_deform_conv_v1(tx, toff, t_dw, padding=1)
            np.testing.assert_allclose(
                g.transpose(0, 3, 1, 2), want.numpy(), atol=1e-4,
                rtol=1e-4,
            )

    def test_single_level(self):
        self._run(multilevel=False)

    def test_multilevel_shared_stream(self):
        """The flattened one-gather-stream multilevel path must match the
        same torch reference per level."""
        self._run(multilevel=True)


def test_correlation_matches_torch_cost_volume():
    rng = np.random.RandomState(1)
    f1 = rng.randn(1, 8, 10, 4).astype(np.float32)
    f2 = rng.randn(1, 8, 10, 4).astype(np.float32)
    md = 2
    got = np.asarray(correlation(jnp.asarray(f1), jnp.asarray(f2), md))
    t1 = torch.from_numpy(f1.transpose(0, 3, 1, 2).astype(np.float64))
    t2 = torch.from_numpy(f2.transpose(0, 3, 1, 2).astype(np.float64))
    t2p = F.pad(t2, (md, md, md, md))
    outs = []
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            shifted = t2p[:, :, md + dy: md + dy + 8, md + dx: md + dx + 10]
            outs.append((t1 * shifted).mean(dim=1))
    want = torch.stack(outs, dim=-1).numpy()  # (1, H, W, D^2)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def torch_mask_roi(rois, probs, deltas, img_shape, score_thresh=0.6,
                   nms_thresh=0.5, top_n=100):
    """Torch port of MaskROI (mask_roi.py:24-147, class_agnostic NMS) with
    the UPSNet decode (bbox_transform.py:290-330)."""
    rois = torch.from_numpy(rois).double()
    probs = torch.from_numpy(probs).double()
    deltas = torch.from_numpy(deltas).double()
    n, c = probs.shape
    widths = rois[:, 2] - rois[:, 0] + 1
    heights = rois[:, 3] - rois[:, 1] + 1
    ctr_x = rois[:, 0] + 0.5 * widths
    ctr_y = rois[:, 1] + 0.5 * heights
    d = deltas.view(n, c, 4)
    wx, wy, ww, wh = 10.0, 10.0, 5.0, 5.0
    dx, dy = d[..., 0] / wx, d[..., 1] / wy
    dw = torch.clamp(d[..., 2] / ww, max=float(np.log(1000.0 / 16)))
    dh = torch.clamp(d[..., 3] / wh, max=float(np.log(1000.0 / 16)))
    px = dx * widths[:, None] + ctr_x[:, None]
    py = dy * heights[:, None] + ctr_y[:, None]
    pw = torch.exp(dw) * widths[:, None]
    ph = torch.exp(dh) * heights[:, None]
    boxes = torch.stack(
        [px - 0.5 * pw, py - 0.5 * ph, px + 0.5 * pw - 1, py + 0.5 * ph - 1],
        dim=-1,
    )
    hh, ww_ = img_shape
    boxes[..., 0::2] = boxes[..., 0::2].clamp(0, ww_ - 1)
    boxes[..., 1::2] = boxes[..., 1::2].clamp(0, hh - 1)

    cand = []
    for i in range(n):
        for cl in range(1, c):
            if float(probs[i, cl]) > score_thresh:
                cand.append((float(probs[i, cl]), boxes[i, cl], cl))
    cand.sort(key=lambda t: -t[0])
    kept = []
    for s, b, cl in cand:
        ok = True
        for s2, b2, _ in kept:
            x1 = max(float(b[0]), float(b2[0]))
            y1 = max(float(b[1]), float(b2[1]))
            x2 = min(float(b[2]), float(b2[2]))
            y2 = min(float(b[3]), float(b2[3]))
            iw, ih = max(x2 - x1 + 1, 0), max(y2 - y1 + 1, 0)
            inter = iw * ih
            a1 = (float(b[2]) - float(b[0]) + 1) * (float(b[3]) - float(b[1]) + 1)
            a2 = (float(b2[2]) - float(b2[0]) + 1) * (float(b2[3]) - float(b2[1]) + 1)
            if inter / (a1 + a2 - inter) > nms_thresh:
                ok = False
                break
        if ok:
            kept.append((s, b, cl))
        if len(kept) >= top_n:
            break
    return kept


def test_panoptic_dets_matches_torch_mask_roi():
    """Full MaskROI stage — UPSNet decode → threshold → pooled NMS → top-N —
    against a sequential torch port on random inputs."""
    rng = np.random.RandomState(7)
    n, c = 40, 5
    rois = np.stack(
        [
            rng.uniform(0, 100, n),
            rng.uniform(0, 60, n),
            np.zeros(n),
            np.zeros(n),
        ],
        axis=-1,
    ).astype(np.float32)
    rois[:, 2] = rois[:, 0] + rng.uniform(8, 60, n)
    rois[:, 3] = rois[:, 1] + rng.uniform(8, 60, n)
    logits = rng.randn(n, c).astype(np.float32) * 2
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    deltas = (rng.randn(n, c * 4) * 0.1).astype(np.float32)
    img_shape = (128, 192)

    det_boxes, det_probs, det_cls, det_valid = panoptic_dets(
        jnp.asarray(rois), jnp.ones((n,), bool), jnp.asarray(probs),
        jnp.asarray(deltas), img_shape, score_thresh=0.3, nms_thresh=0.5,
        top_n=20,
    )
    got = [
        (float(det_probs[i]), np.asarray(det_boxes[i]), int(det_cls[i]))
        for i in range(20)
        if bool(det_valid[i])
    ]
    want = torch_mask_roi(rois, probs, deltas, img_shape, score_thresh=0.3,
                          nms_thresh=0.5, top_n=20)
    assert len(got) == len(want) > 0
    for (gs, gb, gc_), (ws, wb, wc) in zip(got, want):
        assert gc_ == wc
        assert gs == pytest.approx(ws, abs=1e-5)
        np.testing.assert_allclose(gb, wb.numpy(), atol=1e-3)
