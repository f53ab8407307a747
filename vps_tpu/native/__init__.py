"""ctypes bindings for the native host library (C++), with pure-numpy
fallbacks. Builds libvps_native.so on first import if the toolchain is
available."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libvps_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.rle_decode.restype = ctypes.c_int
    lib.rle_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.rle_encode.restype = ctypes.c_int
    lib.rle_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.bbox_overlaps.restype = None
    lib.bbox_overlaps.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.cpu_nms.restype = ctypes.c_int
    lib.cpu_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.cpu_soft_nms.restype = ctypes.c_int
    lib.cpu_soft_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


# ---------------------------------------------------------------------------
# RLE codec (COCO wire format: column-major runs, 6-bit chars, delta coding)
# ---------------------------------------------------------------------------


def _rle_decode_np(counts: str, h: int, w: int) -> np.ndarray:
    cnts = []
    p = 0
    while p < len(counts):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(counts[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    v = 0
    for n in cnts:
        flat[pos : pos + n] = v
        pos += n
        v = 1 - v
    return flat.reshape(w, h).T  # column-major


def _rle_encode_np(mask: np.ndarray) -> str:
    h, w = mask.shape
    flat = np.asfortranarray(mask.astype(np.uint8)).T.reshape(-1)
    # run lengths starting with zeros
    diffs = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    bounds = np.concatenate([[0], diffs, [flat.size]])
    cnts = np.diff(bounds).tolist()
    if flat[0] == 1:
        cnts = [0] + cnts
    out = []
    for i, x in enumerate(cnts):
        if i > 2:
            x -= cnts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def rle_decode(counts, h: int, w: int) -> np.ndarray:
    """Decode a compressed RLE string (or uncompressed counts list) into an
    (h, w) uint8 mask."""
    if isinstance(counts, (list, tuple)):  # uncompressed RLE
        flat = np.zeros(h * w, np.uint8)
        pos = 0
        v = 0
        for n in counts:
            flat[pos : pos + int(n)] = v
            pos += int(n)
            v = 1 - v
        return flat.reshape(w, h).T
    if isinstance(counts, bytes):
        counts = counts.decode("ascii")
    lib = _load()
    if lib is None:
        return _rle_decode_np(counts, h, w)
    out = np.zeros(h * w, np.uint8)  # column-major buffer
    rc = lib.rle_decode(
        counts.encode("ascii"), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return _rle_decode_np(counts, h, w)
    return out.reshape(w, h).T


def rle_encode(mask: np.ndarray) -> str:
    """Encode an (h, w) {0,1} mask into the compressed RLE string."""
    h, w = mask.shape
    lib = _load()
    if lib is None:
        return _rle_encode_np(mask)
    fmask = np.asfortranarray(mask.astype(np.uint8)).T.reshape(-1).copy()
    cap = 4 * h * w + 16
    buf = ctypes.create_string_buffer(cap)
    n = lib.rle_encode(
        fmask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, buf, cap
    )
    if n < 0:
        return _rle_encode_np(mask)
    return buf.value.decode("ascii")


def cpu_nms(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy hard NMS on host. dets (N, 5) = (x1,y1,x2,y2,score), legacy +1
    IoU (reference upsnet cpu_nms.pyx / mmdet nms_cpu.cpp semantics).
    Returns kept indices in score order."""
    dets = np.ascontiguousarray(dets, np.float32)
    n = dets.shape[0]
    if n == 0:
        return np.zeros((0,), np.int64)
    lib = _load()
    if lib is None:
        return _cpu_nms_np(dets, thresh)
    keep = np.zeros((n,), np.int32)
    k = lib.cpu_nms(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return keep[:k].astype(np.int64)


def _cpu_nms_np(dets: np.ndarray, thresh: float) -> np.ndarray:
    order = np.argsort(-dets[:, 4], kind="stable")
    keep = []
    suppressed = np.zeros(len(dets), bool)
    ious = bbox_overlaps_np(dets[:, :4], dets[:, :4])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= ious[i] > thresh
        suppressed[i] = True
    return np.asarray(keep, np.int64)


def cpu_soft_nms(
    dets: np.ndarray,
    iou_thr: float = 0.3,
    sigma: float = 0.5,
    min_score: float = 1e-3,
    method: str = "linear",
) -> tuple:
    """Soft-NMS on host (reference soft_nms_cpu.pyx semantics). Returns
    (rescored dets (K, 5), kept original indices (K,))."""
    dets = np.ascontiguousarray(dets, np.float32).copy()
    n = dets.shape[0]
    if n == 0:
        return dets, np.zeros((0,), np.int64)
    mid = {"hard": 0, "linear": 1, "gaussian": 2}[method]
    lib = _load()
    if lib is None:
        # numpy fallback: mirror the greedy loop
        work = dets.copy()
        done = np.zeros(n, bool)
        keep = []
        while True:
            cand = np.where(~done & (work[:, 4] > min_score))[0]
            if cand.size == 0:
                break
            best = cand[np.argmax(work[cand, 4])]
            done[best] = True
            keep.append(best)
            ov = bbox_overlaps_np(work[best : best + 1, :4], work[:, :4])[0]
            if method == "linear":
                w = np.where(ov > iou_thr, 1.0 - ov, 1.0)
            elif method == "gaussian":
                w = np.exp(-(ov ** 2) / sigma)
            else:
                w = np.where(ov > iou_thr, 0.0, 1.0)
            w[done] = 1.0
            work[:, 4] *= w
        keep = np.asarray(keep, np.int64)
        return work[keep], keep
    keep = np.zeros((n,), np.int32)
    k = lib.cpu_soft_nms(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(iou_thr), ctypes.c_float(sigma),
        ctypes.c_float(min_score), mid,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    kept = keep[:k].astype(np.int64)
    return dets[kept], kept


def bbox_overlaps_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Legacy +1 IoU matrix (native if available)."""
    a = np.ascontiguousarray(a[:, :4], np.float32)
    b = np.ascontiguousarray(b[:, :4], np.float32)
    lib = _load()
    out = np.zeros((a.shape[0], b.shape[0]), np.float32)
    if lib is None or a.size == 0 or b.size == 0:
        lt = np.maximum(a[:, None, :2], b[None, :, :2])
        rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(rb - lt + 1, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        aa = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
        ab = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
        return (inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-9)).astype(
            np.float32
        )
    lib.bbox_overlaps(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.shape[0],
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
