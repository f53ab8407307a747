"""Shared NN layers with torch-parity semantics (NHWC).

Provides the building blocks the reference gets from torch/mmcv: ConvModule
(conv→norm→act), frozen BatchNorm (norm_eval semantics of mmdet ResNet),
GroupNorm, and resize/pool helpers that bit-match torch's
``F.interpolate(align_corners=False)`` / ``nearest`` / adaptive max pool —
these conventions move VPQ, so they are pinned here once and tested against
torch.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


class FrozenBatchNorm(nn.Module):
    """BatchNorm in eval mode: running stats are fixed buffers (collection
    ``batch_stats``), affine params trainable — mmdet's ``norm_eval=True``
    (the reference never updates BN stats during detection training)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        ).value
        # fold in f32, then apply in the input's dtype (keeps a bf16
        # compute path bf16 instead of silently promoting every block)
        inv = scale * jax.lax.rsqrt(var + self.eps)
        shift = bias - mean * inv
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)


class GroupNorm32(nn.Module):
    """GroupNorm with 32 groups (torch nn.GroupNorm(32, C) semantics)."""

    features: int
    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.eps, use_bias=True, use_scale=True
        )(x)


# ---------------------------------------------------------------------------
# Conv blocks
# ---------------------------------------------------------------------------


def _act(name: Optional[str]):
    if name is None:
        return lambda x: x
    if name == "relu":
        return jax.nn.relu
    if name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, 0.1)
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise ValueError(name)


class Conv(nn.Module):
    """Plain conv2d, torch padding semantics (symmetric int padding)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    groups: int = 1
    kernel_init: Callable = nn.initializers.he_normal()
    dtype: Optional[Any] = None  # compute dtype (e.g. bf16); params stay f32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
        )(x)


class ConvWS(nn.Module):
    """Weight-standardized conv (reference mmdet/models/utils/conv_ws.py:5
    conv_ws_2d / ConvWS2d — the conv_cfg=dict(type='ConvWS') GN+WS configs):
    the kernel is normalized per OUTPUT channel to zero mean / unit std
    before the convolution."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    eps: float = 1e-5
    kernel_init: Callable = nn.initializers.he_normal()

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param("kernel", self.kernel_init,
                       (k, k, x.shape[-1], self.features))
        flat = w.reshape(-1, self.features)
        mean = jnp.mean(flat, axis=0)
        # torch .std() is the UNBIASED estimator (N-1 denominator)
        std = jnp.std(flat, axis=0, ddof=1)
        w = (w - mean) / (std + self.eps)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y


class ConvModule(nn.Module):
    """conv → norm → activation (reference mmdet/models/utils/conv_module.py
    ordering). norm: None | 'gn' (32 groups) | 'frozen_bn'."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    norm: Optional[str] = None
    activation: Optional[str] = "relu"
    use_bias: Optional[bool] = None
    dtype: Optional[Any] = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x):
        bias = self.use_bias if self.use_bias is not None else self.norm is None
        x = Conv(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            self.dilation,
            use_bias=bias,
            kernel_init=nn.initializers.variance_scaling(
                1.0, "fan_avg", "uniform"
            ),  # xavier_uniform, the reference's default head init
            dtype=self.dtype,
        )(x)
        if self.norm == "gn":
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5)(x)
        elif self.norm == "frozen_bn":
            x = FrozenBatchNorm(self.features)(x)
        return _act(self.activation)(x)


class ConvTranspose2x(nn.Module):
    """torch ConvTranspose2d(kernel=2, stride=2) used by the mask head."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=(2, 2),
            strides=(2, 2),
            padding="VALID",
            kernel_init=nn.initializers.he_normal(),
        )(x)


# ---------------------------------------------------------------------------
# Resizing / pooling with torch semantics
# ---------------------------------------------------------------------------


def _linear_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) interpolation matrix for torch bilinear align_corners=False
    (half-pixel sample points, border clamp) along one axis."""
    s = (np.arange(out_size, dtype=np.float64) + 0.5) * (in_size / out_size) - 0.5
    s = np.clip(s, 0.0, in_size - 1.0)
    lo = np.floor(s).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    t = s - lo
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), lo] += (1.0 - t).astype(np.float32)
    m[np.arange(out_size), hi] += t.astype(np.float32)
    return m


def resize_bilinear(x, size: Tuple[int, int]):
    """torch F.interpolate(mode='bilinear', align_corners=False): half-pixel
    sample points with border clamp. x: (B, H, W, C).

    Separable matmul formulation: out = Wy · x · Wxᵀ with static (out, in)
    interpolation matrices — rides the MXU instead of lowering to gathers
    (XLA TPU gathers at 1024×2048 cost tens of ms; these matmuls are ~free).
    """
    b, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    wy = jnp.asarray(_linear_resize_matrix(h, oh))
    wx = jnp.asarray(_linear_resize_matrix(w, ow))
    y = jnp.einsum("oh,bhwc->bowc", wy, x.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,bowc->bopc", wx, y, preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def _nearest_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) 0/1 selection matrix for torch nearest interpolate
    (src = floor(dst · in/out))."""
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    idx = np.clip(idx, 0, in_size - 1)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), idx] = 1.0
    return m


def resize_nearest(x, size: Tuple[int, int]):
    """torch F.interpolate(mode='nearest'): src = floor(dst * in/out).
    Separable matmul formulation (see resize_bilinear) — exact, since the
    selection weights are 0/1."""
    b, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    wy = jnp.asarray(_nearest_resize_matrix(h, oh))
    wx = jnp.asarray(_nearest_resize_matrix(w, ow))
    y = jnp.einsum("oh,bhwc->bowc", wy, x.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,bowc->bopc", wx, y, preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def max_pool(x, kernel: int, stride: int, padding: int = 0):
    """torch MaxPool2d(kernel, stride, padding) (floor mode)."""
    return nn.max_pool(
        x,
        window_shape=(kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding)] * 2,
    )


def avg_pool(x, kernel: int, stride: int, padding: int = 0):
    """torch AvgPool2d(kernel, stride, padding) with count_include_pad=True."""
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )
    return summed / (kernel * kernel)


def adaptive_max_pool(x, out_size: Tuple[int, int]):
    """torch F.adaptive_max_pool2d: window i = [floor(i·H/out), ceil((i+1)·H/out))."""
    b, h, w, c = x.shape
    oh, ow = out_size
    if (oh, ow) == (h, w):
        return x
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        return jnp.max(x.reshape(b, oh, kh, ow, kw, c), axis=(2, 4))
    # general case: gather max over per-bin windows (window size ≤ ceil+1)
    def pool_axis(arr, axis_len, out_len, axis):
        starts = jnp.floor(jnp.arange(out_len) * axis_len / out_len).astype(jnp.int32)
        ends = jnp.ceil((jnp.arange(out_len) + 1) * axis_len / out_len).astype(
            jnp.int32
        )
        max_win = int(-(-axis_len // out_len)) + 1
        offs = jnp.arange(max_win)
        idx = jnp.minimum(starts[:, None] + offs[None, :], axis_len - 1)
        valid = (starts[:, None] + offs[None, :]) < ends[:, None]
        gathered = jnp.take(arr, idx.reshape(-1), axis=axis)
        new_shape = list(arr.shape)
        new_shape[axis : axis + 1] = [out_len, max_win]
        gathered = gathered.reshape(new_shape)
        vshape = [1] * len(new_shape)
        vshape[axis] = out_len
        vshape[axis + 1] = max_win
        gathered = jnp.where(
            valid.reshape(vshape), gathered, jnp.full_like(gathered, -jnp.inf)
        )
        return jnp.max(gathered, axis=axis + 1)

    x = pool_axis(x, h, oh, 1)
    x = pool_axis(x, w, ow, 2)
    return x


def global_avg_pool(x):
    """AdaptiveAvgPool2d(1) → (B, 1, 1, C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
