"""SSIM in JAX — replaces pytorch_msssim.SSIM(data_range=1, channel=3).

The reference's image loss is (1-lambda)*L1 + lambda*(1 - SSIM) with
pytorch_msssim's defaults (sgn_splatfacto.py:330,1085): 11x11 gaussian
window, sigma 1.5, K1=0.01, K2=0.03, data_range=1, per-channel SSIM
averaged over channels and pixels, `size_average=True`.

Implemented as depthwise convs (lax.conv with feature_group_count), which
XLA maps onto the MXU. Valid padding like pytorch_msssim (output spatial
dims shrink by the window), mean over everything.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

K1 = 0.01
K2 = 0.03


@functools.lru_cache(maxsize=8)
def _gaussian_window_np(win_size: int, sigma: float):
    # numpy on purpose: caching a device array created during a jit trace
    # leaks trace-scoped state; a numpy constant is embedded per-compile.
    import numpy as np

    coords = np.arange(win_size, dtype=np.float32) - (win_size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    return g / g.sum()


def _gaussian_window(win_size: int, sigma: float):
    return jnp.asarray(_gaussian_window_np(win_size, sigma))


def _blur(x: jax.Array, win: jax.Array) -> jax.Array:
    """Separable depthwise gaussian blur. x: (1, C, H, W), valid padding.

    Implemented as shift-and-add (sum of K weighted slices per axis)
    instead of lax.conv: XLA:TPU lowers a 3-channel depthwise conv far
    off the roofline (~45 ms of a train step fwd+bwd at 1600x1056), while
    K slice-FMAs fuse into ~1 VPU pass per axis and transpose to the same
    form in the backward. Same math as the conv up to f32 summation
    order."""
    k = win.shape[0]
    h = x.shape[2]
    w = x.shape[3]
    out = None
    for i in range(k):
        term = win[i] * x[:, :, i:i + h - k + 1, :]
        out = term if out is None else out + term
    x = out
    out = None
    for i in range(k):
        term = win[i] * x[:, :, :, i:i + w - k + 1]
        out = term if out is None else out + term
    return out


def ssim(
    img1: jax.Array,  # (H, W, C) in [0, data_range]
    img2: jax.Array,  # (H, W, C)
    data_range: float = 1.0,
    win_size: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Mean SSIM over pixels and channels (scalar). Differentiable."""
    x = jnp.transpose(img1, (2, 0, 1))[None].astype(jnp.float32)  # (1,C,H,W)
    y = jnp.transpose(img2, (2, 0, 1))[None].astype(jnp.float32)
    win = _gaussian_window(win_size, sigma)

    c1 = (K1 * data_range) ** 2
    c2 = (K2 * data_range) ** 2

    mu1 = _blur(x, win)
    mu2 = _blur(y, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _blur(x * x, win) - mu1_sq
    sigma2_sq = _blur(y * y, win) - mu2_sq
    sigma12 = _blur(x * y, win) - mu1_mu2

    cs = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    return jnp.mean(ssim_map)


def psnr(img1: jax.Array, img2: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio (torchmetrics semantics, data_range=1)."""
    mse = jnp.mean((img1.astype(jnp.float32) - img2.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))
