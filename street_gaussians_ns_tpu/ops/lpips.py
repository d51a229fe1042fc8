"""LPIPS (VGG16 variant) in pure JAX — eval-only metric (SURVEY.md C-N7).

The standard LPIPS(VGG) pipeline: scale inputs to [-1,1], normalize by the
ImageNet shift/scale, run VGG16 conv features, unit-normalize each layer's
channels, 1x1-conv with learned linear weights, spatial-average, sum over
layers.

Pretrained weights cannot be downloaded in this environment (zero egress);
`load_lpips(path)` consumes an .npz with VGG16 conv kernels
(`features.{idx}.weight/bias` in torch layout OIHW) and LPIPS linear
weights (`lin{0..4}.model.1.weight`). Export one offline with:

    import torch, lpips, numpy as np
    m = lpips.LPIPS(net='vgg')
    np.savez("lpips_vgg.npz", **{k: v.numpy() for k, v in
             {**dict(m.net.named_parameters()),
              **dict(m.named_parameters())}.items()})
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv layer indices in torchvision's features module and the block
# boundaries LPIPS taps (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
_VGG_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_TAP_AFTER = {3, 8, 15, 22, 29}   # feature-module index whose relu is a tap
_MAXPOOL_BEFORE = {5, 10, 17, 24}


def _conv(x, w, b):
    # x: (1, C, H, W); w: (O, I, kh, kw) torch layout.
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn) + b.reshape(
        1, -1, 1, 1)


def load_lpips(path: Path):
    """Returns lpips(img1, img2) -> scalar; imgs (H, W, 3) in [0, 1]."""
    data = np.load(path)
    convs = []
    for idx in _VGG_CONV_IDX:
        convs.append((jnp.asarray(data[f"features.{idx}.weight"]),
                      jnp.asarray(data[f"features.{idx}.bias"]),
                      idx))
    lins = [jnp.asarray(data[f"lin{i}.model.1.weight"]) for i in range(5)]
    return _build_lpips(convs, lins)


# VGG16 conv output channels, aligned with _VGG_CONV_IDX.
_VGG_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512,
                 512, 512, 512]


def random_lpips(seed: int = 0):
    """LPIPS over a SEEDED RANDOM-weight VGG16 with uniform linear heads.

    The environment cannot download pretrained VGG weights (zero egress),
    and none ship in the image; random-convnet features are the standard
    offline fallback — they correlate with perceptual distance (deep
    random features are a known perceptual-metric baseline) and are
    deterministic given the seed, but the absolute values are NOT
    comparable to standard pretrained LPIPS. Consumers must label the
    metric (scripts/eval.py writes `lpips_net`)."""
    rng = np.random.RandomState(seed)
    convs = []
    in_ch = 3
    for idx, out_ch in zip(_VGG_CONV_IDX, _VGG_CHANNELS):
        fan_in = in_ch * 9
        w = rng.normal(0.0, np.sqrt(2.0 / fan_in),
                       (out_ch, in_ch, 3, 3)).astype(np.float32)
        b = np.zeros((out_ch,), np.float32)
        convs.append((jnp.asarray(w), jnp.asarray(b), idx))
        in_ch = out_ch
    tap_ch = [64, 128, 256, 512, 512]
    lins = [jnp.full((1, c, 1, 1), 1.0 / c, jnp.float32) for c in tap_ch]
    return _build_lpips(convs, lins)


def _build_lpips(convs, lins):
    def features(x):
        """x: (1, 3, H, W) normalized. Returns the 5 tapped feature maps."""
        taps = []
        for w, b, idx in convs:
            if idx in _MAXPOOL_BEFORE:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID")
            x = jax.nn.relu(_conv(x, w, b))
            if idx + 1 in _TAP_AFTER or idx + 2 in _TAP_AFTER:
                # conv idx is the last conv of the block when its relu
                # position (idx+1) is a tap.
                if idx + 1 in _TAP_AFTER:
                    taps.append(x)
        return taps

    def lpips(img1, img2):
        def prep(im):
            x = im.astype(jnp.float32) * 2.0 - 1.0
            x = (x - _SHIFT) / _SCALE
            return jnp.transpose(x, (2, 0, 1))[None]

        t1, t2 = features(prep(img1)), features(prep(img2))
        total = 0.0
        for f1, f2, lin in zip(t1, t2, lins):
            n1 = f1 / jnp.sqrt(jnp.sum(f1 ** 2, 1, keepdims=True) + 1e-10)
            n2 = f2 / jnp.sqrt(jnp.sum(f2 ** 2, 1, keepdims=True) + 1e-10)
            d = (n1 - n2) ** 2
            w = lin.reshape(1, -1, 1, 1)
            total = total + jnp.mean(jnp.sum(d * w, axis=1))
        return total

    return jax.jit(lpips)
