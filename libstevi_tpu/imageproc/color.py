"""Color space conversions.

Reference parity: `imageProcessing/colorConversions.h:36-496` — linear<->log,
RGB<->HSV/HSI, YUV->RGB, BGR<->RGB, grayscale, channel normalization.
All functions operate on (..., C) float arrays in [0, 1] unless noted.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_to_log(img: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return jnp.log(img.astype(jnp.float32) + eps)


def log_to_linear(img: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return jnp.exp(img.astype(jnp.float32)) - eps


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    return jnp.einsum("...c,c->...", img.astype(jnp.float32), w)


def bgr_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    return img[..., ::-1]


def rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    x = img.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, -1)
    mn = jnp.min(x, -1)
    d = mx - mn
    safe_d = jnp.where(d > 0, d, 1.0)
    h = jnp.where(mx == r, ((g - b) / safe_d) % 6.0,
                  jnp.where(mx == g, (b - r) / safe_d + 2.0,
                            (r - g) / safe_d + 4.0))
    h = jnp.where(d > 0, h * 60.0, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], -1)


def hsv_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    sect = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select([sect == 0, sect == 1, sect == 2, sect == 3, sect == 4],
                   [c, x, z, z, x], c)
    g = jnp.select([sect == 0, sect == 1, sect == 2, sect == 3, sect == 4],
                   [x, c, c, x, z], z)
    b = jnp.select([sect == 0, sect == 1, sect == 2, sect == 3, sect == 4],
                   [z, z, x, c, c], x)
    return jnp.stack([r + m, g + m, b + m], -1)


def rgb_to_hsi(img: jnp.ndarray) -> jnp.ndarray:
    """Hue / saturation / intensity (`colorConversions.h` HSI variant)."""
    x = img.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    i = (r + g + b) / 3.0
    mn = jnp.min(x, -1)
    s = jnp.where(i > 0, 1.0 - mn / jnp.where(i > 0, i, 1.0), 0.0)
    num = 0.5 * ((r - g) + (r - b))
    den = jnp.sqrt((r - g) ** 2 + (r - b) * (g - b))
    theta = jnp.arccos(jnp.clip(num / jnp.where(den > 0, den, 1.0), -1, 1))
    h = jnp.where(b <= g, theta, 2 * jnp.pi - theta)
    h = jnp.degrees(jnp.where(den > 0, h, 0.0))
    return jnp.stack([h, s, i], -1)


def yuv_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """BT.601 full-range YUV -> RGB (`colorConversions.h` YUV paths)."""
    y, u, v = img[..., 0], img[..., 1] - 0.5, img[..., 2] - 0.5
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return jnp.stack([r, g, b], -1)


def normalize_channels(img: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Per-pixel channel normalization x / sum(x)
    (`colorConversions.h` channel normalization)."""
    s = jnp.sum(img.astype(jnp.float32), -1, keepdims=True)
    return img / jnp.where(jnp.abs(s) > eps, s, 1.0)


def _packed_422_to_rgb(img: jnp.ndarray, u_even: bool) -> jnp.ndarray:
    """Shared YUYV/YVYU 4:2:2 decode (`colorConversions.h:334-457`): the
    chroma channel alternates per column; each pixel uses the most recent
    sample of each chroma (the reference's running U/V update), with the
    row-start V (resp. U) seeded from column 1.  Float path with the
    reference's +-1000 clamps; data is 0-255 scaled like the reference."""
    x = img.astype(jnp.float32)
    H, W, C = x.shape
    if C != 2 or W < 2:
        raise ValueError("packed 4:2:2 image must be (H, W, 2) with W >= 2")
    y = x[..., 0]
    ch = x[..., 1]
    jj = jnp.arange(W)
    even_idx = jj - jj % 2                       # latest even column <= j
    odd_idx = jnp.where(jj == 0, 1, jj - (1 - jj % 2))   # latest odd <= j
    u = ch[:, even_idx if u_even else odd_idx]
    v = ch[:, odd_idx if u_even else even_idx]
    r = y + 1.370705 * (v - 128.0)
    g = y - 0.698001 * (v - 128.0) - 0.337633 * (u - 128.0)
    b = y + 1.732446 * (u - 128.0)
    out = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(out, -1000.0, 1000.0)


def yuyv_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 2) YUYV-packed 4:2:2 -> (H, W, 3) RGB
    (`yuyv2rgb`, `colorConversions.h:334`)."""
    return _packed_422_to_rgb(img, u_even=True)


def yvyu_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 2) YVYU-packed 4:2:2 -> (H, W, 3) RGB
    (`yvyu2rgb`, `colorConversions.h:396`)."""
    return _packed_422_to_rgb(img, u_even=False)
