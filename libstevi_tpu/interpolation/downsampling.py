"""Average-pooling downsampling.

Reference parity: `interpolation/downsampling.h:68-121` —
``averagePoolingDownsample``: output size = ceil(size / window), the window
grid is centered (initial offset = remainder/2 on each axis, shifting windows
*up-left* off the image), and border windows average only their in-image
samples (count-normalized).

TPU design: pad to the aligned grid, `reduce_window` the values and an
in-image indicator with matching windows, divide — no per-pixel branching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def average_pooling_downsample(image: jnp.ndarray, h_window: int,
                               v_window: int | None = None) -> jnp.ndarray:
    """(H, W) or (H, W, C) -> ceil-divided shape, count-normalized means."""
    if v_window is None:
        v_window = h_window
    chan = image.ndim == 3
    x = image.astype(jnp.float32)
    if not chan:
        x = x[..., None]
    H, W, C = x.shape

    new_h = -(-H // v_window)
    new_w = -(-W // h_window)
    # the reference's "hRem" is the ROW remainder and "vRem" the COLUMN
    # remainder, and it applies initialVOffset (= vRem/2) to rows and
    # initialHOffset (= hRem/2) to columns (`downsampling.h:81-87,96-101`)
    # — i.e. the offsets are cross-applied; replicated exactly.
    h_rem = new_h * v_window - H    # row remainder
    v_rem = new_w * h_window - W    # column remainder
    initial_h_offset = h_rem // 2   # applied to columns (p_j)
    initial_v_offset = v_rem // 2   # applied to rows (p_i)

    pad_top = initial_v_offset
    pad_left = initial_h_offset
    pad_bottom = new_h * v_window - H - pad_top
    pad_right = new_w * h_window - W - pad_left

    # when the cross-applied offsets exceed the own-axis remainder the
    # trailing rows/columns fall outside every window — the reference's
    # bounds-checked taps simply never read them (`downsampling.h:105`),
    # so CROP them rather than hand jnp.pad a negative width
    x2, o2 = x, jnp.ones((H, W, 1), jnp.float32)
    if pad_bottom < 0:
        x2, o2 = x2[:pad_bottom], o2[:pad_bottom]
        pad_bottom = 0
    if pad_right < 0:
        x2, o2 = x2[:, :pad_right], o2[:, :pad_right]
        pad_right = 0

    xp = jnp.pad(x2, ((pad_top, pad_bottom), (pad_left, pad_right), (0, 0)))
    ones = jnp.pad(o2, ((pad_top, pad_bottom), (pad_left, pad_right), (0, 0)))

    win = (v_window, h_window, 1)
    sums = jax.lax.reduce_window(xp, 0.0, jax.lax.add, win, win, "VALID")
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, win, win, "VALID")
    out = sums / counts
    return out if chan else out[..., 0]
