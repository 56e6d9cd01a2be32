"""Generic convolution engine.

Reference parity: `imageProcessing/convolutions.h:32-560` — `Filter<T,
Ds...>` with per-axis roles (Moving / Aggregate / BatchedInput /
BatchedOutput), stride, and Constant / Periodic / Mirror padding.

TPU design: the axis-role machinery maps onto `lax.conv_general_dilated`
dimension numbers: Moving axes are spatial dims, an Aggregate channel axis
contracts (kernel carries a channel axis), a BatchedInput channel axis is a
depthwise group.  Padding modes are applied up-front with `jnp.pad`
(constant / wrap / reflect) and the conv runs VALID — exact parity with the
reference's index arithmetic while the convolution lands on the MXU.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import jax
import jax.numpy as jnp


class AxisType(enum.Enum):
    MOVING = 0          # the filter slides along this axis
    AGGREGATE = 1       # summed away (input channels)
    BATCHED_INPUT = 2   # batched on the input only (depthwise)
    BATCHED_OUTPUT = 3  # batched on the output only (filter bank axis)


class PaddingType(enum.Enum):
    CONSTANT = 0
    PERIODIC = 1
    MIRROR = 2

    @property
    def jnp_mode(self) -> str:
        return {PaddingType.CONSTANT: "constant",
                PaddingType.PERIODIC: "wrap",
                PaddingType.MIRROR: "reflect"}[self]


@dataclass(frozen=True)
class PaddingInfos:
    pre: int = 0
    post: int | None = None
    mode: PaddingType = PaddingType.CONSTANT

    @property
    def post_val(self) -> int:
        return self.pre if self.post is None else self.post


def _pad(x, paddings):
    p0, p1 = paddings
    x = jnp.pad(x, ((p0.pre, p0.post_val), (0, 0), (0, 0)),
                mode=p0.mode.jnp_mode)
    x = jnp.pad(x, ((0, 0), (p1.pre, p1.post_val), (0, 0)),
                mode=p1.mode.jnp_mode)
    return x


def convolve_2d(img: jnp.ndarray, kernel: jnp.ndarray,
                paddings=(PaddingInfos(), PaddingInfos()),
                strides=(1, 1)) -> jnp.ndarray:
    """Correlation with role-driven channel handling:

      * (H, W) image, (kh, kw) kernel          -> (H', W')
      * (H, W, C) image, (kh, kw) kernel       -> (H', W', C)  [depthwise]
      * (H, W, C) image, (kh, kw, C) kernel    -> (H', W')     [aggregate]
    """
    chan = img.ndim == 3
    x = img.astype(jnp.float32)
    if not chan:
        x = x[..., None]
    C = x.shape[-1]
    k = jnp.asarray(kernel, jnp.float32)
    x = _pad(x, paddings)

    if k.ndim == 3:
        # aggregate: HWIO with I=C, O=1
        out = jax.lax.conv_general_dilated(
            x[None], k[..., None], strides, "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, ..., 0]
        return out
    # depthwise
    out = jax.lax.conv_general_dilated(
        x[None], jnp.broadcast_to(k[:, :, None, None], k.shape + (1, 1)),
        strides, "VALID", feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    return out if chan else out[..., 0]


@dataclass
class Filter:
    """Reference-style filter object (`Filter<T, Ds...>`,
    `convolutions.h:169`)."""

    coefficients: jnp.ndarray
    paddings: tuple = (PaddingInfos(), PaddingInfos())
    strides: tuple = (1, 1)

    def convolve(self, img: jnp.ndarray) -> jnp.ndarray:
        return convolve_2d(img, self.coefficients, self.paddings,
                           self.strides)
