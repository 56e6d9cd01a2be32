"""Generic convolution engine.

Reference parity: `imageProcessing/convolutions.h:32-560` — `Filter<T,
Ds...>` with per-axis roles, strides, and Constant / Periodic / Mirror
padding:

  * Moving      — the filter slides along this axis (present in input,
                  filter and output; output size =
                  in - k + 1 + pre + post);
  * Aggregate   — summed away (present in input and filter; input extent
                  must equal the filter extent; absent from the output);
  * BatchedInput  — batched through unchanged (absent from the filter);
  * BatchedOutput — a filter-bank axis (absent from the input; output
                  extent = filter extent).

An axis list fully defines the correspondence between input, filter and
output shapes (`correspondanceForExcludedAxisType`, :199-254): the input
sees every axis except BatchedOutput, the filter every axis except
BatchedInput, the output every axis except Aggregate.  The operation is
correlation (no kernel flip), exactly the reference's index arithmetic
(:405-470).

TPU design: the role machinery maps onto ONE `lax.conv_general_dilated`
call — Moving axes become spatial dims, the (merged) Aggregate axes the
contracting feature dim, the (merged) BatchedInput axes the batch dim
and the (merged) BatchedOutput axes the output-feature dim — so any
N-dimensional role combination lands on the MXU.  Padding modes are
applied up-front with `jnp.pad` (constant / wrap / reflect) and the conv
runs VALID.

Deviation: the reference's `MovingWindowAxis` stride is stored but never
applied in its convolve loop (:86-109 vs :405-470 — dead code); here a
stride of s subsamples every (s+1)-th window position ("the jump in
index for the window", :109).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import numpy as np
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


@dataclass(frozen=True)
class MovingWindowAxis:
    """`MovingWindowAxis` (:79-110)."""
    padding: PaddingInfos = PaddingInfos()
    stride: int = 0

    axis_type = AxisType.MOVING


@dataclass(frozen=True)
class AggregateWindowsAxis:
    axis_type = AxisType.AGGREGATE


@dataclass(frozen=True)
class BatchedInputAxis:
    axis_type = AxisType.BATCHED_INPUT


@dataclass(frozen=True)
class BatchedOutputAxis:
    axis_type = AxisType.BATCHED_OUTPUT


class FilterND:
    """Reference-style N-d filter (`Filter<T, Ds...>`,
    `convolutions.h:169`): construct with an n-filter-axis coefficient
    array and one axis-role descriptor per logical dimension."""

    def __init__(self, coefficients, *axes):
        self.axes = tuple(axes)
        self.types = [a.axis_type for a in axes]
        self.coefficients = jnp.asarray(coefficients, jnp.float32)
        # correspondence tables (:199-254)
        self.in_axes = [i for i, t in enumerate(self.types)
                        if t is not AxisType.BATCHED_OUTPUT]
        self.filt_axes = [i for i, t in enumerate(self.types)
                          if t is not AxisType.BATCHED_INPUT]
        self.out_axes = [i for i, t in enumerate(self.types)
                         if t is not AxisType.AGGREGATE]
        if self.coefficients.ndim != len(self.filt_axes):
            raise ValueError("coefficient rank does not match the "
                             "non-BatchedInput axis count")

    def _role(self, kind):
        return [i for i, t in enumerate(self.types) if t is kind]

    def output_shape(self, input_shape):
        """`outputShape` (:305-338)."""
        in_of = {d: i for i, d in enumerate(self.in_axes)}
        f_of = {d: i for i, d in enumerate(self.filt_axes)}
        out = []
        for d in self.out_axes:
            t = self.types[d]
            if t is AxisType.MOVING:
                p = self.axes[d].padding
                full = (input_shape[in_of[d]]
                        - self.coefficients.shape[f_of[d]] + 1
                        + p.pre + p.post_val)
                out.append(-(-full // (self.axes[d].stride + 1)))
            elif t is AxisType.BATCHED_INPUT:
                out.append(input_shape[in_of[d]])
            else:                        # BatchedOutput
                out.append(self.coefficients.shape[f_of[d]])
        return tuple(out)

    def convolve(self, input_arr: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(input_arr, jnp.float32)
        if x.ndim != len(self.in_axes):
            raise ValueError("input rank does not match the "
                             "non-BatchedOutput axis count")
        in_of = {d: i for i, d in enumerate(self.in_axes)}
        f_of = {d: i for i, d in enumerate(self.filt_axes)}

        moving = self._role(AxisType.MOVING)
        agg = self._role(AxisType.AGGREGATE)
        b_in = self._role(AxisType.BATCHED_INPUT)
        b_out = self._role(AxisType.BATCHED_OUTPUT)

        for d in agg:
            if x.shape[in_of[d]] != self.coefficients.shape[f_of[d]]:
                raise ValueError("aggregate axis extent mismatch")

        # pad the moving axes per their padding infos
        pads = [(0, 0)] * x.ndim
        for d in moving:
            p = self.axes[d].padding
            pads[in_of[d]] = (p.pre, p.post_val)
        modes = {d: self.axes[d].padding.mode for d in moving}
        # jnp.pad applies one mode at a time; group axes by mode
        for mode in set(modes.values()):
            per = [(0, 0)] * x.ndim
            any_pad = False
            for d in moving:
                if modes[d] is mode and pads[in_of[d]] != (0, 0):
                    per[in_of[d]] = pads[in_of[d]]
                    any_pad = True
            if any_pad:
                x = jnp.pad(x, per, mode=mode.jnp_mode)

        # input -> (N, spatial..., C): batch = merged BatchedInput,
        # C = merged Aggregate
        perm = ([in_of[d] for d in b_in] + [in_of[d] for d in moving]
                + [in_of[d] for d in agg])
        x = jnp.transpose(x, perm)
        nb = int(np.prod([x.shape[i] for i in range(len(b_in))])) \
            if b_in else 1
        spatial = [x.shape[len(b_in) + i] for i in range(len(moving))]
        nc = int(np.prod(x.shape[len(b_in) + len(moving):])) \
            if agg else 1
        xs = x.reshape((nb,) + tuple(spatial) + (nc,))

        # filter -> (spatial..., I, O)
        k = self.coefficients
        kperm = ([f_of[d] for d in moving] + [f_of[d] for d in agg]
                 + [f_of[d] for d in b_out])
        k = jnp.transpose(k, kperm)
        kspatial = [k.shape[i] for i in range(len(moving))]
        no = int(np.prod(k.shape[len(moving) + len(agg):])) if b_out else 1
        ks = k.reshape(tuple(kspatial) + (nc, no))

        nsp = len(moving)
        spec = ("N" + "".join(chr(ord("0") + i) for i in range(nsp)) + "C",
                "".join(chr(ord("0") + i) for i in range(nsp)) + "IO",
                "N" + "".join(chr(ord("0") + i) for i in range(nsp)) + "C")
        strides = tuple(self.axes[d].stride + 1 for d in moving)
        if nsp == 0:
            # no moving axes: plain contraction
            out = jnp.einsum("nc,co->no", xs.reshape(nb, nc),
                             ks.reshape(nc, no))
            out_sp = []
        else:
            out = jax.lax.conv_general_dilated(
                xs, ks, strides, "VALID", dimension_numbers=spec)
            out_sp = list(out.shape[1:1 + nsp])
            out = out.reshape((nb,) + tuple(out_sp) + (no,))

        # unmerge batch / bank axes and restore the output axis order
        b_in_shape = [input_arr.shape[in_of[d]] for d in b_in]
        b_out_shape = [self.coefficients.shape[f_of[d]] for d in b_out]
        out = out.reshape(tuple(b_in_shape) + tuple(out_sp)
                          + tuple(b_out_shape))
        # current order: b_in..., moving..., b_out...; target: out_axes
        cur = [*b_in, *moving, *b_out]
        inv = [cur.index(d) for d in self.out_axes]
        return jnp.transpose(out, inv)


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
    """Correlation with role-driven channel handling (the common 2-D
    cases of `FilterND`, kept as a direct fast path):

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
        x[None], jnp.broadcast_to(k[:, :, None, None], k.shape + (1, C)),
        strides, "VALID", feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    return out if chan else out[..., 0]


@dataclass
class Filter:
    """2-D reference-style filter object (`Filter<T, Ds...>`,
    `convolutions.h:169`) — the Moving x Moving [+ channel role] special
    case; arbitrary role combinations use `FilterND`."""

    coefficients: jnp.ndarray
    paddings: tuple = (PaddingInfos(), PaddingInfos())
    strides: tuple = (1, 1)

    def convolve(self, img: jnp.ndarray) -> jnp.ndarray:
        return convolve_2d(img, self.coefficients, self.paddings,
                           self.strides)
