"""Round-4 late experiment: move the fused CV's V-window sum onto the
MXU (banded 0/1 matmul) — the CV kernel is the largest flagship stage
(~0.9 ms vs ~0.55 ms VPU issue floor) and the MXU idles.

Variant kernel: cross_d = h_sum(Bv @ (src * t_d)) with Bv the (Hx, Hx)
banded ones matrix; the VPU keeps the product + h-window shifts, the
MXU does the 7-tap vertical reduction.  Values equal up to f32
reassociation (bf16x3 decomposition is exact; accumulation order
differs).

Run: python scripts/exp_cv_mxu.py
"""
import sys, time, functools

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libstevi_tpu.ops import box_pallas as bp

H, W, D, Dp = 480, 640, 120, 128
DC = 8
Hb = 240
Hp, Wp = 480, 640
Wpp = Wp + Dp + DC
pr = bp._PADROWS
Hx = Hb + 2 * pr


def _kernel_mxu(src_ref, tgtp_ref, stats_ref, bv_ref, out_ref, scr_ref, *,
                cv_dtype, W1, H1, D, pout_bake, n):
    hb = pl.program_id(0)
    d_idx = pl.program_id(1)
    d0 = d_idx * DC
    r0 = hb * Hb

    @pl.when(d_idx == 0)
    def _():
        scr_ref[...] = tgtp_ref[:, pl.ds(r0, Hx), :]

    src = src_ref[pl.ds(r0, Hx), :]
    sum_s = stats_ref[0, pl.ds(r0, Hx), :]
    den_s = stats_ref[1, pl.ds(r0, Hx), :]
    tgt_b = scr_ref[...]
    bv = bv_ref[...]                      # (Hb, Hx) banded ones

    jj = jax.lax.broadcasted_iota(jnp.int32, (Hb, Wp), 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (Hb, Wp), 0) + r0
    c = slice(pr, pr + Hb)
    infpat = jnp.where((ii < H1) & (jj < W1), jnp.float32(jnp.inf), 0.0)
    for k in range(DC):
        t_d = jax.lax.slice_in_dim(tgt_b[0], k, k + Wp, axis=1)
        p = src * t_d
        hs = bp._window_sum_lanes(p, 3)
        # V-window on the MXU: (Hb, Hx) @ (Hx, Wp), f32 accumulate
        cross = jax.lax.dot_general(
            bv, hs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sum_t = jax.lax.slice_in_dim(tgt_b[1], k, k + Wp, axis=1)[c]
        zcc = cross - sum_s[c] * sum_t * (1.0 / n)
        cost = zcc * den_s[c] * jax.lax.slice_in_dim(
            tgt_b[2], k, k + Wp, axis=1)[c]
        cost = -cost
        val = jnp.where(jj + (d0 + k) < W1, cost,
                        jnp.where(jj < W1, float(pout_bake), 0.0))
        val = jnp.where(d0 + k < D, jnp.where(ii < H1, val, 0.0), infpat)
        out_ref[k] = val.astype(cv_dtype)
    zfill = jnp.zeros((3, Hx, DC), tgt_b.dtype)
    scr_ref[...] = jnp.concatenate([tgt_b[:, :, DC:], zfill], axis=2)


def cv_mxu(img_l, img_r, dt):
    srcp, tgt_stack, stats_s, n = bp._prep_inputs(
        "zncc", img_l, img_r, 3, 3, Hp, Wp, Wpp)
    rows = np.arange(Hb)[:, None]
    cols = np.arange(Hx)[None, :]
    bv = jnp.asarray((np.abs(cols - (rows + pr)) <= 3)
                     .astype(np.float32))
    kern = functools.partial(_kernel_mxu, cv_dtype=dt, W1=W, H1=H, D=D,
                             pout_bake=100.0, n=n)
    Hpp = Hp + 2 * pr
    out = pl.pallas_call(
        kern, grid=(Hp // Hb, Dp // DC),
        in_specs=[pl.BlockSpec((Hpp, Wp), lambda h, d: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, Hpp, Wpp), lambda h, d: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((2, Hpp, Wp), lambda h, d: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Hb, Hx), lambda h, d: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((DC, Hb, Wp), lambda h, d: (d, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Dp, Hp, Wp), dt),
        scratch_shapes=[pltpu.VMEM((3, Hx, Wpp), jnp.float32)],
        interpret=jax.default_backend() != "tpu")(
            srcp, tgt_stack, stats_s, bv)
    return out


def main():
    rng = np.random.default_rng(0)
    img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    dt = jnp.bfloat16

    ref = bp._fused_call("zncc", img_l, img_r, 3, 3, D, Dp, Hb, dt, False,
                         negate=True, pad_d_inf=True, pout_bake=100.0)
    got = cv_mxu(img_l, img_r, dt)
    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    fin = np.isfinite(r)
    diff = np.abs(r[fin] - g[fin])
    print("value check: max abs diff", float(diff.max()),
          "frac equal", float((diff == 0).mean()))

    def tmed(fn, n_rep=5, iters=50):
        @jax.jit
        def chained(z, k):
            def body(_, zc):
                out = fn(zc)
                return zc + 1e-9 * out.ravel()[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, z)
        np.asarray(chained(img_l, 1).ravel()[0])
        meds = []
        for _ in range(n_rep):
            t0 = time.perf_counter()
            np.asarray(chained(img_l, 1).ravel()[0])
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(chained(img_l, 1 + iters).ravel()[0])
            t2 = time.perf_counter() - t0
            meds.append((t2 - t1) / iters * 1e3)
        return float(np.median(meds))

    print("VPU kernel:", round(tmed(
        lambda l: bp._fused_call("zncc", l, img_r, 3, 3, D, Dp, Hb, dt,
                                 False, negate=True, pad_d_inf=True,
                                 pout_bake=100.0)), 3), "ms")
    print("MXU-V kernel:", round(tmed(
        lambda l: cv_mxu(l, img_r, dt)), 3), "ms")


if __name__ == "__main__":
    main()
