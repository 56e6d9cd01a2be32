"""Headline benchmark: dense ZNCC cost volume + 8-direction SGM + WTA +
subpixel on one synthetic stereo pair at the reference benchmark geometry
(~480p, D=120 — `test/benchmarks/benchmarkCrossCorrelationAlgorithms.cpp:
370-401`; the reference publishes no numbers, so vs_baseline reports the
fraction of the HBM-bandwidth roofline achieved, per BASELINE.md's >=90%
target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

# Raise the scoped-VMEM pool (see utils/vmem.py): the flagship compiles
# to the identical configuration at either pool size (measured neutral,
# scripts/exp_r5_vmem_sd.py) — set for uniformity with bench_grid.py,
# where the raised pool is a measured win at HD / large D.
os.environ.setdefault("LIBTPU_INIT_ARGS",
                      "--xla_tpu_scoped_vmem_limit_kib=65536")

import numpy as np


def _device_healthy(timeout_s: float = 180.0) -> bool:
    """The axon tunnel can go fully down (even a 128x128 matmul hangs
    forever); probe it in a SUBPROCESS so a dead device yields an honest
    error record instead of a silent hang.  (A daemon-thread probe does
    not work: axon backend init from a non-main thread itself hangs,
    reporting a false outage.)"""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax.numpy as jnp;"
             "x = jnp.ones((128, 128), jnp.bfloat16);"
             "print(float((x @ x).sum()))"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import entry

    if not _device_healthy():
        print(json.dumps({
            "metric": "dense ZNCC+SGM8+WTA+subpixel 480x640 D=120 "
                      "frames/s/chip",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": "TPU unreachable (tunnel hang on a trivial matmul); "
                     "no measurement taken — last good record: "
                     "289.6 fps / 3.453 ms median-of-5 bf16 "
                     "(round-5 session)",
        }))
        return

    fn, args = entry()

    # Device-chained timing: each iteration's input depends on the previous
    # output, so n iterations serialize on device and one final host
    # transfer syncs — the (tunnel) host round-trip is amortized away and
    # cannot fake-async the measurement either.  Tunnel timing is noisy
    # (±0.5 ms between windows): take the MEDIAN of 5 independent
    # 40-iteration measurements (min is glitch-prone, mean drags outliers).
    @jax.jit
    def chained(l, r, n):
        def body(_, carry):
            l, r = carry
            disp = fn(l, r)
            return l + 1e-9 * disp[0, 0], r
        return jax.lax.fori_loop(0, n, body, (l, r))[0]

    np.asarray(chained(*args, 1)[0, 0])  # compile + sync
    n_iter = 40

    def timed_call(k):
        t0 = time.perf_counter()
        np.asarray(chained(*args, k)[0, 0])
        return time.perf_counter() - t0

    # Difference of MEDIANS: median the 1-iter and (1+n)-iter call
    # times separately, then subtract — a single spiked tunnel
    # round-trip (they occasionally exceed the whole frame time)
    # perturbs one sample of one median instead of poisoning a
    # per-sample difference.
    t1s = [timed_call(1) for _ in range(5)]
    tns = [timed_call(1 + n_iter) for _ in range(5)]
    dt = (float(np.median(tns)) - float(np.median(t1s))) / n_iter
    fps = 1.0 / dt

    # Roofline: fraction of XLA's own cost-analysis bound achieved —
    # max(bytes accessed / HBM BW, flops / peak) for the compiled frame
    # (v5e: 819 GB/s HBM, 197 TFLOP/s bf16 MXU peak).  The pipeline is
    # VPU-compute bound, so the compute term is the binding one.
    from libstevi_tpu.utils.profiling import (cost_analysis,
                                              V5E_HBM_BYTES_PER_S,
                                              V5E_PEAK_FLOPS_BF16)
    ca = cost_analysis(fn, *args)
    # the flagship pipeline computes in bf16 (197 TFLOP/s peak on v5e)
    t_live = max(float(ca.get("bytes accessed", 0)) / V5E_HBM_BYTES_PER_S,
                 float(ca.get("flops", 0)) / V5E_PEAK_FLOPS_BF16)

    # The live cost-analysis roofline is GRAPH-dependent: removing wasted
    # copies from the pipeline shrinks "bytes accessed" and so shrinks the
    # denominator — round 4's zero-copy-chain path would *look* slower by
    # that metric while being 12% faster.  For cross-round comparability,
    # vs_baseline keeps the round-1..3 denominator frozen at the round-3
    # compiled-graph value (1.64 ms); the live value is reported alongside.
    ROOFLINE_R3_S = 1.64e-3
    vs = ROOFLINE_R3_S / dt

    # Derived per-stage hard floor (docs/PERF.md "Derived hard floor"):
    # every stage at its binding hardware resource — VPU issue for the
    # sequential DP passes and the CV window sums, transposes taken at
    # their best (layout-absorbed/overlapped) case of ~0.  Recomputed
    # round 5 from the corrected stage accounts: 0.55 (CV window-sum
    # issue) + 0.59 (down) + 0.64 (up) + 0.33 (fwd) + 0.32 (rev+WTA)
    # = 2.43 ms.  The cost-analysis roofline does not model instruction
    # issue, so it overstates what any SGM formulation with the
    # reference's exact semantics can reach (see BASELINE.md).
    DERIVED_FLOOR_S = 2.43e-3
    vs_floor = DERIVED_FLOOR_S / dt

    # Round-5 measured-stage floor: the sum of the best ISOLATED
    # per-stage measurements — CV 0.76 (incl. its irreducible per-d
    # lane shifts) + cv_T 0.17 + down 0.635 + up 0.705 + adj_T 0.28 +
    # fwd 0.357 + rev/WTA 0.30 = 3.21 ms (docs/PERF.md round-5 table) —
    # what this pass structure reaches with zero in-context scheduling
    # overhead.  The 2.43 hard floor's CV and transpose terms have no
    # implementation on this layout (docs/PERF.md "The two committed
    # floors", with receipts).
    STAGE_FLOOR_S = 3.21e-3

    print(json.dumps({
        "metric": "dense ZNCC+SGM8+WTA+subpixel 480x640 D=120 frames/s/chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 4),
        # vs_baseline divides a FROZEN denominator (the round-3
        # compiled-graph cost-analysis roofline, 1.64 ms) by the live
        # frame time, so it is cross-round comparable and CAN exceed
        # 1.0; the live-graph fraction is vs_roofline_live.
        "vs_baseline_semantics": "frozen round-3 roofline (1.64 ms) / "
                                 "measured frame time",
        "vs_roofline_live": round(t_live / dt, 4) if t_live > 0 else 0.0,
        "vs_derived_floor": round(vs_floor, 4),
        "derived_floor_ms": DERIVED_FLOOR_S * 1e3,
        "vs_stage_floor": round(STAGE_FLOOR_S / dt, 4),
        "stage_floor_ms": STAGE_FLOOR_S * 1e3,
        "ms_per_frame_median5": round(dt * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
