"""Multi-chip scaling benchmark: frames/s/chip and scaling efficiency of
the distributed dense-stereo step over 1..N devices (BASELINE.md: >= 80%
scaling efficiency at 2+ hosts; fps per chip at 1 chip / 1 host / N hosts).

``--mode`` selects the sharded axis (BASELINE.md names image tiles AND
disparity-range blocks, not just batches):

  * ``batch`` — data parallel: B = 2 frames/chip, no cross-chip traffic
    (serving scale; one v5e chip already saturates on one SD frame);
  * ``tile``  — image rows sharded: halo exchange for the cost volume,
    ppermute carry relay for the SGM scanline passes (the >HBM-frame /
    latency-scale axis);
  * ``dsh``   — disparity-range blocks: each chip builds its disparity
    sub-range, all_gather reassembles before SGM;
  * ``all``   — every mode in sequence.

All modes run `distributed_full_step` (exercises the same code paths the
8-device virtual-mesh tests validate bit-exactly).  On this environment
only ONE physical TPU chip is reachable, so real multi-chip numbers
cannot be produced here: run on a pod slice to fill the table.  With
JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=8 it
validates the harness end-to-end on the virtual mesh (timings then
measure host CPU, not ICI).

Prints one JSON line per (mode, device count):
  {"metric": "...", "mode": m, "n_devices": n, "value": fps_per_chip,
   "unit": "frames/s/chip", "efficiency": fps_n / fps_1}
"""

import argparse
import json
import os
import time

# Raised scoped-VMEM pool, as in bench_grid.py (no-op on the CPU
# virtual mesh; a measured win for the big-geometry rows on TPU).
os.environ.setdefault("LIBTPU_INIT_ARGS",
                      "--xla_tpu_scoped_vmem_limit_kib=65536")

import numpy as np


def run_mode(mode, counts, H, W, D):
    import jax
    import jax.numpy as jnp
    from libstevi_tpu.core import MatchingFunction
    from libstevi_tpu.parallel import make_stereo_mesh, MeshSpec
    from libstevi_tpu.parallel.stereo import distributed_full_step

    devs = jax.devices()
    rng = np.random.default_rng(0)
    base_fps = None
    for n in counts:
        if n > len(devs):
            continue
        spec = {"batch": MeshSpec(batch=n, tile=1, dsh=1),
                "tile": MeshSpec(batch=1, tile=n, dsh=1),
                "dsh": MeshSpec(batch=1, tile=1, dsh=n)}[mode]
        mesh = make_stereo_mesh(spec, devs[:n])
        step = distributed_full_step(
            mesh, MatchingFunction.ZNCC, 3, 3, D, P1=0.1, P2=0.5,
            n_directions=8)
        # batch mode scales work with n (2 frames/chip); tile/dsh keep a
        # FIXED problem and split it (strong scaling)
        B = 2 * n if mode == "batch" else 2
        ls = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
        rs = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
        out = step(ls, rs)
        np.asarray(out[0, 0, 0])        # compile + sync
        n_iter = 5
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = step(ls, rs)
        np.asarray(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / n_iter
        fps_chip = B / dt / n
        if base_fps is None:
            base_fps = fps_chip
        print(json.dumps({
            "metric": f"distributed ZNCC+SGM8 {H}x{W} D={D}",
            "mode": mode,
            "n_devices": n,
            "value": round(fps_chip, 2),
            "unit": "frames/s/chip",
            "efficiency": round(fps_chip / base_fps, 4),
        }), flush=True)


def main():
    import os
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the container's sitecustomize re-registers the TPU plugin over
        # the env var; pin the platform before first backend use so the
        # virtual-mesh validation really runs on N CPU devices
        import jax
        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("batch", "tile", "dsh", "all"),
                    default="batch")
    ap.add_argument("--counts", default="1,2,4,8,16,32")
    ap.add_argument("--shape", default="480,640,120",
                    help="H,W,D (use smaller shapes on the CPU mesh)")
    args = ap.parse_args()
    counts = [int(c) for c in args.counts.split(",")]
    H, W, D = (int(x) for x in args.shape.split(","))
    modes = ("batch", "tile", "dsh") if args.mode == "all" else (args.mode,)
    for m in modes:
        run_mode(m, counts, H, W, D)


if __name__ == "__main__":
    main()
