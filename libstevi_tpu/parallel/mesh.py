"""Device-mesh construction for the stereo engine.

No reference counterpart: LibStevi's parallel substrate is OpenMP threads on
one host (SURVEY.md §2.8).  Here the substrate is a `jax.sharding.Mesh` with
up to three logical axes:

  * ``batch`` — data parallelism over stereo pairs/frames (the production
    serving axis; embarrassingly parallel, no collectives).
  * ``tile``  — spatial parallelism over image rows (the analogue of
    sequence/context parallelism); needs halo exchange for window margins
    and carry relays for SGM scanlines.
  * ``dsh``   — disparity-range sharding of the cost volume D axis; WTA then
    performs an argmin reduction across the axis.

On a pod slice, ``tile`` should map to an ICI-contiguous physical axis so
halo `ppermute`s ride neighbor links; ``batch`` can span DCN.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
from jax.sharding import Mesh


@dataclass(frozen=True)
class MeshSpec:
    batch: int = 1
    tile: int = 1
    dsh: int = 1

    @property
    def n_devices(self) -> int:
        return self.batch * self.tile * self.dsh


def make_stereo_mesh(spec: MeshSpec, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if len(devices) < spec.n_devices:
        raise ValueError(
            f"mesh needs {spec.n_devices} devices, have {len(devices)}")
    devs = np.asarray(devices[: spec.n_devices]).reshape(
        spec.batch, spec.tile, spec.dsh)
    return Mesh(devs, ("batch", "tile", "dsh"))
