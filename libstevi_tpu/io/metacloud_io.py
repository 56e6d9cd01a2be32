"""MetaCloud descriptor format.

Reference parity: `io/metacloud_io.{h,cpp}:10-173` — a text descriptor
aggregating point files plus optional extra-attribute and index files:

    # comments
    POINTS_FILES
    "relative/path.las"
    ...
    ATTRIBUTES_FILES            (optional: sidecar per-point attributes)
    ...
    INDEX_FILES                 (optional)
    ...
    METACLOUD_ATTRIBUTES
    key "value"

Reading concatenates the referenced point clouds (any supported codec) and
collects the metacloud-level attributes; writing emits a descriptor plus a
sidecar LAS holding the points.
"""

from __future__ import annotations

import os
import shlex

import numpy as np

from .pointcloud_io import PointCloud


def read_metacloud(path: str) -> PointCloud:
    from .pointcloud_io import open_point_cloud
    d = os.path.dirname(os.path.abspath(path))
    section = None
    point_files = []
    meta = {}
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            if line in ("POINTS_FILES", "ATTRIBUTES_FILES", "INDEX_FILES",
                        "METACLOUD_ATTRIBUTES"):
                section = line
                continue
            if section == "POINTS_FILES":
                point_files.append(shlex.split(line)[0])
            elif section == "METACLOUD_ATTRIBUTES":
                parts = shlex.split(line)
                if len(parts) >= 2:
                    meta[parts[0]] = " ".join(parts[1:])

    clouds = [open_point_cloud(os.path.normpath(os.path.join(d, p)))
              for p in point_files]
    if not clouds:
        raise IOError(f"metacloud references no point files: {path}")
    positions = np.concatenate([c.positions for c in clouds], 0)
    attrs = {}
    common = set(clouds[0].attributes)
    for c in clouds[1:]:
        common &= set(c.attributes)
    for k in common:
        attrs[k] = np.concatenate([np.asarray(c.attributes[k])
                                   for c in clouds], 0)
    cloud = PointCloud(positions, attrs)
    cloud.metacloud_attributes = meta
    return cloud


def write_metacloud(path: str, cloud: PointCloud, meta: dict | None = None
                    ) -> bool:
    from .pointcloud_io import write_las
    base = os.path.splitext(os.path.basename(path))[0]
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    points_file = f"{base}_points.las"
    write_las(os.path.join(d, points_file), cloud)
    lines = ["# metacloud descriptor", "", "POINTS_FILES",
             f'"{points_file}"', "", "METACLOUD_ATTRIBUTES"]
    for k, v in (meta or {}).items():
        lines.append(f'{k} "{v}"')
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return True
