"""Procedural mesh assets.

The reference loads `box.obj`, which is absent from its repo
(RaytracingEngine.cpp:250 — HEAD throws at startup; SURVEY.md §5.6). We
substitute a procedural axis-aligned cube with the same mesh plumbing
(flat vertex list + flat index list, like Model's storage, Shape.h:251-252).
"""

from __future__ import annotations

import numpy as np


def cube_mesh(size: float = 4.0) -> tuple[np.ndarray, np.ndarray]:
    """Axis-aligned cube centered at the origin, edge length `size`.

    Returns (vertices [8,3] float64, indices [36] int64) — 12 triangles
    with outward-facing winding.
    """
    h = size / 2.0
    verts = np.array(
        [
            [-h, -h, -h],
            [h, -h, -h],
            [h, h, -h],
            [-h, h, -h],
            [-h, -h, h],
            [h, -h, h],
            [h, h, h],
            [-h, h, h],
        ],
        dtype=np.float64,
    )
    # Each face as two CCW-from-outside triangles.
    faces = [
        (0, 2, 1), (0, 3, 2),  # -z (front toward camera at -inf)
        (4, 5, 6), (4, 6, 7),  # +z
        (0, 1, 5), (0, 5, 4),  # -y
        (3, 7, 6), (3, 6, 2),  # +y
        (0, 4, 7), (0, 7, 3),  # -x
        (1, 2, 6), (1, 6, 5),  # +x
    ]
    idx = np.array(faces, dtype=np.int64).reshape(-1)
    return verts, idx


def cube_obj_text(size: float = 4.0) -> str:
    """The same cube serialized as Wavefront OBJ (for OBJ-loader tests)."""
    verts, idx = cube_mesh(size)
    lines = ["# procedural cube", "o box"]
    for v in verts:
        lines.append(f"v {v[0]} {v[1]} {v[2]}")
    for i in range(0, len(idx), 3):
        lines.append(f"f {idx[i]+1} {idx[i+1]+1} {idx[i+2]+1}")
    return "\n".join(lines) + "\n"
