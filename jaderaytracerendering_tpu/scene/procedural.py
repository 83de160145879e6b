"""Procedural meshes replacing the repo's missing demo assets.

The reference scene loads ``happyBuddha.obj``, ``light.obj`` and
``box.obj`` (PathTrace.cpp:1002, 1010, 1037) — none are shipped in the
repo. These generators produce deterministic equivalents: a unit box, a
light quad, UV/ico spheres, and a "buddha stand-in" (a displaced sphere
blob with a tunable triangle count for 100k+-triangle BVH benchmarks).
All outputs are (vertices [V,3] float64, faces [F,3] int64) ready for
``objloader.mesh_from_arrays`` or ``objloader.write_obj``.
"""

from __future__ import annotations

import numpy as np


def box() -> tuple[np.ndarray, np.ndarray]:
    """Unit cube centered at origin, 12 triangles, outward winding."""
    v = np.array(
        [
            [-0.5, -0.5, -0.5], [0.5, -0.5, -0.5], [0.5, 0.5, -0.5], [-0.5, 0.5, -0.5],
            [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5], [0.5, 0.5, 0.5], [-0.5, 0.5, 0.5],
        ],
        np.float64,
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # -z
            [4, 5, 6], [4, 6, 7],  # +z
            [0, 1, 5], [0, 5, 4],  # -y
            [3, 6, 2], [3, 7, 6],  # +y
            [0, 7, 3], [0, 4, 7],  # -x
            [1, 2, 6], [1, 6, 5],  # +x
        ],
        np.int64,
    )
    return v, f


def quad() -> tuple[np.ndarray, np.ndarray]:
    """Unit square in the XY plane (the light.obj stand-in), 2 triangles."""
    v = np.array(
        [[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.5, 0.5, 0.0], [-0.5, 0.5, 0.0]],
        np.float64,
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return v, f


def uv_sphere(n_lat: int = 16, n_lon: int = 32) -> tuple[np.ndarray, np.ndarray]:
    """Unit-diameter UV sphere."""
    verts = [(0.0, 0.5, 0.0)]
    for i in range(1, n_lat):
        theta = np.pi * i / n_lat
        y = 0.5 * np.cos(theta)
        rad = 0.5 * np.sin(theta)
        for j in range(n_lon):
            phi = 2 * np.pi * j / n_lon
            verts.append((rad * np.cos(phi), y, rad * np.sin(phi)))
    verts.append((0.0, -0.5, 0.0))
    v = np.asarray(verts, np.float64)

    faces = []
    # top cap
    for j in range(n_lon):
        faces.append((0, 1 + (j + 1) % n_lon, 1 + j))
    # bands
    for i in range(n_lat - 2):
        a = 1 + i * n_lon
        b = 1 + (i + 1) * n_lon
        for j in range(n_lon):
            j2 = (j + 1) % n_lon
            faces.append((a + j, a + j2, b + j))
            faces.append((a + j2, b + j2, b + j))
    # bottom cap
    last = len(v) - 1
    a = 1 + (n_lat - 2) * n_lon
    for j in range(n_lon):
        faces.append((last, a + j, a + (j + 1) % n_lon))
    return v, np.asarray(faces, np.int64)


def buddha_standin(n_triangles: int = 100_000, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Organic displaced-sphere blob with ~n_triangles triangles.

    Deterministic smooth displacement (sum of low-frequency sinusoids +
    a vertical taper) gives a statue-like silhouette with concavities —
    a fair stand-in for happyBuddha.obj's geometric load on the BVH.
    """
    # tris ~= 2 * n_lat * n_lon with n_lon = 2 n_lat
    n_lat = max(8, int(np.sqrt(n_triangles / 4.0)))
    n_lon = 2 * n_lat
    v, f = uv_sphere(n_lat, n_lon)
    rng = np.random.default_rng(seed)
    # fixed bank of sinusoidal lobes
    freqs = rng.uniform(1.5, 6.0, size=(8, 3))
    phases = rng.uniform(0, 2 * np.pi, size=8)
    amps = rng.uniform(0.02, 0.08, size=8)
    p = v * 2.0  # unit radius
    disp = np.zeros(len(v))
    for k in range(8):
        disp += amps[k] * np.sin(
            p[:, 0] * freqs[k, 0] + p[:, 1] * freqs[k, 1] + p[:, 2] * freqs[k, 2] + phases[k]
        )
    # vertical taper: wider base, narrower top (statue-ish)
    taper = 1.0 - 0.35 * np.clip(p[:, 1], 0, 1) ** 2
    radial = 1.0 + disp
    out = v * (radial * taper)[:, None]
    out[:, 1] *= 1.35  # elongate vertically
    return out, f


def mesh_stats(v: np.ndarray, f: np.ndarray) -> str:
    return f"{len(v)} verts, {len(f)} tris"
