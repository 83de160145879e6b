"""Wavefront OBJ loader with reference-compatible semantics.

Reproduces readObj (PathTrace.cpp:366-466, PathTrace.cu:355-457):

- only ``v`` and ``f`` records are used; ``#`` comment lines skipped;
- triangular faces only; the reference replaces '/' with ' ' so a face
  ``f a/b/c d/e/f g/h/i`` is *misparsed* as vertices (a, b, c). We parse
  index groups correctly by default and keep that bug behind
  ``compat_slash_faces=True`` (SURVEY §7 "known reference bugs");
- optional unit-cube normalization from the object's AABB. The reference
  computes that AABB with a cross-axis typo — ``maxy = max(maxx, y)``
  etc. (PathTrace.cpp:415-416, PathTrace.cu:399-400) — which changes the
  normalization of every model. Correct AABB by default;
  ``compat_aabb_bug=True`` replicates the reference;
- a 4x4 model transform (GLM m[col,row] layout) applied to all vertices;
- output is flat-shaded: one face normal per triangle
  (``normalize(cross(p2-p1, p3-p1))``, PathTrace.cu:448).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..core import vecmath


@dataclasses.dataclass
class MeshData:
    """Triangle soup for one object: [T, 3] float32 arrays."""

    p1: np.ndarray
    p2: np.ndarray
    p3: np.ndarray
    norm: np.ndarray

    @property
    def n_triangles(self) -> int:
        return len(self.p1)


def parse_obj_text(
    text: str, compat_slash_faces: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Parse OBJ source -> (vertices [V,3] f64, face index triples [F,3] i64).

    Face indices are 0-based on return; negative OBJ indices (relative)
    are resolved. ``compat_slash_faces`` reproduces the reference's
    '/'->' ' substitution (PathTrace.cpp:388-392).
    """
    vertices: list[tuple[float, float, float]] = []
    faces: list[tuple[int, int, int]] = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if compat_slash_faces:
            line = line.replace("/", " ")
        parts = line.split()
        tag = parts[0]
        if tag == "v":
            vertices.append((float(parts[1]), float(parts[2]), float(parts[3])))
        elif tag == "f":
            idx = []
            for tok in parts[1:]:
                # correct path: take the vertex index before any '/'
                v = int(tok.split("/")[0])
                idx.append(v)
            if len(idx) < 3:
                raise ValueError(f"face with <3 vertices: {raw!r}")
            if compat_slash_faces:
                # the reference reads exactly three ints per face record
                # (PathTrace.cpp:403-423), so a slash-replaced
                # 'f a/b/c d/e/f g/h/i' collapses to ONE triangle (a,b,c)
                idx = idx[:3]
            # fan-triangulate polygons (reference reads exactly 3)
            for k in range(1, len(idx) - 1):
                tri = (idx[0], idx[k], idx[k + 1])
                faces.append(
                    tuple(v - 1 if v > 0 else len(vertices) + v for v in tri)
                )
    v = np.asarray(vertices, np.float64).reshape(-1, 3)
    f = np.asarray(faces, np.int64).reshape(-1, 3)
    return v, f


def _reference_aabb(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The buggy running AABB of PathTrace.cpp:399-400 / cu:399-400.

    Sequential over vertices: maxx tracks x correctly, but
    maxy = max(maxx_prev_after_x_update, y) and maxz = max(maxx, z);
    same contamination on the min side.
    """
    maxx = maxy = maxz = -11451419.19
    minx = miny = minz = 11451419.19
    for x, y, z in v:
        maxx = max(maxx, x)
        maxy = max(maxx, y)
        maxz = max(maxx, z)
        minx = min(minx, x)
        miny = min(minx, y)
        minz = min(minx, z)
    return np.array([minx, miny, minz]), np.array([maxx, maxy, maxz])


def normalize_vertices(
    v: np.ndarray, compat_aabb_bug: bool = False
) -> np.ndarray:
    """Center the model and scale its longest AABB axis to 1
    (PathTrace.cpp:410-423)."""
    if len(v) == 0:
        return v
    if compat_aabb_bug:
        lo, hi = _reference_aabb(v)
    else:
        lo, hi = v.min(axis=0), v.max(axis=0)
    max_axis = float((hi - lo).max())
    center = (hi + lo) / 2.0
    return (v - center) / max_axis


def mesh_from_arrays(
    v: np.ndarray,
    f: np.ndarray,
    transform: np.ndarray | None = None,
    normalize: bool = False,
    compat_aabb_bug: bool = False,
) -> MeshData:
    """Assemble a MeshData: normalize -> transform -> flat normals."""
    v = np.asarray(v, np.float64)
    if normalize:
        v = normalize_vertices(v, compat_aabb_bug)
    if transform is not None:
        v = vecmath.transform_point(np.asarray(transform, np.float64), v, np)
    p1 = v[f[:, 0]].astype(np.float32)
    p2 = v[f[:, 1]].astype(np.float32)
    p3 = v[f[:, 2]].astype(np.float32)
    norm = vecmath.face_normal(
        p1.astype(np.float64), p2.astype(np.float64), p3.astype(np.float64), np
    ).astype(np.float32)
    return MeshData(p1=p1, p2=p2, p3=p3, norm=norm)


def read_obj(
    filepath: str,
    transform: np.ndarray | None = None,
    normalize: bool = False,
    compat_aabb_bug: bool = False,
    compat_slash_faces: bool = False,
    backend: str = "auto",
) -> MeshData:
    """readObj equivalent: file -> transformed flat-shaded triangle soup.

    ``backend='auto'`` prefers the native C++ parser (accel.native) and
    falls back to the Python parser; 'python'/'native' force one."""
    v = f = None
    if backend in ("auto", "native"):
        from ..accel import native as native_mod

        parsed = native_mod.parse_obj(filepath, compat_slash_faces)
        if parsed is not None:
            v, f = parsed
        elif backend == "native":
            raise RuntimeError("native OBJ parser requested but library missing")
    if v is None:
        with open(filepath, "r") as fh:
            text = fh.read()
        v, f = parse_obj_text(text, compat_slash_faces)
    return mesh_from_arrays(v, f, transform, normalize, compat_aabb_bug)


def write_obj(filepath: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    """Minimal OBJ writer (for shipping procedural demo assets)."""
    with open(filepath, "w") as fh:
        fh.write("# jaderaytracerendering_tpu procedural mesh\n")
        for x, y, z in vertices:
            fh.write(f"v {x:.8g} {y:.8g} {z:.8g}\n")
        for a, b, c in faces + 1:
            fh.write(f"f {a} {b} {c}\n")
