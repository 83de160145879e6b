"""Batched 3-vector math shared by the JAX integrator and the NumPy oracle.

The reference carries its own float3 wrappers (vec3_hs / vec3_dv,
PathTrace.cu:110-289). Here vectors are arrays of shape [..., 3] and every
helper takes an ``xp`` array module (numpy or jax.numpy) so the exact same
code path produces the CPU oracle and the TPU kernels — uint/float op
sequences are identical, which is what makes CPU-vs-TPU RMSE checks tight.
"""

from __future__ import annotations


def dot(a, b, xp):
    """Row-wise dot product of [..., 3] vectors -> [..., 1] (keepdims)."""
    return xp.sum(a * b, axis=-1, keepdims=True)


def dot_s(a, b, xp):
    """Row-wise dot product -> [...] (no kept dim)."""
    return xp.sum(a * b, axis=-1)


def cross(a, b, xp):
    """Row-wise cross product of [..., 3] vectors (PathTrace.cu:283-289)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return xp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def mixed_product(a, b, c, xp):
    """Scalar triple product a . (b x c) -> [...] (PathTrace.cu:261-266)."""
    return dot_s(a, cross(b, c, xp), xp)


def norm(v, xp):
    """Euclidean length of [..., 3] vectors -> [...]."""
    return xp.sqrt(dot_s(v, v, xp))


def normalize(v, xp, eps=0.0):
    """Unit vector; matches the reference's 1/sqrt form (PathTrace.cu:278-281).

    ``eps`` guards zero-length input lanes (masked-out wavefront lanes may
    carry zero directions; the reference never normalizes a zero vector).
    """
    n2 = dot(v, v, xp)
    if eps:
        n2 = xp.maximum(n2, eps)
    return v * (1.0 / xp.sqrt(n2))


def transform_point(m, v, xp):
    """Apply a 4x4 matrix (w=1) to [..., 3] points.

    The reference stores matrices in GLM column-major layout and computes
    ``out = M^T-style`` products (PathTrace.cu:268-276): element [col][row]
    indexing means ``out_x = m[0][0]x + m[1][0]y + m[2][0]z + m[3][0]w``.
    ``m`` here is a [4, 4] array in that same storage order (m[c, r]).
    """
    return _transform(m, v, 1.0, xp)


def transform_dir(m, v, xp):
    """Apply a 4x4 matrix with w=0 (directions; PathTrace.cu:1434-1435)."""
    return _transform(m, v, 0.0, xp)


def _transform(m, v, w, xp):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    ox = m[0, 0] * x + m[1, 0] * y + m[2, 0] * z + m[3, 0] * w
    oy = m[0, 1] * x + m[1, 1] * y + m[2, 1] * z + m[3, 1] * w
    oz = m[0, 2] * x + m[1, 2] * y + m[2, 2] * z + m[3, 2] * w
    return xp.stack([ox, oy, oz], axis=-1)


def reflect(d, n, xp):
    """Mirror reflection d' = d - 2(d.n)n.

    The reference writes the mirror continuation as
    ``n*(2 dot(out,n)) - out`` for the reversed direction convention
    (PathTrace.cu:1378) and ``r - n*2(r.n)`` inside refraction
    (PathTrace.cu:1217); both reduce to this with consistent signs.
    """
    return d - n * (2.0 * dot(d, n, xp))


def triangle_area(p1, p2, p3, xp):
    """0.5 * |(p2-p1) x (p3-p1)| (PathTrace.cu:897-903)."""
    c = cross(p2 - p1, p3 - p1, xp)
    return 0.5 * xp.sqrt(dot_s(c, c, xp))


def face_normal(p1, p2, p3, xp):
    """Flat-shaded face normal normalize(cross(p2-p1, p3-p1)) (PathTrace.cu:448)."""
    return normalize(cross(p2 - p1, p3 - p1, xp), xp)
