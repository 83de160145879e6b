"""Pallas TPU kernel: the pool engine's respawn SPAWN front.

One pallas_call runs the whole per-round spawn chain that previously
cost ~0.4 ms/iter of XLA launches (docs/PERF.md round-3 tail
decomposition: cumsum dots + camera RNG/math + the primary feature
build): the fresh-lane compaction cumsum (in-kernel matmul against a
triangular ones matrix, with a VMEM scratch scalar carrying the running
total across the sequential lane-tile grid), work-queue sample
assignment (pool.py::spawn semantics), the film-jitter RNG draws
(counter hash, bit-identical to core.rng.uniform — same dual-lowering
pattern as bounce_front), the camera ray generation
(core.camera.generate_rays_p math, replacing the reference's
render_pixel ray setup PathTrace.cu:1425-1437), and the primary trace's
[16, M] ray-feature block (gemm_intersect.ray_features_t16 layout,
double-normalized like wavefront._nearest_planes so masked lanes trace
as NaN-miss rows).

Interface (lane blocks (rows, TM) over the sequential lane grid):
  ints [1, 8] i32 in (whole) — 0 next_sample, 1 total_samples,
                               2 sample_base
  cam  [1, 24] f32 in (whole) — 0-15 camera_rotate (flat [col, row] =
                               4*col + row), 16-18 eye
  su   [8, M] i32 in — 0 fresh, 1 slot, 2 pix, 3 smp (current values)
  triu [TM, TM] f32 in (whole) — upper-triangular ones (cumsum matmul)
outputs:
  feats [16, M] f32 — primary-ray trace features (masked lanes NaN)
  meta  [8, M] i32 — 0 got, 1 slot', 2 pix', 3 smp', 4 k (inclusive
                     fresh cumsum; row [4, M-1] is the round's fresh
                     count, pool.py cuts it against the queue)
  daux  [8, M] f32 — 0-2 d_u (the single eps-normalized direction the
                     pool's post-trace math uses: sky lookup, hit-point
                     advance — bit-matching wavefront._unit_p)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import compiler_params as _cparams

from ...core import vecmath as vm
from ...core.vecmath import V3, vwhere


class _Mat:
    """[1, 16] flat camera matrix -> m[col, row] scalar [1, 1] slices so
    vecmath.vtransform's indexing works unchanged in-kernel."""

    def __init__(self, row):
        self._r = row

    def __getitem__(self, cr):
        c, r = cr
        i = 4 * c + r
        return self._r[0:1, i:i + 1]


def _kernel(ints_ref, cam_ref, su_ref, triu_ref, feats_ref, meta_ref,
            daux_ref, acc_ref, *, npix: int, width: int, height: int,
            seed: int, jitter: str, focal_z: float):
    from ...core import rng
    from ...core.rng import DrawSites as S

    tm = su_ref.shape[1]
    fresh = su_ref[0:1] != 0
    slot = su_ref[1:2]
    pix = su_ref[2:3]
    smp = su_ref[3:4]

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[0:1, 0:1] = jnp.zeros((1, 1), jnp.int32)

    # ---- global fresh-lane cumsum (scanops.cumsum_indicator semantics:
    # exact f32 matmul of a 0/1 row, totals << 2^24) ----
    f32row = fresh.astype(jnp.float32)
    within = jnp.dot(f32row, triu_ref[:],
                     preferred_element_type=jnp.float32)
    base = acc_ref[0, 0]
    k = within.astype(jnp.int32) + base
    acc_ref[0:1, 0:1] = acc_ref[0:1, 0:1] + jnp.sum(
        f32row, axis=1, keepdims=True).astype(jnp.int32)

    # ---- work-queue sample assignment (pool.py::spawn) ----
    next_sample = ints_ref[0:1, 0:1]
    total = ints_ref[0:1, 1:2]
    sample_base = ints_ref[0:1, 2:3]
    sample_index = next_sample + (k - 1)
    got = fresh & (sample_index < total)
    new_slot = sample_index % npix
    slot = jnp.where(got, new_slot, slot)
    pix = jnp.where(got, new_slot, pix)
    smp = jnp.where(got, sample_index // npix + sample_base, smp)

    # ---- camera rays (generate_rays_p, in-kernel RNG) ----
    pix_u = pix.astype(jnp.uint32)
    smp_u = smp.astype(jnp.uint32)
    u1 = rng.uniform(jnp, pix_u, smp_u, 0, int(S.JITTER_X), seed)
    u2 = rng.uniform(jnp, pix_u, smp_u, 0, int(S.JITTER_Y), seed)
    px = (pix_u % jnp.uint32(width)).astype(jnp.int32).astype(jnp.float32)
    py = (pix_u // jnp.uint32(width)).astype(jnp.int32).astype(jnp.float32)
    if jitter == "cuda":
        ndc_x = -1.0 + 2.0 / width * (px + u1 - 0.5)
        ndc_y = -1.0 + 2.0 / height * (py + u2 - 0.5)
    elif jitter == "gl":
        ndc_x = -1.0 + 2.0 * (px + 0.5) / width + (u1 - 0.5) / width
        ndc_y = -1.0 + 2.0 * (py + 0.5) / height + (u2 - 0.5) / height
    else:
        raise ValueError(f"unknown jitter mode {jitter!r}")
    dcam = V3(ndc_x, ndc_y, jnp.full_like(ndc_x, focal_z))
    dirs = vm.vnormalize(vm.vtransform(_Mat(cam_ref[:]), dcam, 0.0), jnp)

    # zero-direction masking + the trace path's double normalization
    # (wavefront._nearest_planes): dead lanes become NaN feature rows
    d0 = vwhere(got, dirs, 0.0, jnp)
    d_u = vm.vnormalize(d0, jnp, eps=1e-30)      # _unit_p
    d_uu = vm.vnormalize(d_u, jnp)
    zrow = jnp.zeros((1, tm), jnp.float32)
    ox = cam_ref[0:1, 16:17] + zrow
    oy = cam_ref[0:1, 17:18] + zrow
    oz = cam_ref[0:1, 18:19] + zrow
    o = V3(ox, oy, oz)
    w = vm.vcross(d_uu, o)
    ones = jnp.ones((1, tm), jnp.float32)
    feats_ref[:] = jnp.concatenate([
        d_uu.x, d_uu.y, d_uu.z, w.x, w.y, w.z, o.x, o.y, o.z, ones,
        zrow, zrow, zrow, zrow, zrow, zrow,
    ])
    zi = jnp.zeros((1, tm), jnp.int32)
    meta_ref[:] = jnp.concatenate([
        got.astype(jnp.int32), slot, pix, smp, k, zi, zi, zi,
    ])
    daux_ref[:] = jnp.concatenate(
        [d_u.x, d_u.y, d_u.z, zrow, zrow, zrow, zrow, zrow])


@functools.partial(jax.jit, static_argnames=(
    "npix", "width", "height", "seed", "jitter", "focal_z", "tile_m",
    "interpret"))
def spawn_primary(su, ints, cam, npix, width, height, seed, jitter,
                  focal_z, tile_m=256, interpret=False):
    """Run the spawn front -> (feats [16, M], meta [8, M], daux [8, M]).

    ``su`` [8, M] i32 (fresh/slot/pix/smp rows), ``ints`` [1, 8] i32
    (next_sample/total/sample_base), ``cam`` [1, 24] f32 (rot16 + eye3)."""
    m = su.shape[1]
    pad = (-m) % tile_m
    if pad:
        # pad lanes: fresh=0 -> got=0 -> inert (outputs sliced off)
        su = jnp.concatenate(
            [su, jnp.zeros((su.shape[0], pad), su.dtype)], axis=1)
    mp = m + pad
    triu = jnp.triu(jnp.ones((tile_m, tile_m), jnp.float32))
    kern = functools.partial(
        _kernel, npix=int(npix), width=int(width), height=int(height),
        seed=int(seed), jitter=jitter, focal_z=float(focal_z))
    lane = lambda r: pl.BlockSpec((r, tile_m), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    feats, meta, daux = pl.pallas_call(
        kern,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ints, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cam, whole
            lane(8),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # triu, whole
        ],
        out_specs=[lane(16), lane(8), lane(8)],
        out_shape=[
            jax.ShapeDtypeStruct((16, mp), jnp.float32),
            jax.ShapeDtypeStruct((8, mp), jnp.int32),
            jax.ShapeDtypeStruct((8, mp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, 1), jnp.int32)],
        interpret=interpret,
        compiler_params=_cparams(),
    )(ints, cam, su, triu)
    if pad:
        feats, meta, daux = feats[:, :m], meta[:, :m], daux[:, :m]
    return feats, meta, daux
