"""AOT TPU lowering gate for every Pallas kernel entry.

``jax.jit(...).trace(...).lower(lowering_platforms=('tpu',))`` runs the
pallas->Mosaic lowering WITHOUT TPU hardware, so Mosaic op-support
violations (unsupported primitives, scalar VMEM stores, illegal
gathers) surface in CI instead of on the first real-chip compile.
(It caught a real one: spawn_front's scalar accumulator stores.)
Backend-stage failures (VMEM overflow, layout legalization) still need
the chip — this pins the op-support class only.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from jaderaytracerendering_tpu.integrator import mega as mega_mod
from jaderaytracerendering_tpu.models import demo
from jaderaytracerendering_tpu.scene import material
from jaderaytracerendering_tpu.scene.scene import assemble
from jaderaytracerendering_tpu.utils.config import RenderConfig


def _iter_jaxprs(jaxpr):
    yield jaxpr
    for eqn in jaxpr.eqns:
        for v in eqn.params.values():
            for j in _sub_jaxprs(v):
                yield from _iter_jaxprs(j)


def _sub_jaxprs(v):
    from jax._src import core as jcore

    if isinstance(v, jcore.ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, jcore.Jaxpr):
        yield v
    elif isinstance(v, (tuple, list)):
        for x in v:
            yield from _sub_jaxprs(x)


def _assert_no_bool_transpose(traced):
    """Mosaic's BACKEND stage (hardware-only) rejects tpu.transpose on
    i1 vectors — the AOT lowering pass does NOT catch it (measured as
    an HTTP-500 on the chip, twice). Pin the class statically: no
    transpose primitive in any (nested) jaxpr may consume a bool."""
    import numpy as np

    for j in _iter_jaxprs(traced.jaxpr.jaxpr):
        for eqn in j.eqns:
            if eqn.primitive.name == "transpose":
                dt = eqn.invars[0].aval.dtype
                assert dt != np.bool_, (
                    f"bool transpose in kernel jaxpr: {eqn} — transpose "
                    "a wider dtype instead (i1 transposes fail Mosaic's "
                    "backend stage on hardware)")


def _lower(fn, *args):
    traced = jax.jit(fn).trace(*args)
    _assert_no_bool_transpose(traced)
    traced.lower(lowering_platforms=("tpu",))


@pytest.fixture(scope="module")
def jade():
    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    return ds, assemble(ds.objects, ds.env_map, xp=jnp)


def test_spawn_front_lowers_for_tpu():
    from jaderaytracerendering_tpu.ops.pallas import spawn_front

    su = jnp.zeros((8, 256), jnp.int32)
    ints = jnp.zeros((1, 8), jnp.int32)
    cam = jnp.zeros((1, 24), jnp.float32)
    _lower(lambda a, b, c: spawn_front.spawn_primary(
        a, b, c, 64, 8, 8, 0, "cuda", -1.5), su, ints, cam)


def _mega_args(sd):
    tri8, mat16, envp, buk, win, ota, ltab, lights2 = mega_mod._tables(
        sd, jnp)
    cam24 = jnp.zeros((1, 24), jnp.float32)
    ints = jnp.zeros((1, 8), jnp.int32)
    return (ints, cam24, ltab, lights2, sd.cluster_planes,
            sd.cluster_begin_col, sd.cluster_triu, sd.cluster_coef,
            tri8, mat16, envp, buk, win, ota, sd.cluster_sub16_planes)


@pytest.mark.parametrize("gather", ["loop", "block", "mxu", "auto"])
def test_mega_lowers_for_tpu(jade, gather):
    from jaderaytracerendering_tpu.ops.pallas import mega as megak

    ds, sd = jade
    cfg = RenderConfig(width=8, height=8).replace(spp=1)

    def f(*a):
        return megak.render_mega(
            sd.n_clusters, *a, cfg=cfg, npix=64, e_cnt=sd.n_emit,
            has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=4, has_refract=False,
            gather=gather, interpret=False)

    _lower(f, *_mega_args(sd))


def test_mega_prologue_lowers_for_tpu(jade):
    """cfg.mega_prologue (primary prologue + pre-traced work list):
    the one-hot MXU list append/fetch and the dynamic-sublane wl_ref
    rows must lower."""
    from jaderaytracerendering_tpu.ops.pallas import mega as megak

    ds, sd = jade
    cfg = RenderConfig(width=8, height=8, mega_redistribute=True,
                       mega_prologue=True).replace(spp=1)

    def f(*a):
        return megak.render_mega(
            sd.n_clusters, *a, cfg=cfg, npix=64, e_cnt=sd.n_emit,
            has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=4, has_refract=False,
            gather="auto", interpret=False)

    _lower(f, *_mega_args(sd))


@pytest.mark.parametrize("dbg", ["2xrng", "2xfront", "2xresolve",
                                 "2xfilm", "2xspawncam", "bounds",
                                 "2xsegfeats", "2xstatecat",
                                 "2xsssprep", "2xpull"])
def test_mega_replay_debug_lowers_for_tpu(jade, dbg):
    """The r5 idempotent-replay attribution variants (non-sweep tail
    decomposition) must lower — they duplicate pure components with
    opaque runtime-zero input perturbations and a scratch sink."""
    from jaderaytracerendering_tpu.ops.pallas import mega as megak

    ds, sd = jade
    cfg = RenderConfig(width=8, height=8).replace(spp=1)

    def f(*a):
        return megak.render_mega(
            sd.n_clusters, *a, cfg=cfg, npix=64, e_cnt=sd.n_emit,
            has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=4, has_refract=False,
            gather="auto", interpret=False, _debug=dbg)

    _lower(f, *_mega_args(sd))


def test_mega_wide_fabric_subtiled_sweep_lowers_for_tpu(jade):
    """The production wide-fabric shape (mega_tile=1024 with
    mega_sweep_tile=256 sub-tiled sweeps + redistribution + prologue):
    the 128-aligned static lane-dim slices of the [16, TM] feature rows
    and the per-sub-call compaction must lower."""
    from jaderaytracerendering_tpu.ops.pallas import mega as megak

    ds, sd = jade
    cfg = RenderConfig(width=8, height=8, mega_redistribute=True,
                      mega_prologue=True, mega_tile=1024,
                      mega_sweep_tile=256).replace(spp=1)

    def f(*a):
        return megak.render_mega(
            sd.n_clusters, *a, cfg=cfg, npix=64, e_cnt=sd.n_emit,
            has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=4, has_refract=False,
            gather="auto", interpret=False)

    _lower(f, *_mega_args(sd))


def test_mega_refract_lowers_for_tpu():
    from jaderaytracerendering_tpu.ops.pallas import mega as megak

    ds = demo.jade_scene(n_buddha_tris=100, env_shape=(16, 32))
    ds.objects[0] = dataclasses.replace(
        ds.objects[0],
        material=dataclasses.replace(
            ds.objects[0].material, refract_mode=material.DIR_REFRACT,
            refract_index=1.5, refract_rate=(0.9, 0.9, 0.9)))
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = RenderConfig(width=8, height=8, max_refract_bounces=8).replace(
        spp=1)

    def f(*a):
        return megak.render_mega(
            sd.n_clusters, *a, cfg=cfg, npix=64, e_cnt=sd.n_emit,
            has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=2,
            has_refract=True, gather="loop", interpret=False)

    _lower(f, *_mega_args(sd))

    def f2(*a):
        return megak.render_mega(
            sd.n_clusters, *a, cfg=cfg, npix=64, e_cnt=sd.n_emit,
            has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=2,
            has_refract=True, gather="loop", interpret=False,
            _debug="2xmarch")

    _lower(f2, *_mega_args(sd))


def test_preview_mega_lowers_for_tpu(jade):
    from jaderaytracerendering_tpu.ops.pallas import mega as megak

    ds, sd = jade
    tri8, mat16, envp, _, _, _, _, _ = mega_mod._tables(sd, jnp)
    cam24 = jnp.zeros((1, 24), jnp.float32)
    ints = jnp.zeros((1, 8), jnp.int32)
    cfg = RenderConfig(width=8, height=8).replace(spp=1)

    def f(*a):
        return megak.render_preview_mega(
            sd.n_clusters, *a, cfg=cfg, npix=64,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            spp=1, max_bounce=2, gather="loop", interpret=False)

    _lower(f, ints, cam24, sd.cluster_planes, sd.cluster_begin_col,
           sd.cluster_triu, sd.cluster_coef, tri8, mat16, envp)


@pytest.mark.parametrize("dbg", ["full", "2xprefilter"])
def test_mega_chunked_resident_lowers_for_tpu(jade, dbg):
    """Chunked compaction (dynamic active-chunk fori_loop over the
    compacted cstat list + [NC, 8, 128] planes restack) with resident
    coefficients must pass the full pallas->Mosaic lowering — and the
    '2xprefilter' replay (sub16 slab + chunk gate duplicated) with it."""
    from jaderaytracerendering_tpu.ops.pallas import mega as megak

    ds, sd = jade
    cfg = RenderConfig(width=8, height=8,
                       mega_chunked="on").replace(spp=1)
    mopts = mega_mod.kernel_opts(sd, cfg)
    mtriu = mopts.pop("triu")
    assert mopts["chunked"] and not mopts["stream"]

    def f(*a):
        return megak.render_mega(
            sd.n_clusters, *a, cfg=cfg, npix=64, e_cnt=sd.n_emit,
            has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=4, has_refract=False,
            gather="auto", interpret=False, _debug=dbg, **mopts)

    args = list(_mega_args(sd))
    args[6] = mtriu
    _lower(f, *args)


def test_mega_redistribute_lowers_for_tpu(jade):
    """Intra-tile work redistribution (per-tile work counter, rank
    prefix dot, [TM, TM] one-hot film scatter at HIGHEST, i32 rem/div
    on pulled work ids) must pass the full pallas->Mosaic lowering."""
    from jaderaytracerendering_tpu.ops.pallas import mega as megak

    ds, sd = jade
    cfg = RenderConfig(width=8, height=8,
                       mega_redistribute=True).replace(spp=1)
    mopts = mega_mod.kernel_opts(sd, cfg)
    mopts.pop("triu")

    def f(*a):
        return megak.render_mega(
            sd.n_clusters, *a, cfg=cfg, npix=64, e_cnt=sd.n_emit,
            has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=4, has_refract=False,
            gather="auto", interpret=False, **mopts)

    _lower(f, *_mega_args(sd))


def test_mega_stream_lowers_for_tpu(jade):
    """The HBM-streaming megakernel variant (chunked compaction +
    coef DMA double-buffer + SSS pick-table row DMA) must pass the
    full pallas->Mosaic lowering."""
    from jaderaytracerendering_tpu.ops.pallas import mega as megak

    ds, sd = jade
    cfg = RenderConfig(width=8, height=8,
                       mega_force_stream=True).replace(spp=1)
    mopts = mega_mod.kernel_opts(sd, cfg)
    mtriu = mopts.pop("triu")
    assert mopts["stream"] and mopts["chunked"]

    def f(*a):
        return megak.render_mega(
            sd.n_clusters, *a, cfg=cfg, npix=64, e_cnt=sd.n_emit,
            has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=4, has_refract=False,
            gather="auto", interpret=False, **mopts)

    args = list(_mega_args(sd))
    args[6] = mtriu
    _lower(f, *args)
