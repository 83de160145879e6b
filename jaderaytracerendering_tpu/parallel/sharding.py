"""Multi-chip rendering over a jax.sharding Mesh.

The reference has no multi-device capability (SURVEY §2.3): its
parallelism is one CUDA grid on one GPU. The TPU build's scaling axes are

- **film tiles (data parallel)**: pixel ids sharded over the mesh's
  'tile' axis; each chip renders its film shard with the replicated scene
  and no communication (the tile-accumulation analogue of DP);
- **spp (sample parallel)**: every chip renders the *same* pixels at a
  different sample offset and radiance sums are psum-reduced over ICI —
  the renderer's analogue of sequence/batch-split axes.

Both compose in one 2D mesh ('tile', 'spp'). Scene buffers are
replicated; the film is sharded on 'tile'. DCN-spanning multi-slice would
layer jax.distributed.initialize on top of the same code path.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import camera as camera_mod
from ..core.film import Film
from ..integrator import render as render_mod, wavefront
from ..utils.config import RenderConfig


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("tile", "spp")) -> Mesh:
    """Build a device mesh. Default: all devices on the 'tile' axis."""
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    shape = tuple(shape)
    if len(shape) < len(axis_names):
        shape = shape + (1,) * (len(axis_names) - len(shape))
    return Mesh(devices[: int(np.prod(shape))].reshape(shape), axis_names)


@functools.partial(
    jax.jit, static_argnames=("cfg", "sppb", "mesh"), donate_argnums=()
)
def render_batch_sharded(sd, eye, cam_rot, pixel_ids, sample_base,
                         cfg: RenderConfig, sppb: int, mesh: Mesh):
    """Sharded render step: pixel_ids split over 'tile', samples over 'spp'.

    Returns radiance sums [P, 3] sharded on 'tile' (each chip holds its
    film shard; the 'spp' axis is psum-reduced over ICI).

    pixel_ids length must be divisible by mesh.shape['tile'].
    """
    n_spp_shards = mesh.shape["spp"]

    def shard_fn(sd_, eye_, rot_, ids_, base_):
        spp_rank = jax.lax.axis_index("spp")
        local_base = base_ + spp_rank.astype(jnp.uint32) * jnp.uint32(sppb)
        p = ids_.shape[0]
        pid = jnp.tile(ids_, sppb)
        sid = (jnp.repeat(jnp.arange(sppb, dtype=jnp.uint32), p) + local_base)
        o, d = camera_mod.generate_rays(
            jnp, eye_, rot_, cfg.width, cfg.height, pid, sid, cfg.seed,
            cfg.jitter,
        )
        nearest = render_mod.make_nearest(sd_, cfg, jnp)
        rad = wavefront.trace_radiance(o, d, pid, sid, sd_, cfg, jnp, nearest)
        out = rad.reshape(sppb, p, 3).sum(axis=0)
        return jax.lax.psum(out, "spp")  # ICI reduction over the spp axis

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("tile"), P()),
        out_specs=P("tile"),
        check_vma=False,
    )
    out = fn(sd, eye, cam_rot, pixel_ids, jnp.asarray(sample_base, jnp.uint32))
    del n_spp_shards
    return out


@functools.partial(jax.jit, static_argnames=("mesh",))
def gather_film(tile_shards, mesh: Mesh):
    """Assemble the full film from tile shards with an explicit
    all_gather over ICI (the pass2-style tile accumulation step when a
    replicated copy is needed, e.g. before host-side post or saving)."""

    def fn(local):
        return jax.lax.all_gather(local, "tile", axis=0, tiled=True)

    return jax.shard_map(
        fn, mesh=mesh, in_specs=P("tile"), out_specs=P(), check_vma=False
    )(tile_shards)


@functools.partial(jax.jit, static_argnames=("cfg", "pool_m", "mesh"))
def _pool_render_sharded(sd, eye, cam_rot, pixel_ids, sample_base,
                         cfg: RenderConfig, pool_m: int, mesh: Mesh):
    """Pool engine over the mesh: each 'tile' shard pools its own pixel
    subset with a private sample queue; the 'spp' axis renders disjoint
    sample-id ranges of the same pixels and psum-reduces."""
    from ..integrator import pool as pool_mod

    n_spp = mesh.shape["spp"]
    spp_local = cfg.spp // n_spp

    def shard_fn(sd_, eye_, rot_, ids_):
        spp_rank = jax.lax.axis_index("spp")
        base = (jnp.asarray(sample_base, jnp.uint32)
                + spp_rank.astype(jnp.uint32) * jnp.uint32(spp_local))
        total = ids_.shape[0] * spp_local
        accum, done, _, _ = pool_mod._pool_render_impl(
            sd_, eye_, rot_, total, cfg.replace(spp=spp_local),
            min(pool_m, total), base, pixel_ids=ids_,
        )
        return jax.lax.psum(accum, "spp")

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P("tile")),
        out_specs=P("tile"),
        check_vma=False,
    )(sd, eye, cam_rot, pixel_ids)


def render_film_distributed(sd, cam, cfg: RenderConfig, mesh: Mesh,
                            film: Optional[Film] = None) -> Film:
    """Full-film distributed render: film tiles over 'tile', spp over 'spp'.

    cfg.engine='pool' runs the respawn-compacted pool per shard (cfg.spp
    must divide by the spp axis); 'scan' accumulates in passes of
    mesh.shape['spp'] * sppb samples."""
    npix = cfg.width * cfg.height
    n_tile_ = mesh.shape["tile"]
    if cfg.engine == "mega" and cfg.integrator == "full":
        from ..integrator import mega as mega_mod

        if mega_mod.eligible(sd, cfg):
            return render_film_mega_distributed(sd, cam, cfg, mesh,
                                                film=film)
        cfg = cfg.replace(engine="pool")
    if cfg.engine == "pool" and cfg.integrator == "full":
        assert cfg.spp % mesh.shape["spp"] == 0, "spp must divide spp axis"
        if film is None:
            film = Film.create(cfg.height, cfg.width)
        pad = (-npix) % n_tile_
        pixel_ids = jnp.asarray(
            np.concatenate([np.arange(npix), np.zeros(pad)]).astype(np.uint32)
        )
        pool_m = int(min(cfg.rays_per_launch, npix * cfg.spp))
        accum = _pool_render_sharded(
            sd, jnp.asarray(cam.eye, jnp.float32),
            jnp.asarray(cam.camera_rotate, jnp.float32),
            pixel_ids, film.count, cfg, pool_m, mesh,
        )
        return Film(
            accum=film.accum + accum[:npix].reshape(cfg.height, cfg.width, 3),
            count=film.count + jnp.int32(cfg.spp),
        )
    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    if film is None:
        film = Film.create(cfg.height, cfg.width)

    pad = (-npix) % n_tile
    pixel_ids = jnp.asarray(
        np.concatenate([np.arange(npix), np.zeros(pad)]).astype(np.uint32)
    )
    eye = jnp.asarray(cam.eye, jnp.float32)
    rot = jnp.asarray(cam.camera_rotate, jnp.float32)

    assert cfg.spp % n_spp == 0, "spp must divide the mesh spp axis"
    sppb = max(1, min(cfg.spp_batch, cfg.spp // n_spp))
    accum = film.accum.reshape(-1, 3)
    done = 0
    while done < cfg.spp:
        # clamp the last pass so exactly cfg.spp samples are rendered
        # (remaining stays a multiple of n_spp by induction)
        step = min(sppb, (cfg.spp - done) // n_spp)
        out = render_batch_sharded(
            sd, eye, rot, pixel_ids, film.count + done, cfg, step, mesh
        )
        accum = accum + out[:npix]
        done += step * n_spp
    return Film(accum=accum.reshape(cfg.height, cfg.width, 3),
                count=film.count + done)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "shard_px",
                                             "interpret", "mopts"))
def _mega_render_sharded(tabs, cam24, sample_base, sd, mtriu,
                         cfg: RenderConfig,
                         mesh: Mesh, shard_px: int, interpret: bool,
                         mopts=()):
    """Megakernel over the mesh: each 'tile' shard runs the whole-render
    kernel on its contiguous TM-aligned pixel window (the kernel's
    dynamic pixel-offset input), 'spp' shards render disjoint sample-id
    ranges of the same window and psum-reduce over ICI — the shard_map
    x pallas composition the pod actually executes."""
    from ..ops.pallas import mega as megak

    tri8, mat16, envp, buk, win, ota, ltab, lights2 = tabs
    n_spp = mesh.shape["spp"]
    spp_local = cfg.spp // n_spp
    npix = cfg.width * cfg.height

    def shard_fn(tri8_, mat16_, envp_, buk_, win_, ota_, ltab_, lights2_,
                 cam24_, base_, sd_, mtriu_):
        t = jax.lax.axis_index("tile")
        s_ = jax.lax.axis_index("spp")
        ints = (jnp.zeros((8,), jnp.int32)
                .at[2].set(base_ + s_ * spp_local)
                .at[3].set(t * shard_px)).reshape(1, 8)
        out = megak.render_mega(
            sd_.n_clusters, ints, cam24_, ltab_, lights2_,
            sd_.cluster_planes, sd_.cluster_begin_col, mtriu_,
            sd_.cluster_coef, tri8_, mat16_, envp_, buk_, win_, ota_,
            sd_.cluster_chunk_planes,
            cfg=cfg.replace(spp=1), npix=npix, e_cnt=sd_.n_emit,
            has_sss=sd_.has_sss,
            env_shape=(int(sd_.env_map.shape[0]), int(sd_.env_map.shape[1])),
            nb=int(sd_.sss_nb), cdf_window=16, spp=spp_local,
            has_refract=sd_.has_refract, shard_px=shard_px,
            gather=cfg.mega_gather, interpret=interpret,
            **dict(mopts))
        return jax.lax.psum(out, "spp")

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(),) * 12,
        out_specs=P(None, "tile"),
        check_vma=False,
    )(tri8, mat16, envp, buk, win, ota, ltab, lights2, cam24,
      jnp.asarray(sample_base, jnp.int32), sd, mtriu)


def render_film_mega_distributed(sd, cam, cfg: RenderConfig, mesh: Mesh,
                                 film: Optional[Film] = None) -> Film:
    """Distributed megakernel film render (engine='mega' mesh path)."""
    from ..integrator import mega as mega_mod
    from ..ops.pallas import mega as megak

    assert cfg.spp % mesh.shape["spp"] == 0, "spp must divide spp axis"
    npix = cfg.width * cfg.height
    n_tile = mesh.shape["tile"]
    tmq = int(getattr(cfg, "mega_tile", megak.TM) or megak.TM)
    shard_px = -(-npix // (n_tile * tmq)) * tmq
    if film is None:
        film = Film.create(cfg.height, cfg.width)
    tabs = mega_mod._tables(sd, jnp)
    cam24 = jnp.concatenate([
        jnp.asarray(cam.camera_rotate, jnp.float32).reshape(-1),
        jnp.asarray(cam.eye, jnp.float32),
        jnp.zeros((5,), jnp.float32)]).reshape(1, 24)
    interpret = jax.default_backend() == "cpu"
    mopts = mega_mod.kernel_opts(sd, cfg)
    mtriu = mopts.pop("triu")
    out = _mega_render_sharded(tabs, cam24, film.count, sd, mtriu, cfg,
                               mesh, shard_px, interpret,
                               mopts=tuple(sorted(mopts.items())))
    rad = jnp.transpose(out[0:3, :npix], (1, 0)).reshape(
        cfg.height, cfg.width, 3)
    return Film(accum=film.accum + rad,
                count=film.count + jnp.int32(cfg.spp))
