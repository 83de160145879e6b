"""Megakernel render engine: the whole film in ONE kernel launch.

Host-side wrapper for ops/pallas/mega.py (the TPU analogue of the
reference's single `render_pixel<<<grid, block>>>` launch,
PathTrace.cu:1725-1731): packs the scene's gather tables into the
128-lane-row layouts the kernel's in-kernel gathers need, launches one
pallas_call for the whole film x spp, and folds the dense per-pixel
radiance rows into a Film.

Eligibility (falls back to the pool engine via render.render_film):
  - VMEM-resident traversal class (cluster_triu built, i.e. the fused
    sweep's c_pad <= 2048 scenes) and total table footprint within the
    ~16 MB VMEM budget;
  - SSS scenes need the bucketed CDF tables (sd.sss_nb > 0 — assemble
    always builds them).
"""

from __future__ import annotations

import numpy as np

from ..core.film import Film
from ..utils.config import RenderConfig

# VMEM budget for the resident tables (bytes). ops/pallas/common.py
# raises the Mosaic scoped-VMEM limit to 100 MiB (v5e has 128 MiB
# physical), so scenes up to ~100k tris (coef 37.5 MB + tri/SSS tables
# ~20 MB) stay fully resident; the margin covers per-tile scratch
# (btw/bw [mega_tile, Kp], slab hits [mega_tile, Cp], gather rows).
MEGA_VMEM_BUDGET = 88 * 2 ** 20

_pack_cache: dict = {}


# VMEM budget for the STREAM mode's resident remainder (tri rows +
# env + planes; coefficients and the SSS pick tables stay in HBM and
# DMA per visit/consumer-lane) — sized so scratch and the double
# buffer still fit comfortably
MEGA_STREAM_VMEM_BUDGET = 40 * 2 ** 20


def _scratch_bytes(sd, cfg: RenderConfig, stream: bool) -> int:
    """Per-tile VMEM scratch + small resident tables the budget checks
    must count alongside the big gather tables: the [tmq, kp] btw/bw
    pair and the stream double buffer grow with mega_tile and the
    per-cluster triangle capacity, and an extreme scene could pass a
    tables-only check yet exceed the 100 MiB Mosaic limit at compile."""
    from ..ops.pallas import mega as megak

    tmq = int(getattr(cfg, "mega_tile", megak.TM) or megak.TM)
    kp = int(sd.cluster_coef.shape[2]) // 4
    cp = int(sd.cluster_planes.shape[1])
    l_cap = 128 if cp <= 512 else 256
    planes = (sd.cluster_planes.nbytes + sd.cluster_begin_col.nbytes
              + sd.cluster_sub16_planes.nbytes)
    sseg = ((sd.n_emit + 2)
            if getattr(cfg, "mega_stack_segments", True) else 1)
    scratch = (48 * tmq * 4 + 8 * tmq * 4          # fst/mst state
               + l_cap * 4 + 4                     # candidate ids + count
               + 2 * sseg * tmq * kp * 4           # btw/bw wide (stacked)
               + tmq * 8 * 4 + tmq * 128 * 4)      # gather ids + rows
    if getattr(cfg, "mega_prologue", False) and getattr(
            cfg, "mega_redistribute", False):
        # primary-prologue work list: 3 planes x [spp_batch, tmq] f32
        scratch += 3 * max(1, int(getattr(cfg, "mega_spp_batch", 64))
                           ) * tmq * 4
    if stream:
        scratch += 2 * 16 * 4 * kp * 4             # coef double buffer
    if stream or getattr(cfg, "mega_chunked", "auto") == "on":
        # per-chunk gate cells [NCs, 1] (render_mega's nc_pad)
        scratch += -(-max(cp // 128, 1) // 128) * 128 * 4
    return planes + scratch


def mode(sd, cfg: RenderConfig):
    """'resident' (whole scene in VMEM) | 'stream' (coefficients + SSS
    pick tables in HBM, chunked compaction) | None (pool fallback)."""
    if sd.n_clusters == 0:
        return None
    if sd.has_sss and not sd.sss_nb:
        return None
    total = (sd.cluster_coef.nbytes + sd.cluster_triu.nbytes
             + sd.tri_table.nbytes + sd.env_pack.nbytes
             + (sd.sss_bucket.nbytes + sd.sss_window.nbytes
                if sd.has_sss else 0)
             + _scratch_bytes(sd, cfg, stream=False))
    if (sd.cluster_triu.size and total <= MEGA_VMEM_BUDGET
            and not getattr(cfg, "mega_force_stream", False)):
        return "resident"
    if int(sd.cluster_planes.shape[1]) > 128 * 128:
        # the chunked compaction's chunk-id pass reuses the fixed
        # [128, 128] triu, capping stream mode at 128 chunks = 16384
        # clusters (ops/pallas/mega.py asserts ncs == 128); beyond
        # that the pool engine's HBM-streaming sweep handles the scene
        return None
    resident_part = (sd.tri_table.nbytes + sd.env_pack.nbytes
                     + _scratch_bytes(sd, cfg, stream=True))
    if resident_part <= MEGA_STREAM_VMEM_BUDGET:
        return "stream"
    return None


def eligible(sd, cfg: RenderConfig) -> bool:
    return mode(sd, cfg) is not None


def kernel_opts(sd, cfg: RenderConfig) -> dict:
    """The render_mega kwargs + triu operand for this scene's mode:
    {'stream', 'chunked', 'l_cap'} and 'triu' (the [Cp, Cp] table in
    resident mode; the fixed [128, 128] chunk triu when streaming)."""
    import jax.numpy as jnp

    m = mode(sd, cfg)
    assert m is not None, "scene exceeds the mega budgets"
    c_pad = int(sd.cluster_planes.shape[1])
    # candidate cap scales with cluster count; overflow falls back to a
    # dense all-cluster sweep. Measured tile unions (in-kernel stats,
    # r4/r5): demo max 95-136, 100k max 217, 400k max 273 at tile 512
    # (256 overflowed there — dense 4550-cluster fallbacks; 384
    # measured +2.7% and compiles, where 512 hits the remote-compiler
    # cliff)
    l_cap = 128 if c_pad <= 512 else (256 if c_pad <= 2048 else 384)
    chunk128 = jnp.triu(jnp.ones((128, 128), jnp.float32))
    if m == "resident":
        # resident coefficients can still opt into the chunked
        # compaction (sub16 prefilter + dynamic active-chunk loop):
        # past ~1k clusters the non-chunked [TM, Cp] slab + [Cp, Cp]
        # triu dot dominate the sweep's fixed work
        if getattr(cfg, "mega_chunked", "auto") == "on":
            return {"stream": False, "chunked": True, "l_cap": l_cap,
                    "triu": chunk128}
        return {"stream": False, "chunked": False, "l_cap": l_cap,
                "triu": sd.cluster_triu}
    return {"stream": True, "chunked": True, "l_cap": l_cap,
            "triu": chunk128}


def _pack128(a: np.ndarray) -> np.ndarray:
    """[R, w] -> [max(128, ceil(R/(128//w))), 128]: k=128//w consecutive
    rows per 128-lane row, so a VMEM-resident table wastes no lane
    padding and a row fetch is take(row // k) + a static k-way
    lane-block select. Padded to >= 128 packed rows so the kernel's
    'block' gather can always slice a full [128, 128] window."""
    r, w = a.shape
    k = 128 // w
    rp = max(-(-r // k) * k, 128 * k)
    if rp != r:
        a = np.concatenate([a, np.zeros((rp - r, w), a.dtype)])
    return np.ascontiguousarray(a.reshape(rp // k, 128))


def _tables(sd, xp):
    """Pack (and cache) the kernel's gather tables for this scene."""
    key = id(sd)
    hit = _pack_cache.get(key)
    if hit is not None and hit[0]() is sd:
        return hit[1]
    import weakref

    import jax.numpy as jnp

    tri8 = jnp.asarray(_pack128(np.asarray(sd.tri_table)))
    mat16 = jnp.asarray(np.asarray(sd.mat_table, np.float32))
    envp = jnp.asarray(_pack128(np.asarray(sd.env_pack)))
    if sd.has_sss:
        # bucket ids are < 2^24 (assemble asserts) so f32 is exact;
        # f32 packing lets the stream mode's row DMA land directly in
        # the f32 gather scratch (DMA copies raw bytes — dtypes match)
        buk = jnp.asarray(_pack128(np.asarray(sd.sss_bucket, np.float32)))
        win = jnp.asarray(_pack128(np.asarray(sd.sss_window)))
    else:
        buk = jnp.zeros((1, 128), jnp.float32)
        win = jnp.zeros((1, 128), jnp.float32)
    # per-object row: (total_area, cdf bucket count, flat bucket base, 0)
    # — nb/base are < 2^24 (assemble asserts) so f32 carries them exactly
    ota = jnp.asarray(np.stack([
        np.asarray(sd.obj_total_area, np.float32),
        np.asarray(sd.sss_bnb, np.float32),
        np.asarray(sd.sss_bbase, np.float32),
        np.zeros((sd.n_objects,), np.float32)], axis=1), jnp.float32)

    e_cnt = sd.n_emit
    zc = jnp.zeros((max(e_cnt, 1), 7), jnp.float32)
    ltab = (jnp.concatenate(
        [sd.light_p1, sd.light_p2, sd.light_p3, zc], axis=1)
        if e_cnt else jnp.zeros((1, 16), jnp.float32))
    pad_l = (-ltab.shape[0]) % 8
    if pad_l:
        ltab = jnp.concatenate([ltab, jnp.zeros((pad_l, 16), jnp.float32)])
    lights2 = (jnp.concatenate(
        [sd.light_norm, sd.light_emis, sd.light_area[:, None],
         sd.emit_idx[:, None].astype(jnp.float32)], axis=1)
        if e_cnt else jnp.zeros((1, 8), jnp.float32))

    out = (tri8, mat16, envp, buk, win, ota, ltab, lights2)
    _pack_cache[key] = (weakref.ref(sd), out)
    if len(_pack_cache) > 8:
        for k in [k for k, v in _pack_cache.items() if v[0]() is None]:
            del _pack_cache[k]
    return out


def render_film_mega(sd, cam, cfg: RenderConfig, film=None,
                     interpret=None) -> Film:
    """Whole-film megakernel render -> Film (pool/scan-parity radiance)."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas import mega as megak

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    npix = cfg.width * cfg.height
    if film is None:
        film = Film.create(cfg.height, cfg.width)
    tri8, mat16, envp, buk, win, ota, ltab, lights2 = _tables(sd, jnp)
    cam24 = jnp.concatenate([
        jnp.asarray(cam.camera_rotate, jnp.float32).reshape(-1),
        jnp.asarray(cam.eye, jnp.float32),
        jnp.zeros((5,), jnp.float32)]).reshape(1, 24)
    kcfg = cfg.replace(spp=1)  # kernel statics: spp passed separately
    opts = kernel_opts(sd, cfg)
    triu = opts.pop("triu")
    accum = film.accum
    done = 0
    while done < cfg.spp:
        step = min(max(1, cfg.mega_spp_batch), cfg.spp - done)
        ints = jnp.zeros((8,), jnp.int32).at[2].set(
            jnp.asarray(film.count, jnp.int32) + done).reshape(1, 8)
        out = megak.render_mega(
            sd.n_clusters, ints, cam24, ltab, lights2, sd.cluster_planes,
            sd.cluster_begin_col, triu, sd.cluster_coef,
            tri8, mat16, envp, buk, win, ota, sd.cluster_sub16_planes,
            cfg=kcfg, npix=npix, e_cnt=sd.n_emit, has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=step,
            has_refract=sd.has_refract, gather=cfg.mega_gather,
            interpret=interpret, **opts)
        accum = accum + jnp.transpose(out[0:3, :npix], (1, 0)).reshape(
            cfg.height, cfg.width, 3)
        done += step
    return Film(accum=accum, count=film.count + jnp.int32(cfg.spp))


def render_film_preview_mega_banded(sd, cam, cfg: RenderConfig, film,
                                    frame_idx: int, interpret=None):
    """One BANDED progressive preview frame (cfg.preview_bands = B > 1):
    band ``frame_idx % B`` receives cfg.spp new samples at sample base
    ``(frame_idx // B) * cfg.spp``; the returned u8 display frame maps
    every pixel through its own sample count (derived from the frame
    counter), so the display rate is ~B x the full-frame kernel rate
    while per-pixel sampling stays unbiased and identical to B=1.

    Returns (film, disp). film.count is the MAX per-pixel sample count
    (bands not yet visited this rotation trail by cfg.spp)."""
    import jax
    import jax.numpy as jnp

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    npix = cfg.width * cfg.height
    if film is None:
        film = Film.create(cfg.height, cfg.width)
    tri8, mat16, envp, _, _, _, _, _ = _tables(sd, jnp)
    cam24 = jnp.concatenate([
        jnp.asarray(cam.camera_rotate, jnp.float32).reshape(-1),
        jnp.asarray(cam.eye, jnp.float32),
        jnp.zeros((5,), jnp.float32)]).reshape(1, 24)
    accum, disp = _preview_band_step(
        film.accum, jnp.int32(frame_idx), cam24, sd, tri8, mat16, envp,
        cfg=cfg, interpret=interpret)
    count = (int(frame_idx) // cfg.preview_bands + 1) * cfg.spp
    return Film(accum=accum, count=jnp.int32(count)), disp


def _band_px(cfg: RenderConfig) -> int:
    from ..ops.pallas import mega as megak

    npix = cfg.width * cfg.height
    tmq = int(getattr(cfg, "mega_tile", megak.TM) or megak.TM)
    b = npix // cfg.preview_bands
    assert b * cfg.preview_bands == npix and b % tmq == 0, (
        "preview_bands must split npix into mega_tile-aligned bands")
    return b


def _preview_band_step(accum, frame, cam24, sd, tri8, mat16, envp, *,
                       cfg: RenderConfig, interpret: bool):
    return _preview_band_step_jit(accum, frame, cam24, sd, tri8, mat16,
                                  envp, cfg_=cfg, interpret_=interpret)


def _preview_band_step_impl(accum_, frame_, cam24_, sd_, tri8_, mat16_,
                            envp_, cfg_, interpret_):
    import jax
    import jax.numpy as jnp

    from ..ops.pallas import mega as megak
    from ..post import tonemap

    bpx = _band_px(cfg_)
    npix = cfg_.width * cfg_.height
    bands = cfg_.preview_bands
    band = frame_ % bands
    base = (frame_ // bands) * cfg_.spp
    ints = (jnp.zeros((8,), jnp.int32)
            .at[2].set(base).at[3].set(band * bpx)).reshape(1, 8)
    out = megak.render_preview_mega(
        sd_.n_clusters, ints, cam24_, sd_.cluster_planes,
        sd_.cluster_begin_col, sd_.cluster_triu, sd_.cluster_coef,
        tri8_, mat16_, envp_, cfg=cfg_.replace(spp=1), npix=npix,
        env_shape=(int(sd_.env_map.shape[0]),
                   int(sd_.env_map.shape[1])),
        spp=int(cfg_.spp), max_bounce=int(cfg_.preview_bounces),
        gather=cfg_.mega_gather, interpret=interpret_, shard_px=bpx)
    rad = jnp.transpose(out[0:3], (1, 0))             # [bpx, 3]
    flat = accum_.reshape(-1, 3)
    cur = jax.lax.dynamic_slice(flat, (band * bpx, 0), (bpx, 3))
    flat = jax.lax.dynamic_update_slice(flat, cur + rad, (band * bpx, 0))
    # per-pixel sample counts from the frame counter alone: bands
    # <= band have one more rotation than bands > band
    pband = jnp.arange(npix, dtype=jnp.int32) // bpx
    cnt = ((frame_ // bands + (pband <= band).astype(jnp.int32))
           * cfg_.spp).astype(jnp.float32)
    img = flat / jnp.maximum(cnt, 1.0)[:, None]
    img = img.reshape(cfg_.height, cfg_.width, 3)[::-1]
    return (flat.reshape(cfg_.height, cfg_.width, 3),
            tonemap.finalize(img, jnp, cfg_.tonemap))


def _make_band_step_jit():
    import functools

    import jax

    return functools.partial(
        jax.jit, static_argnames=("cfg_", "interpret_"),
        donate_argnums=(0,))(_preview_band_step_impl)


class _LazyJit:
    """Defer the jax import until first use (the package imports this
    module before tests select the CPU backend)."""

    _fn = None

    def __call__(self, *a, **kw):
        if _LazyJit._fn is None:
            _LazyJit._fn = _make_band_step_jit()
        return _LazyJit._fn(*a, **kw)


_preview_band_step_jit = _LazyJit()


def render_film_preview_mega(sd, cam, cfg: RenderConfig, film=None,
                             interpret=None) -> Film:
    """One-launch progressive preview frame (2-bounce integrator)."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas import mega as megak

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    npix = cfg.width * cfg.height
    if film is None:
        film = Film.create(cfg.height, cfg.width)
    tri8, mat16, envp, _, _, _, _, _ = _tables(sd, jnp)
    cam24 = jnp.concatenate([
        jnp.asarray(cam.camera_rotate, jnp.float32).reshape(-1),
        jnp.asarray(cam.eye, jnp.float32),
        jnp.zeros((5,), jnp.float32)]).reshape(1, 24)
    ints = jnp.zeros((8,), jnp.int32).at[2].set(
        jnp.asarray(film.count, jnp.int32)).reshape(1, 8)
    out = megak.render_preview_mega(
        sd.n_clusters, ints, cam24, sd.cluster_planes,
        sd.cluster_begin_col, sd.cluster_triu, sd.cluster_coef, tri8,
        mat16, envp, cfg=cfg.replace(spp=1), npix=npix,
        env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
        spp=int(cfg.spp), max_bounce=int(cfg.preview_bounces),
        gather=cfg.mega_gather, interpret=interpret)
    rad = jnp.transpose(out[0:3, :npix], (1, 0)).reshape(
        cfg.height, cfg.width, 3)
    return Film(accum=film.accum + rad,
                count=film.count + jnp.int32(cfg.spp))
