"""Megakernel engine: radiance parity with the scan/pool engines.

The single-launch whole-render kernel (ops/pallas/mega.py, the TPU
analogue of PathTrace.cu:1725's render_pixel launch) must reproduce the
scan engine's film — same RNG streams, same branch semantics, same
per-pixel sample set — on every eligible scene class. Interpret-mode
kernels on the CPU backend."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from jaderaytracerendering_tpu.integrator import mega, render as R
from jaderaytracerendering_tpu.models import demo
from jaderaytracerendering_tpu.scene import material
from jaderaytracerendering_tpu.scene.scene import assemble
from jaderaytracerendering_tpu.utils.config import RenderConfig


def _cfg(**kw):
    # mega_gather='take': the fast interpret-mode gather — the
    # production 'loop'/'block' modes are pinned equal by
    # test_mega_gather_modes_agree, so the semantic tests don't need to
    # pay the interpreted 128-step gather loops (5-10x slower on CPU)
    base = dict(width=8, height=8, spp=4, spp_batch=4, max_depth=4,
                traversal="sweep", rays_per_launch=64, mega_gather="take")
    base.update(kw)
    return RenderConfig(**base)


def _films(ds, cfg, **mega_kw):
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    a = np.asarray(
        R.render_film(sd, ds.camera, cfg.replace(engine="scan")).mean())
    assert mega.eligible(sd, cfg)
    b = np.asarray(
        mega.render_film_mega(sd, ds.camera, cfg, **mega_kw).mean())
    return sd, a, b


@pytest.mark.parametrize("rounds", [1, 2])
@pytest.mark.slow
def test_mega_jade_sss_matches_scan(rounds):
    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    ds.camera.r = 2.0
    sd, a, b = _films(ds, _cfg(max_depth=6, spawn_rounds=rounds))
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(b, a, atol=1e-6 * scale, rtol=1e-5)


def test_mega_cornell_matches_scan():
    ds = demo.cornell_scene()
    _, a, b = _films(ds, _cfg())
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(b, a, atol=1e-6 * scale, rtol=1e-5)


@pytest.mark.parametrize("mode", ["take", "block"])
@pytest.mark.slow
def test_mega_gather_modes_agree(mode):
    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(spp=2)
    a = np.asarray(mega.render_film_mega(
        sd, ds.camera, cfg.replace(mega_gather=mode)).mean())
    b = np.asarray(mega.render_film_mega(
        sd, ds.camera, cfg.replace(mega_gather="loop")).mean())
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_mega_film_resume():
    ds = demo.tiny_scene()
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(spp=2)
    f1 = mega.render_film_mega(sd, ds.camera, cfg)
    f2 = mega.render_film_mega(sd, ds.camera, cfg, film=f1)
    f4 = mega.render_film_mega(sd, ds.camera, cfg.replace(spp=4))
    assert int(f2.count) == 4
    np.testing.assert_allclose(np.asarray(f2.mean()), np.asarray(f4.mean()),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_mega_refract_scene_matches_scan():
    """Direct-refraction scenes run the IN-KERNEL march (a while_loop
    of nested sweeps) and must match the scan engine's XLA march."""
    ds = demo.jade_scene(n_buddha_tris=100, env_shape=(16, 32))
    ds.objects[0] = dataclasses.replace(
        ds.objects[0],
        material=dataclasses.replace(
            ds.objects[0].material, refract_mode=material.DIR_REFRACT,
            refract_index=1.5, refract_rate=(0.9, 0.9, 0.9)))
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(spp=2, max_depth=3, max_refract_bounces=8)
    assert sd.has_refract and mega.eligible(sd, cfg)
    a = np.asarray(
        R.render_film(sd, ds.camera, cfg.replace(engine="scan")).mean())
    b = np.asarray(mega.render_film_mega(sd, ds.camera, cfg).mean())
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(b, a, atol=1e-6 * scale, rtol=1e-5)


@pytest.mark.slow
def test_mega_via_render_film_routing():
    ds = demo.diffuse_scene()
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(engine="mega", spp=2)
    f = R.render_film(sd, ds.camera, cfg)
    assert int(f.count) == 2
    assert np.isfinite(np.asarray(f.accum)).all()


@pytest.mark.slow
def test_mega_preview_matches_xla_preview():
    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    ds.camera.r = 2.0
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(spp=2, integrator="preview", jitter="gl",
               rays_per_launch=128)
    a, da = R.render_film_preview(sd, ds.camera, cfg, display=True)
    b, db = R.render_film_preview(sd, ds.camera,
                                  cfg.replace(engine="mega"), display=True)
    scale = max(np.abs(np.asarray(a.mean())).max(), 1.0)
    np.testing.assert_allclose(np.asarray(b.mean()), np.asarray(a.mean()),
                               atol=1e-6 * scale, rtol=1e-5)
    assert np.abs(np.asarray(da).astype(int)
                  - np.asarray(db).astype(int)).max() <= 1


@pytest.mark.slow
def test_mega_no_lights_env_only():
    """e_cnt=0: no NEE segments, env-only illumination — the static
    light loops must vanish cleanly."""
    ds = demo.tiny_scene()
    objs = [o for o in ds.objects if max(o.material.emissive) < 1e-3]
    sd = assemble(objs, ds.env_map, xp=jnp)
    assert sd.n_emit == 0
    cfg = _cfg(spp=2, max_depth=3)
    a = np.asarray(
        R.render_film(sd, ds.camera, cfg.replace(engine="scan")).mean())
    b = np.asarray(mega.render_film_mega(sd, ds.camera, cfg).mean())
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(b, a, atol=1e-6 * scale, rtol=1e-5)


@pytest.mark.parametrize("tile", [128, 512])
@pytest.mark.slow
def test_mega_tile_width_bit_exact(tile):
    """cfg.mega_tile only changes the lane tiling (the sublane-packing
    perf lever, tools/subprobe.py / ops/pallas/common.py); the render
    must be BIT-identical across widths — every lane's RNG stream is
    keyed by pixel/sample, never by tile geometry."""
    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(spp=2)
    a = np.asarray(mega.render_film_mega(
        sd, ds.camera, cfg.replace(mega_tile=tile)).mean())
    b = np.asarray(mega.render_film_mega(
        sd, ds.camera, cfg.replace(mega_tile=256)).mean())
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("swt", [64, 128])
@pytest.mark.slow
def test_mega_sweep_tile_bit_exact(swt):
    """cfg.mega_sweep_tile splits each sweep call into SWT-wide
    sub-calls (own slab + compaction + visit loop each) so wide fabric
    tiles keep sub-tile candidate unions. A ray's hits depend only on
    its own slab row, so the render must be BIT-identical to the
    unsplit sweep."""
    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(spp=2)
    a = np.asarray(mega.render_film_mega(
        sd, ds.camera, cfg.replace(mega_sweep_tile=swt)).mean())
    b = np.asarray(mega.render_film_mega(sd, ds.camera, cfg).mean())
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_mega_stream_bit_exact_vs_resident():
    """mega_force_stream (HBM coefficients through the DMA double
    buffer + chunked compaction + DMA'd SSS pick tables) is a pure
    execution-strategy change: the streamed render must be BIT-identical
    to the resident one (same ascending-id visit order, same bf16x3
    math) on the SSS jade scene."""
    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    ds.camera.r = 2.0
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(max_depth=6)
    assert mega.mode(sd, cfg) == "resident"
    scfg = cfg.replace(mega_force_stream=True)
    assert mega.mode(sd, scfg) == "stream"
    a = np.asarray(mega.render_film_mega(sd, ds.camera, cfg).mean())
    b = np.asarray(mega.render_film_mega(sd, ds.camera, scfg).mean())
    np.testing.assert_array_equal(b, a)


@pytest.mark.slow
@pytest.mark.parametrize("rounds", [1, 2])
def test_mega_redistribute_matches_scan(rounds):
    """Intra-tile work redistribution renders the same (pixel, sample)
    set with the same site-keyed RNG streams — radiance matches the
    scan engine up to per-pixel fp ADD ORDER (samples retire in path-
    completion order, not sample order), hence allclose, not bitwise.
    Covers the SSS jade scene and spawn_rounds (multiple pulls per
    iteration compound with redistribution)."""
    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    ds.camera.r = 2.0
    sd, a, b = _films(ds, _cfg(max_depth=6, spawn_rounds=rounds,
                               mega_redistribute=True))
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(b, a, atol=1e-6 * scale, rtol=1e-5)


@pytest.mark.slow
def test_mega_redistribute_deterministic_and_resumable():
    """Two identical redistribution renders are bit-identical, and a
    resumed (film-count offset) render keeps sample ids disjoint: spp 4
    in one call equals 2+2 across two calls up to fp add order."""
    ds = demo.cornell_scene()
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(mega_redistribute=True)
    r1 = np.asarray(mega.render_film_mega(sd, ds.camera, cfg).mean())
    r2 = np.asarray(mega.render_film_mega(sd, ds.camera, cfg).mean())
    np.testing.assert_array_equal(r1, r2)
    half = cfg.replace(spp=2)
    f1 = mega.render_film_mega(sd, ds.camera, half)
    f2 = mega.render_film_mega(sd, ds.camera, half, film=f1)
    one = np.asarray(mega.render_film_mega(sd, ds.camera, cfg).accum)
    two = np.asarray(f2.accum)
    scale = max(np.abs(one).max(), 1.0)
    np.testing.assert_allclose(two, one, atol=1e-6 * scale, rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("kw", [
    {}, dict(spawn_rounds=2), dict(spp=8, spp_batch=2),
    dict(mega_force_stream=True)])
def test_mega_prologue_matches_scan(kw):
    """cfg.mega_prologue: the primary prologue traces all spp x TM
    primaries at full lane density, resolves sky densely, and compacts
    surface hits into a VMEM work list the main loop pulls pre-traced —
    radiance must match the scan engine up to per-pixel fp add order
    (same (pixel, sample)-keyed RNG streams, same env math). Covers the
    SSS jade scene, spawn_rounds compounding, multi-batch progressive
    spp, and the HBM-streaming mode."""
    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    ds.camera.r = 2.0
    sd, a, b = _films(ds, _cfg(max_depth=6, mega_redistribute=True,
                               mega_prologue=True, **kw))
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(b, a, atol=1e-6 * scale, rtol=1e-5)


@pytest.mark.slow
def test_mega_prologue_work_list_exact():
    """The prologue's one-hot MXU list append and the pull side's
    one-hot fetch must reconstruct (item, t, tri) exactly: pin the
    prologue film BIT-equal to the non-prologue redistribution film
    on a mirror-heavy scene (same RNG keys, same order of surface
    retires would NOT hold in general — so compare radiance sums
    per pixel at tight tolerance instead)."""
    ds = demo.cornell_scene()
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(mega_redistribute=True)
    a = np.asarray(mega.render_film_mega(
        sd, ds.camera, cfg).mean())
    b = np.asarray(mega.render_film_mega(
        sd, ds.camera, cfg.replace(mega_prologue=True)).mean())
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(b, a, atol=1e-6 * scale, rtol=1e-5)


@pytest.mark.slow
def test_mega_redistribute_deep_paths_not_dropped():
    """The while-loop iteration cap must dominate the work-pulling
    schedule's worst case (greedy makespan up to spp*(avg_depth+1) +
    max_depth + pull rounds), not just the lane==pixel schedule's
    spp*(depth+2)+4 — otherwise late-pulled deep paths are silently
    dropped while Film.count still advances, darkening the film.
    Workload: a CLOSED cornell box (front wall added, camera inside),
    rr_rate=1.0 — paths can only terminate at max_depth or on the
    light, so the measured schedule runs 33 iterations against the
    old cap of 40 (spp2 x depth16, 2 work items per lane). A film-
    parity check vs scan catches any dropped in-flight sample (the
    ceiling light's NEE makes every bounce contribute)."""
    ds = demo.cornell_scene()
    white = demo.material.Material(brdf=(0.72, 0.72, 0.72))
    ds.objects.append(demo._obj(
        "front", demo.procedural.quad(), white,
        dict(rotate=(0, 180, 0), translate=(0, 0, 1),
             scale=(2.0, 2.0, 1.0)), normalize=False))
    ds.camera.r = 0.8
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(width=16, height=16, spp=2, spp_batch=2, max_depth=16,
               rr_rate=1.0, mega_redistribute=True)
    a = np.asarray(
        R.render_film(sd, ds.camera, cfg.replace(engine="scan")).mean())
    b = np.asarray(mega.render_film_mega(sd, ds.camera, cfg).mean())
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(b, a, atol=1e-6 * scale, rtol=1e-5)


@pytest.mark.slow
def test_mega_chunked_resident_bit_exact():
    """mega_chunked='on' (chunked compaction — sub16 prefilter +
    dynamic active-chunk loop + fixed 128-triu — with VMEM-resident
    coefficients) is a pure execution-strategy change: bit-identical
    to the non-chunked resident render."""
    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    ds.camera.r = 2.0
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(max_depth=6)
    ccfg = cfg.replace(mega_chunked="on")
    assert mega.mode(sd, ccfg) == "resident"
    assert mega.kernel_opts(sd, ccfg)["chunked"]
    assert not mega.kernel_opts(sd, ccfg)["stream"]
    a = np.asarray(mega.render_film_mega(sd, ds.camera, cfg).mean())
    b = np.asarray(mega.render_film_mega(sd, ds.camera, ccfg).mean())
    np.testing.assert_array_equal(b, a)


@pytest.mark.slow
def test_mega_chunked_visit_counts_match_resident():
    """The chunked compaction must produce the SAME candidate sets as
    the non-chunked one — compare the in-kernel sweep telemetry (max
    tile union, total visits), not just the film: duplicated or missed
    candidates can stay film-invisible (min/max visit idempotency)
    while wrecking performance or faulting on hardware. Regression
    test for the sub-box-count compaction hole (slot 0 -> j=-1 OOB):
    the film stayed bit-exact but visits were duplicated."""
    from jaderaytracerendering_tpu.ops.pallas import mega as megak

    # >128 clusters so the chunked path covers 2+ chunks
    ds = demo.jade_scene(n_buddha_tris=20000, env_shape=(16, 32))
    ds.camera.r = 2.0
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(spp=2, max_depth=3)
    assert int(sd.cluster_planes.shape[1]) >= 256
    tri8, mat16, envp, buk, win, ota, ltab, lights2 = mega._tables(sd, jnp)
    cam24 = jnp.concatenate([
        jnp.asarray(ds.camera.camera_rotate, jnp.float32).reshape(-1),
        jnp.asarray(ds.camera.eye, jnp.float32),
        jnp.zeros((5,), jnp.float32)]).reshape(1, 24)
    ints = jnp.zeros((1, 8), jnp.int32)

    def run(ccfg):
        mopts = mega.kernel_opts(sd, ccfg)
        mtriu = mopts.pop("triu")
        out = megak.render_mega(
            sd.n_clusters, ints, cam24, ltab, lights2, sd.cluster_planes,
            sd.cluster_begin_col, mtriu, sd.cluster_coef, tri8, mat16,
            envp, buk, win, ota, sd.cluster_sub16_planes,
            cfg=ccfg.replace(spp=1), npix=64, e_cnt=sd.n_emit,
            has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=2, has_refract=sd.has_refract,
            gather="take", interpret=True, **mopts)
        o = np.asarray(out)
        tmq = int(ccfg.mega_tile)
        pt = o[5:8].reshape(3, -1, tmq)[:, :, 0]
        return o[0:3], pt[0].max(), pt[2].sum()  # film, max union, visits

    film_a, union_a, visits_a = run(cfg)
    film_b, union_b, visits_b = run(cfg.replace(mega_chunked="on"))
    np.testing.assert_array_equal(film_b, film_a)
    assert union_b == union_a, (union_b, union_a)
    assert visits_b == visits_a, (visits_b, visits_a)


@pytest.mark.slow
def test_mega_stream_refract_bit_exact():
    """The streamed in-kernel refraction march (nested sweeps under
    stream=True) matches the resident one bit-for-bit."""
    ds = demo.jade_scene(n_buddha_tris=200, env_shape=(16, 32))
    ds.objects[0] = dataclasses.replace(
        ds.objects[0],
        material=dataclasses.replace(
            ds.objects[0].material, refract_mode=material.DIR_REFRACT,
            refract_index=1.5, refract_rate=(0.9, 0.9, 0.9)))
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(spp=2, max_depth=3, max_refract_bounces=6)
    a = np.asarray(mega.render_film_mega(sd, ds.camera, cfg).mean())
    b = np.asarray(mega.render_film_mega(
        sd, ds.camera, cfg.replace(mega_force_stream=True)).mean())
    np.testing.assert_array_equal(b, a)


@pytest.mark.slow
@pytest.mark.parametrize("mode_kw", [
    {}, dict(mega_chunked="on"), dict(mega_force_stream=True),
    dict(mega_prologue=True)])
def test_mega_bounds_debug_no_violations(mode_kw):
    """_debug='bounds' counts compaction-invariant violations in-kernel
    (compacted cluster/chunk slots outside their tables, work-list
    pulls landing empty slots) on out row 7 — must be ZERO on every
    compaction variant, with the film unchanged. This is the
    structural guard for the r4 OOB crash class (holes in a compacted
    list crashed the TPU worker while interpret mode silently passed);
    megaprobe --debug bounds runs the same check on hardware."""
    from jaderaytracerendering_tpu.ops.pallas import mega as megak

    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    ds.camera.r = 2.0
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(max_depth=4, mega_redistribute=True, **mode_kw)
    tri8, mat16, envp, buk, win, ota, ltab, lights2 = mega._tables(sd, jnp)
    cam24 = jnp.concatenate([
        jnp.asarray(ds.camera.camera_rotate, jnp.float32).reshape(-1),
        jnp.asarray(ds.camera.eye, jnp.float32),
        jnp.zeros((5,), jnp.float32)]).reshape(1, 24)
    npix = cfg.width * cfg.height
    opts = mega.kernel_opts(sd, cfg)
    triu = opts.pop("triu")

    def run(dbg_):
        ints = jnp.zeros((1, 8), jnp.int32)
        out = megak.render_mega(
            sd.n_clusters, ints, cam24, ltab, lights2, sd.cluster_planes,
            sd.cluster_begin_col, triu, sd.cluster_coef,
            tri8, mat16, envp, buk, win, ota, sd.cluster_sub16_planes,
            cfg=cfg.replace(spp=1), npix=npix, e_cnt=sd.n_emit,
            has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=2, has_refract=sd.has_refract,
            gather=cfg.mega_gather, interpret=True, _debug=dbg_, **opts)
        return np.asarray(out)

    a, b = run("full"), run("bounds")
    np.testing.assert_array_equal(b[0:3], a[0:3])   # film unchanged
    assert b[7].sum() == 0, f"bounds violations: {b[7].sum()}"
    assert a[7].sum() > 0                           # real visits ran


@pytest.mark.slow
@pytest.mark.parametrize("dbg", ["2xrng", "2xfront", "2xresolve",
                                 "2xfilm", "2xspawncam", "2xsegfeats",
                                 "2xstatecat", "2xsssprep", "2xpull"])
def test_mega_replay_debug_bit_exact(dbg):
    """The r5 replay-attribution variants duplicate a pure component
    on perturbed-by-runtime-zero inputs, sinking the duplicate into
    scratch — the film must stay BIT-identical to _debug='full' (that
    equality is what makes wall(2x) - wall(full) honest attribution)."""
    from jaderaytracerendering_tpu.ops.pallas import mega as megak

    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    ds.camera.r = 2.0
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(max_depth=4)
    tri8, mat16, envp, buk, win, ota, ltab, lights2 = mega._tables(sd, jnp)
    cam24 = jnp.concatenate([
        jnp.asarray(ds.camera.camera_rotate, jnp.float32).reshape(-1),
        jnp.asarray(ds.camera.eye, jnp.float32),
        jnp.zeros((5,), jnp.float32)]).reshape(1, 24)
    npix = cfg.width * cfg.height
    opts = mega.kernel_opts(sd, cfg)
    triu = opts.pop("triu")

    def run(dbg_):
        ints = jnp.zeros((1, 8), jnp.int32)
        out = megak.render_mega(
            sd.n_clusters, ints, cam24, ltab, lights2, sd.cluster_planes,
            sd.cluster_begin_col, triu, sd.cluster_coef,
            tri8, mat16, envp, buk, win, ota, sd.cluster_sub16_planes,
            cfg=cfg.replace(spp=1), npix=npix, e_cnt=sd.n_emit,
            has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=2, has_refract=sd.has_refract,
            gather=cfg.mega_gather, interpret=True, _debug=dbg_, **opts)
        return np.asarray(out[0:3])

    np.testing.assert_array_equal(run(dbg), run("full"))


@pytest.mark.slow
def test_mega_replay_march_bit_exact():
    """2xmarch duplicates the whole in-kernel refraction march (nested
    sweeps included) on runtime-zero-perturbed inputs; film must stay
    bit-identical on a direct-refraction scene."""
    from jaderaytracerendering_tpu.ops.pallas import mega as megak

    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    ds.objects[0] = dataclasses.replace(
        ds.objects[0],
        material=dataclasses.replace(
            ds.objects[0].material, refract_mode=material.DIR_REFRACT,
            refract_index=1.5, refract_rate=(0.9, 0.9, 0.9)))
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(max_depth=3, max_refract_bounces=4)
    tri8, mat16, envp, buk, win, ota, ltab, lights2 = mega._tables(sd, jnp)
    cam24 = jnp.concatenate([
        jnp.asarray(ds.camera.camera_rotate, jnp.float32).reshape(-1),
        jnp.asarray(ds.camera.eye, jnp.float32),
        jnp.zeros((5,), jnp.float32)]).reshape(1, 24)
    npix = cfg.width * cfg.height
    opts = mega.kernel_opts(sd, cfg)
    triu = opts.pop("triu")

    def run(dbg_):
        ints = jnp.zeros((1, 8), jnp.int32)
        out = megak.render_mega(
            sd.n_clusters, ints, cam24, ltab, lights2, sd.cluster_planes,
            sd.cluster_begin_col, triu, sd.cluster_coef,
            tri8, mat16, envp, buk, win, ota, sd.cluster_sub16_planes,
            cfg=cfg.replace(spp=1), npix=npix, e_cnt=sd.n_emit,
            has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=2, has_refract=True,
            gather=cfg.mega_gather, interpret=True, _debug=dbg_, **opts)
        return np.asarray(out[0:3])

    np.testing.assert_array_equal(run("2xmarch"), run("full"))


@pytest.mark.slow
def test_mega_stream_lcap_overflow_dense_fallback():
    """l_cap overflow under stream: the dense all-cluster streamed
    sweep must produce the same film as the capped candidate path."""
    from jaderaytracerendering_tpu.ops.pallas import mega as megak

    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    sd = assemble(ds.objects, ds.env_map, xp=jnp)
    cfg = _cfg(spp=2, max_depth=3, mega_force_stream=True)
    tri8, mat16, envp, buk, win, ota, ltab, lights2 = mega._tables(sd, jnp)
    cam24 = jnp.concatenate([
        jnp.asarray(ds.camera.camera_rotate, jnp.float32).reshape(-1),
        jnp.asarray(ds.camera.eye, jnp.float32),
        jnp.zeros((5,), jnp.float32)]).reshape(1, 24)
    triu128 = jnp.triu(jnp.ones((128, 128), jnp.float32))
    npix = cfg.width * cfg.height

    def run(l_cap):
        ints = jnp.zeros((1, 8), jnp.int32)
        out = megak.render_mega(
            sd.n_clusters, ints, cam24, ltab, lights2, sd.cluster_planes,
            sd.cluster_begin_col, triu128, sd.cluster_coef,
            tri8, mat16, envp, buk, win, ota, sd.cluster_sub16_planes,
            cfg=cfg.replace(spp=1), npix=npix, e_cnt=sd.n_emit,
            has_sss=sd.has_sss,
            env_shape=(int(sd.env_map.shape[0]), int(sd.env_map.shape[1])),
            cdf_window=16, spp=2,
            has_refract=sd.has_refract, gather=cfg.mega_gather,
            l_cap=l_cap, chunked=True, stream=True, interpret=True)
        return np.asarray(out[0:3, :npix])

    np.testing.assert_array_equal(run(1), run(64))
