"""Render configuration.

Replaces the reference's compile-time ``#define`` wall (WIDTH/HEIGHT
PathTrace.cpp:26-27; RENDER_WIDTH/HEIGHT, TILE_SIZE, STACK_CAPACITY,
RR_RATE, SSS_RATE, MAX_FULL_REFLEX_TIME PathTrace.cu:24-47; GLSL
STACK_CAPACITY/RR_RATE fshader_render.fsh:32-33) plus its stdin spp prompt
with one dataclass, JSON-serializable for batch runs.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 1024                 # PathTrace.cpp:26
    height: int = 1024                # PathTrace.cpp:27
    spp: int = 16                     # runtime stdin in reference
    max_depth: int = 16               # bounce cap; GLSL 16 / CUDA 128
    rr_rate: float = 0.9              # PathTrace.cu:35 (GLSL uses 0.8)
    sss_rate: float = 0.5             # PathTrace.cu:47
    max_refract_bounces: int = 32     # MAX_FULL_REFLEX_TIME, PathTrace.cu:39
    internal_reflect_rate: float = 0.2  # PathTrace.cu:1215
    hdr_clamp: float = 10.0           # PathTrace.cu:700
    emissive_break_eps: float = 1.4e-5  # path-termination test, PathTrace.cu:917
    emissive_skip_eps: float = 1.5e-4   # continuation skip test, PathTrace.cu:1005
    seed: int = 0
    jitter: str = "cuda"              # 'cuda' | 'gl' film jitter convention
    tonemap: str = "aces"             # 'aces' (CUDA) | 'reinhard' (GL pass3)
    spp_batch: int = 4                # samples per wavefront launch
    rays_per_launch: int = 1 << 14    # wavefront lane cap (larger launches
    #                                   crash the axon remote compiler)
    traversal: str = "sweep"          # 'sweep' (pallas) | 'clusters' |
    #                                   'gemm' | 'bvh' | 'brute'
    integrator: str = "full"          # 'full' (NEE megakernel) | 'preview'
    preview_bounces: int = 2          # fshader_preview.fsh:397
    preview_bands: int = 1            # progressive preview: pixels split
    # into B flat bands, ONE band sampled per displayed frame (band
    # n % B at sample n // B) — display rate decouples from the
    # per-pixel sample rate (~B x the frame rate at 1024^2, bounded by
    # the ~33 fps axon roundtrip ceiling). 1 = reference parity (every
    # pixel every frame). Requires npix % (B * mega_tile) == 0 for the
    # mega engine; the CLI picks a valid B automatically.
    engine: str = "mega"              # 'mega' (whole-render single-
    # launch Pallas megakernel + work redistribution,
    # integrator/mega.py — r4 hardware A/B won every bench row;
    # ineligible scenes fall back to the pool) | 'pool' (respawn
    # compaction) | 'scan'
    mega_spp_batch: int = 64          # megakernel: max samples per
    # launch (a full-scale 1080p x 1024spp render as ONE dispatch would
    # hold the tunnel for minutes; batching bounds per-call wall time
    # while keeping the per-call fixed cost amortized over >=64 spp)
    mega_gather: str = "auto"         # megakernel in-kernel row-gather
    # mechanism, all bit-exact (demo bench Mrays/s in parens):
    # 'auto' (12.9: measured best per-site mix — masked one-hot-MXU for
    # coherent rows + env, count-compacted loop for the SSS pick chain)
    # | 'mxu' (10.7: per-128-row-block one-hot matmul at
    # Precision.HIGHEST everywhere; cost scales with the id spread) |
    # 'loop' (9.0: per-lane dynamic sublane loads, fixed 128 serial
    # rows) | 'take' (jnp.take; interpret-mode/testing only — Mosaic's
    # vector gather is shape-preserving take_along_axis within one
    # vreg, jax/_src/pallas/mosaic/lowering.py:2464-2524)
    mega_redistribute: bool = True    # megakernel intra-tile work
    # redistribution: lanes pull (pixel, sample) items from a per-tile
    # counter instead of owning one pixel, so lanes whose pixel finished
    # all spp keep working on tile-mates' samples (telemetry measured
    # 36% divergence-idle lane-iterations at 64x64 spp8). Film writes
    # become exact one-hot MXU scatters at retire; RNG streams are
    # (pixel, sample)-keyed so radiance matches the dense assignment up
    # to per-pixel fp add ORDER (allclose, not bit-equal, vs scan).
    # Default ON since r5 — hardware A/B (r4 batch, quiet chip) won
    # every row: default 18.25 vs 15.25, depth16 16.36 vs 12.79,
    # 100k 13.31 vs 10.46, 400k-stream 8.11 vs 6.17 Mrays/s.
    mega_prologue: bool = True        # megakernel PRIMARY PROLOGUE
    # (requires mega_redistribute): before the bounce loop, trace all
    # spp x TM primary rays at FULL lane density (lane == pixel, spp
    # sequential full-tile sweeps), resolve sky misses immediately as
    # DENSE lane adds into the film (no scatter), and compact the
    # surface hits (item id, hit t, hit tri) into a VMEM work list.
    # The main loop then pulls PRE-TRACED surface items — the spawn
    # round loses its sweep + env fetch entirely and every pull yields
    # real work, so the sky pull stall (51% of demo items are sky,
    # ~36% of lane-iterations stalled pending) vanishes. Default ON
    # since r5: same-session hardware A/B (quiet chip) measured the
    # default row 17.90 -> 21.04 Mrays/s (+17.5%) with lane
    # utilization 52.9% -> 85.1%.
    mega_chunked: str = "auto"        # megakernel candidate compaction:
    # 'auto' (chunked iff streaming) | 'on' (force the chunked
    # compaction — sub16 prefilter + dynamic active-chunk loop + fixed
    # 128-triu — even with VMEM-resident coefficients). At resident
    # 100k scale the non-chunked compaction pays a [TM, Cp~1152] slab
    # + a [Cp, Cp] triu dot per sweep; the chunked one pays a
    # [TM, NSp~128] sub16 slab + ~1 active [TM, 128] chunk slab.
    mega_stack_segments: bool = False  # megakernel: trace the bounce's
    # E+2 segments (light NEE + HDR visibility + continuation) in ONE
    # stacked sweep call instead of E+2 calls. MEASURED LOSS everywhere
    # (r4 hardware A/B: default 13.5 vs 14.5, 100k 9.4 vs 10.2, depth16
    # 10.9 vs 11.8, 400k wash): the union candidate list makes every
    # visit pay (E+2)x the lane work, which eats the prep savings.
    # Kept config-gated for scenes with many lights (prep scales with
    # E+2 calls; visit work doesn't).
    mega_tile: int = 512              # megakernel lanes per pixel tile
    # (TM). Mosaic packs a [1, N] f32 row into sublanes at 128-lane
    # granularity, so per-lane VPU throughput rises with TM: the
    # tools/subprobe.py FMA probe measured [1,128] 24, [1,512] 93,
    # [1,1024] 150 Gflop/s. Needs the raised Mosaic vmem_limit_bytes
    # (ops/pallas/mega.py) — scratch + transients scale with TM on top
    # of the resident scene tables and blow XLA's default 16 MiB scoped
    # budget. Pre-redistribution bench: 128 -> 13.1, 256 -> 14.6,
    # 512 -> 14.5, 1024 -> 11.5 Mrays/s (divergence in a tile rises
    # with TM). r5 prologue-era A/B (same session, quiet chip):
    # 256 -> 21.04, 512 -> 21.20, 512+swt256 -> 21.78,
    # 1024+swt256 -> 20.12 => default 512 with mega_sweep_tile 256.
    mega_sweep_tile: int = -1         # megakernel: sub-tile width for
    # each sweep CALL. -1 = AUTO (128 for resident scenes, 256 for the
    # chunked/stream path — r5 hardware A/B: swt128 22.56 vs swt256
    # 21.97 on the default row, but 9.30 vs 9.43 at 400k where the
    # extra chunk-loop invocations outweigh the tighter unions);
    # 0 = the full input width, i.e. no split. Wide
    # fabric tiles (mega_tile 512/1024) recover VPU sublane utilization
    # on the [1, TM] bounce-math rows but widen every sweep's candidate
    # UNION; a sub-tile split keeps each compaction + visit loop at
    # SWT-lane unions while the rest of the iteration runs at full
    # width. Bit-identical results (a ray's hits depend only on its own
    # slab row; AABB slab conservativeness covers every hittable
    # cluster).
    mega_force_stream: bool = False   # megakernel: force the HBM-
    # streaming coefficient path even when the scene fits VMEM
    # (test/A-B hook; production selection is integrator/mega.mode)
    spawn_rounds: int = 1             # pool: primary-spawn attempts per loop
    # iteration. >1 lets sky-miss samples retire at spawn time and pull
    # the next sample in the SAME iteration, breaking the total/pool_m
    # iteration floor on miss-heavy films (demo bench: 68 -> 53 iters at
    # rounds=2) — but each extra round duplicates the spawn chain
    # (~1.1 ms/iter: cumsum + camera + trace + env/rows), which measured
    # EXACTLY offsetting today (wall flat, docs/PERF.md round 3). Keep 1
    # until the spawn chain gets cheaper; the lever is real.
    spawn_kernel: bool = True         # pool: run each respawn round's
    # spawn chain (compaction cumsum + sample assignment + camera
    # RNG/rays + primary feature build) as ONE Pallas kernel
    # (ops/pallas/spawn_front). Needs a feats-level traversal route and
    # a whole-film pool call (the sharded film path keeps the XLA spawn).
    fused_tail: bool = True           # pool: run the post-trace bounce tail
    # (resolve + accumulate + state pack) as ONE Pallas kernel
    # (ops/pallas/bounce_resolve) instead of ~40 XLA fusions. Requires
    # n_emit <= 19 (per-light mask bit-pack); falls back automatically.
    front_kernel: bool = True         # pool: run the pre-trace bounce front
    # (branch select + sampling + segment-stacked feature build) as ONE
    # Pallas kernel (ops/pallas/bounce_front) feeding the stacked-segment
    # trace directly. Needs fused_tail + the fused-sweep traversal route;
    # falls back to the XLA front automatically otherwise.
    bvh_leaf_size: int = 8            # PathTrace.cpp:1086 / PathTrace.cu:1565
    bvh_stack_size: int = 128         # reference capacity (PathTrace.cu:34);
    # make_nearest asserts it covers the built tree's depth + 1
    mesh_shape: Optional[Tuple[int, ...]] = None  # device mesh, None = single chip

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "RenderConfig":
        data = json.loads(text)
        if data.get("mesh_shape") is not None:
            data["mesh_shape"] = tuple(data["mesh_shape"])
        # tolerate fields from older configs (e.g. the removed
        # pallas_shading flag) so archived render_args survive upgrades
        known = {f.name for f in dataclasses.fields(RenderConfig)}
        return RenderConfig(**{k: v for k, v in data.items() if k in known})

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


# ---- reference-parity presets ----------------------------------------------

def cuda_parity(**kw) -> RenderConfig:
    """PathTrace.cu settings: RR 0.9, depth cap 128, CUDA jitter, ACES."""
    base = dict(rr_rate=0.9, max_depth=128, jitter="cuda", tonemap="aces",
                engine="pool")
    base.update(kw)
    return RenderConfig(**base)


def gl_render_parity(**kw) -> RenderConfig:
    """fshader_render.fsh settings: RR 0.8, depth 16, GL jitter, Reinhard
    pass3. (The GL encoding drops refract fields; pair with a diffuse
    scene for full parity — models.demo.diffuse_scene.)"""
    base = dict(rr_rate=0.8, max_depth=16, jitter="gl", tonemap="reinhard")
    base.update(kw)
    return RenderConfig(**base)


def gl_preview_parity(**kw) -> RenderConfig:
    """fshader_preview.fsh settings: 2-bounce no-NEE progressive preview."""
    base = dict(integrator="preview", preview_bounces=2, jitter="gl",
                tonemap="reinhard", spp=1, spp_batch=1)
    base.update(kw)
    return RenderConfig(**base)
