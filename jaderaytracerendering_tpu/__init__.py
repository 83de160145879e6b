"""jaderaytracerendering_tpu — a TPU-native path-tracing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
MaxMorning/JadeRayTraceRendering (reference: /root/reference/PathTrace.cpp,
PathTrace.cu, shaders/*): a progressive-preview + batch path tracer with a
SAH BVH, NEE against area lights and an HDR environment, and the "jade"
material stack (diffuse / mirror / subsurface random-walk BSSRDF / direct
refraction with Beer-Lambert absorption).

Architecture (TPU-first, not a port):

- ``core``       vector math conventions, counter-based RNG (replaces the
                 reference's wang_hash / 31 aliased cuRAND states), orbit
                 camera, film (progressive accumulation buffers).
- ``scene``      OBJ loader, materials, transforms, Radiance .hdr loader,
                 equirect environment sampling, scene assembly into SoA
                 device buffers, render_args.txt / JSON serialization.
- ``accel``      SAH BVH builder (NumPy + native C++), SoA flattening,
                 per-object area CDF tables for BSSRDF exit sampling.
- ``ops``        batched ray-triangle / ray-AABB kernels, brute-force and
                 BVH nearest-hit over ray wavefronts (jnp + Pallas).
- ``integrator`` wavefront path integrator: lax.scan over bounces with
                 masked material lanes instead of the CUDA megakernel's
                 divergent branches.
- ``cpuref``     NumPy oracle implementing the same math + RNG streams.
- ``post``       accumulation, ACES/Reinhard tonemaps, gamma, BMP/PNG IO.
- ``parallel``   jax.sharding mesh: film-tile data parallelism and
                 spp-axis sharding with psum accumulation over ICI.
- ``models``     demo scenes (jade Buddha stand-in) and procedural meshes.
- ``cli``        preview (progressive) and render (batch) entry points.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: mega/stream kernel compiles at 100k+
# scene scale take minutes through the axon tunnel and the remote
# compiler intermittently wedges on fresh compiles (docs/PERF.md) —
# caching serialized executables across processes removes the repeat
# risk entirely. Opt out with JADE_COMPILE_CACHE=0.
#
# TPU-only: serializing CPU executables SEGFAULTED the full test suite
# (jax compilation_cache.put_executable_and_time — CPU AOT artifacts
# embed host machine features like +prefer-no-gather and crash across
# host types, the cpu_aot_loader warning class; this jaxlib has no
# per-backend cache flag), so the cache is skipped when the process is
# CPU-targeted: JAX_PLATFORMS=cpu here, tests/conftest.py exports
# JADE_COMPILE_CACHE=0, and every --cpu entry point flips
# jax_enable_compilation_cache off after selecting the CPU backend.
import os as _os

if (_os.environ.get("JADE_COMPILE_CACHE", "1") != "0"
        and _os.environ.get("JAX_PLATFORMS", "") != "cpu"):
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JADE_COMPILE_CACHE_DIR",
                            _os.path.expanduser("~/.cache/jade_xla")))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
del _os
