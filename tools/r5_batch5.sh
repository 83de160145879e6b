#!/bin/bash
# Round-5 phase 5: close the last two targets — 400k >= 10 (tile-shape
# A/B at l_cap 384) and preview fps (bands 8), plus the sustained
# ceiling at reps 8.
set -u
cd /root/repo
OUT=/tmp/r5_batch
mkdir -p $OUT

health() {
  timeout 300 python -c "import jax,jax.numpy as jnp; print(int(jnp.arange(8).sum()))" >/dev/null 2>&1
}
wait_chip() {
  until health; do
    echo "$(date +%H:%M:%S) chip still wedged" >> $OUT/watch.log
    sleep 120
  done
  echo "$(date +%H:%M:%S) chip OK" >> $OUT/watch.log
}
run() {
  local name=$1 tmo=$2; shift 2
  if [ -s "$OUT/$name.done" ]; then return; fi
  wait_chip
  echo "$(date +%H:%M:%S) start $name" >> $OUT/watch.log
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc" >> "$OUT/$name.log"
  if [ $rc -eq 0 ]; then echo ok > "$OUT/$name.done"; fi
  echo "$(date +%H:%M:%S) end $name rc=$rc" >> $OUT/watch.log
}

run m400k_t256_lcap384 3000 python tools/megaprobe.py --tris 400000 --gather auto --redist --prologue --l-cap 384 --mega-tile 256
run bench_reps8 2400 python bench.py --engine mega --reps 8
run prev_band8 1800 python - <<'EOF'
import json, types
import bench
base = types.SimpleNamespace(width=256, height=256, spp=16, depth=6,
                             tris=20000, spp_batch=16,
                             rays_per_launch=1 << 14, traversal="sweep",
                             engine="pool", cpu=False, small=False,
                             reps=4)
for eng in ("pool", "mega"):
    for b in (8, 16):
        fps = bench._measure_preview_fps(base, 1024, 1024, engine=eng,
                                         bands=b)
        print(json.dumps({"engine": eng, "bands": b,
                          "fps": round(fps, 2)}), flush=True)
EOF
echo "$(date +%H:%M:%S) BATCH5 DONE" >> $OUT/watch.log
