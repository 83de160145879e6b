#!/bin/bash
# Round-5 phase 2: waits for phase 1 (r5_batch.sh) to finish, then
# runs the mega_tile A/B under redistribution (+prologue), the preview
# decomposition probe, and the full matrix refresh. Logs /tmp/r5_batch/.
set -u
cd /root/repo
OUT=/tmp/r5_batch
mkdir -p $OUT

until grep -q "BATCH DONE" $OUT/watch.log 2>/dev/null; do sleep 60; done

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

# wider lane tiles under redistribution+prologue: the [1, TM] row math
# runs at ~1/8 sublane utilization (subprobe); the old TM=1024
# regression was divergence-idle + union growth — redistribution +
# prologue remove the first, mega_sweep_tile removes the second
run mdef_prol_t512 2400 python tools/megaprobe.py --gather auto --redist --prologue --mega-tile 512
run mdef_prol_t1024_s256 2400 python tools/megaprobe.py --gather auto --redist --prologue --mega-tile 1024 --sweep-tile 256
run mdef_prol_t512_s256 2400 python tools/megaprobe.py --gather auto --redist --prologue --mega-tile 512 --sweep-tile 256
run mdef_prol_t1024 2400 python tools/megaprobe.py --gather auto --redist --prologue --mega-tile 1024
# preview decomposition (mega + pool)
run prev_mega 1800 python tools/prevprobe.py --engine mega
run prev_pool 1800 python tools/prevprobe.py --engine pool
echo "$(date +%H:%M:%S) BATCH2 DONE" >> $OUT/watch.log
