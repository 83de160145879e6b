#!/bin/bash
# Round-5 phase 7: swt64 probe + the final matrix with auto sweep-tile.
set -u
cd /root/repo
OUT=/tmp/r5_batch
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
run mdef_swt64 2400 python tools/megaprobe.py --gather auto --redist --prologue --sweep-tile 64
run matrix2 7200 python bench.py --all
echo "$(date +%H:%M:%S) BATCH7 DONE" >> $OUT/watch.log
