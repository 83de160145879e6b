#!/bin/bash
# Round-5 phase 6: swt=128 sub-union probe after the matrix rerun.
set -u
cd /root/repo
OUT=/tmp/r5_batch
until [ -s "$OUT/matrix.done" ]; do sleep 60; done
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
run mdef_swt128 2400 python tools/megaprobe.py --gather auto --redist --prologue --sweep-tile 128
run m400k_swt128 3000 python tools/megaprobe.py --tris 400000 --gather auto --redist --prologue --l-cap 384 --sweep-tile 128
echo "$(date +%H:%M:%S) BATCH6 DONE" >> $OUT/watch.log
