#!/bin/bash
# Round-5 phase 3 (reordered): 400k l_cap bump, prologue spawn_rounds,
# the NEW attribution replays (2xmarch/2xsssprep/2xpull), and the
# per-call fixed-cost spp slope — matrix refresh moved to the end of
# the session so it captures the settled defaults.
set -u
cd /root/repo
OUT=/tmp/r5_batch
mkdir -p $OUT

until grep -q "BATCH2 DONE" $OUT/watch.log 2>/dev/null; do sleep 60; done

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

# the completed attribution under the production config (prologue)
run mdef_attrib4 3000 python tools/megaprobe.py --gather auto --redist --prologue --debug full,2xmarch,2xsssprep,2xpull
# per-call fixed cost: spp slope (same kernel, quarter/half work)
run mdef_prol_spp4 1800 python tools/megaprobe.py --gather auto --redist --prologue --spp 4
run mdef_prol_spp8 1800 python tools/megaprobe.py --gather auto --redist --prologue --spp 8
# 400k levers
run m400k_prol_lcap384 3000 python tools/megaprobe.py --tris 400000 --gather auto --redist --prologue --l-cap 384
run mdef_prol_rounds2 2400 python tools/megaprobe.py --gather auto --redist --prologue --spawn-rounds 2
echo "$(date +%H:%M:%S) BATCH3 DONE" >> $OUT/watch.log
