#!/bin/bash
# Round-5 hardware measurement batch (session 2): prologue A/B first,
# then the iteration-fabric attribution replays, then the matrix
# refresh. Logs to /tmp/r5_batch/. Same bounded-step protocol as r4.
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

run() {  # run <name> <timeout_s> <cmd...>
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

# 1. THE A/B: primary prologue on the default row (vs same-session redist)
run mdef_redist 1800 python tools/megaprobe.py --gather auto --redist
run mdef_prologue 2400 python tools/megaprobe.py --gather auto --redist --prologue
# 2. finish the iteration-fabric attribution (segfeats/statecat replays)
run mdef_attrib3 2400 python tools/megaprobe.py --gather auto --redist --debug full,2xsegfeats,2xstatecat
# 3. prologue on the bounce-heavy and scale rows
run mdepth16_prologue 2400 python tools/megaprobe.py --depth 16 --gather auto --redist --prologue
run m400k_prologue 3000 python tools/megaprobe.py --tris 400000 --gather auto --redist --prologue
run m100k_prologue 2400 python tools/megaprobe.py --tris 100000 --gather auto --redist --prologue
# 4. 400k attribution under redistribution (prefilter vs chunk loop split)
run m400k_attrib 3000 python tools/megaprobe.py --tris 400000 --gather auto --redist --debug full,2xsweep,2xprefilter,2xvisit
echo "$(date +%H:%M:%S) BATCH DONE" >> $OUT/watch.log
