#!/bin/bash
# Round-4 hardware measurement batch: waits for the axon tunnel to
# recover, then runs the queued megaprobe/bench measurements in order,
# logging to /tmp/r4_batch/. Each step is bounded so one wedge doesn't
# kill the batch; a failed health re-check pauses until recovery.
set -u
cd /root/repo
OUT=/tmp/r4_batch
mkdir -p $OUT

health() {
  timeout 180 python -c "import jax,jax.numpy as jnp; print(int(jnp.arange(8).sum()))" >/dev/null 2>&1
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

# 1. THE headline questions: 400k with the dynamic chunk loop (+ replay)
#    and the default row with intra-tile work redistribution
run m400k 2400 python tools/megaprobe.py --tris 400000 --gather auto --debug full,2xsweep
run mdef_redist 1800 python tools/megaprobe.py --gather auto --redist
run mdef_redist2 1800 python tools/megaprobe.py --gather auto --redist --spawn-rounds 2
# 2. default-scale mega decomposition incl. the gather replay
run mdef 1800 python tools/megaprobe.py --gather auto --debug full,2xgather,2xsweep
# 3. redistribution on the bounce-heavy + large rows
run mdepth16_redist 1800 python tools/megaprobe.py --depth 16 --gather auto --redist
run mdepth16 1800 python tools/megaprobe.py --depth 16 --gather auto
run m400k_redist 2400 python tools/megaprobe.py --tris 400000 --gather auto --redist
run m100k 1800 python tools/megaprobe.py --tris 100000 --gather auto
run m100k_chunked 1800 python tools/megaprobe.py --tris 100000 --gather auto --chunked
run m100k_redist 1800 python tools/megaprobe.py --tris 100000 --gather auto --redist
run mdef_redist3 1800 python tools/megaprobe.py --gather auto --redist --spawn-rounds 3
# 4. full bench matrix refresh (auto A/Bs engines per row)
run matrix 5400 python bench.py --all
echo "$(date +%H:%M:%S) BATCH DONE" >> $OUT/watch.log
