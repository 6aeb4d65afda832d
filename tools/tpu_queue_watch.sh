#!/bin/bash
# Relauncher for tools/tpu_queue_r4.sh: if the queue process has exited
# while some runs lack their .done marker (e.g. the axon tunnel died
# mid-queue), probe the backend and relaunch. run() skips .done dirs, so
# relaunching is safe; an interrupted run restarts from scratch.
set -u
cd /root/repo
RUNS="lstm_proof 3bp_one1 spring_bf16_one1 half_one1 bounce_one1 mnist_one1"

all_done() {
  # .timeout counts as terminal: relaunching a run the 4h budget already
  # killed would loop the chip forever.
  for r in $RUNS; do
    [ -f "runs/$r/.done" ] || [ -f "runs/$r/.timeout" ] || return 1
  done
  return 0
}

while true; do
  sleep 1800
  all_done && { echo "$(date -u) queue complete; watcher exiting"; break; }
  if [ -f /tmp/queue_r4.pid ] && kill -0 "$(cat /tmp/queue_r4.pid)" 2>/dev/null; then
    continue   # queue still running
  fi
  # queue died with work left: probe the backend, relaunch if alive
  if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$(date -u) queue dead with work left — relaunching"
    setsid nohup bash tools/tpu_queue_r4.sh >> runs/queue_r4.log 2>&1 &
    sleep 5   # the queue writes its own pid marker
  else
    echo "$(date -u) backend unreachable; will retry"
  fi
done
