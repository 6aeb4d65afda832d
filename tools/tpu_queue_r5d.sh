#!/bin/bash
# Round-5 queue, revision d. r5c's mnist_one2 was killed by a TPU-tunnel
# outage at epoch 63 (07:39-08:03 UTC): the tunnel returned but the
# process's device session (params in HBM) died with it, so it hung
# forever on the orphaned RPC. Its log is preserved as
# runs/mnist_one2_outage1_log.txt — valid pred 3.73 / recons 1.13 by
# epoch 63 (thresholds 30 / 1.5), confirming the 400-epoch recipe.
#
# That incident is now a framework feature instead of a babysitting job:
# every run gets --watchdog_secs (train/watchdog.py exits 75 when no
# batch completes in time; 2100s for 3bp/bounce — the 3bp first
# fused-chunk compile measured >911s and false-positived a 900s
# watchdog), and run() treats exit 75 as retryable —
# wait for the backend, resume from the run's own checkpoint with
# --use_ckpt --resume_remaining_epochs (or start fresh if it died before
# the first save).
#
# Value-greedy order inside the (longer, this-session) deadline:
#   1. bench.py fresh     — first post-host-thinning measurement of
#                           e2e_epoch_fps (VERDICT r4 weak 4 target
#                           >=105k); ~12 min while the chip is idle, and
#                           early enough to leave time to react.
#   2. mnist_one2 fresh   — same one-command recipe relaunched (400
#                           epochs fits; r5c header has the arithmetic).
#   3. 3bp_one2           — diagnosed recipe (2300 epochs, ONE late
#                           rescue at 500) from the r5b queue.
#   4. bounce_seed_probe  — --rescue_seed_color on the collapsed
#                           bounce_one1 ckpt; informative even truncated.
# Usage: tpu_queue_r5d.sh <deadline epoch-utc seconds>
set -u
cd /root/repo
echo $$ > /tmp/queue_r5d.pid
R=runners/run_physics.py
DEADLINE=${1:?usage: tpu_queue_r5d.sh <deadline epoch-utc>}

left() { echo $(( DEADLINE - $(date -u +%s) )); }

probe() {
  timeout 150 python -c "
import numpy as np, jax.numpy as jnp
np.asarray(jnp.dot(jnp.ones((256,256)), jnp.ones((256,256))))
print('alive')" 2>/dev/null | grep -q alive
}

wait_backend() {  # wait_backend <min-left-to-keep-trying>
  until probe; do
    if [ "$(left)" -lt "$1" ]; then return 1; fi
    echo "$(date -u +%H:%M:%S) backend down, re-probing in 60s"
    sleep 60
  done
  return 0
}

echo "=== $(date -u +%H:%M:%S) waiting for TPU backend (deadline in $(left)s) ==="
wait_backend 900 || { echo "!!! backend never came up inside the window"; exit 1; }
echo "=== $(date -u +%H:%M:%S) backend ALIVE ==="

# 1. Fresh bench on the thinned loop (first measurement since the
#    host-fetch-thinning commit; e2e_epoch_fps is the number to check).
if [ ! -f benchmarks/bench_r5_post_thin.json ]; then
  PAIG_BENCH_WAIT_BACKEND=0 timeout 2100 python bench.py \
    > benchmarks/bench_r5_post_thin.json 2> /tmp/bench_r5_post_thin.err
  echo "=== bench exit=$? ==="
  cat benchmarks/bench_r5_post_thin.json
fi

run() {  # run <dir> <budget-s> <min-s> <flags...>
  local dir=$1 budget=$2 min=$3; shift 3
  if [ -f "runs/$dir/.done" ]; then echo "skip $dir (done)"; return; fi
  : > "runs/${dir}_stdout.log"
  local attempt=0 extra=()
  while [ "$attempt" -lt 3 ]; do
    local b=$budget avail=$(( $(left) - 420 ))
    [ "$avail" -lt "$b" ] && b=$avail
    if [ "$b" -lt "$min" ]; then
      echo "skip $dir (only ${b}s left, need ${min}s)"; return
    fi
    echo "=== $(date -u +%H:%M:%S) launching $dir attempt $attempt (budget ${b}s) ==="
    timeout -k 120 "$b" python $R --save_dir=runs/$dir "$@" \
      ${extra[@]+"${extra[@]}"} >> "runs/${dir}_stdout.log" 2>&1
    local rc=$?
    echo "=== $(date -u +%H:%M:%S) $dir exit=$rc ==="
    if [ "$rc" -eq 0 ]; then touch "runs/$dir/.done"; return; fi
    echo "$(date -u) $dir attempt=$attempt rc=$rc" >> runs/queue_r5_failures.log
    [ "$rc" -ne 75 ] && return     # only the watchdog exit is retryable
    wait_backend $(( min + 600 )) || { echo "!!! backend gone, dropping $dir"; return; }
    if [ -e "runs/$dir/model.ckpt" ]; then
      # resume own progress; trailing --ckpt_dir wins over any warm-start
      # --ckpt_dir in the original flags (argparse last-occurrence)
      extra=(--use_ckpt --resume_remaining_epochs "--ckpt_dir=runs/$dir")
    else
      extra=()   # died before the first save: start the recipe over
    fi
    attempt=$(( attempt + 1 ))
  done
}

# 2. mnist one-command, relaunched fresh (save_dir is wiped by the
#    trainer's no---use_ckpt semantics, matching the reference).
run mnist_one2 9000 5400 --task=mnist_spring_color --epochs=400 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --discovery_restarts=2 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=250 --max_rescues=2 --save_every_n_epochs=50 \
  --watchdog_secs=900

# 3. 3bp one-command with the 3bp_one1 post-mortem applied
#    (2300 epochs, ONE late rescue, 2 arms, no pos_consistency).
run 3bp_one2 9600 3600 --task=3bp_color --epochs=2300 --batch_size=100 \
  --base_lr=1e-3 --autoencoder_loss=5.0 --color --seed=0 \
  --discovery_restarts=2 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=500 --max_rescues=1 --save_every_n_epochs=100 \
  --watchdog_secs=2100

# 4. bounce NEW-lever probe (VERDICT r4 next-4): --rescue_seed_color on
#    the collapsed bounce_one1 ckpt. Signal: valid recons < 10.4 plateau.
run bounce_seed_probe 3600 900 --task=bouncing_balls --epochs=1200 \
  --batch_size=100 --base_lr=3e-4 --autoencoder_loss=2.0 --color --seed=0 \
  --use_ckpt --ckpt_dir=runs/bounce_one1 --bg_lr_mult=0 \
  --rescue_seed_color --auto_rescue=10 --max_rescues=3 \
  --aux_on_recons=3.5 --learn_frame_offset --save_every_n_epochs=50 \
  --watchdog_secs=2100

echo "=== queue r5d complete $(date -u) ==="
