#!/bin/bash
# Round-5 queue, revision c (supersedes r5b's items 2-4 mid-flight).
#
# Why: mnist_one1 (r5b item 2) measured ~15-20 s/epoch at 64x64 with
# every-epoch evals — 1200 epochs needs ~5 h, so its 12600 s budget
# would kill it ~epoch 600 with NO test phase (= no one-command win,
# round-4's mnist outcome repeated). Its discovery result is already
# banked in runs/mnist_one1/log.txt: arm 2/2 valid recons 1.490 at 150
# epochs; main run valid pred 3.68 / recons 1.21 by epoch 21 (threshold
# for mnist is pred<30 / recons<1.5). So the SAME one-command recipe at
# 400 epochs fits the window including the test phase — relaunched here
# as mnist_one2, then the bounce --rescue_seed_color probe (VERDICT r4
# next-§4's new lever). 3bp_one2 (needs ~2 h alone) cannot share the
# window with mnist and drops off; mnist is the higher VERDICT priority
# (never attempted one-command vs diagnosed-retry).
# Usage: tpu_queue_r5c.sh <deadline epoch-utc seconds>
set -u
cd /root/repo
echo $$ > /tmp/queue_r5c.pid
R=runners/run_physics.py
DEADLINE=${1:?usage: tpu_queue_r5c.sh <deadline epoch-utc>}

left() { echo $(( DEADLINE - $(date -u +%s) )); }

run() {  # run <dir> <budget-s> <min-s> <flags...>
  local dir=$1 budget=$2 min=$3; shift 3
  if [ -f "runs/$dir/.done" ]; then echo "skip $dir (done)"; return; fi
  local avail=$(( $(left) - 300 ))
  [ "$avail" -lt "$budget" ] && budget=$avail
  if [ "$budget" -lt "$min" ]; then
    echo "skip $dir (only ${budget}s left, need ${min}s)"; return
  fi
  echo "=== $(date -u +%H:%M:%S) launching $dir (budget ${budget}s) ==="
  timeout -k 120 "$budget" python $R --save_dir=runs/$dir "$@" \
    > runs/${dir}_stdout.log 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $dir exit=$rc ==="
  if [ $rc -eq 0 ]; then
    touch runs/$dir/.done
  else
    echo "$(date -u) $dir rc=$rc" >> runs/queue_r5_failures.log
  fi
}

# 1. mnist one-command at the window-fitting length (see header).
run mnist_one2 10200 5400 --task=mnist_spring_color --epochs=400 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --discovery_restarts=2 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=250 --max_rescues=2 --save_every_n_epochs=50

# 2. bounce NEW-lever probe (r5b item 4 unchanged): resume the collapsed
#    bounce_one1 ckpt, immediate rescue with --rescue_seed_color. Signal:
#    valid recons breaking below the 10.4 plateau; informative even if
#    the deadline kills it mid-run.
run bounce_seed_probe 3600 1200 --task=bouncing_balls --epochs=1200 \
  --batch_size=100 --base_lr=3e-4 --autoencoder_loss=2.0 --color --seed=0 \
  --use_ckpt --ckpt_dir=runs/bounce_one1 --bg_lr_mult=0 \
  --rescue_seed_color --auto_rescue=10 --max_rescues=3 \
  --aux_on_recons=3.5 --learn_frame_offset --save_every_n_epochs=50

echo "=== queue r5c complete $(date -u) ==="
