#!/bin/bash
# Round-5 live queue (supersedes the pre-round plan in tpu_queue_r5.sh;
# its bounce_one2 premise was falsified by the round-4 overlap probe —
# VERDICT r4 weak §2 / next §4).
#
# The tunnel was DOWN at round-5 start (two probe matmuls timed out), so
# step 0 re-probes until the backend answers, then runs value-greedy
# inside a hard wall-clock deadline:
#   1. bench.py fresh      — ~12 min; lands a non-stale measurement + the
#                            auto-refreshed last_tpu_bench.json snapshot
#                            the moment the chip is reachable (VERDICT §5).
#   2. mnist_one1          — the only matrix task never attempted
#                            one-command; rescue machinery was invented on
#                            mnist (VERDICT §2). 64x64, ~2.5h.
#   3. 3bp_one2            — the diagnosed recipe: 2300 epochs, exactly one
#                            late rescue (VERDICT §3).
#   4. bounce_seed probe   — NEW lever per VERDICT §4: --rescue_seed_color
#                            on the collapsed bounce_one1 ckpt (the overlap
#                            penalty is measured dead; seeding the reset
#                            slot with the unexplained color cluster is the
#                            untested mechanism built for this failure).
# Usage: tpu_queue_r5b.sh <deadline epoch-utc seconds>
set -u
cd /root/repo
echo $$ > /tmp/queue_r5b.pid
R=runners/run_physics.py
DEADLINE=${1:?usage: tpu_queue_r5b.sh <deadline epoch-utc>}

left() { echo $(( DEADLINE - $(date -u +%s) )); }

probe() {
  timeout 150 python -c "
import numpy as np, jax.numpy as jnp
np.asarray(jnp.dot(jnp.ones((256,256)), jnp.ones((256,256))))
print('alive')" 2>/dev/null | grep -q alive
}

echo "=== $(date -u +%H:%M:%S) waiting for TPU backend (deadline in $(left)s) ==="
until probe; do
  if [ "$(left)" -lt 900 ]; then
    echo "!!! backend never came up inside the window"; exit 1
  fi
  echo "$(date -u +%H:%M:%S) backend down, re-probing in 60s"
  sleep 60
done
echo "=== $(date -u +%H:%M:%S) backend ALIVE ==="

# 1. Fresh bench while the chip is idle (writes last_tpu_bench.json).
PAIG_BENCH_WAIT_BACKEND=0 timeout 2100 python bench.py \
  > benchmarks/bench_r5_fresh.json 2> /tmp/bench_r5_fresh.err
echo "=== bench exit=$? ==="
cat benchmarks/bench_r5_fresh.json

run() {  # run <dir> <budget-s> <min-s> <flags...>
  local dir=$1 budget=$2 min=$3; shift 3
  if [ -f "runs/$dir/.done" ]; then echo "skip $dir (done)"; return; fi
  local avail=$(( $(left) - 420 ))   # reserve for the next item's setup
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

# 2. mnist_spring_color one-command (VERDICT §2): 2 arms, dead-slot rescue.
while [ ! -f data/datasets/mnist_spring_color/color_mnist_spring_vx8_vy8_sl30_r2_k2_e12.npz ]; do
  echo "waiting for mnist dataset regen"; sleep 30
  [ "$(left)" -lt 1200 ] && exit 1
done
sleep 5
run mnist_one1 12600 5400 --task=mnist_spring_color --epochs=1200 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --discovery_restarts=2 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=250 --max_rescues=2 --save_every_n_epochs=50

# 3. 3bp_color one-command with the 3bp_one1 post-mortem applied
#    (2300 epochs, ONE late rescue, 2 arms, no pos_consistency).
run 3bp_one2 10800 4200 --task=3bp_color --epochs=2300 --batch_size=100 \
  --base_lr=1e-3 --autoencoder_loss=5.0 --color --seed=0 \
  --discovery_restarts=2 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=500 --max_rescues=1 --save_every_n_epochs=100

# 4. bounce NEW-lever probe: resume the collapsed bounce_one1 checkpoint,
#    fire one immediate rescue with --rescue_seed_color (reset slots seeded
#    with the residual color cluster instead of mid-gray). Signal: valid
#    recons breaking below the 10.4 plateau. Cheap (~40 min) and directly
#    informs the round-6 bounce_one3 recipe either way.
run bounce_seed_probe 3600 1500 --task=bouncing_balls --epochs=1200 \
  --batch_size=100 --base_lr=3e-4 --autoencoder_loss=2.0 --color --seed=0 \
  --use_ckpt --ckpt_dir=runs/bounce_one1 --bg_lr_mult=0 \
  --rescue_seed_color --auto_rescue=10 --max_rescues=3 \
  --aux_on_recons=3.5 --learn_frame_offset --save_every_n_epochs=50

echo "=== queue r5b complete $(date -u) ==="
