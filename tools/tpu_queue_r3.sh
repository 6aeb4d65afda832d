#!/bin/bash
# Round-3 single-command TPU queue (v2): one reference-style invocation per
# task — no warm starts, no offline surgery. In-run machinery does the
# pipeline work:
#   --discovery_restarts  random-restart discovery (counters the
#                         seed-sensitive symmetry breaking the reference
#                         README warns about; v1 finding: a single arm's
#                         discovery is a coin flip and --auto_rescue alone
#                         cannot climb out of the attractor it lands in)
#   --aux_on_recons       physics-alignment losses arm on discovery
#   --fit_physics_every   train-time closed-form physics identification
#   --auto_rescue         in-place slot surgery if discovery still stalls
#                         (v2: least-healthy/balloon-aware slot policy,
#                         re-armable via --max_rescues)
#   --enhancers_eval_only GN estimators (state fit, render refinement)
#                         score evals without taxing the train step
# Sequential: one chip. Each run logs to runs/<name>/log.txt.
set -u
cd /root/repo
# Own-pid marker: the launcher's setsid wrapper pid is useless for
# liveness checks (it exits immediately); the watcher reads this file.
echo $$ > /tmp/queue_r3v2.pid
R=runners/run_physics.py

wait_for() {  # wait_for <dataset file relative to data/datasets>
  local f="data/datasets/$1" waited=0
  while [ ! -f "$f" ]; do
    sleep 60; waited=$((waited+60))
    if [ $waited -gt 10800 ]; then echo "GAVE UP waiting for $f"; return 1; fi
  done
  sleep 30  # let the writer finish the compressed npz
}

run() {  # run <save_dir> <args...>
  local dir=$1; shift
  if [ -f "runs/$dir/.done" ]; then echo "skip $dir (done)"; return; fi
  echo "=== $(date -u +%H:%M:%S) launching $dir ==="
  timeout 14400 python $R --save_dir=runs/$dir "$@" \
    > runs/${dir}_stdout.log 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $dir exit=$rc ==="
  if [ $rc -eq 0 ]; then
    touch runs/$dir/.done
  else
    # ADVICE r3: a failed run (dataset race, rc=124 timeout, ...) must not
    # pass silently — loud marker + queue-level failures file.
    echo "!!! FAILED $dir rc=$rc ($(date -u +%H:%M:%S)) — see runs/${dir}_stdout.log"
    echo "$(date -u) $dir rc=$rc" >> runs/queue_r3_failures.log
  fi
}

# 1. spring_color — the north-star single-command run. v4 stalled in the
#    both-slots-one-ball attractor from epoch ~30 and the (all-slot-reset)
#    rescue at 150 re-converged to it (runs/spring_one4). v5 leads with
#    8 restart arms x 150 epochs: historical discovery, when it happens,
#    shows up well inside 150 epochs (round-2 spring500: epoch ~50).
run spring_one5 --task=spring_color --epochs=1000 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --discovery_restarts=8 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=250 --max_rescues=2 --save_every_n_epochs=50

# 2. 3bp_color — NO pos_consistency (aligned losses anchor to chaotic
#    diverging rollouts; measured regression). Runs before mnist: its
#    dataset is on disk immediately after a fresh-VM regen while the
#    (64x64 + CIFAR background) mnist set is still generating.
#    ADVICE r3: guard the dataset like the other entries — "immediately"
#    still races the regen; get_iterators does a bare np.load. The sl40
#    test file is generated last (same convention as the mnist guard).
wait_for "3bp_color/color_3bp_vx2_vy2_sl40_r2_g60_m1_dt05.npz" && \
run 3bp_one1 --task=3bp_color --epochs=1000 --batch_size=100 \
  --base_lr=1e-3 --autoencoder_loss=5.0 --color --seed=0 \
  --discovery_restarts=4 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=250 --max_rescues=3 --save_every_n_epochs=50

# 3. mnist_spring_color — restarts + the (dead-digit) rescue in-run.
wait_for "mnist_spring_color/color_mnist_spring_vx8_vy8_sl30_r2_k2_e12.npz" && \
run mnist_one1 --task=mnist_spring_color --epochs=1000 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --discovery_restarts=4 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=250 --max_rescues=2 --save_every_n_epochs=50

# 4. spring_color_half — same recipe as spring.
wait_for "spring_color_half/color_spring_vx4_vy4_sl30_r2_k4_e6_halfpane.npz" && \
run half_one1 --task=spring_color_half --epochs=1000 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --discovery_restarts=8 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=250 --max_rescues=2 --save_every_n_epochs=50

# 5. bouncing_balls — no learnable physics (fit_physics off); from-scratch
#    discovery collapsed in all 13 historical runs, so give it the most
#    restart arms; eval scores with the unfolded-reflection state fit +
#    subpixel refinement.
run bounce_one1 --task=bouncing_balls --epochs=800 --batch_size=100 \
  --base_lr=3e-4 --autoencoder_loss=2.0 --color --seed=0 \
  --discovery_restarts=10 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=1 --refine_enc_pos=4 --refine_recons_pos=4 \
  --enhancers_eval_only --auto_rescue=250 --max_rescues=2 \
  --save_every_n_epochs=50

echo "=== queue complete $(date -u) ==="
