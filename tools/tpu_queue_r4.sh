#!/bin/bash
# Round-4 single-command TPU queue: one reference-style invocation per
# task (VERDICT r3 "next round" item 1), ordered value-greedy:
#   1. lstm_proof      — prove the LSTM black-box baseline TRAINS
#                        (VERDICT weak #7; the reference ships the flags
#                        broken, torch_run_physics.py:26-28)
#   2. 3bp_one1        — was mid-flight at the r3 cutoff; restarted fresh
#   3. spring_bf16_one1— the spring_one5 winning recipe under
#                        --compute_dtype=bfloat16 (VERDICT item 3:
#                        validate bf16 convergence, flip the headline)
#   4. half_one1       — cheapest remaining task
#   5. bounce_one1     — no learnable physics; most restart arms
#   6. mnist_one1      — most expensive (64x64); runs last so a round-end
#                        truncation costs the least marginal value
# Sequential: one chip. Each run logs to runs/<name>/log.txt.
set -u
cd /root/repo
echo $$ > /tmp/queue_r4.pid
R=runners/run_physics.py

wait_for() {  # wait_for <dataset file relative to data/datasets>
  local f="data/datasets/$1" waited=0
  while [ ! -f "$f" ]; do
    sleep 60; waited=$((waited+60))
    if [ $waited -gt 10800 ]; then echo "GAVE UP waiting for $f"; return 1; fi
  done
  sleep 5  # let the writer finish the compressed npz
}

run() {  # run <save_dir> <args...>
  local dir=$1; shift
  if [ -f "runs/$dir/.done" ]; then echo "skip $dir (done)"; return; fi
  if [ -f "runs/$dir/.timeout" ]; then echo "skip $dir (timed out previously; needs a smaller budget)"; return; fi
  echo "=== $(date -u +%H:%M:%S) launching $dir ==="
  timeout 14400 python $R --save_dir=runs/$dir "$@" \
    > runs/${dir}_stdout.log 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $dir exit=$rc ==="
  if [ $rc -eq 0 ]; then
    touch runs/$dir/.done
  else
    # ADVICE r3: loud failure marker + queue-level failures file so a
    # lost slot cannot pass silently.
    echo "!!! FAILED $dir rc=$rc ($(date -u +%H:%M:%S)) — see runs/${dir}_stdout.log"
    echo "$(date -u) $dir rc=$rc" >> runs/queue_r4_failures.log
    if [ $rc -eq 124 ]; then
      # Timed out: mark it so a watcher relaunch does NOT restart a
      # known-too-long run from scratch forever (the 4h timeout would
      # kill it again every cycle, burning the chip in a loop).
      mkdir -p runs/$dir && touch runs/$dir/.timeout
    fi
  fi
}

# 1. LSTM baseline proof: short spring run, black-box LSTM cell replacing
#    the ODE cell. Success bar: train/valid pred loss decreasing over the
#    run (not thresholds — a black-box cell has no physics prior).
wait_for "spring_color/color_spring_vx8_vy8_sl30_r2_k4_e6.npz" && \
run lstm_proof --task=spring_color --epochs=150 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --cell_type=lstm --recurrent_units=100 --lstm_layers=1 \
  --save_every_n_epochs=50

# 2. 3bp_color — NO pos_consistency (aligned losses anchor to chaotic
#    diverging rollouts; measured regression in r3).
wait_for "3bp_color/color_3bp_vx2_vy2_sl40_r2_g60_m1_dt05.npz" && \
run 3bp_one1 --task=3bp_color --epochs=1000 --batch_size=100 \
  --base_lr=1e-3 --autoencoder_loss=5.0 --color --seed=0 \
  --discovery_restarts=4 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=250 --max_rescues=3 --save_every_n_epochs=50

# 3. spring_color under bf16 — byte-for-byte the committed spring_one5
#    winning recipe (CONVERGENCE.md) plus --compute_dtype=bfloat16.
run spring_bf16_one1 --task=spring_color --epochs=1000 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --compute_dtype=bfloat16 \
  --discovery_restarts=8 --discovery_epochs=150 --discovery_recons_ok=4.0 \
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
#    discovery collapsed in all 13 historical runs, so most restart arms;
#    eval scores with the unfolded-reflection state fit + refinement.
wait_for "bouncing/color_bounce_vx8_vy8_sl30_r2.npz" && \
run bounce_one1 --task=bouncing_balls --epochs=800 --batch_size=100 \
  --base_lr=3e-4 --autoencoder_loss=2.0 --color --seed=0 \
  --discovery_restarts=10 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=1 --refine_enc_pos=4 --refine_recons_pos=4 \
  --enhancers_eval_only --auto_rescue=250 --max_rescues=2 \
  --save_every_n_epochs=50

# 6. mnist_spring_color — restarts trimmed to 2 arms (r3 evidence: the
#    dead-slot rescue is what cracks mnist, not the restart lottery);
#    1200 epochs (r3's winning chain spent ~3500 post-surgery epochs, but
#    in-run rescue starts from a much better basin).
wait_for "mnist_spring_color/color_mnist_spring_vx8_vy8_sl30_r2_k2_e12.npz" && \
run mnist_one1 --task=mnist_spring_color --epochs=1200 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --discovery_restarts=2 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=250 --max_rescues=2 --save_every_n_epochs=50

echo "=== queue complete $(date -u) ==="
