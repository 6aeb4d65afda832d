#!/bin/bash
# Round-3 single-command TPU queue: one reference-style invocation per task,
# no warm starts, no offline surgery — the staged triggers (--aux_on_recons,
# --fit_physics_every, --auto_rescue) do the pipeline work in-run.
# Sequential: one chip. Each run logs to runs/<name>/log.txt.
set -u
cd /root/repo
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
  [ $rc -eq 0 ] && touch runs/$dir/.done
}

# 1. spring_color — the north-star single-command run.
#    v3 (no auto_rescue) stalled in the dead-slot attractor: recons flat
#    at 9.4 from ep100-156 (runs/spring_one3/log.txt) — the exact
#    signature --auto_rescue exists for. v4 arms it like the hard tasks.
run spring_one4 --task=spring_color --epochs=1000 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --auto_rescue=150 --aux_on_recons=3.5 --fit_physics_every=25 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --save_every_n_epochs=50

# 2. mnist_spring_color — auto_rescue revives the dead digit slot in-run.
wait_for "mnist_spring_color/color_mnist_spring_vx8_vy8_sl30_r2_k2_e12.npz" && \
run mnist_one1 --task=mnist_spring_color --epochs=1000 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --auto_rescue=150 --aux_on_recons=3.5 --fit_physics_every=25 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --save_every_n_epochs=50

# 3. 3bp_color — rescue resets ballooned templates; NO pos_consistency
#    (aligned losses anchor to chaotic diverging rollouts; measured regression).
run 3bp_one1 --task=3bp_color --epochs=1000 --batch_size=100 \
  --base_lr=1e-3 --autoencoder_loss=5.0 --color --seed=0 \
  --auto_rescue=150 --aux_on_recons=3.5 --fit_physics_every=25 \
  --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --save_every_n_epochs=50

# 4. bouncing_balls — no learnable physics (fit_physics off); rescue fixes
#    the slot-collapse discovery failure; eval scores with the
#    unfolded-reflection state fit + subpixel refinement.
run bounce_one1 --task=bouncing_balls --epochs=800 --batch_size=100 \
  --base_lr=3e-4 --autoencoder_loss=2.0 --color --seed=0 \
  --auto_rescue=150 --aux_on_recons=3.5 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=1 --refine_enc_pos=4 --refine_recons_pos=4 \
  --enhancers_eval_only --save_every_n_epochs=50

# 5. spring_color_half — same recipe as spring.
wait_for "spring_color_half/color_spring_vx4_vy4_sl30_r2_k4_e6_halfpane.npz" && \
run half_one1 --task=spring_color_half --epochs=1000 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --auto_rescue=150 --aux_on_recons=3.5 --fit_physics_every=25 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --save_every_n_epochs=50

echo "=== queue complete $(date -u) ==="
