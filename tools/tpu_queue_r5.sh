#!/bin/bash
# Round-5 single-command TPU queue, value-greedy with round-4's measured
# pacing (~21 ep/min steady, ~4 min compile, ~4 min test phase at 32x32):
#   1. half_one2  — skipped automatically if round 4's window already
#                   landed runs/half_one1 (.done). Full-strength spring
#                   recipe; ~80 min, highest p(win).
#   2. 3bp_one2   — the diagnosed 3bp recipe (benchmarks/CONVERGENCE.md
#                   r4): 2300 epochs, exactly ONE late rescue
#                   (auto_rescue=500, max_rescues=1) so the all-slot reset
#                   gets a long uninterrupted pinned-background tail. ~2h.
#   3. bounce_one2 — rescue + slot-overlap penalty together (the 2x2
#                   cell neither round 2 nor bounce_one1 tested); check
#                   the round-4 probe result before spending the window.
#   4. mnist_one1 — if chip time remains; 64x64, ~2.5h+, so it usually
#                   falls off the end.
# Self-sufficient on a fresh VM: regenerates any missing dataset itself
# (ADVICE r3 — never race an external regen), then wait_for guards the
# last-written file of each pair anyway.
set -u
cd /root/repo
echo $$ > /tmp/queue_r5.pid
R=runners/run_physics.py

regen() {  # regen <task> <last-written dataset file>  (skip if present)
  if [ ! -f "data/datasets/$2" ]; then
    echo "=== regenerating $1 datasets ==="
    JAX_PLATFORMS=cpu python -m paig_reproduction_tpu.data.generate --task "$1" \
      >> /tmp/gen_r5.log 2>&1 || echo "!!! regen $1 FAILED"
  fi
}

wait_for() {
  local f="data/datasets/$1" waited=0
  while [ ! -f "$f" ]; do
    sleep 30; waited=$((waited+30))
    if [ $waited -gt 3600 ]; then echo "GAVE UP waiting for $f"; return 1; fi
  done
  sleep 5
}

run() {
  local dir=$1; shift
  if [ -f "runs/$dir/.done" ]; then echo "skip $dir (done)"; return; fi
  echo "=== $(date -u +%H:%M:%S) launching $dir ==="
  timeout 12600 python $R --save_dir=runs/$dir "$@" \
    > runs/${dir}_stdout.log 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $dir exit=$rc ==="
  if [ $rc -eq 0 ]; then
    touch runs/$dir/.done
  else
    echo "!!! FAILED $dir rc=$rc ($(date -u +%H:%M:%S)) — see runs/${dir}_stdout.log"
    echo "$(date -u) $dir rc=$rc" >> runs/queue_r5_failures.log
  fi
}

# 1. spring_color_half — the committed spring_one5 winning recipe verbatim
#    (skips itself if half_one1 landed in round 4's window).
if [ ! -f runs/half_one1/.done ]; then
  regen spring_color_half "spring_color_half/color_spring_vx4_vy4_sl30_r2_k4_e6_halfpane.npz"
  wait_for "spring_color_half/color_spring_vx4_vy4_sl30_r2_k4_e6_halfpane.npz" && \
  run half_one2 --task=spring_color_half --epochs=1000 --batch_size=100 \
    --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
    --discovery_restarts=8 --discovery_epochs=150 --discovery_recons_ok=4.0 \
    --aux_on_recons=3.5 --fit_physics_every=25 \
    --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
    --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
    --auto_rescue=250 --max_rescues=2 --save_every_n_epochs=50
fi

# 2. 3bp_color retry with the runs/3bp_one1 diagnosis applied:
#    - epochs=2300: the all-slot reset needs a LONG uninterrupted
#      pinned-background descent (r3's multi-stage win used 1000 epochs
#      from a better encoder; a one-command run starts weaker).
#    - max_rescues=1 + auto_rescue=500: one reset, fired late enough that
#      the encoder has ~650 epochs behind it; 3bp_one1's rescues 2 and 3
#      only erased post-reset progress.
#    - discovery_restarts=2: 3bp arms never discover (16.5-19.9 across 4
#      arms); two arms keep best-basin selection at half the cost.
#    - NO pos_consistency (anchors to chaotic diverging rollouts;
#      measured regression in r3).
regen 3bp_color "3bp_color/color_3bp_vx2_vy2_sl40_r2_g60_m1_dt05.npz"
wait_for "3bp_color/color_3bp_vx2_vy2_sl40_r2_g60_m1_dt05.npz" && \
run 3bp_one2 --task=3bp_color --epochs=2300 --batch_size=100 \
  --base_lr=1e-3 --autoencoder_loss=5.0 --color --seed=0 \
  --discovery_restarts=2 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=500 --max_rescues=1 --save_every_n_epochs=100

# 3. bouncing_balls retry — the untested cell of the 2x2: rescue +
#    slot-overlap penalty TOGETHER. Round-2 measured the penalty failing
#    from scratch; round-4's bounce_one1 measured the rescue alone
#    failing (recons flat at 10.4 through two rescues). The round-4 tail
#    probe (runs/bounce_probe_overlap, tools/bounce_probe_overlap.sh)
#    tests the combination on the collapsed ckpt — CHECK ITS RESULT
#    (CONVERGENCE.md round-4 bounce section) and tune
#    --attn_overlap_loss before burning these 2h. Arms trimmed to 2:
#    bounce arms never discover (10.8-17.2 across 8), the rescue is the
#    mechanism. No fit_physics (nothing learnable); refine_enc_pos +
#    unfolded-reflection state fit carry the pred metric as in the
#    committed bounce_ft2 win.
regen bouncing_balls "bouncing/color_bounce_vx8_vy8_sl30_r2.npz"
wait_for "bouncing/color_bounce_vx8_vy8_sl30_r2.npz" && \
run bounce_one2 --task=bouncing_balls --epochs=800 --batch_size=100 \
  --base_lr=3e-4 --autoencoder_loss=2.0 --color --seed=0 \
  --attn_overlap_loss=1.0 \
  --discovery_restarts=2 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=1 --refine_enc_pos=4 --refine_recons_pos=4 \
  --enhancers_eval_only --auto_rescue=200 --max_rescues=2 \
  --save_every_n_epochs=50

# 4. mnist_spring_color — 2 arms (the dead-slot rescue is what cracks
#    mnist, not the restart lottery), 1200 epochs.
regen mnist_spring_color "mnist_spring_color/color_mnist_spring_vx8_vy8_sl30_r2_k2_e12.npz"
wait_for "mnist_spring_color/color_mnist_spring_vx8_vy8_sl30_r2_k2_e12.npz" && \
run mnist_one1 --task=mnist_spring_color --epochs=1200 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --discovery_restarts=2 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=250 --max_rescues=2 --save_every_n_epochs=50

echo "=== queue complete $(date -u) ==="
