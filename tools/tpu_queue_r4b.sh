#!/bin/bash
# Round-4 session-2 queue: the two remaining single-command runs that fit
# one ~3h chip window (VERDICT r3 item 1). Ordered by win probability so a
# round-end truncation costs the least:
#   1. half_one1   — byte-for-byte the proven spring_one5 recipe
#                    (CONVERGENCE.md) on spring_color_half; same physics,
#                    same image size, highest p(win).
#   2. bounce_one1 — no learnable physics; discovery historically collapses
#                    from scratch, so 8 restart arms + rescue; eval scores
#                    with the unfolded-reflection state fit + refinement.
# 3bp_one2 (tools/run_3bp_one2.sh, ~2.4h alone) and mnist_one1 (~2.5h+,
# 64x64) do not fit alongside these; queued for round 5 (tpu_queue_r5.sh).
set -u
cd /root/repo
echo $$ > /tmp/queue_r4b.pid
R=runners/run_physics.py

wait_for() {  # wait_for <dataset file relative to data/datasets>
  local f="data/datasets/$1" waited=0
  while [ ! -f "$f" ]; do
    sleep 30; waited=$((waited+30))
    if [ $waited -gt 3600 ]; then echo "GAVE UP waiting for $f"; return 1; fi
  done
  sleep 5  # let the writer finish the compressed npz
}

run() {  # run <save_dir> <args...>
  local dir=$1; shift
  if [ -f "runs/$dir/.done" ]; then echo "skip $dir (done)"; return; fi
  echo "=== $(date -u +%H:%M:%S) launching $dir ==="
  timeout 7200 python $R --save_dir=runs/$dir "$@" \
    > runs/${dir}_stdout.log 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $dir exit=$rc ==="
  if [ $rc -eq 0 ]; then
    touch runs/$dir/.done
  else
    echo "!!! FAILED $dir rc=$rc ($(date -u +%H:%M:%S)) — see runs/${dir}_stdout.log"
    echo "$(date -u) $dir rc=$rc" >> runs/queue_r4b_failures.log
  fi
}

# 1. bouncing_balls — runs FIRST in practice: its dataset is committed
#    while the half sl30 regen is still ~25 min out on the fresh VM
#    (measured 2026-08-19); bounce-first keeps the chip busy. Arms
#    trimmed 10->8 to fit the window; recipe otherwise the r4 queue
#    entry (no fit_physics: nothing learnable to fit).
wait_for "bouncing/color_bounce_vx8_vy8_sl30_r2.npz" && \
run bounce_one1 --task=bouncing_balls --epochs=800 --batch_size=100 \
  --base_lr=3e-4 --autoencoder_loss=2.0 --color --seed=0 \
  --discovery_restarts=8 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=1 --refine_enc_pos=4 --refine_recons_pos=4 \
  --enhancers_eval_only --auto_rescue=250 --max_rescues=2 \
  --save_every_n_epochs=50

# 2. spring_color_half — the committed spring_one5 winning recipe verbatim.
wait_for "spring_color_half/color_spring_vx4_vy4_sl12_r2_k4_e6_halfpane.npz" && \
wait_for "spring_color_half/color_spring_vx4_vy4_sl30_r2_k4_e6_halfpane.npz" && \
run half_one1 --task=spring_color_half --epochs=1000 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --discovery_restarts=8 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=250 --max_rescues=2 --save_every_n_epochs=50

echo "=== queue complete $(date -u) ==="
