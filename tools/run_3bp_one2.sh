#!/bin/bash
# 3bp_color single-command retry with the runs/3bp_one1 diagnosis applied
# (benchmarks/CONVERGENCE.md round 4):
#   - epochs=2300 (fits the round): the all-slot reset needs a LONG uninterrupted
#     pinned-background tail (r3's successful multi-stage run used 1000
#     epochs from a better encoder; a one-command run starts weaker).
#   - max_rescues=1 + auto_rescue=500: exactly one reset, fired late
#     enough that the encoder has ~650 epochs of training behind it;
#     3bp_one1's rescues 2 and 3 only erased post-reset progress.
#   - discovery_restarts=2: 3bp arms never discover (16.5-19.9 across 4
#     arms); two arms keep the best-basin selection at half the cost.
# ~2.9 h on the chip at 3bp_one1's measured 17.7 epochs/min.
set -u
cd /root/repo
echo $$ > /tmp/run_3bp_one2.pid
timeout 14400 python runners/run_physics.py --save_dir=runs/3bp_one2 \
  --task=3bp_color --epochs=2300 --batch_size=100 \
  --base_lr=1e-3 --autoencoder_loss=5.0 --color --seed=0 \
  --discovery_restarts=2 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=500 --max_rescues=1 --save_every_n_epochs=100 \
  > runs/3bp_one2_stdout.log 2>&1
rc=$?
echo "=== 3bp_one2 exit=$rc ($(date -u +%H:%M:%S)) ==="
[ $rc -eq 0 ] && touch runs/3bp_one2/.done
