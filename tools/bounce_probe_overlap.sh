#!/bin/bash
# Orphan-window probe (round 4 tail): does the slot-overlap penalty
# (--attn_overlap_loss, models/physics_net.py:485-492) break the
# two-slots-on-one-ball attractor WHEN COMBINED WITH the rescue surgery?
#
# Round-2 measured the penalty failing from scratch (CONVERGENCE.md:
# 13 runs x 4 recipes incl. slot-overlap all collapse), and round-4's
# bounce_one1 measured the rescue alone failing (two rescues, recons
# flat at ~10.4). The untested cell of that 2x2 is rescue+penalty:
# fresh disk slots on a pinned median background, with the spatial-
# exclusivity term making the collapsed optimum unstable. This probe
# resumes the collapsed bounce_one1 checkpoint, fires one more rescue
# immediately (auto_rescue=10 + empty recons history = stall guard
# passes at the first valid eval), and trains with the penalty until
# the round cutoff. Signal: valid recons breaking decisively below the
# 10.4 plateau. Informs the round-5 bounce_one2 recipe.
set -u
cd /root/repo
HPID=${1:?usage: bounce_probe_overlap.sh <half_one1 python pid> <cutoff epoch-utc>}
CUTOFF=${2:?}
echo $$ > /tmp/bounce_probe.pid

while kill -0 "$HPID" 2>/dev/null; do sleep 15; done

LEFT=$(( CUTOFF - $(date -u +%s) - 300 ))
if [ $LEFT -lt 420 ]; then
  echo "$(date -u) probe SKIPPED: only ${LEFT}s usable" >> runs/queue_r4b_failures.log
  exit 0
fi
echo "=== $(date -u +%H:%M:%S) launching bounce_probe_overlap (${LEFT}s budget) ==="
timeout -k 240 $LEFT python runners/run_physics.py \
  --save_dir=runs/bounce_probe_overlap \
  --task=bouncing_balls --epochs=1200 --batch_size=100 \
  --base_lr=3e-4 --autoencoder_loss=2.0 --color --seed=0 \
  --use_ckpt --ckpt_dir=runs/bounce_one1 --bg_lr_mult=0 \
  --attn_overlap_loss=1.0 \
  --auto_rescue=10 --max_rescues=3 \
  --aux_on_recons=3.5 --learn_frame_offset \
  --save_every_n_epochs=50 \
  > runs/bounce_probe_overlap_stdout.log 2>&1
rc=$?
echo "=== $(date -u +%H:%M:%S) bounce_probe_overlap exit=$rc ==="
