#!/bin/bash
# Watcher for the round-4b window: when the bounce_one1 python (pid $1)
# exits, mark its outcome and launch half_one1 with a window-fitting
# budget (6 arms x150 + 700 epochs ~= 57 min at spring's measured
# ~28 ep/min) — trimmed from the spring_one5 recipe (8 arms + 1000) so
# the run CANNOT be truncated before its final test eval. spring_one5
# was already winning at epoch 306; 700 keeps most of the polish tail.
set -u
cd /root/repo
BPID=${1:?usage: half_after_bounce.sh <bounce timeout pid>}
echo $$ > /tmp/half_watch.pid

while kill -0 "$BPID" 2>/dev/null; do sleep 20; done
# bounce python exited; record completion marker if the final test ran
if grep -q "^test - epoch" runs/bounce_one1/log.txt 2>/dev/null; then
  touch runs/bounce_one1/.done
else
  echo "$(date -u) bounce_one1 exited WITHOUT a test line" >> runs/queue_r4b_failures.log
fi

for f in \
  data/datasets/spring_color_half/color_spring_vx4_vy4_sl12_r2_k4_e6_halfpane.npz \
  data/datasets/spring_color_half/color_spring_vx4_vy4_sl30_r2_k4_e6_halfpane.npz; do
  while [ ! -f "$f" ]; do sleep 20; done
done
sleep 5

echo "=== $(date -u +%H:%M:%S) launching half_one1 ==="
timeout 7200 python runners/run_physics.py --save_dir=runs/half_one1 \
  --task=spring_color_half --epochs=700 --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --discovery_restarts=6 --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=250 --max_rescues=2 --save_every_n_epochs=50 \
  > runs/half_one1_stdout.log 2>&1
rc=$?
echo "=== $(date -u +%H:%M:%S) half_one1 exit=$rc ==="
if [ $rc -eq 0 ]; then touch runs/half_one1/.done
else echo "$(date -u) half_one1 rc=$rc" >> runs/queue_r4b_failures.log; fi
