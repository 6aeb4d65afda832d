#!/bin/bash
# Adaptive watcher for the round-4b window: when the bounce_one1 python
# (pid $1) exits, size half_one1's budget to the time left before the
# round cutoff (arg $2, epoch seconds UTC) and launch it — or skip if
# the remaining window cannot fit a run with a final test eval.
#
# Budget model (measured this session, single chip + 1 shared host CPU):
# ~19 epochs/min steady state, ~4 min compile, ~4 min test-phase
# (compile + seq-30 eval + viz). spring_one5 was already beating both
# thresholds at epoch 306 (CONVERGENCE.md), so a 350-epoch tail after
# 2 arms is the smallest credible budget; 700 after 6 arms is the
# full recipe-strength budget.
set -u
cd /root/repo
BPID=${1:?usage: half_after_bounce.sh <bounce pid> <cutoff epoch-utc>}
CUTOFF=${2:?}
echo $$ > /tmp/half_watch.pid

while kill -0 "$BPID" 2>/dev/null; do sleep 20; done
if grep -q "^test - epoch\|test - epoch" runs/bounce_one1/log.txt 2>/dev/null; then
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

LEFT=$(( CUTOFF - $(date -u +%s) ))
MIN_LEFT=$(( LEFT / 60 ))
# epochs that fit: (minutes - 8 min compile/test overhead) * 19 ep/min
FIT=$(( (MIN_LEFT - 8) * 19 ))
if   [ $FIT -ge 1600 ]; then ARMS=6; EPOCHS=700
elif [ $FIT -ge 1000 ]; then ARMS=4; EPOCHS=550   # rescue@250 + ~300 aligned tail
elif [ $FIT -ge 650 ];  then ARMS=2; EPOCHS=350   # minimum credible
else
  echo "$(date -u) half_one1 SKIPPED: only ${MIN_LEFT} min left (fit=$FIT ep)" \
    >> runs/queue_r4b_failures.log
  exit 0
fi

echo "=== $(date -u +%H:%M:%S) launching half_one1 (arms=$ARMS epochs=$EPOCHS, ${MIN_LEFT} min left) ==="
timeout $LEFT python runners/run_physics.py --save_dir=runs/half_one1 \
  --task=spring_color_half --epochs=$EPOCHS --batch_size=100 \
  --base_lr=6e-4 --autoencoder_loss=3.0 --color --seed=0 \
  --discovery_restarts=$ARMS --discovery_epochs=150 --discovery_recons_ok=4.0 \
  --aux_on_recons=3.5 --fit_physics_every=25 \
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset \
  --init_state_fit=3 --refine_recons_pos=4 --enhancers_eval_only \
  --auto_rescue=250 --max_rescues=1 --save_every_n_epochs=50 \
  > runs/half_one1_stdout.log 2>&1
rc=$?
echo "=== $(date -u +%H:%M:%S) half_one1 exit=$rc ==="
if [ $rc -eq 0 ]; then touch runs/half_one1/.done
else echo "$(date -u) half_one1 rc=$rc" >> runs/queue_r4b_failures.log; fi
