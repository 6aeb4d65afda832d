#!/bin/bash
# Supervisor for the round-5 session-3 bounce_one3 single-command run.
# The fresh launch (00:00-00:15 UTC) wedged at epoch ~120 on an orphaned
# device RPC when the axon tunnel dropped (the mnist_one2 outage mode,
# docs/TRAINING.md). This script re-proves the crash-resume story: wait
# for the backend, resume from the run's own checkpoint with
# --use_ckpt --resume_remaining_epochs, retry watchdog exits (75).
set -u
cd /root/repo
echo $$ > /tmp/bounce_one3_sup.pid
DEADLINE=${1:?usage: bounce_one3_supervisor.sh <deadline epoch-utc>}
left() { echo $(( DEADLINE - $(date -u +%s) )); }

probe() {
  timeout 150 python -c "
import numpy as np, jax.numpy as jnp
np.asarray(jnp.dot(jnp.ones((256,256)), jnp.ones((256,256))))
print('alive')" 2>/dev/null | grep -q alive
}

FLAGS=(--task=bouncing_balls --epochs=550 --batch_size=100
  --base_lr=3e-4 --autoencoder_loss=2.0 --color --seed=0
  --discovery_restarts=4 --discovery_epochs=150 --discovery_recons_ok=4.0
  --aux_on_recons=3.5
  --pos_consistency=1.0 --vel_anchor=1.0 --learn_frame_offset
  --init_state_fit=1 --refine_enc_pos=4 --refine_recons_pos=4
  --enhancers_eval_only --auto_rescue=150 --max_rescues=2
  --rescue_seed_color --save_every_n_epochs=50 --watchdog_secs=900
  --watchdog_floor_secs=300)

attempt=0
while [ "$attempt" -lt 5 ]; do
  until probe; do
    [ "$(left)" -lt 600 ] && { echo "$(date -u) giving up (deadline)"; exit 1; }
    echo "$(date -u +%H:%M:%S) backend down, re-probing in 45s"
    sleep 45
  done
  if [ -e runs/bounce_one3/model.ckpt ]; then
    extra=(--use_ckpt --resume_remaining_epochs --ckpt_dir=runs/bounce_one3)
  else
    extra=()
  fi
  b=$(( $(left) - 120 )); [ "$b" -gt 3600 ] && b=3600
  [ "$b" -lt 600 ] && { echo "$(date -u) window too small"; exit 1; }
  echo "=== $(date -u +%H:%M:%S) resume attempt $attempt (budget ${b}s) ==="
  timeout -k 60 "$b" python runners/run_physics.py --save_dir=runs/bounce_one3 \
    "${FLAGS[@]}" ${extra[@]+"${extra[@]}"} >> runs/bounce_one3_stdout.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) bounce_one3 exit=$rc ==="
  [ "$rc" -eq 0 ] && { touch runs/bounce_one3/.done; exit 0; }
  [ "$rc" -ne 75 ] && [ "$rc" -ne 124 ] && exit "$rc"
  attempt=$(( attempt + 1 ))
done
