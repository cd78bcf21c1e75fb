#!/bin/bash
# Full-scale product-surface probe (round-5 verdict ask #5): run the real
# entry point (experiments/mnist_ode/main.py mlp.yaml) for the full 7,500
# reference steps on TPU; run it again, SIGKILL it mid-run (~step 4000,
# after the step-4000 eval checkpoint lands), restart the identical
# command (the runner auto-resumes from model_current.ckpt), and compare
# the resumed trajectory/checkpoints against the uninterrupted run
# (scripts/kill_resume_compare.py -> kill_resume_parity.json).
#
# Resume is trajectory-EXACT by design: seeded loaders fast-forward via
# skip_batches and checkpoints carry the best-eval marker (see
# tests/test_resume_parity.py for the CPU-level bitwise assertion).
set -u
cd "$(dirname "$0")/.."

CFG=experiments/mnist_ode/mlp.yaml
rm -rf checkpoints/killresume_cut logs/killresume_cut
mkdir -p logs

if grep -q "\[7500/7500\]" logs/kr_full.log 2>/dev/null && \
   ls checkpoints/killresume_full/*/model_current.ckpt >/dev/null 2>&1; then
  echo "=== arm 1: reusing completed uninterrupted run ==="
else
  rm -rf checkpoints/killresume_full logs/killresume_full
  echo "=== arm 1: uninterrupted full 7500 steps ==="
  timeout 5400 python experiments/mnist_ode/main.py "$CFG" \
    --train.expt_subdir=killresume_full > logs/kr_full.log 2>&1
  echo "uninterrupted rc=$?"
fi

echo "=== arm 2: to be killed at ~step 4000 ==="
# setsid + kill the PROCESS GROUP: killing a `timeout`/shell wrapper PID
# leaves the python child alive (observed: the "killed" arm ran to 7500
# as an orphan while the resume started beside it)
setsid python experiments/mnist_ode/main.py "$CFG" \
  --train.expt_subdir=killresume_cut > logs/kr_cut1.log 2>&1 &
CUTPID=$!
waited=0
while kill -0 "$CUTPID" 2>/dev/null; do
  if grep -q "eval @ 4000" logs/kr_cut1.log; then
    sleep 8   # let the step-4000 checkpoint write complete
    echo "killing process group $CUTPID at step ~4000"
    kill -9 -- "-$CUTPID"
    break
  fi
  sleep 10
  waited=$((waited + 10))
  if [ "$waited" -ge 5400 ]; then
    echo "watchdog: arm 2 never reached step 4000; killing"
    kill -9 -- "-$CUTPID"
    break
  fi
done
wait "$CUTPID" 2>/dev/null
echo "killed arm rc=$? (expected non-zero)"
sleep 5
if grep -q "7500/7500" logs/kr_cut1.log; then
  echo "ERROR: the to-be-killed arm ran to completion; probe invalid"
fi

echo "=== arm 2 resumed: identical command ==="
timeout 5400 python experiments/mnist_ode/main.py "$CFG" \
  --train.expt_subdir=killresume_cut > logs/kr_cut2.log 2>&1
echo "resumed rc=$?"

python scripts/kill_resume_compare.py
