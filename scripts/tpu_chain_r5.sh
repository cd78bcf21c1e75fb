#!/bin/bash
# Round-5 serialized TPU job queue (ONE TPU job at a time — concurrent
# claims through the relay deadlock; CLAUDE.md). Each stage writes its
# own artifact; a crash/timeout in one stage doesn't lose the others.
set -u
cd "$(dirname "$0")/.."
echo "chain start: $(date -u)"

# 1. latent-family hard stand-in, seed 0 (verdict ask #1): none + shipped
#    100->10 + safe-zone 10->10 at the full 3000-step reference schedule
LRN_HARD=1 timeout 10800 python scripts/latent_nfe_study.py 3000 \
  latent_hard3000_s0.json none unbiased:100:10 unbiased:10:10 \
  > /tmp/lat_s0.log 2>&1
echo "stage1 latent s0 rc=$? $(date -u)"

# 2. full-scale kill/resume on the real entry point (ask #5)
bash scripts/kill_resume_probe.sh > /tmp/killresume.log 2>&1
echo "stage2 killresume rc=$? $(date -u)"

# 3. CIFAR full 31,250-step reference schedule (ask #2), de-confounded
#    bn_eval_stats=batch protocol + default-semantics eval alongside;
#    arms as separate invocations (crash isolation on multi-hour runs)
LRN_HARD=1 LRN_BN_EVAL=batch LRN_EVAL_EVERY=2500 LRN_SUBDIR_TAG=none \
  timeout 14400 python scripts/cifar_nfe_study.py 31250 \
  cifar_full31250_hard_none.json none > /tmp/cifar_none.log 2>&1
echo "stage3 cifar none rc=$? $(date -u)"

LRN_HARD=1 LRN_BN_EVAL=batch LRN_EVAL_EVERY=2500 LRN_SUBDIR_TAG=unb \
  timeout 10800 python scripts/cifar_nfe_study.py 31250 \
  cifar_full31250_hard_unb.json unbiased:2.5:2.5 > /tmp/cifar_unb.log 2>&1
echo "stage4 cifar unbiased rc=$? $(date -u)"

# 5. fixtures smoke now verifies LEARNING (ask #6)
timeout 5400 python scripts/real_parity.py --fixtures-smoke \
  --out real_parity_smoke_r5.json > /tmp/parity_smoke.log 2>&1
echo "stage5 parity smoke rc=$? $(date -u)"

# 6. latent seed 1 (2 arms)
LRN_HARD=1 LRN_SEED=1 timeout 7200 python scripts/latent_nfe_study.py 3000 \
  latent_hard3000_s1.json none unbiased:100:10 > /tmp/lat_s1.log 2>&1
echo "stage6 latent s1 rc=$? $(date -u)"

# 7. bench sample with the new conv row + device prefetch in-tree
timeout 3600 python bench.py > /tmp/bench_r5_sample.log 2>&1
echo "stage7 bench rc=$? $(date -u)"
echo "chain done: $(date -u)"
