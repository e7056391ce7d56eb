#!/bin/bash
# Second round-4 TPU measurement queue (run serially after the sampler
# fused-grouped probe): DDEC per-op profile + async-offload-EMA bench with
# the packed single-transfer D2H staging.
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "${STEP_TIMEOUT:-1800}" "$@" > "/tmp/tpur4b_${name}.log" 2>&1
  echo "rc=$?" >> "/tmp/tpur4b_${name}.log"
  tail -3 "/tmp/tpur4b_${name}.log"
}
# 1. DDEC per-op TPU profile (VERDICT r3 #1: where do 172 ms/fwd go)
run ddec_prof python scripts/stage_profile.py --stage ddec --topk 30
# 2. Async host-EMA offload overhead with packed single-transfer staging
run bt_off python bench_train.py --ref-scale --iters 10 --offload-ema
echo "R4B DONE $(date)" > /tmp/tpur4b_status.log
