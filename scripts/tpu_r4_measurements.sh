#!/bin/bash
# Serialized TPU measurement queue for the round-4 decisions
# (one process owns the tunneled TPU at a time; each step tolerates
# failure). Results land in /tmp/tpur4_*.log.
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "${STEP_TIMEOUT:-1800}" "$@" > "/tmp/tpur4_${name}.log" 2>&1
  echo "rc=$?" >> "/tmp/tpur4_${name}.log"
  tail -3 "/tmp/tpur4_${name}.log"
}
# 1. DDEC pack A/B under the new conv-lowering default (expect pack=128
#    ~110 ms/fwd, pack=0 ~157 ms/fwd)
run ddec_probe python scripts/ddec_probe.py --packs 0,128 --reps 2 --scan 8
# 2. DAE pack A/B under the conv-lowering default
run dae_probe python scripts/dae_probe.py --packs 0,128 --reps 2 --scan 8
# 3. Ref-scale sampler per-op profile (the VERDICT item-4 ground truth)
run sampler_prof python scripts/stage_profile.py --stage sampler --scale ref_scale --topk 30
# 4. Same sampler with XLA-native grouped convs (A/B the round-3
#    dense-lowering claim with honest timing)
run sampler_native env DD_GROUPED_CONV_NATIVE=1 python scripts/stage_profile.py --stage sampler --scale ref_scale --topk 30
# 5. SPSI phase-init TPU timing (VERDICT item 8: BASELINE "TPU timing pending")
run fgla_probe python scripts/fgla_probe.py --reps 2
echo "ALL DONE $(date)" > /tmp/tpur4_status.log
