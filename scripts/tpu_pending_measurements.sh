#!/bin/bash
# Serialized TPU measurement queue for the round-3 pending decisions
# (run when the axon tunnel is live; each step tolerates failure).
# Results land in /tmp/tpum_*.log + the JSON lines inside them.
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "${STEP_TIMEOUT:-1500}" "$@" > "/tmp/tpum_${name}.log" 2>&1
  echo "rc=$?" >> "/tmp/tpum_${name}.log"
  tail -3 "/tmp/tpum_${name}.log"
}
# 1. FGLA loop variants: two-kernel vs fused-iter vs spsi (decides
#    the DD_FGLA_FUSE_ITER default and the spsi story)
run fgla_probe python scripts/fgla_probe.py --reps 2
# 2. Headline bench, both scales + DDEC (with the new tap-matmul convs
#    and DAE W-pack)
STEP_TIMEOUT=3000 run bench python bench.py
# 3. Packed-conv A/B at the DDEC-dominant config
DD_PACKED_CONV_MATMUL=0 run bench_convlowering python bench.py --flagship-only
# 4. ref-scale training throughput with the EMA memory options
run bench_train python bench_train.py --ref-scale
echo "ALL DONE $(date)" >> /tmp/tpum_status.log
