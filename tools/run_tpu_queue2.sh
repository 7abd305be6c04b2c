#!/bin/bash
# Round-3 second TPU queue (serial: ONE JAX process at a time on axon).
set -u
cd /root/repo

echo "=== q2 phase 1: profiled Groth16 c=131k ===" | tee /tmp/queue2_status.log
OZL_PROFILE=1 timeout 7200 python tools/bench_groth16.py --chain 560 \
    > /tmp/bench_groth16_prof.log 2>&1
echo "prof groth16 rc=$?" | tee -a /tmp/queue2_status.log

echo "=== q2 phase 2: roofline audit ===" | tee -a /tmp/queue2_status.log
timeout 7200 python tools/roofline_audit.py > /tmp/roofline_r03.log 2>&1
echo "roofline rc=$?" | tee -a /tmp/queue2_status.log
echo "=== q2 done ===" | tee -a /tmp/queue2_status.log
