#!/bin/bash
# Serial TPU job queue (ONE JAX process at a time — the axon tunnel wedges
# under concurrent processes). Each phase logs to its own file; a phase
# failure does not stop later phases. Round-3 artifacts: SCALE_r03.json,
# HEAVY_r03.log.
set -u
cd /root/repo

echo "=== phase 1: NTT + MSM + Merkle scale ===" | tee /tmp/queue_status.log
timeout 7200 python tools/bench_scale.py \
    > /tmp/bench_scale_r03.log 2>&1
echo "bench_scale rc=$?" | tee -a /tmp/queue_status.log

echo "=== phase 2: Groth16 device bench 2^14 ===" | tee -a /tmp/queue_status.log
timeout 3600 python tools/bench_groth16.py --chain 64 \
    > /tmp/bench_groth16_c64.log 2>&1
echo "bench_groth16 c64 rc=$?" | tee -a /tmp/queue_status.log

echo "=== phase 3: Groth16 device bench 2^17 ===" | tee -a /tmp/queue_status.log
timeout 7200 python tools/bench_groth16.py --chain 560 \
    > /tmp/bench_groth16_c560.log 2>&1
echo "bench_groth16 c560 rc=$?" | tee -a /tmp/queue_status.log

echo "=== phase 4: heavy suite on axon backend ===" | tee -a /tmp/queue_status.log
OPENZL_TPU_TEST_BACKEND=axon timeout 10800 python -m pytest tests/ -m heavy \
    -q -n 0 --no-header > HEAVY_r03.log 2>&1
echo "heavy rc=$?" | tee -a /tmp/queue_status.log

echo "=== phase 5: headline bench ===" | tee -a /tmp/queue_status.log
timeout 1800 python bench.py > /tmp/bench_headline.log 2>&1
echo "bench rc=$?" | tee -a /tmp/queue_status.log
echo "=== queue done ===" | tee -a /tmp/queue_status.log
