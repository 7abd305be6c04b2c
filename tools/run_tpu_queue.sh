#!/bin/bash
# Serial TPU job queue (ONE JAX process at a time — the axon tunnel wedges
# under concurrent processes). Each phase logs to its own file; a phase
# failure does not stop later phases.
set -u
cd /root/repo

echo "=== phase 1: MSM scale refresh ===" | tee /tmp/queue_status.log
timeout 5400 python tools/bench_scale.py --skip-ntt \
    > /tmp/bench_scale_msm.log 2>&1
echo "bench_scale rc=$?" | tee -a /tmp/queue_status.log

echo "=== phase 2: Groth16 device bench ===" | tee -a /tmp/queue_status.log
timeout 3600 python tools/bench_groth16.py --chain 64 \
    > /tmp/bench_groth16.log 2>&1
echo "bench_groth16 rc=$?" | tee -a /tmp/queue_status.log

echo "=== phase 3: heavy suite on axon backend ===" | tee -a /tmp/queue_status.log
OPENZL_TPU_TEST_BACKEND=axon timeout 7200 python -m pytest tests/ -m heavy \
    -q -n 0 --no-header > HEAVY_r02.log 2>&1
echo "heavy rc=$?" | tee -a /tmp/queue_status.log

echo "=== phase 4: fast suite (CPU mesh) ===" | tee -a /tmp/queue_status.log
timeout 2700 python -m pytest tests/ -q > /tmp/fast_suite.log 2>&1
echo "fast rc=$?" | tee -a /tmp/queue_status.log
echo "=== queue done ===" | tee -a /tmp/queue_status.log
