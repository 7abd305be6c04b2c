#!/bin/bash
# Serial TPU job queue (ONE JAX process at a time — the axon tunnel wedges
# under concurrent processes). Replaces the round-3 run_tpu_queue{,2}.sh
# accretion with one parameterized runner (VERDICT r3 item 10).
#
# Usage: tools/run_tpu_queue.sh [phase ...]     (default: scale groth16)
# Phases:
#   scale      NTT 2^18-22 + MSM G1 2^16-20 + MSM G2 2^16/18 + Merkle
#   groth16    Poseidon-chain c~=2^14 setup/prove/verify (+warm)
#   groth16_1m Poseidon-chain c~=2^20 (the fused 5-MSM design point)
#   coldcache  fresh-process groth16 c~=2^17 against the populated
#              compile cache (the warm-start story)
#   drive      consolidated verify drive, all phases
#   roofline   per-kernel roofline audit
set -u
cd "$(dirname "$0")/.."

# the native witness/pairing library is a build artifact (not committed);
# fresh machines must build it before any groth16 phase
make -C native

LOG=/tmp/queue_status.log
: > "$LOG"

run_phase() {
    local name=$1; shift
    echo "=== phase $name: $* ===" | tee -a "$LOG"
    timeout "${PHASE_TIMEOUT:-7200}" "$@" > "/tmp/queue_${name}.log" 2>&1
    echo "$name rc=$?" | tee -a "$LOG"
}

for phase in "${@:-scale groth16}"; do
  case "$phase" in
    scale)      run_phase scale python tools/bench_scale.py \
                    --msm-g2-sizes 16,18,20 ;;
    groth16)    run_phase groth16 python tools/bench_groth16.py --chain 64 ;;
    groth16_1m) PHASE_TIMEOUT=14400 run_phase groth16_1m \
                    env OZL_PROFILE=1 python tools/bench_groth16.py \
                    --chain 4480 --staged ;;
    groth16_half) PHASE_TIMEOUT=14400 run_phase groth16_half \
                    env OZL_PROFILE=1 python tools/bench_groth16.py \
                    --chain 2240 ;;
    coldcache)  # three-run cold-start story at c=131k (VERDICT r4 item 5):
                # 1. populate XLA + AOT-executable caches (same process)
                # 2. fresh process, XLA persistent cache only (r4 baseline)
                # 3. fresh process, AOT-executable cache (skips tracing)
                run_phase coldpop env OZL_AOT_CACHE=/tmp/openzl_tpu_aot \
                    python tools/bench_groth16.py --chain 560 --tag warmpop
                run_phase coldcache python tools/bench_groth16.py \
                    --chain 560 --tag coldcache
                run_phase coldaot env OZL_AOT_CACHE=/tmp/openzl_tpu_aot \
                    python tools/bench_groth16.py --chain 560 --tag coldaot ;;
    drive)      run_phase drive python tools/verify_drive_all.py all ;;
    kzg)        run_phase kzg python tools/bench_kzg.py ;;
    roofline)   run_phase roofline python tools/roofline_audit.py ;;
    *) echo "unknown phase: $phase" | tee -a "$LOG" ;;
  esac
done
echo "=== queue done ===" | tee -a "$LOG"
