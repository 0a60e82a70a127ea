#!/bin/bash
# Serialized TPU job queue (one client at a time on the tunneled chip).
cd /root/repo
# wait for any running quality_run to finish
while pgrep -f "scripts/quality_run.py" > /dev/null; do sleep 20; done
echo "=== ngp train (sorted backward) ==="
timeout 1800 python scripts/bench_ngp_train.py 2> result/ngp_sorted.log | tee result/ngp_sorted.json
echo "=== ngp train (plain scatter backward, for comparison) ==="
BENCH_NGP_SORTED=0 timeout 1800 python scripts/bench_ngp_train.py 2> result/ngp_scatter.log | tee result/ngp_scatter.json
echo "=== hash probes (new implementation) ==="
PROBES=hash,mlp_pallas_enc timeout 1800 python scripts/bench_perf_probe2.py > result/probe2_hash.log 2>&1
tail -6 result/perf_probe2.jsonl
echo "=== bench.py (trained ckpt + occupancy + pallas) ==="
timeout 2500 python bench.py 2> result/bench_r2.log | tee result/bench_r2.json
echo "=== queue done ==="
