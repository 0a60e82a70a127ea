#!/bin/bash
# Serialized TPU job queue (one client at a time on the tunneled chip).
cd /root/repo
# wait for any running quality_run to finish
while pgrep -f "scripts/quality_run.py" > /dev/null; do sleep 20; done

echo "=== med-scene quality run (lego-difficulty, 14 min budget) ==="
QR_SCENE=med QR_MINUTES=14 QR_VAL_EVERY=4 timeout 3500 \
    python scripts/quality_run.py >> result/quality_run.log 2>&1
echo "med run exit=$?"
tail -1 result/quality_run.jsonl

echo "=== ngp train (sorted backward) ==="
timeout 1800 python scripts/bench_ngp_train.py 2> result/ngp_sorted.log | tee result/ngp_sorted.json
echo "=== ngp train (plain scatter backward, for comparison) ==="
BENCH_NGP_SORTED=0 timeout 1800 python scripts/bench_ngp_train.py 2> result/ngp_scatter.log | tee result/ngp_scatter.json
echo "=== hash probes + enc-fused MLP kernel probes ==="
PROBES=hash_fwd,hash_step,mlp_pallas_enc timeout 2400 python scripts/bench_perf_probe2.py > result/probe2_hash.log 2>&1
tail -8 result/perf_probe2.jsonl
echo "=== bench.py (trained ckpt + occupancy + pallas) ==="
timeout 2500 python bench.py 2> result/bench_r2.log | tee result/bench_r2.json
echo "=== donated-scan repro (LAST: may crash the worker) ==="
timeout 1200 python scripts/repro_donated_scan.py | tee result/repro_sorted.json
echo "=== queue done ==="
