#!/bin/bash
# Round-3 serialized TPU job queue (one client at a time on the
# tunneled chip). Ordered cheapest-first so early results land even if
# a later job wedges the tunnel; the 8-scene sweep (longest) runs last
# before the final bench refreshes.
cd /root/repo
mkdir -p result

# the tunneled chip admits ONE client; even CPU-mode python processes
# dial the relay here. Wait (up to 30 min) for quiet before starting.
for i in $(seq 1 90); do
  n=$(pgrep -c python 2>/dev/null || echo 0)
  [ "$n" -le 0 ] && break
  sleep 20
done

echo "=== fused-kernel gather probe (combined vs split) ==="
PROBE_BLKS=1024 timeout 2000 python scripts/probe_fused.py \
    > result/probe_fused_cg.log 2>&1
tail -6 result/probe_fused_cg.log

echo "=== NGP bench: selection grid + mid compaction + probe accel ==="
BENCH_TIMEOUT=4200 timeout 4500 python bench.py \
    2> result/bench_ngp_r3c.log | tee result/bench_ngp_r3c.json
tail -16 result/bench_ngp_r3c.log

echo "=== frame strip profile (with occ compaction) ==="
PROBE_CMF=32,10,10 PROBE_CAP=0.38 PROBE_OCAP=0.25 PROBE_FCAP=0.23 \
    PROBE_SEL=1 timeout 2400 python scripts/probe_frame_parts.py \
    > result/probe_parts_r3b.log 2>&1
tail -12 result/probe_parts_r3b.log

echo "=== fused-MLP train ablation (freq flagship) ==="
timeout 2400 python scripts/abl_train_mlp.py \
    > result/abl_train_mlp.log 2>&1
tail -8 result/abl_train_mlp.log

echo "=== freq bench refresh ==="
BENCH_MODEL=freq timeout 1800 python bench.py \
    2> result/bench_freq_r3b.log | tee result/bench_freq_r3b.json

echo "=== 8-scene sweep (train 3k steps + evaluate each) ==="
timeout 14000 python scripts/eval_scenes.py \
    --base_cfg configs/nerf/sweep_ngp.yaml --train \
    --generate 200 --views 40 \
    --out result/scene_sweep.json \
    > result/scene_sweep.log 2>&1
tail -12 result/scene_sweep.log
cat result/scene_sweep.json 2>/dev/null

echo "=== queue done ==="
