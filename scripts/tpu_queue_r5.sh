#!/bin/bash
# Round-5 serialized TPU job queue (one client at a time on the
# tunneled chip). RE-ENTRANT: each stage is skipped when its artifact
# already exists and looks complete, so a mid-queue tunnel outage
# preserves finished stages and a re-run resumes where it left off.
# Ordered cheapest-first so early results land even if a later job
# wedges the tunnel.
#
# ADVICE r4 fixes vs the r4 queue:
# - every bench stage pins BENCH_MODEL explicitly (the best-mode hint
#   can no longer redirect a family stage to another family);
# - the stage-skip check also rejects dense-fallback emissions (a
#   failed-gate bench is retried on the next pass, matching bench.py's
#   own _last_good_metric exclusion).
cd /root/repo || exit 1
mkdir -p result

# 0-pre. machine wipes delete data/synthetic (only git content
# survives). The bench stages do NOT regenerate scenes themselves — a
# missing test split silently degrades the quality gate to the weaker
# frame-vs-dense criterion. Regenerate deterministically (seed 0 →
# bit-identical GT) before anything else. numpy-only: no TPU client.
for sc in hard med; do
  if [ ! -f "data/synthetic/$sc/transforms_train.json" ]; then
    echo "=== regenerating data/synthetic/$sc (800^2, 100 train views) ==="
    timeout 1800 python - "$sc" <<'EOF'
import sys, time
from nerf_replication_tpu.utils.synthetic_scene import generate_scene
t0 = time.time()
generate_scene("data/synthetic", scene=sys.argv[1], H=800, W=800,
               n_train=100, n_val=4, n_test=8)
print(f"{sys.argv[1]} generated in {time.time() - t0:.0f}s", flush=True)
EOF
  fi
done

# the tunneled chip admits ONE client; even CPU-mode python processes
# dial the relay here. Wait (up to 30 min) for quiet before starting.
# The permanent tunnel keeper (/root/.tpu_init.py) is NOT a client —
# exclude it, or the queue stalls the full 30 min on every launch.
other_python_busy() {
  for pid in $(pgrep -x python; pgrep -x python3); do
    if ! tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null | grep -q 'tpu_init'; then
      return 0
    fi
  done
  return 1
}
for _ in $(seq 1 90); do
  other_python_busy || break
  sleep 20
done

# stage <name> <artifact> <done-marker|-> <timeout_s> <cmd...>
#   skips when artifact exists non-empty, matches the done marker
#   ("-" = mere existence), is not a stale bench emission, and is not
#   a dense-fallback (failed-gate) emission
stage() {
  local name=$1 art=$2 marker=$3 to=$4
  shift 4
  if [ -s "$art" ] \
      && { [ "$marker" = "-" ] || grep -q "$marker" "$art" 2>/dev/null; } \
      && ! grep -q '"stale": true' "$art" 2>/dev/null \
      && ! grep -q '"kind": "dense-fallback"' "$art" 2>/dev/null; then
    echo "=== $name: $art complete, skipping ==="
    return 0
  fi
  echo "=== $name ==="
  timeout "$to" "$@"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "stage $name: rc=$rc (artifact may be partial; re-run resumes)"
  fi
  return $rc
}

# 0. retrain the NGP flagship checkpoint: data/pretrain/* (except the
#    committed freq 'hard') did not survive the machine wipe, and every
#    NGP stage below needs hard_ngp_b9. quality_run doubles as the
#    time-to-PSNR artifact for the hard scene. Re-entrant via QR_RESUME.
stage "ngp flagship train (hard b9)" data/pretrain/hard_ngp_b9/pretrain.ckpt - 3900 \
  env QR_OUT=result/quality_r5_ngp_hard.jsonl QR_CFG=configs/nerf/hard_ngp.yaml \
  QR_SCENE=hard QR_BRICKS=9 QR_MINUTES=12 QR_RESUME=1 \
  python scripts/quality_run.py

# 1. headline NGP bench — BENCH_MODEL pinned (ADVICE r4): this stage
#    must produce the NGP artifact regardless of any best-mode hint
stage "ngp bench (headline)" result/bench_ngp_r5.json render_fps 3900 \
  env BENCH_TAG=r5 BENCH_MODEL=ngp BENCH_TIMEOUT=3600 python bench.py

# 1b. freq flagship through the occupancy-raymarch path
stage "freq raymarch bench" result/bench_freq_rm_r5.json render_fps 3900 \
  env BENCH_TAG=r5 BENCH_MODEL=freq_rm BENCH_TIMEOUT=3600 python bench.py

# 1c. ladder v2: the r5 freq_rm run passed only at C=32,M=14,F=12
#     (0.230 s/frame) because 32,10,10 missed the 0.2 dB budget by
#     0.12; bench.py now inserts 32,12,10 and 32,12,12 between them.
#     This stage re-walks the new ladder (the ladder cache key includes
#     the ladder string, so the walk is fresh) and re-seeds the cache —
#     the driver's final plain bench then starts at the cached step.
stage "freq_rm bench (ladder v2)" result/bench_freq_rm_r5v2.json render_fps 3900 \
  env BENCH_TAG=r5v2 BENCH_MODEL=freq_rm BENCH_TIMEOUT=3600 python bench.py

# 1d. same reseed for the NGP family (insurance: if freq_rm ever fails
#     its gate, the driver's plain bench falls back to ngp and must
#     find a warm ladder cache to fit its 1200 s watchdog)
stage "ngp bench (ladder v2 reseed)" result/bench_ngp_r5v2.json render_fps 3900 \
  env BENCH_TAG=r5v2 BENCH_MODEL=ngp BENCH_TIMEOUT=3600 python bench.py

# 2. frame strip profile with the r3-authored optimizations
stage "frame strip profile" result/probe_parts_r5.json - 2400 \
  env PROBE_CMF=32,14,12 PROBE_SEL=1 PROBE_OCAP=0.25 PROBE_FCAP=0.23 \
  PROBE_OUT=result/probe_parts_r5.json \
  python scripts/probe_frame_parts.py

# 2b. strip profile of the freq_rm raymarch frame
stage "freq_rm strip profile" result/probe_parts_freq_r5.json - 2400 \
  env PROBE_FAMILY=freq PROBE_CMF=32,10,10 PROBE_SEL=1 PROBE_OCAP=0.25 \
  PROBE_FCAP=0.23 PROBE_OUT=result/probe_parts_freq_r5.json \
  python scripts/probe_frame_parts.py

# 2c. fused-kernel micro-sweep: blk x bf16 x combined-gather
stage "fused kernel sweep" result/probe_fused_r5.log "blk=4096 bf16=1 cg=1" 2400 \
  sh -c 'python scripts/probe_fused.py > result/probe_fused_r5.log 2>&1'

# 3. fused-MLP train ablation (VERDICT r3 item 5 / r4 item 6)
stage "fused-MLP train ablation" result/abl_train_mlp.json - 2400 \
  python scripts/abl_train_mlp.py

# 4. freq bench refresh
stage "freq bench" result/bench_freq_r5.json render_fps 2400 \
  env BENCH_TAG=r5 BENCH_MODEL=freq BENCH_TIMEOUT=2100 python bench.py

# 5. train headline: time-to-30dB on med at 800^2 (NGP + freq);
#    QR_RESUME lets an interrupted run continue from its checkpoint
stage "quality run (ngp b9)" result/quality_r5_ngp.jsonl '"event": "final"' 3600 \
  env QR_OUT=result/quality_r5_ngp.jsonl QR_CFG=configs/nerf/hard_ngp.yaml \
  QR_SCENE=med QR_BRICKS=9 QR_MINUTES=12 QR_RESUME=1 \
  python scripts/quality_run.py
stage "quality run (freq)" result/quality_r5_freq.jsonl '"event": "final"' 7200 \
  env QR_OUT=result/quality_r5_freq.jsonl QR_CFG=configs/nerf/hard.yaml \
  QR_SCENE=med QR_MINUTES=30 QR_RESUME=1 \
  python scripts/quality_run.py

# 6. 8-scene sweep (longest; runs last). eval_scenes is itself
# re-entrant (skips swept scenes, retries error rows, saves after every
# scene) so the stage always runs — a complete sweep no-ops in seconds.
echo "=== 8-scene sweep ==="
timeout 14000 python scripts/eval_scenes.py \
  --base_cfg configs/nerf/sweep_ngp.yaml \
  --train --generate 200 --views 40 --out result/scene_sweep.json

# 7. record the fastest gated family so the driver's plain
#    `python bench.py` reports it (bench.py main() reads this hint)
python - <<'EOF'
import json
best, mode = 0.0, None
for m in ("ngp", "freq", "freq_rm"):
    for tag in ("r5", "r5v2"):
        try:
            with open(f"result/bench_{m}_{tag}.json") as f:
                o = json.loads(f.readline())
            if (not o.get("stale")
                    and o.get("gate", {}).get("kind") != "dense-fallback"
                    and float(o.get("value", 0)) > best):
                best, mode = float(o["value"]), m
        except (OSError, ValueError):
            pass
if mode:
    with open("result/bench_best_mode.txt", "w") as f:
        f.write(mode + "\n")
print("best mode:", mode, best)
EOF

# 7b. headline refresh: one plain-best-mode bench with the r5 tag so
#     the committed result/bench_r5.json reflects the fastest gated
#     family (earlier per-family stages each overwrote it; the LAST
#     family to run is not necessarily the fastest). Warm caches make
#     this a short run. Skipped until the v2 reseed exists so an early
#     pass doesn't pay a cold full-ladder walk twice.
if [ -s result/bench_freq_rm_r5v2.json ] && [ -s result/bench_best_mode.txt ] \
    && ! grep -q '"stale": true' result/bench_freq_rm_r5v2.json; then
  echo "=== headline refresh (best mode, tag r5) ==="
  # a stale emission writes value 0.0 into EVERY _JSON_PATHS target —
  # back up the good per-family artifacts and restore any that a
  # mid-refresh tunnel flake turns stale
  for a in result/bench_ngp_r5.json result/bench_freq_r5.json \
           result/bench_freq_rm_r5.json result/bench_r5.json; do
    [ -s "$a" ] && ! grep -q '"stale": true' "$a" && cp "$a" "$a.bak"
  done
  timeout 3900 env BENCH_TAG=r5 BENCH_TIMEOUT=3600 python bench.py
  for a in result/bench_ngp_r5.json result/bench_freq_r5.json \
           result/bench_freq_rm_r5.json result/bench_r5.json; do
    if [ -s "$a.bak" ] && grep -q '"stale": true' "$a" 2>/dev/null; then
      echo "headline refresh: restoring $a from backup (stale overwrite)"
      cp "$a.bak" "$a"
    fi
  done
fi

echo "=== queue done ==="
ls -la result/bench_*r5* result/abl_train_mlp.json result/scene_sweep.json \
  result/quality_r5_*.jsonl 2>/dev/null

# 8. auto-commit the evidence so a late tunnel window still lands in
#    git even if the interactive session is out of turns (result/ is
#    gitignored — force-add the specific artifacts)
# the committed freq checkpoint is the only one that survived this
# round's machine wipe — commit the retrained NGP flagship too (the
# brick-encoder params are ~MBs) so round 6 never re-trains to bench
git add -f data/pretrain/hard_ngp_b9/pretrain.ckpt 2>/dev/null
git add -f result/bench_ngp_r5.json result/bench_ngp_r5.log \
  result/bench_freq_r5.json result/bench_freq_r5.log \
  result/bench_freq_rm_r5.json result/bench_freq_rm_r5.log \
  result/bench_freq_rm_r5v2.json result/bench_freq_rm_r5v2.log \
  result/bench_ngp_r5v2.json result/bench_ngp_r5v2.log \
  result/bench_r5.json result/bench_r5.log \
  result/probe_parts_r5.json result/probe_parts_freq_r5.json \
  result/probe_fused_r5.log result/abl_train_mlp.json \
  result/quality_r5_ngp.jsonl result/quality_r5_freq.jsonl \
  result/quality_r5_ngp_hard.jsonl \
  result/scene_sweep.json result/bench_best_mode.txt 2>/dev/null
if ! git diff --cached --quiet; then
  git commit -m "Round-5 TPU queue artifacts (auto-committed on queue completion)"
fi
