#!/usr/bin/env bash
# Re-run the reference's Performance.md experiment grids on this framework.
# Produces RESULT lines (grep ^RESULT) for every sweep point.
#
# Usage: scripts/run_sweeps.sh [workdir] [count] [dim]
set -euo pipefail
cd "$(dirname "$0")/.."

WORK=${1:-/tmp/nvdb_sweeps}
COUNT=${2:-500000}
DIM=${3:-768}
Q=${Q:-1000}
K=${K:-10}
mkdir -p "$WORK"

BASE="$WORK/base.vecbin"; QRY="$WORK/q.vecbin"; GT="$WORK/gt.gtbin"

echo "== data =="
# hard corpus (hierarchical Zipf topics): recall-vs-nprobe actually slopes,
# unlike the round-1 clustered generator the coarse quantizer memorized
[ -f "$BASE" ] || python -m nvdb_tpu.tools.synth "$BASE" --count "$COUNT" --dim "$DIM" --hard 48 --seed 1
[ -f "$QRY" ] || python -m nvdb_tpu.tools.make_query "$BASE" "$QRY" --q "$Q" --perturb 0.05
[ -f "$GT" ] || python -m nvdb_tpu.tools.gt_build "$BASE" "$QRY" "$GT" --k "$K"

echo "== dtype ladder (Performance.md 'section 2-3') =="
python -m nvdb_tpu.tools.convert_bf16 "$BASE" "$WORK/base_bf16.vecbin"
python -m nvdb_tpu.tools.quantize_i8 "$BASE" "$WORK/base_i8.vecbin"
for f in "$BASE" "$WORK/base_bf16.vecbin" "$WORK/base_i8.vecbin"; do
  python -m nvdb_tpu.tools.bench "$f" "$QRY" "$K" --gt "$GT" --batch-q 1
done

echo "== query batching sweep (Performance.md 'section 5') =="
for bq in 1 2 4 8 32 128; do
  python -m nvdb_tpu.tools.bench "$WORK/base_bf16.vecbin" "$QRY" "$K" --gt "$GT" --batch-q "$bq" | grep -E "^RESULT|batch_p99|Avg_query"
done

echo "== IVF-Flat nlist x nprobe grid (Performance.md 'section 7') =="
for nlist in 1024 4096; do
  IDX="$WORK/ivf_$nlist.npz"
  [ -f "$IDX" ] || python -m nvdb_tpu.tools.ivf_build "$BASE" "$IDX" --kind ivfflat --nlist "$nlist" --dtype bf16
  python -m nvdb_tpu.tools.ivf_eval "$IDX" "$BASE" "$QRY" --gt "$GT" --nprobe 8 32 128 256 | grep -E "^---|^RESULT|recall"
done

echo "== IVF-OPQ-PQ + refine grid (Performance.md 'section 8') =="
IDX="$WORK/ivfpq.npz"
[ -f "$IDX" ] || python -m nvdb_tpu.tools.ivf_build "$BASE" "$IDX" --kind ivfpq --nlist 4096 --pq-m 64
python -m nvdb_tpu.tools.ivf_eval "$IDX" "$BASE" "$QRY" --gt "$GT" \
  --nprobe 32 64 128 --refine-k 0 20 50 100 | grep -E "^---|^RESULT|recall"

echo "== HNSW-parity partition sweep (Performance.md 'section 6') =="
python -m nvdb_tpu.tools.pr_eval "$BASE" "$QRY" --gt "$GT" \
  --nprobe 4 16 64 256 --rerank-k 50 --tune 0.98 | grep -E "partitions|tuned|^RESULT|recall"
