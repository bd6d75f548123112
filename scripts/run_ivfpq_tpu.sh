#!/usr/bin/env bash
# The flagship IVF-(O)PQ+refine study at 1M x 768 on the real TPU — the
# reference's deepest result (Performance.md:659-689, OPQ+refine recall .9743
# at total p99 0.735 ms on 500K x 384). Run on the HARD corpus (hierarchical
# Zipf topics, heavy overlap) so the recall-vs-nprobe tradeoff actually
# slopes (VERDICT r1 "What's weak" #3).
#
# Usage: scripts/run_ivfpq_tpu.sh [workdir] [count] [dim]
# Artifacts: RESULT lines on stdout; per-stage TSVs in $WORK/dbg.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

WORK=${1:-/tmp/nvdb_ivfpq_1m}
COUNT=${2:-1000000}
DIM=${3:-768}
Q=${Q:-1000}
K=${K:-10}
NLIST=${NLIST:-4096}
PQM=${PQM:-96}
mkdir -p "$WORK"

BASE="$WORK/base.vecbin"; QRY="$WORK/q.vecbin"; GT="$WORK/gt.gtbin"

echo "== data (hard corpus) =="
[ -f "$BASE" ] || python -m nvdb_tpu.tools.synth "$BASE" --count "$COUNT" \
    --dim "$DIM" --hard 48 --seed 1
[ -f "$QRY" ] || python -m nvdb_tpu.tools.make_query "$BASE" "$QRY" --q "$Q" --perturb 0.05
[ -f "$GT" ] || python -m nvdb_tpu.tools.gt_build "$BASE" "$QRY" "$GT" --k "$K"

echo "== build IVF-OPQ (nlist=$NLIST m=$PQM) =="
IDX="$WORK/ivfpq_${NLIST}_m${PQM}.npz"
[ -f "$IDX" ] || python -m nvdb_tpu.tools.ivf_build "$BASE" "$IDX" \
    --kind ivfpq --nlist "$NLIST" --pq-m "$PQM" --opq

# Residual-int8 refine store — the PAVED ROAD for int8 refine since round
# 4: same byte budget as plain i8, ~1.8x smaller quant step, measured
# strictly better at every (nprobe, rk) on the 8M ladder (BENCHMARKS §4e).
RES_I8="$WORK/base_res_i8_$(basename "$IDX" .npz).vecbin"
[ -f "$RES_I8" ] || python -m nvdb_tpu.tools.quantize_i8 --cpu \
    "$BASE" "$RES_I8" --residual "$IDX"

echo "== staged eval grid (pallas ADC + fused residual-i8 refine) =="
NVDB_DBG_DIR="$WORK/dbg" python -m nvdb_tpu.tools.ivf_eval "$IDX" "$RES_I8" "$QRY" \
    --gt "$GT" --k "$K" --nprobe 16 32 64 128 --refine-k 0 50 100 \
    --batch-q "${BQ:-8}" --residual-refine

echo "== f32-store control row (the pre-r4 default, for the store delta) =="
python -m nvdb_tpu.tools.ivf_eval "$IDX" "$BASE" "$QRY" \
    --gt "$GT" --k "$K" --nprobe 64 --refine-k 100 --batch-q "${BQ:-8}"

echo "== IVF-Flat comparison point =="
IDXF="$WORK/ivfflat_${NLIST}.npz"
[ -f "$IDXF" ] || python -m nvdb_tpu.tools.ivf_build "$BASE" "$IDXF" \
    --kind ivfflat --nlist "$NLIST" --dtype bf16
python -m nvdb_tpu.tools.ivf_eval "$IDXF" "$BASE" "$QRY" \
    --gt "$GT" --k "$K" --nprobe 8 16 32 64 128 256
