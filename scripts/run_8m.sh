#!/usr/bin/env bash
# The 8M x 768 single-chip flagship: IVF-OPQ-PQ + int8-store refine.
#
# Turns docs/SCALE_100M.md's projections into measured numbers on ONE chip:
# the ANN index (nlist=16384, pad_factor=2 -> lcap=1024, the same ADC kernel
# shape as the 1M flagship) plus the int8 refine payload (6.2 GB) both live
# in HBM; refine re-ranks dequantized int8 rows against exact f32 GT — the
# exact configuration the 100M plan runs per chip (refine against the int8
# payload, docs/SCALE_100M.md).
#
# Stages are idempotent (skip when the output exists) because the data
# build is hours-scale. Run stage by stage:
#   scripts/run_8m.sh data    # host: synth 8M hard corpus + queries + i8
#   scripts/run_8m.sh gt      # device: chunked exact f32 GT (8 x 1M chunks)
#   scripts/run_8m.sh build   # device+host: IVF-OPQ-PQ train/encode/pack
#   scripts/run_8m.sh eval    # device: chained serving eval with tail
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

W=${W:-/tmp/nvdb8m}
N=${N:-8000000}
D=${D:-768}
Q=${Q:-1000}
K=${K:-10}
NLIST=${NLIST:-16384}
mkdir -p "$W"

BASE="$W/base.vecbin"; QRY="$W/q.vecbin"; I8="$W/base_i8.vecbin"
GT="$W/gt.gtbin"; IDX="$W/ivfpq_${NLIST}.npz"

stage=${1:-all}

if [[ $stage == data || $stage == all ]]; then
  [ -s "$BASE" ] || python -m nvdb_tpu.tools.synth --cpu "$BASE" \
      --count "$N" --dim "$D" --hard 48 --seed 1
  [ -s "$QRY" ] || python -m nvdb_tpu.tools.make_query --cpu "$BASE" "$QRY" \
      --q "$Q" --perturb 0.05
  # SKIP_I8=1 skips the plain-i8 store: the residual-i8 store (resq stage)
  # is the int8 serving default since round 4, so runs that only serve the
  # residual + bf16 ladder (e.g. the 12.5M per-chip config) save the bytes.
  [ "${SKIP_I8:-0}" = 1 ] || [ -s "$I8" ] || \
      python -m nvdb_tpu.tools.quantize_i8 --cpu "$BASE" "$I8"
fi

if [[ $stage == gt || $stage == all ]]; then
  # --row-chunk 0 = auto: 24.6 GB working set -> 1M-row chunked device scans
  [ -s "$GT" ] || python -m nvdb_tpu.tools.gt_build "$BASE" "$QRY" "$GT" \
      --k "$K"
fi

if [[ $stage == build || $stage == all ]]; then
  # pad_factor=2 over mean list N/nlist=488 -> lcap=1024: the 1M flagship's
  # ADC kernel shape (m=96, lcap=1024), so the TPU compile cache carries over.
  # CR>0: corpus-scale Lloyd + dead-centroid reseeding (one corpus upload
  # per pass; reclaims the ~11% of lists the 1M subsample left dead at 8M)
  [ -s "$IDX" ] || python -m nvdb_tpu.tools.ivf_build "$BASE" "$IDX" \
      --kind ivfpq --nlist "$NLIST" --pq-m 96 --opq \
      --pad-factor 2.0 --spill-candidates 8 --train 1000000 \
      --corpus-refine "${CR:-0}"
fi

RES_I8="$W/base_res_i8_$(basename "$IDX" .npz).vecbin"

if [[ $stage == resq || $stage == all ]]; then
  # Residual-int8 refine store (round 4): quantize residuals vs THIS
  # index's coarse centroids — ~1.8x smaller amax, so the same 6.2 GB
  # byte budget ranks finer (refine ceiling .9760 plain -> .9900+).
  [ -s "$RES_I8" ] || python -m nvdb_tpu.tools.quantize_i8 --cpu \
      "$BASE" "$RES_I8" --residual "$IDX"
fi

if [[ $stage == eval || $stage == all ]]; then
  # Refine store = an int8 vecbin (6.2 GB in HBM vs 24.6 f32 / 12.3 bf16):
  # recall is still scored against the exact f32 GT, so the i8-dequant
  # rerank's ranking economy is measured, not assumed. RES=1 (default when
  # the residual store exists) reranks residual codes vs the index's coarse
  # centroids at the same byte budget.
  # IDS_MODE=dma forces exact-f32 in-kernel candidate ranking (no bf16
  # packed-key granularity) — the last-.0045 knob of BENCHMARKS §4e.
  IM=()
  [ -n "${IDS_MODE:-}" ] && IM=(--ids-mode "$IDS_MODE")
  if [[ "${RES:-auto}" != 0 && -s "$RES_I8" ]]; then
    python -m nvdb_tpu.tools.ivf_eval "$IDX" "$RES_I8" "$QRY" --gt "$GT" \
        --k "$K" --nprobe ${NPROBE:-64 128} --refine-k ${RK:-50 100} \
        --batch-q "${BQ:-64}" --chained --wave "${WAVE:-4}" \
        --residual-refine "${IM[@]}"
  else
    python -m nvdb_tpu.tools.ivf_eval "$IDX" "$I8" "$QRY" --gt "$GT" \
        --k "$K" --nprobe ${NPROBE:-64 128} --refine-k ${RK:-50 100} \
        --batch-q "${BQ:-64}" --chained --wave "${WAVE:-4}" "${IM[@]}"
  fi
fi
