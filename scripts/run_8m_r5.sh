#!/usr/bin/env bash
# Round-5 unattended 8M rebuild + the BENCHMARKS §4e ids-mode grid.
#
# The round-4 artifacts (corpus, GT, index) lived in /tmp and were wiped
# between sessions; everything must be rebuilt before the §4e "next
# table" (ids-mode dma at deep refine_k) can be measured. The chain is
# hours-scale on the relay-attached chip, so each stage tees its log into
# bench_artifacts/ and commits it the moment it lands — a cut session
# loses only the stage in flight, never a finished measurement.
#
# Stages honor a stop sentinel (/tmp/STOP_8M): touch it to make the chain
# exit cleanly before the next stage (used to free the chip for the
# end-of-round bench.py run).
#
# Build uses CR=1 (single corpus-scale Lloyd pass + dead-centroid
# reseeding): round 4 measured pass 1 reseeding 1,844 dead lists and
# pass 2 finding ZERO dead, so the second pass's 1,418 s buys only the
# final settle of the reseeded 11% — the coverage probe below verifies
# what CR=1 actually delivers before the grid interprets recall.
set -uo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
W=/tmp/nvdb8m
A=bench_artifacts
IDX=$W/ivfpq_16384.npz
GT=$W/gt.gtbin
QRY=$W/q.vecbin
BF16=$W/base_bf16.vecbin
RES=$W/base_res_i8_ivfpq_16384.vecbin

stop() { [ -e /tmp/STOP_8M ] && { echo "STOP sentinel — exiting before $1"; exit 0; }; return 0; }
land() { # land <artifact> <msg>
  git add "$1" && git commit -q -m "$2" || true
}

stop gt
if [ ! -s "$GT" ]; then
  python -m nvdb_tpu.tools.gt_build $W/base.vecbin $QRY $GT --k 10 \
      2>&1 | tee $A/gt_8m_r5.txt || exit 1
  land $A/gt_8m_r5.txt "8M rebuild: exact f32 ground truth (chunked device scan)"
fi

stop build
if [ ! -s "$IDX" ]; then
  python -m nvdb_tpu.tools.ivf_build $W/base.vecbin $IDX \
      --kind ivfpq --nlist 16384 --pq-m 96 --opq \
      --pad-factor 2.0 --spill-candidates 8 --train 1000000 \
      --corpus-refine 1 2>&1 | tee $A/flagship_8m_build_r5.txt || exit 1
  land $A/flagship_8m_build_r5.txt "8M rebuild: IVF-OPQ-PQ index, corpus-refine 1"
fi

stop resq
if [ ! -s "$RES" ]; then
  python -m nvdb_tpu.tools.quantize_i8 --cpu $W/base.vecbin $RES \
      --residual $IDX 2>&1 | tail -3 || exit 1
fi

# Host-side ceiling check: CR=1's coverage decides how to read the grid.
if [ ! -s $A/coverage_8m_r5.txt ]; then
  python scripts/coverage_probe.py $IDX $QRY $GT --nprobe 64 96 128 \
      2>&1 | tee $A/coverage_8m_r5.txt
  land $A/coverage_8m_r5.txt "8M rebuild: coverage ceiling of the CR=1 quantizer"
fi

# The grid, most valuable row first. One invocation per store (the store
# upload through the relay dominates setup; sweep nprobe inside it).
stop eval-bf16-dma
if [ ! -s $A/flagship_8m_dma_bf16_r5.txt ]; then
  python -m nvdb_tpu.tools.ivf_eval $IDX $BF16 $QRY --gt $GT \
      --k 10 --nprobe 128 96 --refine-k 256 --batch-q 64 --chained --wave 4 \
      --ids-mode dma 2>&1 | tee $A/flagship_8m_dma_bf16_r5.txt
  land $A/flagship_8m_dma_bf16_r5.txt "8M ids-mode=dma grid: bf16 refine store"
fi

stop eval-resi8-dma
if [ ! -s $A/flagship_8m_dma_resi8_r5.txt ]; then
  python -m nvdb_tpu.tools.ivf_eval $IDX $RES $QRY --gt $GT \
      --k 10 --nprobe 128 96 --refine-k 256 --batch-q 64 --chained --wave 4 \
      --residual-refine --ids-mode dma 2>&1 | tee $A/flagship_8m_dma_resi8_r5.txt
  land $A/flagship_8m_dma_resi8_r5.txt "8M ids-mode=dma grid: residual-int8 refine store"
fi

stop eval-bf16-key
if [ ! -s $A/flagship_8m_key_bf16_r5.txt ]; then
  python -m nvdb_tpu.tools.ivf_eval $IDX $BF16 $QRY --gt $GT \
      --k 10 --nprobe 128 96 --refine-k 256 --batch-q 64 --chained --wave 4 \
      2>&1 | tee $A/flagship_8m_key_bf16_r5.txt
  land $A/flagship_8m_key_bf16_r5.txt "8M grid: key-mode control on the same CR=1 index"
fi
echo "chain done"
