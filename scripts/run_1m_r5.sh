#!/usr/bin/env bash
# Round-5 1M flagship re-baseline, serialized on the relay-attached chip.
#
# Four measurements against the round-3 flagship operating point
# (np=64, refine@100, B=256, wave=1 -> .9986 @ p99 0.339, f32 store):
#   1. residual-int8 refine store at the same operating point — the
#      "paved road" re-baseline VERDICT r4 #4 asked for (same byte budget
#      as plain i8, 4x smaller than the f32 store it replaces)
#   2. f32-store control row on THIS index build (fresh corpus + index:
#      the r3 absolute numbers must be re-anchored, not assumed)
#   3. --ids-mode dma vs the key default on the residual store at deep
#      refine_k — the §4e candidate-generator granularity knob, measured
#      where a full rebuild fits the session (the 8M chain runs behind)
#   4. --force-sharded at the same point — the shard_map + all_gather
#      serving surcharge on ONE device (VERDICT r4 #3), directly
#      comparable to row 1 because everything else is held fixed.
#
# Each stage tees into bench_artifacts/ and commits when it lands.
# IMPORTANT: the relay serializes clients — never run two device
# processes at once (a concurrent probe starves behind a GB upload).
set -uo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
W=/tmp/nvdb_ivfpq_1m
A=bench_artifacts
IDX=$W/ivfpq_4096_m96.npz
RES=$W/base_res_i8_ivfpq_4096_m96.vecbin
E="python -m nvdb_tpu.tools.ivf_eval $IDX"
COMMON="--gt $W/gt.gtbin --k 10 --batch-q 256 --chained --wave 1"

land() { git add "$1" && git commit -q -m "$2" || true; }

if [ ! -s "$RES" ]; then
  python -m nvdb_tpu.tools.quantize_i8 --cpu $W/base.vecbin $RES \
      --residual $IDX 2>&1 | tail -2 || exit 1
fi

if [ ! -s $A/flagship_1m_resi8_r5.txt ]; then
  $E $RES $W/q.vecbin $COMMON --nprobe 64 --refine-k 50 100 \
      --residual-refine 2>&1 | tee $A/flagship_1m_resi8_r5.txt
  land $A/flagship_1m_resi8_r5.txt \
      "1M flagship re-baseline: residual-int8 refine store"
fi

if [ ! -s $A/flagship_1m_f32_r5.txt ]; then
  $E $W/base.vecbin $W/q.vecbin $COMMON --nprobe 64 --refine-k 100 \
      2>&1 | tee $A/flagship_1m_f32_r5.txt
  land $A/flagship_1m_f32_r5.txt \
      "1M flagship re-baseline: f32-store control row"
fi

if [ ! -s $A/flagship_1m_dma_r5.txt ]; then
  $E $RES $W/q.vecbin $COMMON --nprobe 64 --refine-k 100 256 \
      --residual-refine --ids-mode dma 2>&1 | tee $A/flagship_1m_dma_r5.txt
  land $A/flagship_1m_dma_r5.txt \
      "1M flagship: ids-mode=dma rows (exact-f32 candidate ranking)"
fi

if [ ! -s $A/sharded_serve_1dev_r5.txt ]; then
  $E $RES $W/q.vecbin $COMMON --nprobe 64 --refine-k 100 \
      --residual-refine --force-sharded 2>&1 | tee $A/sharded_serve_1dev_r5.txt
  land $A/sharded_serve_1dev_r5.txt \
      "1M flagship: force-sharded serving surcharge on one device"
fi
echo "1m chain done"
