#!/usr/bin/env bash
# Timed 2-process sharded serving (VERDICT r4 #8): the DCN-analogue number.
#
# test_multiprocess.py proves 2-process ivf_eval --shards N is CORRECT;
# this script measures what the cross-process runtime COSTS. Same data,
# same index, same SPMD program (shard_map ADC + sharded refine + all_gather
# merge over a 2-way row mesh), three runtimes:
#
#   A  single process, mesh over 2 in-process virtual CPU devices
#      (collectives = shared-memory transfers — the ICI analogue)
#   B  2 OS processes x 1 device, one jax.distributed runtime
#      (collectives cross the process boundary through the distributed
#      client — the DCN analogue this host can express)
#
# B's delta over A upper-bounds the cross-process transport cost; on this
# single-core host it also includes 2-way core timesharing, so sizes are
# kept small enough that per-batch compute is ms-scale and the delta is
# dominated by runtime/transport, not arithmetic. RESULT lines land in
# bench_artifacts/ for BENCHMARKS §6.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

W=${W:-/tmp/nvdb_mp}
N=${N:-65536}
D=${D:-256}
Q=${Q:-512}
K=${K:-10}
NLIST=${NLIST:-128}
NPROBE=${NPROBE:-16}
RK=${RK:-64}
BQ=${BQ:-64}
OUT=${OUT:-bench_artifacts/multiproc_serve_r5.txt}
mkdir -p "$W" bench_artifacts

BASE="$W/base.vecbin"; QRY="$W/q.vecbin"; GT="$W/gt.gtbin"
IDX="$W/ivfpq_${NLIST}.npz"

[ -s "$BASE" ] || python -m nvdb_tpu.tools.synth --cpu "$BASE" \
    --count "$N" --dim "$D" --hard 24 --seed 1
[ -s "$QRY" ] || python -m nvdb_tpu.tools.make_query --cpu "$BASE" "$QRY" \
    --q "$Q" --perturb 0.05 > /dev/null
[ -s "$GT" ] || python -m nvdb_tpu.tools.gt_build --cpu "$BASE" "$QRY" "$GT" \
    --k "$K"
[ -s "$IDX" ] || python -m nvdb_tpu.tools.ivf_build --cpu "$BASE" "$IDX" \
    --kind ivfpq --nlist "$NLIST" --pq-m 32 --train "$N"

EVAL_ARGS=("$IDX" "$BASE" "$QRY" --gt "$GT" --k "$K" --nprobe "$NPROBE"
           --refine-k "$RK" --batch-q "$BQ" --chained --cpu --shards 2)

{
echo "=== A: single process, 2 virtual devices (in-process collectives) ==="
XLA_FLAGS=--xla_force_host_platform_device_count=2 \
  python -m nvdb_tpu.tools.ivf_eval "${EVAL_ARGS[@]}" | grep -E "RESULT" \
  | sed 's/$/ runtime=1proc/'

echo "=== B: 2 processes x 1 device, jax.distributed (cross-process) ==="
PORT=$(python - <<'EOF'
import socket
s = socket.socket(); s.bind(("localhost", 0)); print(s.getsockname()[1])
EOF
)
pids=()
for RANK in 0 1; do
  NVDB_COORD="localhost:$PORT" NVDB_NPROC=2 NVDB_PROC_ID=$RANK \
  XLA_FLAGS=--xla_force_host_platform_device_count=1 \
    python -m nvdb_tpu.tools.ivf_eval "${EVAL_ARGS[@]}" \
    > "$W/rank$RANK.out" 2>&1 &
  pids+=($!)
done
for p in "${pids[@]}"; do wait "$p"; done
grep -E "RESULT" "$W/rank0.out" | sed 's/$/ runtime=2proc/'
} | tee "$OUT"
