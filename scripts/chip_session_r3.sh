#!/bin/bash
# One-shot chip measurement session for round 3 (run when the TPU is
# reachable). Each stage is independently fault-tolerant; outputs land
# in /tmp/r3chip_* and the JSON artifacts should be folded into
# docs/RESULTS_TPU.md + ROUND3.md afterwards.
#
# Stage order is by value-at-risk: the TPU relay has a history of
# multi-hour outages, so the full bench of record runs FIRST — if the
# relay dies mid-session we still hold the headline artifact.
set -u
cd "$(dirname "$0")/.."

echo "=== 1/6 full bench of record ==="
timeout 7200 python bench.py > /tmp/r3chip_bench.json \
    2>/tmp/r3chip_bench.err
tail -1 /tmp/r3chip_bench.json

echo "=== 2/6 compiled-kernel chip CI (trajectory gates) ==="
# MBT_X64=0 is required: the chip tests skip themselves under x64
# (Mosaic lane-shift fence) and conftest enables x64 by default.
MBT_TEST_PLATFORM=tpu MBT_X64=0 timeout 3600 python -m pytest \
    tests/test_chip_kernels.py -q 2>&1 | tail -5 \
    | tee /tmp/r3chip_tests.log

echo "=== 3/6 fused method matrix (slope-timed, 1.6M) ==="
timeout 5400 python scripts/chip_fused_bench.py \
    > /tmp/r3chip_fused.json 2>/tmp/r3chip_fused.err
tail -1 /tmp/r3chip_fused.json

echo "=== 4/6 fused Chebyshev chain A/B (f32 + df32, 1.6M banded) ==="
timeout 1800 python -m mpi_bicgstab_tpu bench \
    --matrix banded:1602112 --what cheby --iters 12 \
    2>/dev/null | tee /tmp/r3chip_cheby_chain_f32.json
timeout 1800 python -m mpi_bicgstab_tpu bench \
    --matrix banded:1602112 --what cheby --dtype df32 --iters 12 \
    2>/dev/null | tee /tmp/r3chip_cheby_chain_df32.json

echo "=== 5/6 uniform-random butterfly SpMV (200k then 1.6M) ==="
timeout 3600 python - <<'EOF' 2>/dev/null | tee /tmp/r3chip_butterfly.json
import json
from mpi_bicgstab_tpu.benchmarks.runner import bench_spmv
from mpi_bicgstab_tpu.models.generators import random_diag_dominant
out = {}
for n in (200_704, 1_602_112):
    csr = random_diag_dominant(n, nnz_per_row=8, seed=0)
    r = bench_spmv(csr, "float32", devices=1, iters=60)
    out[f"uniform_{n}"] = {"nnz_per_s": round(r["spmv_nnz_per_s"], 1),
                           "layout": r.get("spmv_layout")}
print(json.dumps(out))
EOF
echo "=== 6/6 butterfly phase breakdown (where the budget went) ==="
timeout 2400 python scripts/chip_butterfly_phases.py 200704 \
    2>/dev/null | tee /tmp/r3chip_butterfly_phases.json

echo "=== chip session complete $(date) ==="
