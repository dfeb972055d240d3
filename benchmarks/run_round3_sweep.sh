#!/bin/bash
# Round-3 on-chip measurement sweep (run when the axon tunnel is up).
# Ordered most-important-first in case the tunnel drops mid-sweep.
# Each step is independently skippable; results append to /tmp/r3_sweep.log.
cd "$(dirname "$0")/.."
L=/tmp/r3_sweep.log
# xtrace into the same log so summarize_sweep.py can pair each JSON result
# with the env that produced it
exec 19>>$L
export BASH_XTRACEFD=19
set -x
date >> $L

# 1. headline configs (capture first)
timeout 1800 python bench.py >> $L 2>&1                      # b1 txt2img
SD_TPU_FUSED_MM=0 timeout 1800 python bench.py >> $L 2>&1    # b1 A/B: fused-matmul kernels off
BENCH_BATCH=4 timeout 1800 python bench.py >> $L 2>&1        # b4
BENCH_CONFIG=train_step timeout 2400 python bench.py >> $L 2>&1
BENCH_CONFIG=one_step_b32 timeout 1800 python bench.py >> $L 2>&1

# 2. new-kernel microbenches (decide gates)
timeout 1800 python benchmarks/microbench_linear.py >> $L 2>&1
timeout 1800 python benchmarks/microbench_winograd.py >> $L 2>&1

# 3. serving variants + train A/Bs
BENCH_INT8=static BENCH_BATCH=4 timeout 1800 python bench.py >> $L 2>&1
SD_TPU_Q_FUSED=0 BENCH_INT8=static BENCH_BATCH=4 timeout 1800 python bench.py >> $L 2>&1
BENCH_BATCH=8 timeout 1800 python bench.py >> $L 2>&1
SD_TPU_CONV_BWD=xla BENCH_CONFIG=train_step timeout 2400 python bench.py >> $L 2>&1
BENCH_TRAIN_REMAT=0 BENCH_CONFIG=train_step timeout 2400 python bench.py >> $L 2>&1

# 4. remaining configs
BENCH_CONFIG=sd15_img2img timeout 1800 python bench.py >> $L 2>&1
BENCH_CONFIG=sd21_txt2img_768 timeout 2400 python bench.py >> $L 2>&1

# 5. per-op tables for configs 1-3/5 (VERDICT item 6)
timeout 2400 python benchmarks/profile_e2e.py >> $L 2>&1
E2E_CONFIG=img2img timeout 2400 python benchmarks/profile_e2e.py >> $L 2>&1
E2E_CONFIG=sd21_768 timeout 2400 python benchmarks/profile_e2e.py >> $L 2>&1
E2E_CONFIG=one_step timeout 2400 python benchmarks/profile_e2e.py >> $L 2>&1

# 6. quality deltas must hold with the fused kernels in the path
timeout 3600 python benchmarks/quality_deltas.py >> $L 2>&1

date >> $L
echo SWEEP_DONE >> $L
