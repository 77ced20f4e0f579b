#!/bin/bash
# Round-5 measurement chain (VERDICT r4 "next round" tasks, in judge priority
# order). ONE orchestrator for all TPU work this round — cells serialize on
# the single chip and every harness is resumable, so a crash loses at most
# the in-flight cell (CLAUDE.md matrix rules).
#
# Run from the PINNED WORKTREE (git worktree add /tmp/repo_matrix <sha>):
#   cd /tmp/repo_matrix && nohup bash tools/chain_r5.sh > /tmp/chain_r5.log 2>&1 &
#   echo $! > /tmp/chain_r5.pid
#
# Artifacts accumulate directly in /root/repo/results/*.json (flock +
# merge-on-save makes cross-tree writes safe) so progress can be committed
# from the main checkout while the matrix runs.
set -u
REPO=/root/repo
R256=/tmp/v2x256_r5      # 256-grid occluded root (reference geometry)
R64=/tmp/v2x64_r5        # 64-grid occluded root (matrix protocol of r3/r4)
RSEG=/tmp/v2x_seg_r5     # seg occluded root

phase() { echo "=== [$(date +%H:%M:%S)] PHASE $* ==="; }

# A. Reference-geometry bracket at n>=3 (VERDICT r4 task #1): upperbound +
#    disco_kd seeds 1,2 (new rows -> n=3 with the existing seed-0 cells) and
#    the spiked disco seed-1 retrain under the best-of-epoch save policy.
#    Teacher ordering (upperbound first within each seed) is the harness's.
phase A 256-bracket
python tools/bench_quality.py --root $R256 --grid 256 --occlusion 1 \
  --nepoch 100 --seeds 1 2 --configs upperbound disco_kd disco \
  --max_pos 1024 --out $REPO/results/occluded256_pair.json \
  || echo "PHASE A FAILED"

# B. bench.py warm + record check (task #7/#10): warms the inference-graph
#    compile cache (wiped between rounds) and verifies the median-of-windows
#    number holds the record before the driver's end-of-round run.
phase B bench-warm
(cd $REPO && python bench.py) || echo "PHASE B FAILED"

# C. Seg fusion-ordering matrix (task #3): the last task with zero
#    collaboration claims. Core bracket x 3 seeds at 64-grid, occluded.
phase C seg-matrix
python tools/bench_seg_matrix.py --root $RSEG --seeds 0 1 2 \
  --configs lowerbound disco upperbound \
  --out $REPO/results/seg_matrix.json || echo "PHASE C FAILED"

# D. 64-grid matrix extensions (tasks #4, #5): who2com rows (paper Table 1)
#    and the v2v GRU-rounds ablation at the resolution-matched point.
#    Deterministic data regen (seeded by split) keeps new cells comparable
#    with the committed occluded_matrix rows.
phase D 64-grid-cells
python tools/bench_quality.py --root $R64 --grid 64 --occlusion 1 \
  --nepoch 100 --seeds 0 1 2 --configs who2com_l2 v2v_l2_r1 \
  --out $REPO/results/occluded_matrix.json || echo "PHASE D FAILED"

# E. Tracking at the reference geometry (task #6). Round-4's checkpoints died
#    with /tmp, so the MOTA rows need fresh weights: lowerbound seeds 4,5 and
#    disco seed 4 are NEW cells (no committed row is replaced); disco seed 1
#    and disco_kd seeds 1,2 come from phase A. Then SORT + CLEAR-MOT over
#    every config/seed whose best.pth exists.
phase E 256-tracking
python tools/bench_quality.py --root $R256 --grid 256 --occlusion 1 \
  --nepoch 100 --seeds 4 5 --configs lowerbound \
  --max_pos 1024 --out $REPO/results/occluded256_pair.json \
  || echo "PHASE E1 FAILED"
python tools/bench_quality.py --root $R256 --grid 256 --occlusion 1 \
  --nepoch 100 --seeds 4 --configs disco \
  --max_pos 1024 --out $REPO/results/occluded256_pair.json \
  || echo "PHASE E2 FAILED"
python tools/bench_quality.py --root $R256 --grid 256 --occlusion 1 \
  --nepoch 100 --seeds 1 2 4 5 --track_evals \
  --out $REPO/results/occluded256_pair.json || echo "PHASE E3 FAILED"

# F. KD-step stage attribution (task #8): where do the 6.8 scenes/s
#    (45.4 -> 38.6) go — MSE+tap-backward, cache gather, or the frozen
#    teacher re-forward the 256 cells actually run?
phase F kd-attribution
ROOFLINE=1 python tools/bench_train_stages.py --data $R256/train \
  --kd 1 --max_pos 1024 | tee /tmp/kd_stages_r5.json || echo "PHASE F FAILED"

phase DONE
