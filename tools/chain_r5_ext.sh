#!/bin/bash
# Round-5 extension chain (runs after tools/chain_r5.sh completes):
#   G. robustness rows at the REFERENCE geometry (eval-only --extra_evals:
#      pose noise at the paper's 0.4 m / 4 deg + late fusion) over the phase-A
#      256 checkpoints — extends the 64-grid robustness story to 256
#   H. 4th bracket seed pair (upperbound + disco_kd seed 4) -> disco_kd n=4,
#      then its tracking + robustness rows
# Same conventions as chain_r5.sh: run from the pinned worktree, artifacts
# accumulate in /root/repo/results/occluded256_pair.json.
set -u
cd /tmp/repo_matrix
REPO=/root/repo
R256=/tmp/v2x256_r5

phase() { echo "=== [$(date +%H:%M:%S)] PHASE $* ==="; }

phase G 256-robustness
python tools/bench_quality.py --root $R256 --grid 256 --occlusion 1 \
  --nepoch 100 --seeds 1 2 4 --extra_evals \
  --out $REPO/results/occluded256_pair.json || echo "PHASE G FAILED"

phase H 4th-bracket-seed
python tools/bench_quality.py --root $R256 --grid 256 --occlusion 1 \
  --nepoch 100 --seeds 4 --configs upperbound disco_kd \
  --max_pos 1024 --out $REPO/results/occluded256_pair.json \
  || echo "PHASE H1 FAILED"
python tools/bench_quality.py --root $R256 --grid 256 --occlusion 1 \
  --nepoch 100 --seeds 4 --track_evals \
  --out $REPO/results/occluded256_pair.json || echo "PHASE H2 FAILED"
python tools/bench_quality.py --root $R256 --grid 256 --occlusion 1 \
  --nepoch 100 --seeds 4 --extra_evals \
  --out $REPO/results/occluded256_pair.json || echo "PHASE H3 FAILED"

phase EXT-DONE
