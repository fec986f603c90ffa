#!/bin/bash
# Final unseen-category experiment: eval + pose stage for every held-out
# object with a trained checkpoint, mirroring the reference's committed
# results_on_* layout (test_RANSAC.py / test_teaser.py output formats).
#
#   scripts/run_unseen_experiment.sh <params.msgpack> <out_root> [platform]
#
# Produces <out_root>/obj{5,6,8,11,12}/result_*.npz (eval handoff npzs),
# <out_root>/results_poses_RANSAC/{results/*.txt,avg_results.txt} and
# the same for GNC, aggregated over all objects.
set -euo pipefail
PARAMS=$1
OUT=$2
PLATFORM=${3:-axon}

cd "$(dirname "$0")/.."
mkdir -p "$OUT/all_results"
for obj in 5 6 8 11 12; do
  env JAX_PLATFORMS=$PLATFORM python -m pose6d_tpu.cli.eval \
    --config config/unseen_lm.yaml --weights "$PARAMS" --save-results \
    eval_dataset.render_data_name=synth_eval_obj$obj \
    save_results="$OUT/obj$obj"
  # merge into one dir with disjoint names for the joint pose stage
  for f in "$OUT/obj$obj"/result_*.npz; do
    b=$(basename "$f" .npz)                   # result_000017
    cp "$f" "$OUT/all_results/result_obj${obj}_${b#result_}.npz"
  done
done
env JAX_PLATFORMS=$PLATFORM python -m pose6d_tpu.cli.pose ransac \
  "$OUT/all_results" "$OUT" --no-ply
env JAX_PLATFORMS=$PLATFORM python -m pose6d_tpu.cli.pose gnc \
  "$OUT/all_results" "$OUT" --no-ply
echo "UNSEEN_EXPERIMENT_DONE"
