#!/bin/bash
# Final unseen-category experiment: eval + pose stage for every held-out
# object with a trained checkpoint, mirroring the reference's committed
# results_on_* layout (test_RANSAC.py / test_teaser.py output formats).
#
#   scripts/run_unseen_experiment.sh <params.msgpack> <out_root> [platform] [config] [eval_prefix]
#
# Produces <out_root>/obj{5,6,8,11,12}/result_*.npz (eval handoff npzs)
# and three aggregated pose trees over all objects:
#   results_poses_RANSAC/          adaptive RANSAC + flip disambiguation + ICP
#   results_poses_RANSAC_nodisamb/ same without disambiguation (A/B ablation)
#   results_poses_GNC/             GNC-TLS + flip disambiguation + ICP
set -euo pipefail
PARAMS=$1
OUT=$2
PLATFORM=${3:-axon}
CONFIG=${4:-config/unseen_lm300.yaml}
# eval-set prefix: synth_eval (24 frames/obj, rounds 2-3),
# synth_eval56 (56 frames/obj, round 4+), synth_evadv (56 frames/obj
# with occluders + depth noise + holes)
EVAL_PREFIX=${5:-synth_eval56}
# extra dotted overrides for the eval pass, e.g.
#   EXTRA_OVERRIDES="eval.tta_rotations=4" scripts/run_unseen_experiment.sh ...
EXTRA_OVERRIDES=${EXTRA_OVERRIDES:-}

cd "$(dirname "$0")/.."
mkdir -p "$OUT/all_results"
# one process sweeps all five sets, reusing the compiled programs
# (cli/eval.py --eval-names; a fresh process per set pays ~5 min of
# compile each on the tunneled chip)
env JAX_PLATFORMS=$PLATFORM python -m pose6d_tpu.cli.eval \
  --config $CONFIG --weights "$PARAMS" --save-results \
  save_results="$OUT" $EXTRA_OVERRIDES \
  --eval-names ${EVAL_PREFIX}_obj5 ${EVAL_PREFIX}_obj6 \
    ${EVAL_PREFIX}_obj8 ${EVAL_PREFIX}_obj11 ${EVAL_PREFIX}_obj12
for obj in 5 6 8 11 12; do
  mv "$OUT/${EVAL_PREFIX}_obj$obj" "$OUT/obj$obj"
  # merge into one dir with disjoint names for the joint pose stage
  for f in "$OUT/obj$obj"/result_*.npz; do
    b=$(basename "$f" .npz)                   # result_000017
    cp "$f" "$OUT/all_results/result_obj${obj}_${b#result_}.npz"
  done
done
env JAX_PLATFORMS=$PLATFORM python -m pose6d_tpu.cli.pose ransac \
  "$OUT/all_results" "$OUT" --no-ply --disambiguate
env JAX_PLATFORMS=$PLATFORM python -m pose6d_tpu.cli.pose ransac \
  "$OUT/all_results" "$OUT" --no-ply --suffix _nodisamb
env JAX_PLATFORMS=$PLATFORM python -m pose6d_tpu.cli.pose gnc \
  "$OUT/all_results" "$OUT" --no-ply --disambiguate
echo "UNSEEN_EXPERIMENT_DONE"
