#!/bin/bash
# Regenerate every /tmp synthetic corpus + cache after an environment
# reset (all experiment data lives on fast local disk; the repo commits
# only recipes + results). Idempotent: a dataset dir that already has
# the expected frame count is skipped, and the LBO cache is
# content-addressed per sample, so re-runs only fill gaps.
#
#   scripts/regen_corpora.sh [phase...]
#   default order: eval base cacheval cache300 shapes big cachebig
#   (so a training chain on the lm300 corpus can start while the big
#   corpus is still generating/caching behind it)
#
# Phases:
#   eval     synth_eval (24f seed3) + synth_eval56 (56f seed0) +
#            synth_evadv (56f seed0, occluders/noise/holes)
#   base     synth300 (9 objs x 300f, seed 20)
#   cacheval LBO cache for all eval sets
#   cache300 LBO cache for the synth300 train corpus
#   shapes   procedural model bank + shapes150 (32 x 150f)
#   big      synth900 (9 objs x 900f, seed 77)
#   cachebig LBO cache for the full unseen_big corpus (hours, 1 CPU)
set -uo pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
LM=/root/reference/sample-data/lm/models
ROOT=/tmp/pose6d_unseen
LOG=${REGEN_LOG:-/tmp/regen_corpora.log}
export JAX_PLATFORMS=cpu PYTHONPATH=$REPO
say() { echo "[$(date -u +%F' '%T)] $*" | tee -a "$LOG"; }

have() {  # have <ds_name> <n_frames_per_obj> <obj...>
  local name=$1 n=$2; shift 2
  for o in "$@"; do
    local d="$ROOT/${name}_obj$o/train_pbr/000000/depth"
    [ "$(ls "$d" 2>/dev/null | wc -l)" -ge "$n" ] || return 1
  done
  return 0
}

gen() {  # gen <name> <frames> <seed> <models_dir> <extra...> -- <obj...>
  local name=$1 frames=$2 seed=$3 models=$4; shift 4
  local extra=()
  while [ "$1" != "--" ]; do extra+=("$1"); shift; done
  shift
  if have "$name" "$frames" "$@"; then say "$name: present, skip"; return 0; fi
  say "$name: generating ($frames frames x $*)"
  python -m pose6d_tpu.cli.synth_data "$ROOT" --name "$name" \
    --models "$models" --objects "$@" --frames "$frames" --seed "$seed" \
    "${extra[@]}" >> "$LOG" 2>&1 || { say "$name: FAILED"; return 1; }
}

TRAIN_OBJS="1 2 4 7 9 10 13 14 15"
HELD_OUT="5 6 8 11 12"

PHASES=("$@")
[ ${#PHASES[@]} -eq 0 ] && PHASES=(eval base cacheval cache300 shapes big cachebig)
for phase in "${PHASES[@]}"; do
case "$phase" in
eval)
  gen synth_eval   24 3 "$LM" -- $HELD_OUT
  gen synth_eval56 56 0 "$LM" -- $HELD_OUT
  gen synth_evadv  56 0 "$LM" --occlude-prob 0.6 --depth-noise-mm 3 \
      --hole-frac 0.04 -- $HELD_OUT
  ;;
base)
  gen synth300 300 20 "$LM" -- $TRAIN_OBJS
  ;;
shapes)
  if [ ! -f /tmp/shapes/models_info.json ]; then
    say "shape bank: generating"
    python -m pose6d_tpu.cli.gen_shapes /tmp/shapes --count 32 --seed 0 \
      >> "$LOG" 2>&1
  fi
  gen shapes150 150 11 /tmp/shapes -- $(seq 1 32)
  ;;
big)
  gen synth900 900 77 "$LM" -- $TRAIN_OBJS
  ;;
cacheval)
  for pfx in synth_eval synth_eval56 synth_evadv; do
    for o in $HELD_OUT; do
      python -m pose6d_tpu.cli.generate_cache \
        --config config/unseen_lm300_hks_aug180.yaml --eval --workers 1 \
        eval_dataset.render_data_name=${pfx}_obj$o >> "$LOG" 2>&1
      say "cache: ${pfx}_obj$o done"
    done
  done
  ;;
cache300)
  say "cache: synth300 train corpus (2.7k samples)"
  python -m pose6d_tpu.cli.generate_cache \
    --config config/unseen_lm300_hks_aug180.yaml --workers 1 >> "$LOG" 2>&1
  say "cache: synth300 corpus done"
  ;;
cachebig)
  say "cache: unseen_big train corpus (15.6k samples)"
  python -m pose6d_tpu.cli.generate_cache \
    --config config/unseen_big_hks_aug180.yaml --workers 1 >> "$LOG" 2>&1
  say "cache: unseen_big corpus done"
  ;;
*) say "unknown phase: $phase";;
esac
done
say "REGEN_DONE ${*:-all}"
