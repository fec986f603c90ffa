#!/bin/bash
# Preemptible-training window chain (docs/DESIGN.md "Preemptible
# training"): drives one logical training run as a chain of short-lived
# processes, each capped at a global step count, resuming losslessly
# from the full-TrainState checkpoint. Survives tunnel outages (backend
# probe + metrics watchdog), wall deadlines, and host reclaim — the
# normal operating conditions for tunneled/preempted TPU time.
#
# Usage:
#   scripts/train_chain.sh --config config/foo.yaml --run /path/run_dir \
#     [--deadline +7200|EPOCHSECONDS] [--window-steps 1800] \
#     [--sync runs/foo] [--platform cpu] [--probe-backend] \
#     [--extra "train.augment_rotation_deg=60 ..."] [--log FILE]
#
# Control files (checked between AND during windows):
#   <run>/STOP   end the chain after killing the current window
#   <run>/PAUSE  idle without launching windows until removed
#
# The chain is stateless: all progress lives in <run>/ckpt (latest.json
# + full-TrainState msgpacks), so a killed chain restarts with the same
# command line. --sync mirrors metrics + the 2 newest checkpoints to a
# persistent directory (e.g. inside the repo) after every window.
set -uo pipefail

CONFIG="" RUN="" DEADLINE="" WINDOW=1800 SYNC="" PLATFORM="" EXTRA=""
PROBE=0 LOG=""
while [ $# -gt 0 ]; do
  case "$1" in
    --config) CONFIG=$2; shift 2;;
    --run) RUN=$2; shift 2;;
    --deadline) DEADLINE=$2; shift 2;;
    --window-steps) WINDOW=$2; shift 2;;
    --sync) SYNC=$2; shift 2;;
    --platform) PLATFORM=$2; shift 2;;
    --probe-backend) PROBE=1; shift;;
    --extra) EXTRA=$2; shift 2;;
    --log) LOG=$2; shift 2;;
    *) echo "unknown arg: $1" >&2; exit 2;;
  esac
done
[ -n "$CONFIG" ] && [ -n "$RUN" ] || { echo "--config and --run required" >&2; exit 2; }

REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
LOG=${LOG:-$RUN/chain.log}
mkdir -p "$RUN"
[ -n "$SYNC" ] && mkdir -p "$SYNC"
case "$DEADLINE" in
  "") DEADLINE=$(( $(date +%s) + 86400 ));;
  +*) DEADLINE=$(( $(date +%s) + ${DEADLINE#+} ));;
esac
# CPU platform must keep the TPU plugin off sys.path (the plugin pins
# jax_platforms at import and hangs backend init when the tunnel is
# down) — PYTHONPATH=$REPO only, no site extras.
ENVPRE=""
if [ "$PLATFORM" = cpu ]; then
  ENVPRE="env PYTHONPATH=$REPO JAX_PLATFORMS=cpu"
fi

say() { echo "[$(date -u +%F' '%T)] $*" >> "$LOG"; }

backend_up() {
  [ "$PROBE" = 1 ] || return 0
  # killable probe: a hard-down tunnel hangs jax.devices() forever
  timeout 150 $ENVPRE python -c "import jax; jax.devices()[0]" >/dev/null 2>&1
}

sync_state() {
  [ -n "$SYNC" ] || return 0
  cp -f "$RUN/metrics.jsonl" "$SYNC/" 2>/dev/null
  cp -f "$RUN/ckpt/latest.json" "$SYNC/" 2>/dev/null
  ls -t "$RUN"/ckpt/ckpt_*.msgpack 2>/dev/null | head -2 \
    | xargs -I{} cp -f {} "$SYNC/" 2>/dev/null
  ls -t "$SYNC"/ckpt_*.msgpack 2>/dev/null | tail -n +3 | xargs -r rm -f
}

say "chain start: config=$CONFIG run=$RUN window=$WINDOW deadline=$(date -u -d @"$DEADLINE" +%T)"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  [ -e "$RUN/STOP" ] && { say "STOP sentinel"; break; }
  [ -e "$RUN/PAUSE" ] && { sleep 60; continue; }
  if ! backend_up; then say "backend down, waiting"; sleep 90; continue; fi
  STEP=$(python -c "import json;print(json.load(open('$RUN/ckpt/latest.json'))['step'])" 2>/dev/null || echo 0)
  CAP=$(( STEP + WINDOW ))
  say "window from $STEP cap $CAP"
  $ENVPRE python -m pose6d_tpu.cli.train --config "$CONFIG" \
    train.resume_dir="$RUN" train.max_steps=$CAP $EXTRA >> "$LOG" 2>&1 &
  TPID=$!
  WSTART=$(date +%s)
  while kill -0 $TPID 2>/dev/null; do
    sleep 60
    NOW=$(date +%s)
    AGE=$(( NOW - $(stat -c %Y "$RUN/metrics.jsonl" 2>/dev/null || echo "$WSTART") ))
    # 15 min compile grace, then 7 min of silent metrics = hung backend
    if [ $(( NOW - WSTART )) -gt 900 ] && [ "$AGE" -gt 420 ]; then
      say "WATCHDOG: no metrics for ${AGE}s, killing window"
      kill $TPID 2>/dev/null; sleep 5; kill -9 $TPID 2>/dev/null; break
    fi
    if [ "$NOW" -gt "$DEADLINE" ] || [ -e "$RUN/STOP" ] || [ -e "$RUN/PAUSE" ]; then
      say "window cut (deadline/sentinel)"
      kill $TPID 2>/dev/null; sleep 5; kill -9 $TPID 2>/dev/null; break
    fi
  done
  wait $TPID 2>/dev/null
  sync_state
  sleep 5
done
sync_state
say "CHAIN_DONE"
