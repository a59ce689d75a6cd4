#!/usr/bin/env bash
# Thin wrapper over the sweep runner (ref: scripts/run_experiment.sh).
# Usage: scripts/run_experiment.sh <experiment-yaml> [extra sweep args...]
set -euo pipefail

if [[ $# -lt 1 ]]; then
  echo "Usage: $0 <experiment-yaml> [--backend inprocess|subprocess] [--devices ...]" >&2
  exit 1
fi

CONFIG_FILE="$1"
shift

exec python -m clip_gp_tpu.parallel.sweep --config-file "$CONFIG_FILE" "$@"
