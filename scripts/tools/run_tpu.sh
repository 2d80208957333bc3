#!/bin/bash
# Thin launch wrapper (reference: clipa_jax/scripts/tools/run_tpu.sh):
# activates the venv if present and runs the given module on this host.
#   scripts/tools/run_tpu.sh clipa_tpu.train --config=... --workdir=...
set -euo pipefail
cd "$(dirname "$0")/../.."
[ -d .venv ] && . .venv/bin/activate
if [ $# -ne 0 ]; then
  exec env TFDS_DATA_DIR="${TFDS_DATA_DIR:-}" python3 -m "$@"
fi
