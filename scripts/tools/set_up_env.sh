#!/bin/bash
# Environment bootstrap for a fresh TPU VM (the reference's
# clipa_jax/scripts/tools/{prepare_env,set_up_env}.sh equivalent).
# Creates a venv, installs pinned deps, builds the native C++ library,
# and checks the tokenizer vocab artifact is in place.
set -euo pipefail
cd "$(dirname "$0")/../.."

PYTHON="${PYTHON:-python3}"
VENV="${VENV:-$PWD/.venv}"

if [ ! -d "$VENV" ]; then
  "$PYTHON" -m venv "$VENV"
fi
. "$VENV/bin/activate"
pip install -U pip

# TPU jax first (pulls libtpu); then the rest pinned.
pip install "jax[tpu]>=0.4.30" \
  -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip install \
  "flax>=0.8" "optax>=0.2" "orbax-checkpoint>=0.5" "chex" "einops" \
  "numpy" "pillow" "ml_collections" "ml_dtypes" "absl-py" "pytest"
# torch CPU only — used by the checkpoint converter and parity tests.
pip install torch --index-url https://download.pytorch.org/whl/cpu

# Native host library (libjpeg DCT-scaled decode, WordPiece, TFRecord scan).
make -C clipa_tpu/native

# Tokenizer vocab (ships with the repo; fetch only if missing).
if [ ! -f data/vocab.txt ]; then
  echo "data/vocab.txt missing — fetch the BERT multilingual vocab" >&2
  exit 1
fi

python - <<'PY'
import jax
print("devices:", jax.devices())
PY
echo "env ready: $VENV"
