#!/usr/bin/env bash
# Environment setup fan-out for a TPU pod (reference: clipa_jax/scripts/).
# Usage: ./scripts/setup_tpu_pod.sh <tpu-name> <zone> <repo-tarball-or-git-url>
set -euo pipefail

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
SRC=${3:?repo source (git url)}

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone="$ZONE" --worker=all \
  --command="
    sudo pkill -f 'python.*clipa_tpu' || true
    python3 -m venv ~/clipa-venv 2>/dev/null || true
    source ~/clipa-venv/bin/activate
    pip -q install -U 'jax[tpu]' flax optax orbax-checkpoint pillow numpy
    rm -rf ~/clipa_tpu_repo && git clone '$SRC' ~/clipa_tpu_repo
    cd ~/clipa_tpu_repo/clipa_tpu/native && make -s || echo 'native build skipped'
  "
