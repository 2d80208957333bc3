#!/usr/bin/env bash
# CLIPA reduced-token pre-training on a TPU pod.
# All workers run the same SPMD program; jax.distributed initializes from
# the TPU runtime automatically (no pmap host plumbing needed).
#
# Usage: ./scripts/pre_training.sh <tpu-name> <zone> <workdir-gcs> <data-dir> \
#            [extra config args, e.g. img=H/14,res=84,batchsize=65536]
set -euo pipefail

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
WORKDIR=${3:?workdir}
DATA_DIR=${4:?data dir}
ARGS=${5:-img=H/14,res=84,token_len=8,batchsize=65536}

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone="$ZONE" --worker=all \
  --command="
    sudo pkill -f 'python.*clipa_tpu.train' || true
    source ~/clipa-venv/bin/activate
    cd ~/clipa_tpu_repo
    nohup python -m clipa_tpu.train \
      --config=clipa_tpu/configs/clipa_pretrain.py:${ARGS},data_dir=${DATA_DIR} \
      --workdir=${WORKDIR} > ~/pretrain.log 2>&1 &
  "
echo "launched; logs: ~/pretrain.log on each worker"
