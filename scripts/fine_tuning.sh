#!/usr/bin/env bash
# CLIPA unmask-tuning (full-resolution fine-tune) on a TPU pod.
# Usage: ./scripts/fine_tuning.sh <tpu-name> <zone> <workdir> <data-dir> \
#            <pretrain-params-npz> [extra args, e.g. res=224,mask_ratio=0.3]
set -euo pipefail

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
WORKDIR=${3:?workdir}
DATA_DIR=${4:?data dir}
INIT=${5:?pretrained params}
ARGS=${6:-img=H/14,res=224,mask_ratio=0.3,batchsize=32768}

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone="$ZONE" --worker=all \
  --command="
    sudo pkill -f 'python.*clipa_tpu.train' || true
    source ~/clipa-venv/bin/activate
    cd ~/clipa_tpu_repo
    nohup python -m clipa_tpu.train \
      --config=clipa_tpu/configs/clipa_finetune.py:${ARGS},init=${INIT},data_dir=${DATA_DIR} \
      --workdir=${WORKDIR} > ~/finetune.log 2>&1 &
  "
echo "launched; logs: ~/finetune.log on each worker"
