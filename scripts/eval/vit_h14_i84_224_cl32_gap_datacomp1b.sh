#!/bin/bash
# Reproduces the reference recipe clipa_torch/scripts/test/vit_h14_i84_224_cl32_gap_datacomp1b.sh
# on TPU through the JAX eval CLI. Published number: see BASELINE.md.
CKPT="${CKPT:-/path/to/vit_h14_i84_224_cl32_gap_datacomp1b.pt}"
IMNET="${IMNET:-/path/to/imagenet_val_tfrecords}"
python3 -m clipa_tpu.tools.eval_zeroshot \
    --model ViT-H-14-CL32-GAP-BigVision \
    --pretrained "$CKPT" \
    --data-dir "$IMNET" \
    --vocab data/vocab.txt \
    --image-size 224 \
    --square-resize --batch-size 256 \
    --precision bfloat16
