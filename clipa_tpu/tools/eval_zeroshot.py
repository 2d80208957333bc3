"""Eval-only CLI: zero-shot ImageNet for a checkpoint.

Mirrors the reference's scripts/test/*.sh reproduction flow through the
open_clip-compatible facade:

  python -m clipa_tpu.tools.eval_zeroshot \
      --model ViT-H-14-CL32-GAP-BigVision --pretrained /path/params.npz \
      --data-dir /data/imagenet_val --vocab /path/vocab.txt \
      --image-size 336 --square-resize
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", required=True)
    p.add_argument("--pretrained", required=True)
    p.add_argument("--data-dir", required=True,
                   help="dir of imagenet val tfrecords ({image,label})")
    p.add_argument("--vocab", required=True)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--square-resize", action="store_true",
                   help="square_resize_only eval transform (336px ckpts)")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--precision", default="bfloat16")
    args = p.parse_args(argv)

    from clipa_tpu.compat import openclip
    from clipa_tpu.evaluators import zeroshot
    from clipa_tpu.parallel import create_mesh
    from clipa_tpu.train import step as step_lib

    model = openclip.create_model(args.model, args.pretrained,
                                  force_image_size=args.image_size,
                                  precision=args.precision)
    mesh = create_mesh(fsdp=1)

    def predict_fn(params, image=None, text=None):
        return model.model.apply({"params": params}, image, text)

    res = model.image_size
    pp_img = (f'decode|resize({res}, method="bilinear")'
              if args.square_resize else
              f'decode|resize_small({res}, method="bilinear")|'
              f'central_crop({res})')
    # BigVision-style CLIPA checkpoints trained with ImageNet (vgg) stats;
    # open_clip-style ones with the OpenAI CLIP stats
    # (clipa_torch/open_clip/constants.py, transform.py defaults).
    pp_img += "|vgg_value_range" if "BigVision" in args.model else \
        "|openai_value_range"
    ctx = model.context_length
    ev = zeroshot.Evaluator(
        predict_fn, mesh, batch_size=args.batch_size,
        dataset_names=["imagenet2012"],
        data_dir=args.data_dir,
        pp_img=pp_img,
        pp_txt=(f'bert_tokenize(inkey="texts", max_len={ctx}, '
                f'vocab_path="{args.vocab}", sample_if_multi=False)'))
    for key, value in ev.run(model.params):
        print(f"{key}: {value:.4f}")


if __name__ == "__main__":
    main()
