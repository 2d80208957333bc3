"""Generates the committed golden checkpoint-parity fixture.

Run once (offline):  python tests/golden/generate.py

Writes:
  golden_sd.bin  — an open_clip-format torch state dict for golden_tiny.json,
                   with weights drawn from a fixed numpy seed (independent of
                   our flax init code).
  fixture.npz    — fixed inputs (uint8 images, tokenized class names) and the
                   expected outputs (embeddings, logits, argmax predictions),
                   computed with a float64 torch forward written from the
                   open_clip SPEC (clipa_torch/open_clip/model.py:452-515,
                   transformer.py big_vision_gap/big_vision_last pooling) —
                   NOT with clipa_tpu model code.

tests/test_golden_parity.py then asserts the FULL user chain —
create_model_and_transforms -> preprocess -> tokenize -> encode ->
zero-shot argmax — reproduces these numbers. This is the strongest offline
stand-in for the "within 0.2% of released checkpoints" claim (PARITY.md
documents what remains unprovable without the released weights).
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

CLASS_NAMES = ["cat", "dog", "house", "tree"]
PROMPT = "a photo of a {}"

W, HEADS, LAYERS, EMBED, PATCH, RES, CTX, VOCAB = 64, 2, 2, 32, 16, 32, 8, 64
OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)


def build_state_dict(rng: np.random.RandomState) -> dict:
    def w(*shape, scale=0.05):
        return rng.randn(*shape).astype(np.float32) * scale

    sd = {
        "visual.conv1.weight": w(W, 3, PATCH, PATCH),
        "visual.class_embedding": w(W),
        "visual.positional_embedding": w((RES // PATCH) ** 2 + 1, W),
        "visual.ln_post.weight": np.ones(W, np.float32),
        "visual.ln_post.bias": np.zeros(W, np.float32),
        "visual.proj": w(W, EMBED),
        "token_embedding.weight": w(VOCAB, W),
        "positional_embedding": w(CTX, W),
        "ln_final.weight": np.ones(W, np.float32),
        "ln_final.bias": np.zeros(W, np.float32),
        "text_projection": w(W, EMBED),
        "logit_scale": np.float32(np.log(1 / 0.07)),
    }
    for tower in ("visual.transformer", "transformer"):
        for i in range(LAYERS):
            b = f"{tower}.resblocks.{i}"
            sd[f"{b}.ln_1.weight"] = np.ones(W, np.float32)
            sd[f"{b}.ln_1.bias"] = np.zeros(W, np.float32)
            sd[f"{b}.attn.in_proj_weight"] = w(3 * W, W)
            sd[f"{b}.attn.in_proj_bias"] = np.zeros(3 * W, np.float32)
            sd[f"{b}.attn.out_proj.weight"] = w(W, W)
            sd[f"{b}.attn.out_proj.bias"] = np.zeros(W, np.float32)
            sd[f"{b}.ln_2.weight"] = np.ones(W, np.float32)
            sd[f"{b}.ln_2.bias"] = np.zeros(W, np.float32)
            sd[f"{b}.mlp.c_fc.weight"] = w(4 * W, W)
            sd[f"{b}.mlp.c_fc.bias"] = np.zeros(4 * W, np.float32)
            sd[f"{b}.mlp.c_proj.weight"] = w(W, 4 * W)
            sd[f"{b}.mlp.c_proj.bias"] = np.zeros(W, np.float32)
    return sd


def torch_block(torch, x, sd, b):
    """open_clip ResidualAttentionBlock spec, tanh gelu (BigVision cfgs)."""
    import torch.nn.functional as F
    hd = W // HEADS
    y = F.layer_norm(x, (W,), sd[f"{b}.ln_1.weight"], sd[f"{b}.ln_1.bias"])
    qkv = y @ sd[f"{b}.attn.in_proj_weight"].T + sd[f"{b}.attn.in_proj_bias"]
    q, k, v = qkv.split(W, dim=-1)
    bsz, length, _ = q.shape
    q = q.view(bsz, length, HEADS, hd).transpose(1, 2)
    k = k.view(bsz, length, HEADS, hd).transpose(1, 2)
    v = v.view(bsz, length, HEADS, hd).transpose(1, 2)
    a = ((q @ k.transpose(-1, -2) / hd ** 0.5).softmax(-1) @ v)
    a = a.transpose(1, 2).reshape(bsz, length, W)
    x = x + a @ sd[f"{b}.attn.out_proj.weight"].T \
        + sd[f"{b}.attn.out_proj.bias"]
    y = F.layer_norm(x, (W,), sd[f"{b}.ln_2.weight"], sd[f"{b}.ln_2.bias"])
    y = y @ sd[f"{b}.mlp.c_fc.weight"].T + sd[f"{b}.mlp.c_fc.bias"]
    y = torch.nn.functional.gelu(y, approximate="tanh")
    return x + y @ sd[f"{b}.mlp.c_proj.weight"].T + sd[f"{b}.mlp.c_proj.bias"]


def main():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(42)
    sd_np = build_state_dict(rng)
    torch.save({k: torch.tensor(v) for k, v in sd_np.items()},
               os.path.join(HERE, "golden_sd.bin"))

    images = rng.randint(0, 255, (4, RES, RES, 3)).astype(np.uint8)

    # tokenize prompts with our WordPiece stack; committed tokens pin the
    # tokenizer's behavior (bit-parity vs tensorflow_text is proven
    # separately in tests/test_tokenizer.py golden corpora)
    from clipa_tpu.compat.openclip import get_tokenizer
    tok = get_tokenizer(os.path.join(HERE, "golden_tiny.json"),
                        vocab_path=os.path.join(HERE, "vocab.txt"))
    tokens = tok([PROMPT.format(c) for c in CLASS_NAMES])
    assert tokens.shape == (4, CTX) and (tokens[:, 0] == 2).all(), tokens

    sd = {k: torch.tensor(np.asarray(v, np.float64))
          for k, v in sd_np.items()}

    # ---- vision forward: conv patchify, cls token, NO ln_pre,
    # big_vision_gap pool (cls attends, excluded from pool), ln_post on the
    # pooled vector (open_clip transformer.py:472-526) ----
    x = (torch.tensor(images, dtype=torch.float64) / 255.0
         - torch.tensor(OPENAI_MEAN, dtype=torch.float64)) \
        / torch.tensor(OPENAI_STD, dtype=torch.float64)
    x = x.permute(0, 3, 1, 2)
    x = F.conv2d(x, sd["visual.conv1.weight"], stride=PATCH)
    x = x.reshape(4, W, -1).permute(0, 2, 1)
    cls = sd["visual.class_embedding"].expand(4, 1, -1)
    x = torch.cat([cls, x], dim=1) + sd["visual.positional_embedding"]
    for i in range(LAYERS):
        x = torch_block(torch, x, sd, f"visual.transformer.resblocks.{i}")
    pooled = x[:, 1:].mean(dim=1)
    pooled = F.layer_norm(pooled, (W,), sd["visual.ln_post.weight"],
                          sd["visual.ln_post.bias"])
    zimg = pooled @ sd["visual.proj"]
    zimg = zimg / zimg.norm(dim=-1, keepdim=True)

    # ---- text forward: bidirectional (attention_mask false),
    # big_vision_last pooling (transformer.py:638-673) ----
    t = torch.tensor(np.asarray(tokens, np.int64))
    x = sd["token_embedding.weight"][t] + sd["positional_embedding"]
    for i in range(LAYERS):
        x = torch_block(torch, x, sd, f"transformer.resblocks.{i}")
    x = F.layer_norm(x, (W,), sd["ln_final.weight"], sd["ln_final.bias"])
    ztxt = x[:, -1] @ sd["text_projection"]
    ztxt = ztxt / ztxt.norm(dim=-1, keepdim=True)

    logits = sd["logit_scale"].exp() * (zimg @ ztxt.T)
    np.savez(
        os.path.join(HERE, "fixture.npz"),
        images=images,
        tokens=np.asarray(tokens, np.int32),
        class_names=np.asarray(CLASS_NAMES),
        expected_zimg=zimg.numpy().astype(np.float64),
        expected_ztxt=ztxt.numpy().astype(np.float64),
        expected_logits=logits.numpy().astype(np.float64),
        expected_pred=logits.argmax(dim=1).numpy().astype(np.int64),
    )
    print("wrote golden_sd.bin + fixture.npz;",
          "pred =", logits.argmax(dim=1).numpy())


if __name__ == "__main__":
    main()
