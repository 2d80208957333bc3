"""open_clip-compatible factory API.

Preserves the public surface clipa_torch exposes
(clipa_torch/open_clip/factory.py: `create_model_and_transforms`,
`get_tokenizer`, `list_models`, model-config JSON registry) so downstream
evaluation scripts port with a backend swap. Under the hood everything is
the JAX two-tower stack; `CLIPModel.encode_image/encode_text` are jitted.

Model configs live in model_configs/*.json with open_clip field names
(vision_cfg/text_cfg, pool_style, bert_tokenizer, attention_mask, ... —
clipa_torch/open_clip/model.py:48-75); `_to_two_towers_cfg` translates them
to our tower kwargs. Checkpoints load from our flat npz directly, or from a
torch open_clip state_dict via `convert_torch_state_dict`.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "model_configs")

# Default channel statistics (open_clip constants.py). CLIPA-v2/BigVision
# checkpoints use the ImageNet ("vgg") statistics instead.
OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def list_models() -> list[str]:
    return sorted(f[:-5] for f in os.listdir(_CONFIG_DIR)
                  if f.endswith(".json"))


@functools.lru_cache(maxsize=None)
def get_model_config(name: str) -> dict:
    if name.endswith(".json") and os.path.exists(name):
        # a user-local config file, addressed by path (lets downstream code
        # and tests use configs outside the shipped zoo)
        with open(name) as f:
            return json.load(f)
    path = os.path.join(_CONFIG_DIR, name + ".json")
    if not os.path.exists(path):
        raise KeyError(f"Unknown model {name!r}; known: {list_models()}")
    with open(path) as f:
        return json.load(f)


# timm trunk name -> convnext stage spec (timm convnext.py model registry;
# referenced by the convnext_* JSONs via vision_cfg.timm_model_name).
_TIMM_CONVNEXT = {
    "convnext_tiny": dict(dims=(96, 192, 384, 768), depths=(3, 3, 9, 3)),
    "convnext_small": dict(dims=(96, 192, 384, 768), depths=(3, 3, 27, 3)),
    "convnext_base": dict(dims=(128, 256, 512, 1024), depths=(3, 3, 27, 3)),
    "convnext_large": dict(dims=(192, 384, 768, 1536), depths=(3, 3, 27, 3)),
    "convnext_xlarge": dict(dims=(256, 512, 1024, 2048),
                            depths=(3, 3, 27, 3)),
    "convnext_xxlarge": dict(dims=(384, 768, 1536, 3072),
                             depths=(3, 4, 30, 3)),
}


def _timm_vision_cfg(v: dict) -> Tuple[str, dict]:
    """Maps vision_cfg.timm_model_name to (image_model, image kwargs).

    Covers the timm trunks the reference config zoo actually names:
    convnext_* (clipa_torch/open_clip/timm_model.py adapter: trunk + GAP +
    linear/mlp proj — our convnext tower IS trunk+GAP+head) and
    vit_medium_patch16_gap_256 (ViT-M/16, gap pool, no class token ->
    closest native equivalent is our gap-pooled ViT), plus native towers
    for the swin (models/swin.py) and relpos-ViT (models/vit_relpos.py)
    trunks.
    """
    name = v["timm_model_name"]
    if name in _TIMM_CONVNEXT:
        image = dict(
            variant=None,
            **_TIMM_CONVNEXT[name],
            drop_path=float(v.get("timm_drop_path") or 0.0),
            dropout=float(v.get("timm_drop") or 0.0),
            # timm convnext default ls_init_value=1e-6
            layer_scale_init_value=1e-6,
            head_mlp=v.get("timm_proj", "linear") == "mlp",
        )
        return "convnext", image
    if name == "vit_medium_patch16_gap_256":
        image = dict(
            variant=None, width=512, depth=12, num_heads=8, mlp_dim=2048,
            patch_size=(16, 16), pool_type="gap", posemb="learn",
            ln_pre=False, gelu_approx=False, ln_eps=1e-6,
            drop_path=float(v.get("timm_drop_path") or 0.0),
        )
        return "vit", image
    if name == "swin_base_patch4_window7_224":
        image = dict(
            variant=None, embed_dim=128, depths=(2, 2, 18, 2),
            num_heads=(4, 8, 16, 32), window=7, patch_size=4,
            drop_path=float(v.get("timm_drop_path") or 0.0),
            head_bias=bool(v.get("timm_proj_bias", False)),
        )
        return "swin", image
    if name == "vit_relpos_medium_patch16_cls_224":
        image = dict(
            variant=None, width=512, depth=12, num_heads=8, patch_size=16,
            drop_path=float(v.get("timm_drop_path") or 0.0),
            head_bias=bool(v.get("timm_proj_bias", False)),
        )
        return "vit_relpos", image
    raise NotImplementedError(
        f"timm vision trunk {name!r} has no native tower here (supported: "
        f"{sorted(_TIMM_CONVNEXT)} + ['vit_medium_patch16_gap_256', "
        "'swin_base_patch4_window7_224', "
        "'vit_relpos_medium_patch16_cls_224']; "
        "ModifiedResNet has its own non-timm tower, models/resnet.py).")


def _to_two_towers_cfg(cfg: dict, *, image_size=None, pos_embed=None) -> dict:
    """open_clip JSON fields -> clipa_tpu.models.two_towers kwargs.

    Field semantics and defaults follow the reference dataclasses
    (clipa_torch/open_clip/model.py:25-75): vision `ln_pre` defaults True,
    `pool_style` defaults 'open_clip', text `attention_mask` defaults True
    (causal), gelu defaults to the exact (erf) form.
    """
    v, t = cfg["vision_cfg"], cfg["text_cfg"]
    # OpenAI CLIP models use QuickGELU everywhere (model.py:452-515 passes
    # quick_gelu=True through build_model_from_openai_state_dict)
    quick = bool(cfg.get("quick_gelu"))
    image_model = "vit"
    text_model = "text_transformer"
    if "hf_model_name" in t:
        hf_name = t["hf_model_name"].split("/")[-1]
        text_model = "t5_text" if hf_name.startswith("mt5") else "hf_text"
    if "timm_model_name" in v:
        image_model, image = _timm_vision_cfg(v)
        text = _text_tower_cfg(t, quick)
        return dict(image=image, text=text, image_model=image_model,
                    text_model=text_model,
                    out_dim=(cfg["embed_dim"], cfg["embed_dim"]),
                    temperature_init=1 / 0.07)
    if isinstance(v["layers"], (list, tuple)):
        # ModifiedResNet (RN*.json): list-valued layers selects the ResNet
        # tower; attn-pool heads = width*32 // head_width
        # (clipa_torch/open_clip/model.py _build_vision_tower).
        image = dict(
            variant=None,
            layers=tuple(v["layers"]),
            width=v["width"],
            num_heads=v["width"] * 32 // v.get("head_width", 64),
        )
        text = _text_tower_cfg(t, quick)
        return dict(image=image, text=text, image_model="resnet",
                    text_model=text_model,
                    out_dim=(cfg["embed_dim"], cfg["embed_dim"]),
                    temperature_init=1 / 0.07)
    vision_pool_style = v.get("pool_style", "open_clip")
    if vision_pool_style == "big_vision_gap":
        img_pool = "gap"           # mean over patch tokens, then ln_post
    elif vision_pool_style == "big_vision_tok":
        img_pool = "tok"
    elif v.get("global_average_pool"):
        img_pool = "gap_all"       # open_clip gap: mean incl. cls token
    else:
        img_pool = "tok"           # open_clip cls pooling == tok numerically
    width = v["width"]
    head_width = v.get("head_width", 64)
    image = dict(
        variant=None,
        width=width,
        depth=v["layers"],
        num_heads=width // head_width,
        mlp_dim=int(round(width * v.get("mlp_ratio", 4.0))),
        patch_size=(v["patch_size"], v["patch_size"]),
        pool_type=img_pool,
        posemb={"sin_cos_2d": "sincos2d"}.get(pos_embed, pos_embed)
        or "learn",
        ln_pre=bool(v.get("ln_pre", True)),
        gelu_approx="quick" if quick else
        (v.get("gelu_approximate", "none") == "tanh"),
        ln_eps=1e-5,  # torch nn.LayerNorm default — the compat surface
        ls_init=v.get("ls_init_value"),  # LayerScale (e.g. ViT-M-16-alt)
    )
    text = _text_tower_cfg(t, quick)
    return dict(image=image, text=text, text_model=text_model,
                out_dim=(cfg["embed_dim"], cfg["embed_dim"]),
                temperature_init=1 / 0.07)


def _to_coca_cfg(cfg: dict) -> dict:
    """coca_*.json -> clipa_tpu.models.coca.Model kwargs.

    Field semantics follow the reference dataclasses (coca_model.py:44-50
    MultimodalCfg; decoder ignores its n_queries/attn_pooler_heads — only
    the vision tower's attentional pool uses those)."""
    v, t, m = cfg["vision_cfg"], cfg["text_cfg"], cfg["multimodal_cfg"]
    quick = bool(cfg.get("quick_gelu"))
    width = v["width"]
    image = dict(
        variant=None,
        width=width,
        depth=v["layers"],
        num_heads=width // v.get("head_width", 64),
        mlp_dim=int(round(width * v.get("mlp_ratio", 4.0))),
        patch_size=(v["patch_size"], v["patch_size"]),
        posemb="learn",
        ln_pre=bool(v.get("ln_pre", True)),
        gelu_approx="quick" if quick else
        (v.get("gelu_approximate", "none") == "tanh"),
        ln_eps=1e-5,
    )
    text = _text_tower_cfg(t, quick)
    text_model = "text_transformer"
    if "hf_model_name" in t:
        # coca_roberta-*.json: HF text trunk under the caption decoder
        # (coca_model.py:95-100); truncation/labels stay at the CoCa level.
        hf_name = t["hf_model_name"].split("/")[-1]
        text_model = "t5_text" if hf_name.startswith("mt5") else "hf_text"
    else:
        text["embed_cls"] = True
        # fixed posemb capacity = context_length + 1 (reference num_pos,
        # transformer.py:559-578; one row beyond the post-truncation length,
        # matching the torch parameter shape for checkpoint parity).
        text["context_length"] = t["context_length"]
    mm = dict(
        # decoder vocab = text_cfg.vocab_size, default 49408, for HF text
        # towers too (coca_model.py:102-106 + CLIPTextCfg default).
        vocab_size=m.get("vocab_size", t.get("vocab_size", 49408)),
        width=m["width"],
        depth=m["layers"],
        num_heads=m["heads"],
        mlp_dim=int(round(m["width"] * m.get("mlp_ratio", 4.0))),
        gelu_approx="quick" if quick else False,
    )
    return dict(
        image=image, text=text, text_model=text_model, multimodal_cfg=mm,
        out_dim=cfg["embed_dim"],
        attentional_pool=bool(v.get("attentional_pool")),
        n_queries=int(v.get("n_queries", 256)),
        attn_pooler_heads=int(v.get("attn_pooler_heads", 8)),
        temperature_init=1 / 0.07,
    )


def _text_tower_cfg(t: dict, quick: bool) -> dict:
    if "hf_model_name" in t:
        # HF text trunk (clipa_torch/open_clip/hf_model.py): native
        # roberta-family (models/hf_text.py) or mt5-encoder
        # (models/t5_text.py) towers.
        from clipa_tpu.models.hf_text import HF_ARCHS
        from clipa_tpu.models.t5_text import T5_ARCHS
        name = t["hf_model_name"].split("/")[-1]  # drop the HF org prefix
        if name not in HF_ARCHS and name not in T5_ARCHS:
            raise NotImplementedError(
                f"hf text trunk {name!r} has no native tower (supported: "
                f"{sorted(HF_ARCHS) + sorted(T5_ARCHS)}).")
        if t.get("pooler_type", "mean_pooler") != "mean_pooler":
            raise NotImplementedError("only mean_pooler is implemented")
        return dict(variant=name, proj=t.get("proj", "mlp"))
    text_pool = {"big_vision_last": "last", "big_vision_tok": "tok",
                 "open_clip": "eot"}[t.get("pool_style", "open_clip")]
    return dict(
        variant=None,
        width=t["width"],
        depth=t["layers"],
        num_heads=t["heads"],
        mlp_dim=int(round(t["width"] * t.get("mlp_ratio", 4.0))),
        pool_type=text_pool,
        vocab_size=t["vocab_size"],
        causal_mask=bool(t.get("attention_mask", True)),
        gelu_approx="quick" if quick else
        (t.get("gelu_approximate", "none") == "tanh"),
        ln_eps=1e-5,  # torch nn.LayerNorm default — the compat surface
    )


class CLIPModel:
    """Stateful convenience wrapper: flax model + params + jitted encoders."""

    def __init__(self, model, params, config: dict, image_size: int,
                 context_length: int, model_state: Optional[dict] = None):
        self.model = model
        self.params = params
        self.config = config
        self.image_size = image_size
        self.context_length = context_length
        # Extra flax variable collections beyond "params" — e.g. the
        # ModifiedResNet towers' BatchNorm running stats ("batch_stats").
        self.model_state = model_state or {}

        def _encode_image(params, state, image, normalize):
            zimg, _, _ = model.apply({"params": params, **state}, image, None)
            return zimg if normalize else zimg  # tower output is normalized

        def _encode_text(params, state, text, normalize):
            _, ztxt, _ = model.apply({"params": params, **state}, None, text)
            return ztxt

        self._encode_image = jax.jit(_encode_image, static_argnums=3)
        self._encode_text = jax.jit(_encode_text, static_argnums=3)

    def encode_image(self, image, normalize: bool = True):
        image = jnp.asarray(image)
        if image.ndim == 3:
            image = image[None]
        if image.shape[1] == 3 and image.shape[-1] != 3:
            image = jnp.transpose(image, (0, 2, 3, 1))  # accept NCHW
        return self._encode_image(self.params, self.model_state, image,
                                  normalize)

    def encode_text(self, text, normalize: bool = True):
        return self._encode_text(self.params, self.model_state,
                                 jnp.asarray(text), normalize)

    @property
    def logit_scale(self):
        return jnp.exp(self.params["t"])

    def __call__(self, image=None, text=None):
        zimg = self.encode_image(image) if image is not None else None
        ztxt = self.encode_text(text) if text is not None else None
        return zimg, ztxt, self.logit_scale


class CoCaModel(CLIPModel):
    """CLIPModel + caption generation (reference CoCa.generate,
    clipa_torch/open_clip/coca_model.py:167-288).

    Sampling (top_k / top_p) uses the transformers logits warpers — the
    exact processors the reference uses — around a jitted fixed-length
    decode (the prefix is padded to seq_len so one XLA program serves every
    step; causal masking makes the pad suffix inert). Beam search implements
    the reference's grouped protocol (independent sub-beam groups, 2x
    over-candidates, score = mean log-prob at length_penalty 1.0) in numpy
    on the host around the same jitted step.
    """

    def _decode_logits_fn(self):
        if not hasattr(self, "_decode_jit"):
            model = self.model
            def decode(params, state, image, tokens):
                _, _, out = model.apply({"params": params, **state}, image,
                                        tokens, embed_cls=False)
                return out["logits"]
            self._decode_jit = jax.jit(decode)
        return self._decode_jit

    def generate(self, image, text=None, seq_len=30, max_seq_len=77,
                 temperature=1.0, generation_type="beam_search",
                 top_p=0.1, top_k=1, pad_token_id=None, eos_token_id=None,
                 sot_token_id=None, num_beams=6, num_beam_groups=3,
                 min_seq_len=5, repetition_penalty=1.0,
                 fixed_output_length=False, seed=0):
        import torch
        from transformers import (LogitsProcessorList,
                                  MinLengthLogitsProcessor,
                                  RepetitionPenaltyLogitsProcessor,
                                  TopKLogitsWarper, TopPLogitsWarper)

        sot = 49406 if sot_token_id is None else int(sot_token_id)
        eos = 49407 if eos_token_id is None else int(eos_token_id)
        pad = (int(self.config.get("pad_id", 0)) if pad_token_id is None
               else int(pad_token_id))
        assert seq_len > min_seq_len, "seq_len must exceed min_seq_len"

        image = jnp.asarray(image)
        if image.ndim == 3:
            image = image[None]
        if image.shape[1] == 3 and image.shape[-1] != 3:
            image = jnp.transpose(image, (0, 2, 3, 1))
        b = image.shape[0]
        processors = LogitsProcessorList([
            MinLengthLogitsProcessor(min_seq_len, eos_token_id=eos),
            RepetitionPenaltyLogitsProcessor(repetition_penalty),
        ])
        decode = self._decode_logits_fn()

        def step_logits(tokens_np, cur_len):
            """Next-token logits for each row of a (b', cur_len) prefix."""
            buf = np.full((tokens_np.shape[0], seq_len), pad, np.int32)
            buf[:, :cur_len] = tokens_np
            logits = decode(self.params, self.model_state, image_rep,
                            jnp.asarray(buf))
            return np.asarray(logits[:, cur_len - 1], np.float32)

        if generation_type == "beam_search":
            image_rep = jnp.repeat(image, num_beams, axis=0)
            out = self._beam_search(
                step_logits, batch_size=b, num_beams=num_beams,
                num_beam_groups=num_beam_groups, seq_len=seq_len,
                sot=sot, eos=eos, pad=pad, processors=processors)
            if fixed_output_length and out.shape[1] < seq_len:
                out = np.concatenate(
                    [out, np.full((b, seq_len - out.shape[1]), pad,
                                  out.dtype)], axis=1)
            return out

        if generation_type == "top_p":
            warper = TopPLogitsWarper(top_p)
        elif generation_type == "top_k":
            warper = TopKLogitsWarper(top_k)
        else:
            raise ValueError(
                "generation_type must be top_k | top_p | beam_search")

        image_rep = image
        rng = np.random.default_rng(seed)
        if text is None:
            out = np.full((b, 1), sot, np.int64)
        else:
            out = np.asarray(text, np.int64)
            if out.ndim == 1:
                out = out[None]
        while out.shape[1] < seq_len:
            cur = out[:, -max_seq_len:]
            logits = step_logits(cur.astype(np.int32), cur.shape[1])
            done = (out[:, -1] == eos) | (out[:, -1] == pad)
            if done.all() and not fixed_output_length:
                break
            t_logits = torch.tensor(logits)
            t_prefix = torch.tensor(cur)
            filtered = processors(t_prefix, t_logits)
            filtered = warper(t_prefix, filtered)
            probs = torch.softmax(filtered / temperature, dim=-1).numpy()
            if out.shape[1] + 1 == seq_len:
                sample = np.full((b,), eos, np.int64)
            else:
                sample = np.array(
                    [rng.choice(probs.shape[1], p=p / p.sum())
                     for p in probs], np.int64)
            sample = np.where(done, pad, sample)
            out = np.concatenate([out, sample[:, None]], axis=1)
        return out

    def _beam_search(self, step_logits, *, batch_size, num_beams,
                     num_beam_groups, seq_len, sot, eos, pad, processors):
        import torch
        g = num_beams // num_beam_groups
        tokens = np.full((batch_size * num_beams, 1), sot, np.int64)
        # first beam of each group live, rest -1e9 (coca_model.py:335-339)
        scores = np.full((batch_size, num_beams), -1e9, np.float32)
        scores[:, ::g] = 0.0
        scores = scores.reshape(-1)
        done_hyps = [[] for _ in range(batch_size)]  # (score, tokens)

        for cur_len in range(1, seq_len):
            logits = step_logits(tokens.astype(np.int32), cur_len)
            logp = torch.log_softmax(torch.tensor(logits), dim=-1)
            logp = processors(torch.tensor(tokens), logp).numpy()
            vocab = logp.shape[-1]
            next_tokens = np.zeros((batch_size * num_beams,), np.int64)
            reorder = np.arange(batch_size * num_beams)
            for grp in range(num_beam_groups):
                idx = np.concatenate(
                    [np.arange(grp * g, grp * g + g) + bi * num_beams
                     for bi in range(batch_size)])
                cand = (logp[idx] + scores[idx, None]).reshape(
                    batch_size, g * vocab)
                top = np.argsort(-cand, axis=1)[:, :2 * g]
                top_scores = np.take_along_axis(cand, top, axis=1)
                for bi in range(batch_size):
                    kept = 0
                    for rank in range(2 * g):
                        beam = int(top[bi, rank] // vocab)
                        tok = int(top[bi, rank] % vocab)
                        sc = float(top_scores[bi, rank])
                        src = bi * num_beams + grp * g + beam
                        if tok == eos:
                            done_hyps[bi].append(
                                (sc / cur_len, tokens[src].copy()))
                            continue
                        dst = bi * num_beams + grp * g + kept
                        reorder[dst] = src
                        next_tokens[dst] = tok
                        scores[dst] = sc
                        kept += 1
                        if kept == g:
                            break
            tokens = np.concatenate(
                [tokens[reorder], next_tokens[:, None]], axis=1)
        # finalize: open beams compete with finished hypotheses
        for bi in range(batch_size):
            for beam in range(num_beams):
                src = bi * num_beams + beam
                done_hyps[bi].append(
                    (scores[src] / (seq_len - 1), tokens[src].copy()))
        best = [max(h, key=lambda x: x[0])[1] for h in done_hyps]
        width = max(len(t) for t in best) + 1
        out = np.full((batch_size, width), pad, np.int64)
        for bi, t in enumerate(best):
            out[bi, :len(t)] = t
            out[bi, len(t)] = eos
        return out


def create_model(model_name: str, pretrained: Optional[str] = None, *,
                 precision: str = "float32",
                 force_image_size: Optional[int] = None,
                 pos_embed: Optional[str] = None,
                 seed: int = 0, **unused) -> CLIPModel:
    """Builds (and optionally loads) a CLIPA model by open_clip name."""
    from clipa_tpu.models import two_towers

    if pretrained and not os.path.exists(pretrained):
        # registry tag ("openai", "laion2b_s34b_b79k", ...) -> local file
        from clipa_tpu.compat import pretrained as registry
        if registry.is_pretrained_cfg(model_name, pretrained):
            pretrained = registry.download_pretrained(model_name, pretrained)
        else:
            # neither an existing path nor a registered tag: fail here with
            # the known tags instead of an opaque file-open error later
            raise KeyError(
                f"pretrained={pretrained!r} is not a local file or a "
                f"registered tag for {model_name!r}; known tags: "
                f"{registry.list_pretrained_tags_by_model(model_name)}")

    cfg = get_model_config(model_name)
    image_size = force_image_size or cfg["vision_cfg"]["image_size"]
    dtype = {"float32": None, "bf16": jnp.bfloat16,
             "bfloat16": jnp.bfloat16}[precision]
    if "multimodal_cfg" in cfg:
        from clipa_tpu.models import coca as coca_lib
        model = coca_lib.Model(dtype=dtype, **_to_coca_cfg(cfg))
        # HF-text coca configs carry no text context_length; the reference
        # tokenizer default is 77 (tokenizer.py DEFAULT_CONTEXT_LENGTH).
        ctx = cfg["text_cfg"].get("context_length", 77)
        rng = jax.random.PRNGKey(seed)
        params = jax.jit(lambda r: model.init(
            {"params": r}, jnp.zeros((1, image_size, image_size, 3)),
            jnp.zeros((1, ctx), jnp.int32))["params"])(rng)
        if pretrained:
            params = load_checkpoint_params(pretrained, params)
        return CoCaModel(model, params, cfg, image_size, ctx)
    tt_cfg = _to_two_towers_cfg(cfg, pos_embed=pos_embed)
    model = two_towers.Model(dtype=dtype, **tt_cfg)

    ctx = cfg["text_cfg"].get("context_length", 77)
    rng = jax.random.PRNGKey(seed)
    variables = jax.jit(lambda r: model.init(
        {"params": r}, jnp.zeros((1, image_size, image_size, 3)),
        jnp.zeros((1, ctx), jnp.int32)))(rng)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}

    if pretrained:
        params, model_state = load_checkpoint_variables(
            pretrained, params, model_state)

    return CLIPModel(model, params, cfg, image_size, ctx,
                     model_state=model_state)


def load_checkpoint_params(path: str, init_params):
    """Loads npz (ours) or torch .pt/.bin (open_clip state_dict) weights."""
    params, _ = load_checkpoint_variables(path, init_params, {})
    return params


def load_checkpoint_variables(path: str, init_params, init_state: dict):
    """Like load_checkpoint_params but also merges non-param collections
    (BatchNorm running stats for the ResNet towers)."""
    from clipa_tpu.models.common import merge_params
    from clipa_tpu.train import checkpoint as ckpt

    state = dict(init_state)
    if path.endswith((".pt", ".pth", ".bin")):
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = sd.get("state_dict", sd)
        loaded_vars = convert_torch_variables(
            {k: v.numpy() for k, v in sd.items()},
            heads=_heads_from_params(init_params))
        loaded = loaded_vars["params"]
        for coll, tree in loaded_vars.items():
            if coll != "params" and coll in state:
                state[coll] = merge_params(tree, state[coll])
    else:
        loaded = ckpt.load_params(path)
        # npz checkpoints may carry collections under "<coll>/..." flat keys
        # (CLIPModel.save writes batch_stats that way).
        for coll in state:
            if coll in loaded:
                state[coll] = merge_params(loaded.pop(coll), state[coll])
    return merge_params(loaded, init_params), state


def _heads_from_params(params) -> dict:
    """Reads the per-tower head count off the init params' qkv kernel shapes
    ((d, H, hd)) so the converter never guesses head_width."""
    heads = {}
    for tower in ("img", "txt"):
        try:
            k = params[tower]["Transformer"]["encoderblock_0"][
                "MultiHeadDotProductAttention_0"]["query"]["kernel"]
            heads[tower] = int(k.shape[1])
        except (KeyError, TypeError):
            pass
    return heads


class _ConsumingDict(dict):
    """Dict that records which keys were read, so the converter can prove it
    consumed the whole state dict (silently dropped weights = wrong numbers,
    round-1 Missing #2)."""

    def __init__(self, data):
        super().__init__(data)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)

    def unconsumed(self):
        return sorted(set(self) - self.consumed)


# state_dict entries that carry no weights we need (buffers etc.).
_IGNORABLE_TORCH_KEYS = ("attn_mask", "position_ids", "logit_bias",
                         "num_batches_tracked", "relative_position_index",
                         "rel_coords_log")


def convert_torch_state_dict(sd: dict[str, np.ndarray], *,
                             strict: bool = True,
                             heads: Optional[dict] = None) -> dict:
    """open_clip torch state_dict -> our parameter tree (weight converter).

    ViT-tower convenience wrapper around convert_torch_variables (which
    also returns BatchNorm running stats for ModifiedResNet towers)."""
    return convert_torch_variables(sd, strict=strict, heads=heads)["params"]


def convert_torch_variables(sd: dict[str, np.ndarray], *,
                            strict: bool = True,
                            heads: Optional[dict] = None) -> dict:
    """open_clip torch state_dict -> flax variables {"params": ...,
    ["batch_stats": ...]} (weight converter).

    Handles both `CLIP` (text attrs at top level) and `CustomTextCLIP`
    (`text.`-prefixed) layouts (clipa_torch/open_clip/model.py:200/277),
    with either a ViT or a ModifiedResNet visual tower. With strict=True
    (default) raises if any state-dict tensor other than known non-weight
    buffers is left unconsumed.
    """
    from clipa_tpu import utils as u

    sd = _ConsumingDict(
        {k.replace("module.", ""): v for k, v in sd.items()})
    if any(k.startswith("text.transformer") for k in sd):
        tprefix = "text."
    else:
        tprefix = ""
    flat: dict[str, np.ndarray] = {}
    stats: dict[str, np.ndarray] = {}

    def put(name, val):
        flat[name] = np.asarray(val)

    # temperature
    put("t", np.asarray(sd["logit_scale"]).reshape(1))

    # CoCa checkpoints carry a caption decoder; their visual ln_post/proj
    # map to the coca-module pooling scope instead of the vit tower's.
    is_coca = any(k.startswith("text_decoder.") for k in sd)

    # ---- image tower ----
    if any(k.startswith("visual.trunk.") for k in sd):
        if "visual.trunk.stem.0.weight" in sd:
            # timm ConvNeXt trunk (convnext_* configs)
            _convert_convnext_visual(sd, put)
        elif any(".attn.relative_position_bias_table" in k for k in sd):
            # timm Swin trunk (swin_* configs)
            _convert_swin_visual(sd, put)
        elif any(".attn.rel_pos.mlp." in k for k in sd):
            # timm relpos-ViT trunk (vit_relpos_* configs)
            _convert_relpos_visual(sd, put)
        else:
            raise NotImplementedError(
                "state_dict has an unsupported timm vision trunk "
                "(visual.trunk.*); the torch converter covers CLIP ViT / "
                "ModifiedResNet / CoCa / timm-ConvNeXt / timm-Swin / "
                "timm-relpos-ViT layouts")
    elif "visual.attnpool.positional_embedding" in sd:
        _convert_resnet_visual(sd, put, stats)
    else:
        conv = sd["visual.conv1.weight"]  # (width, 3, p, p)
        put("img/embedding/kernel", conv.transpose(2, 3, 1, 0))
        put("img/cls", sd["visual.class_embedding"].reshape(1, 1, -1))
        put("img/pos_embedding", sd["visual.positional_embedding"][None])
        ln_post = "img_encoder_norm" if is_coca else "img/encoder_norm"
        if "visual.proj" in sd:
            put("img_head/kernel" if is_coca else "img/head/kernel",
                sd["visual.proj"])
        if "visual.ln_pre.weight" in sd:
            put("img/ln_pre/scale", sd["visual.ln_pre.weight"])
            put("img/ln_pre/bias", sd["visual.ln_pre.bias"])
        put(f"{ln_post}/scale", sd["visual.ln_post.weight"])
        put(f"{ln_post}/bias", sd["visual.ln_post.bias"])
        if "visual.attn_pool.query" in sd:
            _convert_attn_pooler(sd, "visual.attn_pool", "img_pool", put)
        _convert_blocks(sd, "visual.transformer.resblocks", "img/Transformer", put,
                        heads=(heads or {}).get("img"))

    # ---- text tower ----
    put("txt/Embed_0/embedding", sd[f"{tprefix}token_embedding.weight"])
    put("txt/pos_embedding", sd[f"{tprefix}positional_embedding"][None])
    put("txt/head/kernel", sd[f"{tprefix}text_projection"])
    put("txt/encoder_norm/scale", sd[f"{tprefix}ln_final.weight"])
    put("txt/encoder_norm/bias", sd[f"{tprefix}ln_final.bias"])
    if f"{tprefix}cls_emb" in sd:
        put("txt/cls_emb", sd[f"{tprefix}cls_emb"].reshape(1, 1, -1))
    _convert_blocks(sd, f"{tprefix}transformer.resblocks", "txt/Transformer", put,
                    heads=(heads or {}).get("txt"))

    # ---- caption decoder (CoCa, transformer.py:684-772) ----
    if is_coca:
        _convert_blocks(sd, "text_decoder.resblocks", "decoder", put,
                        heads=(heads or {}).get("decoder"))
        _convert_cross_blocks(sd, "text_decoder.cross_attn", "decoder", put,
                              heads=(heads or {}).get("decoder"))
        put("decoder/encoder_norm/scale", sd["text_decoder.ln_final.weight"])
        put("decoder/encoder_norm/bias", sd["text_decoder.ln_final.bias"])
        put("decoder/head/kernel", sd["text_decoder.text_projection"])

    leftover = [k for k in sd.unconsumed()
                if not k.endswith(_IGNORABLE_TORCH_KEYS)]
    if leftover and strict:
        raise ValueError(
            f"convert_torch_variables left {len(leftover)} state-dict "
            f"entries unconsumed (model family not fully supported; "
            f"loading would silently drop weights): {leftover[:10]}")

    out = {"params": u.recover_tree(list(flat.keys()), list(flat.values()))}
    if stats:
        out["batch_stats"] = u.recover_tree(list(stats.keys()),
                                            list(stats.values()))
    return out


def _convert_timm_head(sd, put):
    """open_clip TimmModel projection (visual.head.{proj|mlp.*}, reference
    clipa_torch/open_clip/timm_model.py:76-82) -> img/head[_mlp_fc]."""
    if "visual.head.mlp.fc1.weight" in sd:
        put("img/head_mlp_fc/kernel",
            np.asarray(sd["visual.head.mlp.fc1.weight"]).T)
        put("img/head_mlp_fc/bias", sd["visual.head.mlp.fc1.bias"])
        put("img/head/kernel", np.asarray(sd["visual.head.mlp.fc2.weight"]).T)
        if "visual.head.mlp.fc2.bias" in sd:
            put("img/head/bias", sd["visual.head.mlp.fc2.bias"])
    elif "visual.head.proj.weight" in sd:
        put("img/head/kernel", np.asarray(sd["visual.head.proj.weight"]).T)
        if "visual.head.proj.bias" in sd:
            put("img/head/bias", sd["visual.head.proj.bias"])


def _export_timm_head(flat, sd):
    """Inverse of _convert_timm_head."""
    if "img/head_mlp_fc/kernel" in flat:
        sd["visual.head.mlp.fc1.weight"] = np.asarray(
            flat["img/head_mlp_fc/kernel"]).T
        sd["visual.head.mlp.fc1.bias"] = np.asarray(
            flat["img/head_mlp_fc/bias"])
        sd["visual.head.mlp.fc2.weight"] = np.asarray(flat["img/head/kernel"]).T
        if "img/head/bias" in flat:
            sd["visual.head.mlp.fc2.bias"] = np.asarray(flat["img/head/bias"])
    elif "img/head/kernel" in flat:
        sd["visual.head.proj.weight"] = np.asarray(flat["img/head/kernel"]).T
        if "img/head/bias" in flat:
            sd["visual.head.proj.bias"] = np.asarray(flat["img/head/bias"])


# PatchMerging neighbor order: ours concatenates the 2x2 neighbors as
# (0,0),(0,1),(1,0),(1,1); timm as (0,0),(1,0),(0,1),(1,1) (see
# models/swin.py PatchMerging). The reduction kernel's INPUT rows must be
# block-permuted [0,2,1,3] in either direction (the permutation is its own
# inverse).
def _permute_merge_rows(kernel_4c_2c):
    k = np.asarray(kernel_4c_2c)
    c = k.shape[0] // 4
    blocks = [k[i * c:(i + 1) * c] for i in range(4)]
    return np.concatenate([blocks[0], blocks[2], blocks[1], blocks[3]], 0)


def _convert_swin_visual(sd, put):
    """timm Swin trunk (visual.trunk.*: patch_embed.{proj,norm},
    layers.{i}.blocks.{j}.{norm1,attn.qkv,attn.relative_position_bias_table,
    attn.proj,norm2,mlp.fc1,mlp.fc2}, layers.{i}.downsample.{norm,reduction},
    final norm) + open_clip head -> our native tower (models/swin.py)."""
    t = "visual.trunk"
    put("img/patch_embed/kernel",
        np.asarray(sd[f"{t}.patch_embed.proj.weight"]).transpose(2, 3, 1, 0))
    put("img/patch_embed/bias", sd[f"{t}.patch_embed.proj.bias"])
    put("img/patch_norm/scale", sd[f"{t}.patch_embed.norm.weight"])
    put("img/patch_norm/bias", sd[f"{t}.patch_embed.norm.bias"])
    layers = sorted({int(k.split(".")[3]) for k in sd
                     if k.startswith(f"{t}.layers.")})
    for i in layers:
        lp = f"{t}.layers.{i}"
        blocks = sorted({int(k.split(".")[5]) for k in sd
                         if k.startswith(f"{lp}.blocks.")})
        for j in blocks:
            bp = f"{lp}.blocks.{j}"
            o = f"img/layers{i}_blocks{j}"
            put(f"{o}/norm1/scale", sd[f"{bp}.norm1.weight"])
            put(f"{o}/norm1/bias", sd[f"{bp}.norm1.bias"])
            put(f"{o}/attn/qkv/kernel", np.asarray(sd[f"{bp}.attn.qkv.weight"]).T)
            put(f"{o}/attn/qkv/bias", sd[f"{bp}.attn.qkv.bias"])
            put(f"{o}/attn/rel_pos_table",
                sd[f"{bp}.attn.relative_position_bias_table"])
            put(f"{o}/attn/proj/kernel",
                np.asarray(sd[f"{bp}.attn.proj.weight"]).T)
            put(f"{o}/attn/proj/bias", sd[f"{bp}.attn.proj.bias"])
            put(f"{o}/norm2/scale", sd[f"{bp}.norm2.weight"])
            put(f"{o}/norm2/bias", sd[f"{bp}.norm2.bias"])
            put(f"{o}/mlp_fc1/kernel", np.asarray(sd[f"{bp}.mlp.fc1.weight"]).T)
            put(f"{o}/mlp_fc1/bias", sd[f"{bp}.mlp.fc1.bias"])
            put(f"{o}/mlp_fc2/kernel", np.asarray(sd[f"{bp}.mlp.fc2.weight"]).T)
            put(f"{o}/mlp_fc2/bias", sd[f"{bp}.mlp.fc2.bias"])
        if f"{lp}.downsample.norm.weight" in sd:
            put(f"img/layers{i}_downsample/norm/scale",
                sd[f"{lp}.downsample.norm.weight"])
            put(f"img/layers{i}_downsample/norm/bias",
                sd[f"{lp}.downsample.norm.bias"])
            put(f"img/layers{i}_downsample/reduction/kernel",
                _permute_merge_rows(
                    np.asarray(sd[f"{lp}.downsample.reduction.weight"]).T))
    for cand in (f"{t}.norm", f"{t}.head.norm"):
        if f"{cand}.weight" in sd:
            put("img/norm/scale", sd[f"{cand}.weight"])
            put("img/norm/bias", sd[f"{cand}.bias"])
            break
    _convert_timm_head(sd, put)


def _export_swin_visual(flat, sd):
    """Inverse of _convert_swin_visual."""
    t = "visual.trunk"
    sd[f"{t}.patch_embed.proj.weight"] = np.asarray(
        flat["img/patch_embed/kernel"]).transpose(3, 2, 0, 1)
    sd[f"{t}.patch_embed.proj.bias"] = np.asarray(flat["img/patch_embed/bias"])
    sd[f"{t}.patch_embed.norm.weight"] = np.asarray(flat["img/patch_norm/scale"])
    sd[f"{t}.patch_embed.norm.bias"] = np.asarray(flat["img/patch_norm/bias"])
    i = 0
    while f"img/layers{i}_blocks0/norm1/scale" in flat:
        j = 0
        while f"img/layers{i}_blocks{j}/norm1/scale" in flat:
            o = f"img/layers{i}_blocks{j}"
            bp = f"{t}.layers.{i}.blocks.{j}"
            sd[f"{bp}.norm1.weight"] = np.asarray(flat[f"{o}/norm1/scale"])
            sd[f"{bp}.norm1.bias"] = np.asarray(flat[f"{o}/norm1/bias"])
            sd[f"{bp}.attn.qkv.weight"] = np.asarray(
                flat[f"{o}/attn/qkv/kernel"]).T
            sd[f"{bp}.attn.qkv.bias"] = np.asarray(flat[f"{o}/attn/qkv/bias"])
            sd[f"{bp}.attn.relative_position_bias_table"] = np.asarray(
                flat[f"{o}/attn/rel_pos_table"])
            sd[f"{bp}.attn.proj.weight"] = np.asarray(
                flat[f"{o}/attn/proj/kernel"]).T
            sd[f"{bp}.attn.proj.bias"] = np.asarray(flat[f"{o}/attn/proj/bias"])
            sd[f"{bp}.norm2.weight"] = np.asarray(flat[f"{o}/norm2/scale"])
            sd[f"{bp}.norm2.bias"] = np.asarray(flat[f"{o}/norm2/bias"])
            sd[f"{bp}.mlp.fc1.weight"] = np.asarray(
                flat[f"{o}/mlp_fc1/kernel"]).T
            sd[f"{bp}.mlp.fc1.bias"] = np.asarray(flat[f"{o}/mlp_fc1/bias"])
            sd[f"{bp}.mlp.fc2.weight"] = np.asarray(
                flat[f"{o}/mlp_fc2/kernel"]).T
            sd[f"{bp}.mlp.fc2.bias"] = np.asarray(flat[f"{o}/mlp_fc2/bias"])
            j += 1
        if f"img/layers{i}_downsample/norm/scale" in flat:
            lp = f"{t}.layers.{i}.downsample"
            sd[f"{lp}.norm.weight"] = np.asarray(
                flat[f"img/layers{i}_downsample/norm/scale"])
            sd[f"{lp}.norm.bias"] = np.asarray(
                flat[f"img/layers{i}_downsample/norm/bias"])
            sd[f"{lp}.reduction.weight"] = _permute_merge_rows(
                np.asarray(flat[f"img/layers{i}_downsample/reduction/kernel"])).T
            # (_permute_merge_rows is its own inverse; transpose back to
            # torch (out, in) after permuting the input rows)
        i += 1
    sd[f"{t}.norm.weight"] = np.asarray(flat["img/norm/scale"])
    sd[f"{t}.norm.bias"] = np.asarray(flat["img/norm/bias"])
    _export_timm_head(flat, sd)


def _convert_relpos_visual(sd, put):
    """timm relpos-ViT trunk (visual.trunk.*: cls_token, patch_embed.proj,
    blocks.{i}.{norm1,attn.qkv,attn.rel_pos.mlp.{fc1,fc2},attn.proj,norm2,
    mlp.{fc1,fc2}}, final norm) + open_clip head -> our native tower
    (models/vit_relpos.py, coords_mode='cr' — timm RelPosMlp's mode for
    the vit_relpos_* family; its rel_coords_log/relative_position_index
    buffers are recomputed, not loaded).

    timm's relpos variants set qkv_bias=False; a checkpoint carrying a
    qkv bias would need a tower our config zoo doesn't build, so it
    errors below rather than silently dropping the bias."""
    t = "visual.trunk"
    put("img/cls", sd[f"{t}.cls_token"])
    put("img/patch_embed/kernel",
        np.asarray(sd[f"{t}.patch_embed.proj.weight"]).transpose(2, 3, 1, 0))
    put("img/patch_embed/bias", sd[f"{t}.patch_embed.proj.bias"])
    blocks = sorted({int(k.split(".")[3]) for k in sd
                     if k.startswith(f"{t}.blocks.")})
    for i in blocks:
        bp = f"{t}.blocks.{i}"
        o = f"img/blocks{i}"
        if f"{bp}.attn.qkv.bias" in sd:
            raise NotImplementedError(
                "relpos-ViT checkpoint has qkv biases; the vit_relpos "
                "tower (like timm's vit_relpos_* configs) is qkv_bias=False")
        put(f"{o}/norm1/scale", sd[f"{bp}.norm1.weight"])
        put(f"{o}/norm1/bias", sd[f"{bp}.norm1.bias"])
        put(f"{o}/qkv/kernel", np.asarray(sd[f"{bp}.attn.qkv.weight"]).T)
        put(f"{o}/rel_pos/fc1/kernel",
            np.asarray(sd[f"{bp}.attn.rel_pos.mlp.fc1.weight"]).T)
        put(f"{o}/rel_pos/fc1/bias", sd[f"{bp}.attn.rel_pos.mlp.fc1.bias"])
        put(f"{o}/rel_pos/fc2/kernel",
            np.asarray(sd[f"{bp}.attn.rel_pos.mlp.fc2.weight"]).T)
        put(f"{o}/rel_pos/fc2/bias", sd[f"{bp}.attn.rel_pos.mlp.fc2.bias"])
        put(f"{o}/proj/kernel", np.asarray(sd[f"{bp}.attn.proj.weight"]).T)
        put(f"{o}/proj/bias", sd[f"{bp}.attn.proj.bias"])
        put(f"{o}/norm2/scale", sd[f"{bp}.norm2.weight"])
        put(f"{o}/norm2/bias", sd[f"{bp}.norm2.bias"])
        put(f"{o}/mlp_fc1/kernel", np.asarray(sd[f"{bp}.mlp.fc1.weight"]).T)
        put(f"{o}/mlp_fc1/bias", sd[f"{bp}.mlp.fc1.bias"])
        put(f"{o}/mlp_fc2/kernel", np.asarray(sd[f"{bp}.mlp.fc2.weight"]).T)
        put(f"{o}/mlp_fc2/bias", sd[f"{bp}.mlp.fc2.bias"])
    put("img/norm/scale", sd[f"{t}.norm.weight"])
    put("img/norm/bias", sd[f"{t}.norm.bias"])
    _convert_timm_head(sd, put)


def _export_relpos_visual(flat, sd):
    """Inverse of _convert_relpos_visual."""
    t = "visual.trunk"
    sd[f"{t}.cls_token"] = np.asarray(flat["img/cls"])
    sd[f"{t}.patch_embed.proj.weight"] = np.asarray(
        flat["img/patch_embed/kernel"]).transpose(3, 2, 0, 1)
    sd[f"{t}.patch_embed.proj.bias"] = np.asarray(flat["img/patch_embed/bias"])
    i = 0
    while f"img/blocks{i}/norm1/scale" in flat:
        o = f"img/blocks{i}"
        bp = f"{t}.blocks.{i}"
        sd[f"{bp}.norm1.weight"] = np.asarray(flat[f"{o}/norm1/scale"])
        sd[f"{bp}.norm1.bias"] = np.asarray(flat[f"{o}/norm1/bias"])
        sd[f"{bp}.attn.qkv.weight"] = np.asarray(flat[f"{o}/qkv/kernel"]).T
        sd[f"{bp}.attn.rel_pos.mlp.fc1.weight"] = np.asarray(
            flat[f"{o}/rel_pos/fc1/kernel"]).T
        sd[f"{bp}.attn.rel_pos.mlp.fc1.bias"] = np.asarray(
            flat[f"{o}/rel_pos/fc1/bias"])
        sd[f"{bp}.attn.rel_pos.mlp.fc2.weight"] = np.asarray(
            flat[f"{o}/rel_pos/fc2/kernel"]).T
        sd[f"{bp}.attn.rel_pos.mlp.fc2.bias"] = np.asarray(
            flat[f"{o}/rel_pos/fc2/bias"])
        sd[f"{bp}.attn.proj.weight"] = np.asarray(flat[f"{o}/proj/kernel"]).T
        sd[f"{bp}.attn.proj.bias"] = np.asarray(flat[f"{o}/proj/bias"])
        sd[f"{bp}.norm2.weight"] = np.asarray(flat[f"{o}/norm2/scale"])
        sd[f"{bp}.norm2.bias"] = np.asarray(flat[f"{o}/norm2/bias"])
        sd[f"{bp}.mlp.fc1.weight"] = np.asarray(flat[f"{o}/mlp_fc1/kernel"]).T
        sd[f"{bp}.mlp.fc1.bias"] = np.asarray(flat[f"{o}/mlp_fc1/bias"])
        sd[f"{bp}.mlp.fc2.weight"] = np.asarray(flat[f"{o}/mlp_fc2/kernel"]).T
        sd[f"{bp}.mlp.fc2.bias"] = np.asarray(flat[f"{o}/mlp_fc2/bias"])
        i += 1
    sd[f"{t}.norm.weight"] = np.asarray(flat["img/norm/scale"])
    sd[f"{t}.norm.bias"] = np.asarray(flat["img/norm/bias"])
    _export_timm_head(flat, sd)


def _convert_convnext_visual(sd, put):
    """timm ConvNeXt trunk + open_clip TimmModel head -> our native tower.

    Source layout: `visual.trunk.*` (timm convnext: stem.{0 conv,1 LN},
    stages.{i}.downsample.{0 LN,1 conv} for i>=1, stages.{i}.blocks.{j}.
    {conv_dw,norm,mlp.fc1,mlp.fc2,gamma}, head.norm) plus the open_clip
    adapter projection `visual.head.{proj|mlp.*}` (reference
    clipa_torch/open_clip/timm_model.py:64-84). Target: models/convnext.py
    (embedding, downsample_layers{i}{j}, encoderblock_j / stages{i}{j},
    norm, head[_mlp_fc])."""
    t = "visual.trunk"
    put("img/embedding/kernel",
        np.asarray(sd[f"{t}.stem.0.weight"]).transpose(2, 3, 1, 0))
    put("img/embedding/bias", sd[f"{t}.stem.0.bias"])
    put("img/downsample_layers01/scale", sd[f"{t}.stem.1.weight"])
    put("img/downsample_layers01/bias", sd[f"{t}.stem.1.bias"])

    stages = sorted({int(k.split(".")[3]) for k in sd
                     if k.startswith(f"{t}.stages.")})
    for i in stages:
        sp = f"{t}.stages.{i}"
        if i > 0:
            put(f"img/downsample_layers{i}0/scale",
                sd[f"{sp}.downsample.0.weight"])
            put(f"img/downsample_layers{i}0/bias",
                sd[f"{sp}.downsample.0.bias"])
            put(f"img/downsample_layers{i}1/kernel",
                np.asarray(sd[f"{sp}.downsample.1.weight"]
                           ).transpose(2, 3, 1, 0))
            put(f"img/downsample_layers{i}1/bias",
                sd[f"{sp}.downsample.1.bias"])
        blocks = sorted({int(k.split(".")[5]) for k in sd
                         if k.startswith(f"{sp}.blocks.")})
        for j in blocks:
            bp = f"{sp}.blocks.{j}"
            o = f"img/encoderblock_{j}" if i == 0 else f"img/stages{i}{j}"
            # depthwise (C, 1, 7, 7) -> HWIO (7, 7, 1, C)
            put(f"{o}/dwconv/kernel",
                np.asarray(sd[f"{bp}.conv_dw.weight"]).transpose(2, 3, 1, 0))
            put(f"{o}/dwconv/bias", sd[f"{bp}.conv_dw.bias"])
            put(f"{o}/norm/scale", sd[f"{bp}.norm.weight"])
            put(f"{o}/norm/bias", sd[f"{bp}.norm.bias"])
            put(f"{o}/pwconv1/kernel", np.asarray(sd[f"{bp}.mlp.fc1.weight"]).T)
            put(f"{o}/pwconv1/bias", sd[f"{bp}.mlp.fc1.bias"])
            put(f"{o}/pwconv2/kernel", np.asarray(sd[f"{bp}.mlp.fc2.weight"]).T)
            put(f"{o}/pwconv2/bias", sd[f"{bp}.mlp.fc2.bias"])
            if f"{bp}.gamma" in sd:
                put(f"{o}/gamma", sd[f"{bp}.gamma"])

    # final LN after GAP: timm names vary by version (head.norm for the
    # classifier-reset trunk open_clip builds; norm/norm_pre in older tags)
    for cand in (f"{t}.head.norm", f"{t}.norm", f"{t}.norm_pre"):
        if f"{cand}.weight" in sd:
            put("img/norm/scale", sd[f"{cand}.weight"])
            put("img/norm/bias", sd[f"{cand}.bias"])
            break

    _convert_timm_head(sd, put)


def _convert_attn_pooler(sd, src, dst, put):
    """CoCa AttentionalPooler (transformer.py:169-192): torch MHA with
    kdim=context width -> our q/k/v/out Dense params."""
    put(f"{dst}/query", sd[f"{src}.query"])
    for ln, ours in (("ln_q", "ln_q"), ("ln_k", "ln_k")):
        put(f"{dst}/{ours}/scale", sd[f"{src}.{ln}.weight"])
        put(f"{dst}/{ours}/bias", sd[f"{src}.{ln}.bias"])
    if f"{src}.attn.in_proj_weight" in sd:  # packed (kdim == embed_dim)
        w = sd[f"{src}.attn.in_proj_weight"]
        d = w.shape[0] // 3
        wq, wk, wv = w[:d], w[d:2 * d], w[2 * d:]
    else:
        wq = sd[f"{src}.attn.q_proj_weight"]
        wk = sd[f"{src}.attn.k_proj_weight"]
        wv = sd[f"{src}.attn.v_proj_weight"]
        d = wq.shape[0]
    b = sd[f"{src}.attn.in_proj_bias"]
    for name, w_, b_ in (("q_proj", wq, b[:d]), ("k_proj", wk, b[d:2 * d]),
                         ("v_proj", wv, b[2 * d:])):
        put(f"{dst}/{name}/kernel", w_.T)
        put(f"{dst}/{name}/bias", b_)
    put(f"{dst}/out_proj/kernel", sd[f"{src}.attn.out_proj.weight"].T)
    put(f"{dst}/out_proj/bias", sd[f"{src}.attn.out_proj.bias"])


def _convert_cross_blocks(sd, prefix, tower, put, heads=None):
    """CoCa cross-attention blocks (ResidualAttentionBlock with
    is_cross_attention=True, transformer.py:195-251) -> crossblock_i."""
    depth = 1 + max(int(k.split(".")[len(prefix.split("."))])
                    for k in sd if k.startswith(prefix))
    width = sd[f"{prefix}.0.ln_1.weight"].shape[0]
    if heads is None:
        heads = width // {1280: 80, 1664: 104}.get(width, 64)
    head_width = width // heads
    for i in range(depth):
        b = f"{prefix}.{i}"
        o = f"{tower}/crossblock_{i}"
        put(f"{o}/ln_kv/scale", sd[f"{b}.ln_1_kv.weight"])
        put(f"{o}/ln_kv/bias", sd[f"{b}.ln_1_kv.bias"])
        put(f"{o}/LayerNorm_0/scale", sd[f"{b}.ln_1.weight"])
        put(f"{o}/LayerNorm_0/bias", sd[f"{b}.ln_1.bias"])
        put(f"{o}/LayerNorm_1/scale", sd[f"{b}.ln_2.weight"])
        put(f"{o}/LayerNorm_1/bias", sd[f"{b}.ln_2.bias"])
        wqkv = sd[f"{b}.attn.in_proj_weight"]
        bqkv = sd[f"{b}.attn.in_proj_bias"]
        for j, name in enumerate(("query", "key", "value")):
            w = wqkv[j * width:(j + 1) * width]
            put(f"{o}/MultiHeadDotProductAttention_0/{name}/kernel",
                w.T.reshape(width, heads, head_width))
            put(f"{o}/MultiHeadDotProductAttention_0/{name}/bias",
                bqkv[j * width:(j + 1) * width].reshape(heads, head_width))
        put(f"{o}/MultiHeadDotProductAttention_0/out/kernel",
            sd[f"{b}.attn.out_proj.weight"].T.reshape(heads, head_width,
                                                      width))
        put(f"{o}/MultiHeadDotProductAttention_0/out/bias",
            sd[f"{b}.attn.out_proj.bias"])
        put(f"{o}/MlpBlock_0/Dense_0/kernel", sd[f"{b}.mlp.c_fc.weight"].T)
        put(f"{o}/MlpBlock_0/Dense_0/bias", sd[f"{b}.mlp.c_fc.bias"])
        put(f"{o}/MlpBlock_0/Dense_1/kernel", sd[f"{b}.mlp.c_proj.weight"].T)
        put(f"{o}/MlpBlock_0/Dense_1/bias", sd[f"{b}.mlp.c_proj.bias"])


def _convert_resnet_visual(sd, put, stats: dict):
    """ModifiedResNet visual tower: torch `visual.*` -> img/* params plus
    BatchNorm running stats (clipa_torch/open_clip/modified_resnet.py)."""
    def conv(torch_key, our):
        put(f"img/{our}/kernel", sd[f"visual.{torch_key}.weight"]
            .transpose(2, 3, 1, 0))

    def bn(torch_key, our):
        put(f"img/{our}/scale", sd[f"visual.{torch_key}.weight"])
        put(f"img/{our}/bias", sd[f"visual.{torch_key}.bias"])
        stats[f"img/{our}/mean"] = np.asarray(
            sd[f"visual.{torch_key}.running_mean"])
        stats[f"img/{our}/var"] = np.asarray(
            sd[f"visual.{torch_key}.running_var"])

    for i in (1, 2, 3):  # the 3-conv stem
        conv(f"conv{i}", f"conv{i}")
        bn(f"bn{i}", f"bn{i}")
    for layer in (1, 2, 3, 4):
        j = 0
        while f"visual.layer{layer}.{j}.conv1.weight" in sd:
            t, o = f"layer{layer}.{j}", f"layer{layer}_{j}"
            for i in (1, 2, 3):
                conv(f"{t}.conv{i}", f"{o}/conv{i}")
                bn(f"{t}.bn{i}", f"{o}/bn{i}")
            # downsample OrderedDict: "-1"=avgpool, "0"=conv, "1"=bn
            # (modified_resnet.py:36-40)
            if f"visual.{t}.downsample.0.weight" in sd:
                conv(f"{t}.downsample.0", f"{o}/downsample_conv")
                bn(f"{t}.downsample.1", f"{o}/downsample_bn")
            j += 1
    put("img/attnpool/pos_embedding",
        sd["visual.attnpool.positional_embedding"])
    for p in ("q", "k", "v", "c"):
        put(f"img/attnpool/{p}_proj/kernel",
            sd[f"visual.attnpool.{p}_proj.weight"].T)
        put(f"img/attnpool/{p}_proj/bias",
            sd[f"visual.attnpool.{p}_proj.bias"])


def _convert_blocks(sd, prefix, dst, put, heads=None):
    """dst is the destination scope holding encoderblock_i (e.g.
    "img/Transformer", "txt/Transformer", "decoder")."""
    depth = 1 + max(int(k.split(".")[len(prefix.split("."))])
                    for k in sd if k.startswith(prefix))
    width = sd[f"{prefix}.0.ln_1.weight"].shape[0]
    if heads is None:
        # head count is not in the state dict; infer a canonical head_width
        # of 64 unless width is known 80-per-head (H) or 104 (bigG). Callers
        # with init params pass heads explicitly (_heads_from_params).
        heads = width // {1280: 80, 1664: 104}.get(width, 64)
    head_width = width // heads
    for i in range(depth):
        b = f"{prefix}.{i}"
        o = f"{dst}/encoderblock_{i}"
        put(f"{o}/LayerNorm_0/scale", sd[f"{b}.ln_1.weight"])
        put(f"{o}/LayerNorm_0/bias", sd[f"{b}.ln_1.bias"])
        put(f"{o}/LayerNorm_1/scale", sd[f"{b}.ln_2.weight"])
        put(f"{o}/LayerNorm_1/bias", sd[f"{b}.ln_2.bias"])
        wqkv = sd[f"{b}.attn.in_proj_weight"]  # (3w, w)
        bqkv = sd[f"{b}.attn.in_proj_bias"]
        for j, name in enumerate(("query", "key", "value")):
            w = wqkv[j * width:(j + 1) * width]  # (w, w) out,in
            put(f"{o}/MultiHeadDotProductAttention_0/{name}/kernel",
                w.T.reshape(width, heads, head_width))
            put(f"{o}/MultiHeadDotProductAttention_0/{name}/bias",
                bqkv[j * width:(j + 1) * width].reshape(heads, head_width))
        wout = sd[f"{b}.attn.out_proj.weight"]  # (w, w) out,in
        put(f"{o}/MultiHeadDotProductAttention_0/out/kernel",
            wout.T.reshape(heads, head_width, width))
        put(f"{o}/MultiHeadDotProductAttention_0/out/bias",
            sd[f"{b}.attn.out_proj.bias"])
        put(f"{o}/MlpBlock_0/Dense_0/kernel", sd[f"{b}.mlp.c_fc.weight"].T)
        put(f"{o}/MlpBlock_0/Dense_0/bias", sd[f"{b}.mlp.c_fc.bias"])
        put(f"{o}/MlpBlock_0/Dense_1/kernel", sd[f"{b}.mlp.c_proj.weight"].T)
        put(f"{o}/MlpBlock_0/Dense_1/bias", sd[f"{b}.mlp.c_proj.bias"])


def export_torch_state_dict(params, batch_stats=None) -> dict:
    """Our parameter tree -> open_clip torch state_dict layout (inverse of
    convert_torch_variables) for users moving checkpoints the other way.
    `batch_stats` supplies BatchNorm running stats for ResNet towers."""
    from clipa_tpu import utils as u

    flat = dict(u.tree_flatten_with_names(params)[0])
    sd: dict[str, np.ndarray] = {}
    sd["logit_scale"] = np.asarray(flat["t"]).reshape(())
    is_coca = any(k.startswith("decoder/") for k in flat)
    if "img/attnpool/pos_embedding" in flat:
        _export_resnet_visual(flat, batch_stats, sd)
    elif "img/downsample_layers01/scale" in flat:
        _export_convnext_visual(flat, sd)
    elif "img/patch_norm/scale" in flat and \
            "img/layers0_blocks0/norm1/scale" in flat:
        _export_swin_visual(flat, sd)
    elif "img/blocks0/rel_pos/fc1/kernel" in flat:
        _export_relpos_visual(flat, sd)
    else:
        _export_vit_visual(flat, sd, coca=is_coca)
    _export_blocks(flat, sd, "img/Transformer", "visual.transformer.resblocks")

    # CoCa checkpoints use the CustomTextCLIP "text."-prefixed layout
    # (coca_model.py builds self.text via _build_text_tower).
    tp = "text." if is_coca else ""
    sd[f"{tp}token_embedding.weight"] = np.asarray(
        flat["txt/Embed_0/embedding"])
    sd[f"{tp}positional_embedding"] = np.asarray(flat["txt/pos_embedding"])[0]
    sd[f"{tp}text_projection"] = np.asarray(flat["txt/head/kernel"])
    sd[f"{tp}ln_final.weight"] = np.asarray(flat["txt/encoder_norm/scale"])
    sd[f"{tp}ln_final.bias"] = np.asarray(flat["txt/encoder_norm/bias"])
    if "txt/cls_emb" in flat:
        sd[f"{tp}cls_emb"] = np.asarray(flat["txt/cls_emb"]).reshape(-1)
    _export_blocks(flat, sd, "txt/Transformer",
                   f"{tp}transformer.resblocks")

    if is_coca:
        _export_blocks(flat, sd, "decoder", "text_decoder.resblocks")
        _export_cross_blocks(flat, sd, "decoder", "text_decoder.cross_attn")
        sd["text_decoder.ln_final.weight"] = np.asarray(
            flat["decoder/encoder_norm/scale"])
        sd["text_decoder.ln_final.bias"] = np.asarray(
            flat["decoder/encoder_norm/bias"])
        sd["text_decoder.text_projection"] = np.asarray(
            flat["decoder/head/kernel"])
        if "img_pool/query" in flat:
            _export_attn_pooler(flat, sd, "img_pool", "visual.attn_pool")
    return sd


def _export_blocks(flat, sd, tower, prefix):
    i = 0
    while f"{tower}/encoderblock_{i}/LayerNorm_0/scale" in flat:
        o = f"{tower}/encoderblock_{i}"
        b = f"{prefix}.{i}"
        _export_one_block(flat, sd, o, b)
        i += 1


def _export_cross_blocks(flat, sd, tower, prefix):
    i = 0
    while f"{tower}/crossblock_{i}/LayerNorm_0/scale" in flat:
        o = f"{tower}/crossblock_{i}"
        b = f"{prefix}.{i}"
        _export_one_block(flat, sd, o, b)
        sd[f"{b}.ln_1_kv.weight"] = np.asarray(flat[f"{o}/ln_kv/scale"])
        sd[f"{b}.ln_1_kv.bias"] = np.asarray(flat[f"{o}/ln_kv/bias"])
        i += 1


def _export_one_block(flat, sd, o, b):
    sd[f"{b}.ln_1.weight"] = np.asarray(flat[f"{o}/LayerNorm_0/scale"])
    sd[f"{b}.ln_1.bias"] = np.asarray(flat[f"{o}/LayerNorm_0/bias"])
    sd[f"{b}.ln_2.weight"] = np.asarray(flat[f"{o}/LayerNorm_1/scale"])
    sd[f"{b}.ln_2.bias"] = np.asarray(flat[f"{o}/LayerNorm_1/bias"])
    attn = f"{o}/MultiHeadDotProductAttention_0"
    width = flat[f"{o}/LayerNorm_0/scale"].shape[0]
    wq, wk, wv = (np.asarray(flat[f"{attn}/{n}/kernel"]).reshape(
        width, width).T for n in ("query", "key", "value"))
    sd[f"{b}.attn.in_proj_weight"] = np.concatenate([wq, wk, wv], 0)
    sd[f"{b}.attn.in_proj_bias"] = np.concatenate(
        [np.asarray(flat[f"{attn}/{n}/bias"]).reshape(-1)
         for n in ("query", "key", "value")], 0)
    sd[f"{b}.attn.out_proj.weight"] = np.asarray(
        flat[f"{attn}/out/kernel"]).reshape(width, width).T
    sd[f"{b}.attn.out_proj.bias"] = np.asarray(flat[f"{attn}/out/bias"])
    sd[f"{b}.mlp.c_fc.weight"] = np.asarray(
        flat[f"{o}/MlpBlock_0/Dense_0/kernel"]).T
    sd[f"{b}.mlp.c_fc.bias"] = np.asarray(
        flat[f"{o}/MlpBlock_0/Dense_0/bias"])
    sd[f"{b}.mlp.c_proj.weight"] = np.asarray(
        flat[f"{o}/MlpBlock_0/Dense_1/kernel"]).T
    sd[f"{b}.mlp.c_proj.bias"] = np.asarray(
        flat[f"{o}/MlpBlock_0/Dense_1/bias"])


def _export_attn_pooler(flat, sd, src, dst):
    sd[f"{dst}.query"] = np.asarray(flat[f"{src}/query"])
    for ours, ln in (("ln_q", "ln_q"), ("ln_k", "ln_k")):
        sd[f"{dst}.{ln}.weight"] = np.asarray(flat[f"{src}/{ours}/scale"])
        sd[f"{dst}.{ln}.bias"] = np.asarray(flat[f"{src}/{ours}/bias"])
    d = np.asarray(flat[f"{src}/q_proj/kernel"]).shape[1]
    kdim = np.asarray(flat[f"{src}/k_proj/kernel"]).shape[0]
    wq = np.asarray(flat[f"{src}/q_proj/kernel"]).T
    wk = np.asarray(flat[f"{src}/k_proj/kernel"]).T
    wv = np.asarray(flat[f"{src}/v_proj/kernel"]).T
    if kdim == d:  # torch packs same-dim projections
        sd[f"{dst}.attn.in_proj_weight"] = np.concatenate([wq, wk, wv], 0)
    else:
        sd[f"{dst}.attn.q_proj_weight"] = wq
        sd[f"{dst}.attn.k_proj_weight"] = wk
        sd[f"{dst}.attn.v_proj_weight"] = wv
    sd[f"{dst}.attn.in_proj_bias"] = np.concatenate(
        [np.asarray(flat[f"{src}/{n}/bias"]).reshape(-1)
         for n in ("q_proj", "k_proj", "v_proj")], 0)
    sd[f"{dst}.attn.out_proj.weight"] = np.asarray(
        flat[f"{src}/out_proj/kernel"]).T
    sd[f"{dst}.attn.out_proj.bias"] = np.asarray(
        flat[f"{src}/out_proj/bias"])


def _export_vit_visual(flat, sd, coca: bool = False):
    sd["visual.conv1.weight"] = np.asarray(
        flat["img/embedding/kernel"]).transpose(3, 2, 0, 1)
    sd["visual.class_embedding"] = np.asarray(flat["img/cls"]).reshape(-1)
    if "img/pos_embedding" in flat:
        sd["visual.positional_embedding"] = np.asarray(
            flat["img/pos_embedding"])[0]
    ln_post = "img_encoder_norm" if coca else "img/encoder_norm"
    proj = "img_head/kernel" if coca else "img/head/kernel"
    if proj in flat:
        sd["visual.proj"] = np.asarray(flat[proj])
    sd["visual.ln_post.weight"] = np.asarray(flat[f"{ln_post}/scale"])
    sd["visual.ln_post.bias"] = np.asarray(flat[f"{ln_post}/bias"])
    if "img/ln_pre/scale" in flat:
        sd["visual.ln_pre.weight"] = np.asarray(flat["img/ln_pre/scale"])
        sd["visual.ln_pre.bias"] = np.asarray(flat["img/ln_pre/bias"])


def _export_convnext_visual(flat, sd):
    """img/* ConvNeXt tower -> timm trunk + open_clip TimmModel head keys
    (inverse of _convert_convnext_visual)."""
    t = "visual.trunk"
    sd[f"{t}.stem.0.weight"] = np.asarray(
        flat["img/embedding/kernel"]).transpose(3, 2, 0, 1)
    sd[f"{t}.stem.0.bias"] = np.asarray(flat["img/embedding/bias"])
    sd[f"{t}.stem.1.weight"] = np.asarray(flat["img/downsample_layers01/scale"])
    sd[f"{t}.stem.1.bias"] = np.asarray(flat["img/downsample_layers01/bias"])
    for i in range(4):
        if i > 0:
            if f"img/downsample_layers{i}0/scale" not in flat:
                break
            sd[f"{t}.stages.{i}.downsample.0.weight"] = np.asarray(
                flat[f"img/downsample_layers{i}0/scale"])
            sd[f"{t}.stages.{i}.downsample.0.bias"] = np.asarray(
                flat[f"img/downsample_layers{i}0/bias"])
            sd[f"{t}.stages.{i}.downsample.1.weight"] = np.asarray(
                flat[f"img/downsample_layers{i}1/kernel"]).transpose(3, 2, 0, 1)
            sd[f"{t}.stages.{i}.downsample.1.bias"] = np.asarray(
                flat[f"img/downsample_layers{i}1/bias"])
        j = 0
        while True:
            o = f"img/encoderblock_{j}" if i == 0 else f"img/stages{i}{j}"
            if f"{o}/dwconv/kernel" not in flat:
                break
            bp = f"{t}.stages.{i}.blocks.{j}"
            sd[f"{bp}.conv_dw.weight"] = np.asarray(
                flat[f"{o}/dwconv/kernel"]).transpose(3, 2, 0, 1)
            sd[f"{bp}.conv_dw.bias"] = np.asarray(flat[f"{o}/dwconv/bias"])
            sd[f"{bp}.norm.weight"] = np.asarray(flat[f"{o}/norm/scale"])
            sd[f"{bp}.norm.bias"] = np.asarray(flat[f"{o}/norm/bias"])
            sd[f"{bp}.mlp.fc1.weight"] = np.asarray(
                flat[f"{o}/pwconv1/kernel"]).T
            sd[f"{bp}.mlp.fc1.bias"] = np.asarray(flat[f"{o}/pwconv1/bias"])
            sd[f"{bp}.mlp.fc2.weight"] = np.asarray(
                flat[f"{o}/pwconv2/kernel"]).T
            sd[f"{bp}.mlp.fc2.bias"] = np.asarray(flat[f"{o}/pwconv2/bias"])
            if f"{o}/gamma" in flat:
                sd[f"{bp}.gamma"] = np.asarray(flat[f"{o}/gamma"])
            j += 1
    sd[f"{t}.head.norm.weight"] = np.asarray(flat["img/norm/scale"])
    sd[f"{t}.head.norm.bias"] = np.asarray(flat["img/norm/bias"])
    _export_timm_head(flat, sd)


def _export_resnet_visual(flat, batch_stats, sd):
    """img/* ModifiedResNet params (+ batch_stats) -> torch visual.* keys."""
    from clipa_tpu import utils as u

    stats = dict(u.tree_flatten_with_names(batch_stats)[0]
                 ) if batch_stats else {}

    def conv(our, torch_key):
        sd[f"visual.{torch_key}.weight"] = np.asarray(
            flat[f"img/{our}/kernel"]).transpose(3, 2, 0, 1)

    def bn(our, torch_key):
        sd[f"visual.{torch_key}.weight"] = np.asarray(flat[f"img/{our}/scale"])
        sd[f"visual.{torch_key}.bias"] = np.asarray(flat[f"img/{our}/bias"])
        c = sd[f"visual.{torch_key}.weight"].shape[0]
        sd[f"visual.{torch_key}.running_mean"] = np.asarray(
            stats.get(f"img/{our}/mean", np.zeros(c, np.float32))).reshape(c)
        sd[f"visual.{torch_key}.running_var"] = np.asarray(
            stats.get(f"img/{our}/var", np.ones(c, np.float32))).reshape(c)

    for i in (1, 2, 3):
        conv(f"conv{i}", f"conv{i}")
        bn(f"bn{i}", f"bn{i}")
    for layer in (1, 2, 3, 4):
        j = 0
        while f"img/layer{layer}_{j}/conv1/kernel" in flat:
            o, t = f"layer{layer}_{j}", f"layer{layer}.{j}"
            for i in (1, 2, 3):
                conv(f"{o}/conv{i}", f"{t}.conv{i}")
                bn(f"{o}/bn{i}", f"{t}.bn{i}")
            if f"img/{o}/downsample_conv/kernel" in flat:
                conv(f"{o}/downsample_conv", f"{t}.downsample.0")
                bn(f"{o}/downsample_bn", f"{t}.downsample.1")
            j += 1
    sd["visual.attnpool.positional_embedding"] = np.asarray(
        flat["img/attnpool/pos_embedding"])
    for p in ("q", "k", "v", "c"):
        sd[f"visual.attnpool.{p}_proj.weight"] = np.asarray(
            flat[f"img/attnpool/{p}_proj/kernel"]).T
        sd[f"visual.attnpool.{p}_proj.bias"] = np.asarray(
            flat[f"img/attnpool/{p}_proj/bias"])


# ---------------------------------------------------------------------------
# transforms + tokenizer
# ---------------------------------------------------------------------------

def image_transform(image_size: int, is_train: bool, *,
                    mean=None, std=None, interpolation: str = "bicubic",
                    square_resize_only: bool = False,
                    scale=(0.9, 1.0)) -> Callable:
    """Returns a numpy preprocess callable (PIL/array/bytes -> CHW float32).

    Matches open_clip's transform semantics
    (clipa_torch/open_clip/transform.py): train = RandomResizedCrop(+flip),
    eval = Resize+CenterCrop or square resize; output normalized float CHW.
    """
    mean = np.asarray(mean or OPENAI_MEAN, np.float32)
    std = np.asarray(std or OPENAI_STD, np.float32)
    from clipa_tpu.registry import get_preprocess_fn

    if is_train:
        pp = get_preprocess_fn(
            f'decode_jpeg_and_inception_crop(size={image_size}, '
            f'area_min={int(scale[0] * 100)}, area_max={int(scale[1] * 100)},'
            f' method="{interpolation}")|flip_lr')
    elif square_resize_only:
        pp = get_preprocess_fn(
            f'decode|resize({image_size}, method="{interpolation}")')
    else:
        pp = get_preprocess_fn(
            f'decode|resize_small({image_size}, method="{interpolation}")|'
            f'central_crop({image_size})')

    def _transform(image):
        if hasattr(image, "convert"):  # PIL image
            image = np.asarray(image.convert("RGB"))
        out = pp({"image": image, "_rng": np.random.default_rng()})
        x = out["image"].astype(np.float32) / 255.0
        x = (x - mean) / std
        return x.transpose(2, 0, 1)  # CHW for drop-in torch compatibility

    _transform.image_size = image_size
    return _transform


def get_tokenizer(model_name: str, *, vocab_path: Optional[str] = None,
                  context_length: Optional[int] = None) -> Callable:
    """Returns texts -> (B, context_length) int32 token array.

    BERT-tokenizer configs (all CLIPA-v2 BigVision models) use our WordPiece
    stack, with syntax-priority sampling when the config says
    `text_mask: syntax`. BPE (OpenAI-vocab) configs require a merges file:
    pass it via vocab_path.
    """
    cfg = get_model_config(model_name)["text_cfg"]
    ctx = context_length or cfg.get("context_length", 77)
    vocab_path = vocab_path or os.environ.get("CLIPA_VOCAB_PATH")

    if "hf_tokenizer_name" in cfg:
        # HF tokenizer (reference factory.py get_tokenizer HF branch).
        # transformers is a baked-in dependency; in offline environments
        # point vocab_path (or HF_HOME cache) at a local tokenizer dir.
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(
            vocab_path or cfg["hf_tokenizer_name"])

        def hf_tokenize(texts, rng=None):
            if isinstance(texts, (str, bytes)):
                texts = [texts]
            enc = tok(list(texts), padding="max_length", truncation=True,
                      max_length=ctx, return_tensors="np")
            return enc["input_ids"].astype(np.int32)

        return hf_tokenize

    if not cfg.get("bert_tokenizer") and cfg.get("vocab_size") == 49408:
        if not vocab_path:
            raise ValueError(
                f"{model_name} uses the OpenAI BPE vocab; provide the "
                f"merges file (bpe_simple_vocab_16e6.txt.gz) via "
                f"vocab_path= or CLIPA_VOCAB_PATH. BigVision-suffixed "
                f"models use WordPiece and work out of the box.")
        from clipa_tpu.pp.bpe_tokenizer import SimpleTokenizer
        bpe = SimpleTokenizer(vocab_path, context_length=ctx)
        if cfg.get("text_mask") == "syntax":
            return _syntax_bpe(bpe, ctx)
        return bpe
    if not vocab_path:
        raise ValueError("vocab_path (or CLIPA_VOCAB_PATH) is required")

    from clipa_tpu.registry import get_preprocess_fn
    op_name = ("syntax_tokenize" if cfg.get("text_mask") == "syntax"
               else "bert_tokenize")
    pp = get_preprocess_fn(
        f'{op_name}(inkey="texts", max_len={ctx}, vocab_path="{vocab_path}", '
        f'sample_if_multi=False)')

    def tokenize(texts, rng=None):
        if isinstance(texts, (str, bytes)):
            texts = [texts]
        rng = rng or np.random.default_rng(0)
        return np.stack([pp({"texts": t, "_rng": rng})["labels"]
                         for t in texts])

    tokenize.context_length = ctx
    return tokenize


def _syntax_bpe(bpe, ctx: int):
    """Syntax-priority word sampling before BPE (the torch
    syntax_mask_tokenize path, clipa_torch/open_clip/tokenizer.py:281-340)."""
    import numpy as np
    from clipa_tpu.pp.ops_text import pos_priorities

    def tokenize(texts, rng=None):
        if isinstance(texts, (str, bytes)):
            texts = [texts]
        out = np.zeros((len(texts), ctx), np.int32)
        budget = ctx - 2
        for i, text in enumerate(texts):
            words = str(text).split()
            ids = bpe.encode(" ".join(words))
            if len(ids) > budget and words:
                pri = pos_priorities(words)
                order = np.argsort(pri, kind="stable")
                keep = sorted(order[:budget].tolist())
                ids = bpe.encode(" ".join(words[k] for k in keep))
            toks = [bpe.sot] + ids[:budget] + [bpe.eot]
            out[i, :len(toks)] = toks
        return out

    tokenize.context_length = ctx
    return tokenize


def create_loss(model_name_or_cfg, *, distill: bool = False,
                coca_caption_loss_weight: float = 2.0,
                coca_contrastive_loss_weight: float = 1.0,
                pad_id: int = 0) -> Callable:
    """Loss selector, mirroring the reference factory's create_loss
    (clipa_torch/open_clip/factory.py): CoCa configs get CoCaLoss, distill
    gets DistillClipLoss, everything else ClipLoss. Returns a callable
    over our loss signatures (clipa_tpu.losses)."""
    from clipa_tpu import losses as losses_lib

    cfg = (get_model_config(model_name_or_cfg)
           if isinstance(model_name_or_cfg, str) else model_name_or_cfg)
    if distill:
        return losses_lib.distill_contrastive_loss
    if "multimodal_cfg" in cfg:
        return functools.partial(
            losses_lib.coca_loss,
            clip_loss_weight=coca_contrastive_loss_weight,
            caption_loss_weight=coca_caption_loss_weight, pad_id=pad_id)
    return functools.partial(losses_lib.bidirectional_contrastive_loss,
                             reduction=True)


def create_model_and_transforms(model_name: str,
                                pretrained: Optional[str] = None, *,
                                image_mean=None, image_std=None,
                                force_image_size: Optional[int] = None,
                                interpolation: str = "bicubic",
                                square_resize_only: bool = False,
                                **kw):
    """The reference's main entry point (factory.py:293): returns
    (model, preprocess_train, preprocess_val)."""
    model = create_model(model_name, pretrained,
                         force_image_size=force_image_size, **kw)
    mean = image_mean or (IMAGENET_MEAN if "BigVision" in model_name
                          else OPENAI_MEAN)
    std = image_std or (IMAGENET_STD if "BigVision" in model_name
                        else OPENAI_STD)
    train_t = image_transform(model.image_size, True, mean=mean, std=std,
                              interpolation=interpolation)
    val_t = image_transform(model.image_size, False, mean=mean, std=std,
                            interpolation=interpolation,
                            square_resize_only=square_resize_only)
    return model, train_t, val_t


def create_model_from_pretrained(model_name: str, pretrained: str, **kw):
    """open_clip parity alias: returns (model, preprocess_val)."""
    model, _, preprocess_val = create_model_and_transforms(
        model_name, pretrained, **kw)
    return model, preprocess_val


def _infer_openai_config(sd: dict) -> dict:
    """open_clip model-config dict from an OpenAI CLIP state dict's shapes
    (clipa_torch/open_clip/model.py:376-419), ViT or ModifiedResNet."""
    text_width = sd["ln_final.weight"].shape[0]
    text_cfg = {
        "context_length": int(sd["positional_embedding"].shape[0]),
        "vocab_size": int(sd["token_embedding.weight"].shape[0]),
        "width": int(text_width),
        "heads": max(1, int(text_width // 64)),
        "layers": len({k.split(".")[2] for k in sd
                       if k.startswith("transformer.resblocks")}),
    }
    if "visual.attnpool.positional_embedding" in sd:
        # ModifiedResNet (model.py:388-397): per-stage block counts from the
        # layer indices; image size from the attn-pool grid (x32 stride).
        counts = [len({k.split(".")[2] for k in sd
                       if k.startswith(f"visual.layer{b}.")})
                  for b in (1, 2, 3, 4)]
        width = int(sd["visual.layer1.0.conv1.weight"].shape[0])
        grid = round((sd["visual.attnpool.positional_embedding"].shape[0]
                      - 1) ** 0.5)
        return {
            "embed_dim": int(sd["text_projection"].shape[1]),
            "quick_gelu": True,
            "vision_cfg": {
                "layers": counts, "width": width, "patch_size": None,
                "image_size": int(grid * 32),
            },
            "text_cfg": text_cfg,
        }
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_layers = len([k for k in sd if k.startswith("visual.")
                         and k.endswith(".attn.in_proj_weight")])
    patch = sd["visual.conv1.weight"].shape[-1]
    grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
    text_width = sd["ln_final.weight"].shape[0]
    return {
        "embed_dim": int(sd["text_projection"].shape[1]),
        "quick_gelu": True,
        "vision_cfg": {
            "layers": int(vision_layers), "width": int(vision_width),
            "patch_size": int(patch), "image_size": int(patch * grid),
        },
        "text_cfg": {
            "context_length": int(sd["positional_embedding"].shape[0]),
            "vocab_size": int(sd["token_embedding.weight"].shape[0]),
            "width": int(text_width),
            "heads": max(1, int(text_width // 64)),
            "layers": len({k.split(".")[2] for k in sd
                           if k.startswith("transformer.resblocks")}),
        },
    }


def load_openai_model(path: str, *, precision: str = "float32",
                      seed: int = 0) -> CLIPModel:
    """Loads an OpenAI CLIP release (TorchScript archive or plain state
    dict), inferring the architecture from tensor shapes — the capability of
    the reference's `load_openai_model` (clipa_torch/open_clip/openai.py:23)
    without the torch.jit execution path (we rebuild as JAX, so `jit=True`
    tracing is meaningless here)."""
    import torch
    from clipa_tpu.models import two_towers

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = sd.get("state_dict", sd)
    except Exception:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    sd_np = {k: v.numpy() for k, v in sd.items()
             if isinstance(v, torch.Tensor)}

    cfg = _infer_openai_config(sd_np)
    tt_cfg = _to_two_towers_cfg(cfg)
    dtype = {"float32": None, "bf16": jnp.bfloat16,
             "bfloat16": jnp.bfloat16}[precision]
    model = two_towers.Model(dtype=dtype, **tt_cfg)
    image_size = cfg["vision_cfg"]["image_size"]
    ctx = cfg["text_cfg"]["context_length"]
    variables = jax.jit(lambda r: model.init(
        {"params": r}, jnp.zeros((1, image_size, image_size, 3)),
        jnp.zeros((1, ctx), jnp.int32)))(jax.random.PRNGKey(seed))
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}

    from clipa_tpu.models.common import merge_params
    loaded_vars = convert_torch_variables(sd_np,
                                          heads=_heads_from_params(params))
    params = merge_params(loaded_vars["params"], params)
    for coll, tree in loaded_vars.items():
        if coll != "params" and coll in model_state:
            model_state[coll] = merge_params(tree, model_state[coll])
    return CLIPModel(model, params, cfg, image_size, ctx,
                     model_state=model_state)
