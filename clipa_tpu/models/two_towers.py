"""Two-tower CLIP model: image encoder + text encoder + learned temperature.

Reference behavior (clipa_jax/models/two_towers.py:31-131): towers named
"img"/"txt", embeddings L2-normalized with a 1e-8 floor, scalar log-temperature
parameter "t" initialized to log(temperature_init) (CLIPA uses 1/0.07).
Either input may be None (evaluators embed one modality at a time).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from clipa_tpu.models import get_model_module

ConfigDict = Any


class Model(nn.Module):
    image: Optional[ConfigDict] = None
    text: Optional[ConfigDict] = None
    image_model: str = "vit"
    text_model: str = "text_transformer"
    out_dim: Union[int, Tuple[Optional[int], int]] = 512
    temperature_init: float = 1.0
    # SigLIP's learnable scalar logit bias (arxiv.org/abs/2303.15343 §3.1,
    # recommended -10.0); None (the CLIPA default) adds no parameter, so
    # reference checkpoints are unaffected. Consumed by the sigmoid losses.
    bias_init: Optional[float] = None
    dtype: Optional[Any] = None  # compute dtype for both towers

    @nn.compact
    def __call__(self, image, text=None, *, train: bool = False,
                 mask_ratio: float = 0.0, **kw):
        """Returns (zimg, ztxt, out) with L2-normalized (B, C) embeddings."""
        out = {}
        out_dims = self.out_dim
        if isinstance(out_dims, int):
            out_dims = (out_dims, out_dims)

        ztxt = zimg = None
        if text is not None:
            text_model = get_model_module(self.text_model).Model(
                **{"num_classes": out_dims[1], "dtype": self.dtype,
                   **(self.text or {})}, name="txt")
            ztxt, out_txt = text_model(text, train=train, **kw)
            out["txt/norm"] = jnp.linalg.norm(ztxt, axis=1, keepdims=True)
            out["txt/normalized"] = ztxt = ztxt / (out["txt/norm"] + 1e-8)
            for k, v in out_txt.items():
                out[f"txt/{k}"] = v

        if image is not None:
            image_model = get_model_module(self.image_model).Model(
                **{"num_classes": out_dims[0], "dtype": self.dtype,
                   **(self.image or {})}, name="img")
            zimg, out_img = image_model(
                image, train=train, mask_ratio=mask_ratio, **kw)
            out["img/norm"] = jnp.linalg.norm(zimg, axis=1, keepdims=True)
            out["img/normalized"] = zimg = zimg / (out["img/norm"] + 1e-8)
            for k, v in out_img.items():
                out[f"img/{k}"] = v

        temp_init = jnp.log(self.temperature_init)
        t = self.param("t", lambda key, shape, dtype: temp_init *
                       jnp.ones(shape, dtype), (1,), jnp.float32)
        out["t"] = jnp.exp(t)
        out["t/parameter"] = t
        if self.bias_init is not None:
            bias_init = self.bias_init
            out["b"] = self.param(
                "b", lambda key, shape, dtype: bias_init *
                jnp.ones(shape, dtype), (1,), jnp.float32)
        return zimg, ztxt, out


def load(init_params, init_files, model_cfg, img_load_kw=None,
         txt_load_kw=None):
    """Loads both towers; `init_files` is a dict with img/txt/t keys or a path.

    A plain string means one two_towers checkpoint: each subtree is pulled out
    with the `file.npz:key` syntax (reference: two_towers.py:100-131).
    """
    from clipa_tpu.train import checkpoint as ckpt

    if isinstance(init_files, str):
        init_files = {k: f"{init_files}:{k}" for k in ("img", "txt", "t")}
    else:
        init_files = {**init_files}

    restored = {**init_params}
    img_init = init_files.pop("image", init_files.pop("img", None))
    if img_init:
        restored["img"] = get_model_module(model_cfg.image_model).load(
            init_params["img"], img_init, model_cfg.get("image"),
            **(img_load_kw or {}))
    txt_init = init_files.pop("text", init_files.pop("txt", None))
    if txt_init:
        restored["txt"] = get_model_module(model_cfg.text_model).load(
            init_params["txt"], txt_init, model_cfg.get("text"),
            **(txt_load_kw or {}))
    t_init = init_files.pop("temperature", init_files.pop("t", None))
    if t_init:
        restored["t"] = ckpt.load_params(t_init)
    if init_files:
        raise ValueError(f"Unused keys in model_init: {list(init_files)}")
    return restored
