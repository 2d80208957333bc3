"""Pretrained checkpoint registry.

Name/tag -> source mapping for released CLIPA weights (the reference's
pretrained.py surface, clipa_torch/open_clip/pretrained.py). Zero-egress
hosts resolve local paths only; on connected hosts `download_pretrained`
pulls from HF Hub (the UCSC-VLAA org publishes all CLIPA-v2 weights).
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

# model name -> tag -> hf hub repo (UCSC-VLAA released checkpoints)
_PRETRAINED = {
    "ViT-B-16-CL32-GAP-BigVision": {
        "laion400m": "UCSC-VLAA/ViT-B-16-CL32-GAP-laion400m",
    },
    "ViT-L-14-CL32-GAP-BigVision": {
        "datacomp1b": "UCSC-VLAA/ViT-L-14-CLIPA-datacomp1B",
        "datacomp1b-336": "UCSC-VLAA/ViT-L-14-CLIPA-336-datacomp1B",
    },
    "ViT-H-14-CL32-GAP-BigVision": {
        "laion2b": "UCSC-VLAA/ViT-H-14-CLIPA-laion2B",
        "datacomp1b": "UCSC-VLAA/ViT-H-14-CLIPA-datacomp1B",
        "datacomp1b-336": "UCSC-VLAA/ViT-H-14-CLIPA-336-datacomp1B",
    },
    "ViT-bigG-14-CL32-GAP-BigVision": {
        "datacomp1b": "UCSC-VLAA/ViT-bigG-14-CLIPA-datacomp1B",
        "datacomp1b-336": "UCSC-VLAA/ViT-bigG-14-CLIPA-336-datacomp1B",
    },
    # OpenAI CLIP releases (load via compat.openclip.load_openai_model or
    # the HF-hub open_clip mirrors; quick_gelu configs)
    "ViT-B-32-quickgelu": {"openai": "timm/vit_base_patch32_clip_224.openai"},
    "ViT-B-16-quickgelu": {"openai": "timm/vit_base_patch16_clip_224.openai"},
    "ViT-L-14-quickgelu": {"openai": "timm/vit_large_patch14_clip_224.openai"},
}


def list_pretrained() -> list[tuple[str, str]]:
    return [(model, tag) for model, tags in _PRETRAINED.items()
            for tag in tags]


def get_pretrained_cfg(model: str, tag: str) -> Optional[dict]:
    repo = _PRETRAINED.get(model, {}).get(tag)
    return {"hf_hub": repo} if repo else None


def download_pretrained(model: str, tag: str,
                        cache_dir: Optional[str] = None) -> str:
    """Resolves a (model, tag) to a local checkpoint file.

    Local paths pass through; otherwise tries HF Hub (requires network).
    """
    if os.path.exists(tag):
        return tag
    cfg = get_pretrained_cfg(model, tag)
    if cfg is None:
        raise KeyError(f"No pretrained tag {tag!r} for {model!r}; "
                       f"known: {list(_PRETRAINED.get(model, {}))}")
    try:
        from huggingface_hub import hf_hub_download
        return hf_hub_download(cfg["hf_hub"], "open_clip_pytorch_model.bin",
                               cache_dir=cache_dir)
    except Exception as e:
        raise RuntimeError(
            f"Cannot download {cfg['hf_hub']} (offline host?). Download the "
            f"checkpoint manually and pass its local path.") from e


def checkpoint_sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()
