"""Model zoo: two-tower CLIP with ViT image and transformer text encoders."""

import importlib


def get_model_module(name: str):
    """Resolves a short model name to its module (e.g. "vit", "text_transformer")."""
    aliases = {
        "vit": "clipa_tpu.models.vit",
        "text_transformer": "clipa_tpu.models.text",
        "proj.image_text.text_transformer": "clipa_tpu.models.text",
        "two_towers": "clipa_tpu.models.two_towers",
        "convnext": "clipa_tpu.models.convnext",
        "swin": "clipa_tpu.models.swin",
        "vit_relpos": "clipa_tpu.models.vit_relpos",
        "resnet": "clipa_tpu.models.resnet",
        "coca": "clipa_tpu.models.coca",
        "hf_text": "clipa_tpu.models.hf_text",
        "t5_text": "clipa_tpu.models.t5_text",
        "multimodal": "clipa_tpu.models.multimodal",
        "bert": "clipa_tpu.models.bert",
        "proj.flaxformer.bert": "clipa_tpu.models.bert",
    }
    return importlib.import_module(aliases.get(name, name))
