"""open_clip-compatible public API (the surface downstream users call)."""

from clipa_tpu.compat.openclip import (  # noqa: F401
    create_model,
    create_model_and_transforms,
    get_model_config,
    get_tokenizer,
    list_models,
)
