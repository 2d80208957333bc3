"""open_clip-compatible public API (the surface downstream users call)."""

from clipa_tpu.compat.openclip import (  # noqa: F401
    create_loss,
    create_model,
    create_model_and_transforms,
    create_model_from_pretrained,
    get_model_config,
    get_tokenizer,
    list_models,
)
from clipa_tpu.compat.pretrained import (  # noqa: F401
    download_pretrained,
    get_pretrained_cfg,
    is_pretrained_cfg,
    list_pretrained,
    list_pretrained_models_by_tag,
    list_pretrained_tags_by_model,
)
from clipa_tpu.compat.export import (  # noqa: F401
    push_to_hf_hub,
    save_open_clip,
)
