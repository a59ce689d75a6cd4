"""Template selection logic (ref: utils/trainer.py:210-220).

The default bank starts with "a photo of a {}." and extends with the 7-template
select bank, then the 80-template full bank, up to ``num_templates``. With
``use_custom_templates`` the per-dataset 15-template bank is used instead.
"""

from __future__ import annotations

from typing import List

from clip_gp_tpu.data.template_banks import (
    CUSTOM_TEMPLATES,
    IMAGENET_TEMPLATES,
    IMAGENET_TEMPLATES_SELECT,
    SINGLE_TEMPLATES,
)

__all__ = [
    "CUSTOM_TEMPLATES",
    "IMAGENET_TEMPLATES",
    "IMAGENET_TEMPLATES_SELECT",
    "SINGLE_TEMPLATES",
    "get_templates",
]


def get_templates(config) -> List[str]:
    if config.adapter.use_custom_templates:
        return CUSTOM_TEMPLATES[config.dataset.name]
    templates = ["a photo of a {}."]
    n = config.adapter.num_templates
    if n > 1:
        templates += IMAGENET_TEMPLATES_SELECT[: n - 1]
    if n > 1 + len(IMAGENET_TEMPLATES_SELECT):
        templates += IMAGENET_TEMPLATES[: n - 1 - len(IMAGENET_TEMPLATES_SELECT)]
    return templates
