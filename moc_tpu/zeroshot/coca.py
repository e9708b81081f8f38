"""CoCa vision-language model in flax (CONCH configuration).

Behavioral reference ``/root/reference/models/conch/open_clip_custom/
coca_model.py:150-246``: frozen-encoder usage only — ``encode_text`` drops
the final placeholder pad to make room for the CLS slot and L2-normalizes;
``encode_image`` returns the normalized contrastive embedding; the caption
decoder is not needed for any MOC workload and is omitted (the reference
never invokes it either: only ``encode_text``/``encode_image`` are called,
``utils/zeroshot_utils.py:36``, ``utils/lora_utils.py``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from moc_tpu.zeroshot.text_tower import TextConfig, TextTower
from moc_tpu.zeroshot.vision_tower import VisionConfig, VisionTower


@dataclasses.dataclass(frozen=True)
class CoCaConfig:
    text: TextConfig = TextConfig()
    vision: VisionConfig = VisionConfig()


CONCH_VITB16 = CoCaConfig()  # the conch_ViT-B-16.json configuration


from moc_tpu.models.layers import l2norm as _l2norm  # noqa: E402  (shared def)


class CoCa(nn.Module):
    cfg: CoCaConfig = CONCH_VITB16

    def setup(self):
        self.text = TextTower(self.cfg.text, name="text")
        self.visual = VisionTower(self.cfg.vision, name="visual")
        self.logit_scale = self.param(
            "logit_scale", lambda *_: jnp.log(1.0 / 0.07)
        )

    def encode_text(self, token_ids, normalize: bool = True):
        """token_ids ``[B, 128]`` (127 tokens + placeholder pad) → ``[B, 512]``."""
        pooled = self.text(token_ids[:, :-1])  # drop placeholder, CLS appended inside
        return _l2norm(pooled) if normalize else pooled

    def encode_image(self, images, normalize: bool = True, proj_contrast: bool = True):
        if proj_contrast:
            pooled, _ = self.visual(images)
        else:
            pooled = self.visual.forward_no_head(images)
        return _l2norm(pooled) if normalize else pooled

    def __call__(self, images, token_ids):
        img = self.encode_image(images)
        txt = self.encode_text(token_ids)
        return img, txt, jnp.exp(self.logit_scale)
