"""ViLa-MIL: dual-scale prompt-learning MIL over a frozen text tower.

Behavioral reference ``/root/reference/models/model_ViLa_MIL.py``:
  * CoOp-style ``PromptLearner`` (lines 168-262): 16 learnable context
    vectors spliced between the BOS embedding and the classname-token
    embeddings of the CONCH vocabulary; one prompt per (class × scale), the
    first C for the low scale, the next C for the high scale;
  * ``TextEncoder`` (37-53): re-drives the CONCH text transformer on the
    soft prompts WITHOUT the causal mask, pooling at the EOT (argmax) token
    and projecting to the 512-d space;
  * learnable image prototypes cross-attended against each scale's patch bag
    (cross_attention_1, 317-322), gated attention pooling shared across
    scales (324-338), text features contextualized by [prototypes; patches]
    via cross_attention_2 (340-348);
  * ``logits = img_lowᵀtext_low + img_highᵀtext_high`` (350-352).

TPU-native: both scales are padded+masked bags; prompt constants
(BOS/classname embeddings, EOT indices) are precomputed host-side with
``build_prompt_constants`` from converted CONCH params.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from moc_tpu.nn.transformer import CrossAttention, LayerNorm, Transformer
from moc_tpu.zeroshot.text_tower import TextConfig


@dataclasses.dataclass(frozen=True)
class VilaConfig:
    n_classes: int = 2
    input_size: int = 512  # patch-embedding / fusion dim
    hidden_size: int = 192  # gated-attention hidden
    prototype_number: int = 16
    n_ctx: int = 16
    text: TextConfig = TextConfig()


@dataclasses.dataclass(frozen=True)
class PromptConstants:
    """Host-side prompt tensors: [2C, 1, W] BOS embeds, [2C, L-1-n_ctx, W]
    classname/EOT/pad embeds, [2C] EOT positions."""

    token_prefix: np.ndarray
    token_suffix: np.ndarray
    eot_idx: np.ndarray


def load_vila_prompts(csv_path: str) -> list[str]:
    """Read a ViLa two-scale prompt CSV (one full-sentence prompt per line,
    first C lines = low scale, next C = high scale — the reference's
    ``models/prompts/vila_text_prompt/*.csv`` consumed as
    ``config.text_prompt``)."""
    import csv

    prompts = []
    with open(csv_path, newline="") as f:
        for row in csv.reader(f):
            if row and row[0].strip():
                prompts.append(row[0].strip())
    return prompts


def build_prompt_constants(token_embedding: np.ndarray, tokenizer, classnames,
                           n_ctx: int = 16) -> PromptConstants:
    """Assemble CoOp prompt constants from a token-embedding table ``[V, W]``
    (e.g. converted CONCH ``text.token_embedding``) and classname strings.

    ``classnames`` must have 2·C entries (low-scale then high-scale prompts,
    ref ``config.text_prompt``)."""
    ids = tokenizer(list(classnames))  # [2C, 128]
    emb = np.asarray(token_embedding)[ids]  # [2C, 128, W]
    suffix = emb[:, 1 + n_ctx :]
    # token positions 1..n_ctx are replaced by the learned ctx vectors, so
    # prompts that only differ inside that window collapse to identical
    # suffixes — every class gets the same text feature and gradients cancel
    if len(classnames) > 1 and len(np.unique(
            np.asarray(ids)[:, 1 + n_ctx:], axis=0)) == 1:
        import warnings

        warnings.warn(
            "all prompt suffixes are identical after the first "
            f"{1 + n_ctx} tokens; class words this early are discarded by "
            "the soft-prompt window and the classifier cannot separate "
            "classes — move distinguishing words later in the prompt",
            stacklevel=2,
        )
    return PromptConstants(
        token_prefix=emb[:, :1],
        token_suffix=suffix,
        eot_idx=np.argmax(ids, axis=1),
    )


class ViLaTextEncoder(nn.Module):
    """The CONCH text transformer re-driven on soft prompts, mask-free,
    EOT-pooled (ref ``TextEncoder``, lines 37-53)."""

    cfg: TextConfig = TextConfig()

    @nn.compact
    def __call__(self, prompt_embeds, eot_idx):
        cfg = self.cfg
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.width))
        x = prompt_embeds + pos[: prompt_embeds.shape[1]]
        x = Transformer(cfg.width, cfg.layers, cfg.heads, name="transformer")(x)
        x = LayerNorm(name="ln_final")(x)
        pooled = x[jnp.arange(x.shape[0]), eot_idx]
        proj = self.param("text_projection", nn.initializers.normal(cfg.width ** -0.5),
                          (cfg.width, cfg.output_dim))
        return pooled @ proj


class ViLaMIL(nn.Module):
    cfg: VilaConfig = VilaConfig()

    @nn.compact
    def __call__(self, x_s, mask_s, x_l, mask_l, prompts: PromptConstants):
        """Dual-scale padded bags ``x_s/x_l [N, D]`` + masks → logits ``[C]``."""
        cfg = self.cfg
        c = cfg.n_classes
        d = cfg.input_size

        # --- soft prompts → text features [2C, 512]
        ctx = self.param("ctx", nn.initializers.normal(0.02),
                         (cfg.n_ctx, cfg.text.width))
        prefix = jnp.asarray(prompts.token_prefix)
        suffix = jnp.asarray(prompts.token_suffix)
        n_prompts = prefix.shape[0]
        prompt_embeds = jnp.concatenate(
            [prefix, jnp.broadcast_to(ctx, (n_prompts, *ctx.shape)), suffix], axis=1
        )
        text_features = ViLaTextEncoder(cfg.text, name="text_encoder")(
            prompt_embeds, jnp.asarray(prompts.eot_idx)
        )  # [2C, 512]

        # --- shared modules
        centers = self.param("learnable_image_center",
                             nn.initializers.truncated_normal(0.02),
                             (cfg.prototype_number, d))
        cross1 = CrossAttention(d, 1, name="cross_attention_1")
        cross2 = CrossAttention(d, 1, name="cross_attention_2")
        norm = LayerNorm(name="norm")
        attn_v = nn.Dense(cfg.hidden_size, name="attention_V")
        attn_u = nn.Dense(cfg.hidden_size, name="attention_U")
        attn_w = nn.Dense(1, name="attention_weights")

        def scale_branch(patches, mask, text_feats):
            # prototypes attend the bag (padding masked out of keys)
            comp = cross1(centers[None], patches[None], ~mask[None])[0]
            comp = norm(comp + centers)  # [P, D]
            # gated attention pooling over prototypes (all valid)
            a = attn_w(jnp.tanh(attn_v(comp)) * jax.nn.sigmoid(attn_u(comp))).T  # [1, P]
            a = jax.nn.softmax(a, axis=1)
            img_feat = (a @ comp)[0]  # [D]
            # text contextualized by [prototypes; patches]
            context = jnp.concatenate([comp, patches], axis=0)  # [P+N, D]
            ctx_mask = jnp.concatenate([jnp.ones((comp.shape[0],), bool), mask])
            tc = cross2(text_feats[None], context[None], ~ctx_mask[None])[0]
            return img_feat, tc + text_feats

        img_low, text_low = scale_branch(x_s, mask_s, text_features[:c])
        img_high, text_high = scale_branch(x_l, mask_l, text_features[c:])

        logits = img_low @ text_low.T + img_high @ text_high.T  # [C]
        return {"logits": logits, "text_features": text_features}
