"""CoCa caption decoder: autoregressive text over pooled image caption tokens.

Behavioral reference: the CoCa ``MultimodalTransformer``
(``/root/reference/models/conch/open_clip_custom/transformer.py:452-576``) —
a causal text decoder whose layers cross-attend the vision tower's 256
caption tokens — and the autoregressive ``generate`` loop with top-k/top-p
sampling (``coca_model.py:247-346``). The reference never invokes this path
in any MOC workload; here it is a working capability built from the shared
cached decoder, with greedy and sampling generation compiled as single
``lax.scan`` programs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from moc_tpu.nn.decoder import Decoder, DecoderConfig, greedy_generate, sample_generate


@dataclasses.dataclass(frozen=True)
class CaptionerConfig:
    """``eot_id`` defaults to the largest vocab id — the CONCH tokenizer
    convention this repo relies on everywhere (``tokenizer.py``: argmax(ids)
    finds EOT), so generation actually terminates on sequences produced by
    ``ConchTokenizer``. The reference's ``generate`` defaults to the
    open_clip legacy (sot=1, eot=2; ``coca_model.py:271-272``) — pass those
    explicitly to reproduce it against a vocabulary that really uses id 2."""
    vocab_size: int = 32007
    width: int = 768
    layers: int = 12
    heads: int = 12
    context_length: int = 128
    sot_id: int = 1
    eot_id: int = 32006


class CoCaCaptioner(nn.Module):
    cfg: CaptionerConfig = CaptionerConfig()

    def setup(self):
        c = self.cfg
        self.token_embedding = nn.Embed(c.vocab_size, c.width, name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (c.context_length, c.width),
        )
        self.decoder = Decoder(
            DecoderConfig(embed_dim=c.width, ffn_dim=4 * c.width, layers=c.layers,
                          heads=c.heads, cross_attention=True),
            name="decoder",
        )
        self.lm_head = nn.Dense(c.vocab_size, name="lm_head")

    def __call__(self, token_ids, caption_tokens, caption_mask=None):
        """Teacher-forced logits: ``token_ids [B, L]`` + image caption tokens
        ``[B, 256, width]`` → next-token logits ``[B, L, vocab]``."""
        x = self.token_embedding(token_ids) + self.positional_embedding[: token_ids.shape[1]]
        h, _ = self.decoder(x, caption_tokens, caption_mask)
        return self.lm_head(h)

    def caption_loss(self, token_ids, caption_tokens, pad_id: int = 0,
                     caption_mask=None):
        """Shifted CE over non-pad targets (the CoCa captioning objective)."""
        import optax

        logits = self(token_ids[:, :-1], caption_tokens, caption_mask)
        targets = token_ids[:, 1:]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
        w = (targets != pad_id).astype(jnp.float32)
        return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def generate_caption(
    captioner: CoCaCaptioner,
    params,
    caption_tokens: jax.Array,
    *,
    seq_len: int = 30,
    mode: str = "greedy",  # greedy | sample | beam
    rng: jax.Array | None = None,
    beam_size: int = 4,
    length_penalty: float = 1.0,
    top_k: int | None = 1,
    top_p: float | None = None,
    temperature: float = 1.0,
    min_seq_len: int = 5,
    repetition_penalty: float = 1.0,
    caption_mask=None,
):
    """Decode captions from image caption tokens ``[B, 256, width]``
    (ref ``coca_model.generate`` defaults: ``min_seq_len=5``,
    ``repetition_penalty=1.0``)."""
    cfg = captioner.cfg
    batch = caption_tokens.shape[0]
    bound = captioner.bind(params)

    def embed_fn(tokens, idx):
        emb = bound.token_embedding(tokens) + bound.positional_embedding[idx]
        return emb[:, None, :]

    def logits_fn(h):
        return bound.lm_head(h[:, 0])

    dec_params = {"params": params["params"]["decoder"]}
    if mode == "greedy":
        return greedy_generate(
            bound.decoder, dec_params, embed_fn, logits_fn, batch=batch,
            seq_len=seq_len, bos_id=cfg.sot_id, eos_id=cfg.eot_id,
            memory=caption_tokens, memory_mask=caption_mask,
        )
    if mode == "beam":
        from moc_tpu.nn.decoder import beam_generate

        return beam_generate(
            bound.decoder, dec_params, embed_fn, logits_fn, batch=batch,
            seq_len=seq_len, bos_id=cfg.sot_id, eos_id=cfg.eot_id,
            beam_size=beam_size, length_penalty=length_penalty,
            memory=caption_tokens, memory_mask=caption_mask,
        )
    assert rng is not None
    return sample_generate(
        bound.decoder, dec_params, embed_fn, logits_fn, rng, batch=batch,
        seq_len=seq_len, bos_id=cfg.sot_id, eos_id=cfg.eot_id,
        top_k=top_k, top_p=top_p, temperature=temperature,
        min_len=min_seq_len, repetition_penalty=repetition_penalty,
        vocab_size=cfg.vocab_size if repetition_penalty != 1.0 else None,
        memory=caption_tokens, memory_mask=caption_mask,
    )
