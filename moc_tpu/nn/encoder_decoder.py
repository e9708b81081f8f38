"""Seq2seq wrapper: encoder + cross-attending decoder.

Behavioral reference ``/root/reference/models/musk/torchscale/architecture/
encoder_decoder.py``: embed source tokens through the encoder, embed target
tokens through the causal decoder with cross-attention over the encoder
output, project to the vocabulary. Supports full-sequence (training) and
cached incremental decoding via ``moc_tpu.nn.decoder``.
"""

from __future__ import annotations

import dataclasses

from flax import linen as nn

from moc_tpu.nn.decoder import Decoder, DecoderConfig
from moc_tpu.nn.encoder import Encoder, EncoderConfig


@dataclasses.dataclass(frozen=True)
class EncoderDecoderConfig:
    src_vocab: int = 1024
    tgt_vocab: int = 1024
    max_len: int = 512
    # torchscale sharing flags (ref ``encoder_decoder.py:23-43``,
    # ``decoder.py:306-313``): one embedding table for source+target, and/or
    # the output projection tied to the target embedding transpose
    share_all_embeddings: bool = False
    share_decoder_input_output_embed: bool = False
    encoder: EncoderConfig = EncoderConfig(embed_dim=256, ffn_dim=1024,
                                           layers=4, heads=8)
    decoder: DecoderConfig = DecoderConfig(embed_dim=256, ffn_dim=1024,
                                           layers=4, heads=8,
                                           cross_attention=True)


class EncoderDecoder(nn.Module):
    cfg: EncoderDecoderConfig = EncoderDecoderConfig()

    def setup(self):
        c = self.cfg
        self.src_embed = nn.Embed(c.src_vocab, c.encoder.embed_dim, name="src_embed")
        if c.share_all_embeddings:
            # ref: share_all_embeddings implies the decoder reuses the
            # encoder table AND ties the output layer
            assert c.src_vocab == c.tgt_vocab
            assert c.encoder.embed_dim == c.decoder.embed_dim
            self.tgt_embed = self.src_embed
        else:
            self.tgt_embed = nn.Embed(c.tgt_vocab, c.decoder.embed_dim,
                                      name="tgt_embed")
        self.src_pos = self.param("src_pos", nn.initializers.normal(0.02),
                                  (c.max_len, c.encoder.embed_dim))
        self.tgt_pos = self.param("tgt_pos", nn.initializers.normal(0.02),
                                  (c.max_len, c.decoder.embed_dim))
        self.encoder = Encoder(c.encoder, name="encoder")
        self.decoder = Decoder(c.decoder, name="decoder")
        if not self._tied():
            # ref build_output_projection: bias-free in the untied path too
            self.output_projection = nn.Dense(c.tgt_vocab, use_bias=False,
                                              name="output_projection")

    def _tied(self) -> bool:
        c = self.cfg
        return c.share_all_embeddings or c.share_decoder_input_output_embed

    def _project(self, h):
        if self._tied():
            # bias-free tied head: logits = h @ E^T (ref
            # ``build_output_projection``, decoder.py:306-313)
            return h @ self.tgt_embed.embedding.T
        return self.output_projection(h)

    def encode(self, src_ids, src_padding_mask=None):
        x = self.src_embed(src_ids) + self.src_pos[: src_ids.shape[1]]
        memory, aux = self.encoder(x, src_padding_mask)
        return memory, aux

    def __call__(self, src_ids, tgt_ids, src_padding_mask=None):
        memory, aux = self.encode(src_ids, src_padding_mask)
        memory_valid = None if src_padding_mask is None else ~src_padding_mask
        y = self.tgt_embed(tgt_ids) + self.tgt_pos[: tgt_ids.shape[1]]
        h, _ = self.decoder(y, memory, memory_valid)
        return self._project(h), aux
