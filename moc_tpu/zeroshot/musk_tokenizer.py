"""MUSK text tokenization: XLM-Roberta sentencepiece wrapper.

Behavioral reference ``/root/reference/models/musk/utils.py:19-31``
(``xlm_tokenizer``): encode with the XLM-Roberta sentencepiece model,
truncate to ``max_len - 2``, wrap in <s>…</s>, right-pad with the pad id,
and return a padding mask. The tokenizer model file ships with the MUSK
release; a deterministic hash fallback serves tests (same pattern as
``ConchTokenizer``).
"""

from __future__ import annotations

import numpy as np


class MuskTokenizer:
    """``texts -> (ids [B, max_len], padding_mask [B, max_len])`` where the
    mask is True on PAD positions (torchscale convention)."""

    def __init__(self, tokenizer_file: str | None = None, max_len: int = 100,
                 vocab_size: int = 64010):
        self.max_len = max_len
        self.vocab_size = vocab_size
        self._tk = None
        if tokenizer_file is not None:
            from transformers import XLMRobertaTokenizer

            self._tk = XLMRobertaTokenizer(tokenizer_file)
        self.bos_id = 0 if self._tk is None else self._tk.bos_token_id
        self.eos_id = 2 if self._tk is None else self._tk.eos_token_id
        self.pad_id = 1 if self._tk is None else self._tk.pad_token_id

    def __call__(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        ids = np.full((len(texts), self.max_len), self.pad_id, np.int32)
        pad_mask = np.ones((len(texts), self.max_len), bool)
        for i, text in enumerate(texts):
            if self._tk is not None:
                tokens = self._tk.encode(text, add_special_tokens=False)
            else:
                tokens = self._hash_encode(text)
            tokens = tokens[: self.max_len - 2]
            row = [self.bos_id] + list(tokens) + [self.eos_id]
            ids[i, : len(row)] = row
            pad_mask[i, : len(row)] = False
        return ids, pad_mask

    def _hash_encode(self, text: str) -> list[int]:
        out = []
        for w in text.lower().split():
            h = 0
            for ch in w.encode():
                h = (h * 131 + ch) % (self.vocab_size - 4)
            out.append(3 + h)
        return out
