"""The CONCH tokenization protocol: pad-to-127, append one placeholder pad.

Behavioral reference ``/root/reference/models/conch/open_clip_custom/
custom_tokenizer.py:14-32``. The vocabulary file (a byte-level BPE
``tokenizer.json``) ships with the CONCH release, not with this repo — pass
its path (or any HF-compatible tokenizer) to ``ConchTokenizer``. A
deterministic hash-based fallback vocabulary is provided for tests and
synthetic pipelines where real CONCH weights aren't in play.
"""

from __future__ import annotations

import numpy as np

CONTEXT_LEN = 128  # model context; last slot reserved for the CLS embedding
TEXT_LEN = 127  # tokens actually produced per prompt


class ConchTokenizer:
    """Wraps a HF tokenizer with the 127+1 CONCH padding protocol."""

    def __init__(self, tokenizer_file: str | None = None, pad_id: int = 0):
        self.pad_id = pad_id
        self._tk = None
        if tokenizer_file is not None:
            from transformers import PreTrainedTokenizerFast

            self._tk = PreTrainedTokenizerFast(
                tokenizer_file=tokenizer_file,
                bos_token="<start_of_text>",
                eos_token="<end_of_text>",
                pad_token="<pad>",
            )
            self.pad_id = self._tk.pad_token_id

    def __call__(self, texts: list[str]) -> np.ndarray:
        """texts → int32 ids ``[B, 128]`` (127 real slots + placeholder pad)."""
        if self._tk is not None:
            enc = self._tk.batch_encode_plus(
                texts,
                max_length=TEXT_LEN,
                add_special_tokens=True,
                return_token_type_ids=False,
                truncation=True,
                padding="max_length",
            )
            ids = np.asarray(enc["input_ids"], dtype=np.int32)
        else:
            ids = np.stack([self._hash_encode(t) for t in texts])
        placeholder = np.full((ids.shape[0], 1), self.pad_id, np.int32)
        return np.concatenate([ids, placeholder], axis=1)

    def _hash_encode(self, text: str, vocab_size: int = 32007) -> np.ndarray:
        """Deterministic fallback: word → stable hash bucket (tests only).

        EOT is the largest vocabulary id, like the real CONCH tokenizer, so
        ``argmax(ids)`` finds the EOT position (the pooling convention CoOp
        -style prompt learners rely on)."""
        words = text.lower().split()[: TEXT_LEN - 2]
        bos, eos = 1, vocab_size - 1
        ids = [bos]
        for w in words:
            h = 0
            for ch in w.encode():
                h = (h * 131 + ch) % (vocab_size - 4)
            ids.append(3 + h)  # ids in [3, vocab_size-2): always below EOT
        ids.append(eos)
        out = np.full((TEXT_LEN,), self.pad_id, np.int32)
        out[: len(ids)] = np.asarray(ids[:TEXT_LEN], np.int32)
        return out
