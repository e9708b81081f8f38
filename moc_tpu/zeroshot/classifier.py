"""Zero-shot classifier weight building with on-disk caching.

Rebuild of ``zero_shot_classifier`` (``/root/reference/utils/
zeroshot_utils.py:20-51``): for every class, encode alias×template prompts
through the text tower, L2-normalize each embedding, mean over (aliases ×
templates), renormalize; stack per-class columns into ``W [D, C]``. The
expensive text encoding is cached to ``.npz`` like the reference's ``.pt``
weight cache (``main_moc.py:149-156``).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from moc_tpu.zeroshot.prompts import PromptBank
from moc_tpu.zeroshot.tokenizer import ConchTokenizer


def build_zero_shot_classifier(
    encode_text: Callable[[np.ndarray], jax.Array],
    tokenizer: ConchTokenizer,
    bank: PromptBank,
) -> np.ndarray:
    """``encode_text``: token ids ``[B, 128]`` → L2-normalized ``[B, D]``.

    Returns ``W [D, C]`` ready for ``feats @ W`` patch scoring.
    """
    class_embeddings = []
    for c in range(bank.n_classes):
        per_alias = []
        for texts in bank.texts_for_class(c):
            ids = tokenizer(texts)  # [n_templates, 128]
            emb = np.asarray(encode_text(ids))  # normalized [n_templates, D]
            per_alias.append(emb)
        stacked = np.stack(per_alias)  # [n_aliases, n_templates, D]
        mean = stacked.mean(axis=(0, 1))
        mean /= np.linalg.norm(mean)
        class_embeddings.append(mean)
    return np.stack(class_embeddings, axis=1).astype(np.float32)  # [D, C]


def cached_zero_shot_classifier(
    cache_path: str,
    encode_text: Callable[[np.ndarray], jax.Array],
    tokenizer: ConchTokenizer,
    bank: PromptBank,
    *,
    use_cache: bool = True,
) -> np.ndarray:
    """Disk-cached variant (the reference's ``--load_weight`` behavior)."""
    if use_cache and os.path.exists(cache_path):
        return np.load(cache_path)["weights"]
    w = build_zero_shot_classifier(encode_text, tokenizer, bank)
    os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
    np.savez(cache_path, weights=w)
    return w


def make_encode_text_fn(coca, params) -> Callable[[np.ndarray], jax.Array]:
    """Jitted ``encode_text`` over a flax CoCa model + params.

    ``params`` enter as a jit ARGUMENT, not a closure capture: a captured
    array is baked into the HLO as a constant, and the full CoCa tree is
    ~350 MB — large-constant programs break remote-compile transports
    (the axon tunnel rejects them with HTTP 413) and bloat the persistent
    compile cache."""

    @jax.jit
    def fn(p, token_ids):
        return coca.apply(p, token_ids, method=coca.encode_text)

    return lambda ids: fn(params, jnp.asarray(ids))
