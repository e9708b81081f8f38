"""LoRA utilities: trainable masks, merging, and a CONCH-LoRA wrapper.

Behavioral reference ``/root/reference/models/lora.py``: q/v low-rank
injection into the (timm) ViT's fused qkv with base weights frozen, A
kaiming-uniform / B zero init, optionally restricted to the last n blocks;
``models/model_conch.py:12-27`` wraps the CONCH visual trunk this way for
the LoRA fine-tuning path.

In this stack LoRA parameters live inside ``moc_tpu.nn.Attention``
(``lora_rank`` field); freezing is an optimizer concern: ``lora_mask``
produces the optax ``masked``/``multi_transform`` pytree that trains only
LoRA (and optionally named head) parameters. ``merge_lora`` folds A·B into
the fused qkv kernel for deployment. The reference's ``MOELoRA`` (broken as
checked in — wrong ``super()`` target, ``lora.py:107-168``) is realized
WORKING as ``Attention(lora_experts=N)``; ``lora_balance_loss`` supplies
the Switch-style router regularizer its trainer uses
(``moc_tpu.cli.lora_finetune``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _path_names(path) -> list[str]:
    return [getattr(p, "key", getattr(p, "name", str(p))) for p in path]


def lora_mask(params, extra_trainable: Sequence[str] = ()) -> dict:
    """Boolean pytree: True = trainable (LoRA params + any param whose path
    contains a name in ``extra_trainable``, e.g. a classification head)."""

    def mark(path, leaf):
        names = _path_names(path)
        if any(str(n).startswith("lora_") for n in names):
            return True
        return any(t in names for t in extra_trainable)

    return jax.tree_util.tree_map_with_path(mark, params)


def lora_optimizer(base: optax.GradientTransformation, params,
                   extra_trainable: Sequence[str] = ()) -> optax.GradientTransformation:
    """Optimizer that updates only LoRA (+extra) params — the reference's
    requires_grad freezing (``lora.py:80-91``) as an optax mask."""
    mask = lora_mask(params, extra_trainable)
    return optax.multi_transform(
        {"train": base, "freeze": optax.set_to_zero()},
        jax.tree.map(lambda m: "train" if m else "freeze", mask),
    )


def lora_balance_loss(intermediates, patch_valid=None) -> jax.Array:
    """Mean Switch-Transformer load-balancing loss over every MoE-LoRA
    router gate sown by ``nn.Attention`` (collection ``intermediates``, key
    ``lora_gate``; run ``apply(..., mutable=["intermediates"])`` to collect).
    ``patch_valid [M]`` masks the LEADING (patch-image) axis of each gate so
    padding patches inside a partially-valid minibatch never steer the
    router statistics (every ViT token of an invalid patch gets weight 0).
    Formula shared with the adapter zoo (ref ``load_balancing_loss_func``,
    ``model_adapters.py:253-289``)."""
    from moc_tpu.models.adapters import load_balancing_loss

    gates: list = []

    def collect(node):
        if isinstance(node, dict):
            for key, value in node.items():
                if key == "lora_gate":
                    gates.extend(value if isinstance(value, (tuple, list)) else [value])
                else:
                    collect(value)

    collect(intermediates)
    if not gates:
        return jnp.float32(0.0)
    losses = []
    for g in gates:
        probs = g.reshape(-1, g.shape[-1])
        idx = jnp.argmax(probs, axis=-1)
        if patch_valid is None:
            valid = jnp.ones(probs.shape[0], bool)
        else:
            # g is [M, ..., E] row-major → flat rows stay patch-major
            valid = jnp.repeat(patch_valid,
                               probs.shape[0] // patch_valid.shape[0])
        losses.append(load_balancing_loss(probs, idx, valid))
    return jnp.mean(jnp.stack(losses))


def merge_lora(params):
    """Fold every attention's ``lora_a_{q,v} @ lora_b_{q,v}`` into its fused
    ``in_proj`` kernel and drop the LoRA params (inference export).

    Mixture-of-LoRA trees (``lora_moe_*``) cannot be folded — the routed
    delta is input-dependent — so they raise instead of silently dropping
    trained adapters."""

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        if any(str(k).startswith("lora_moe_") for k in tree):
            raise ValueError(
                "merge_lora cannot fold mixture-of-LoRA experts "
                "(input-dependent routing); export the adapters instead")
        if "lora_block_a" in tree:
            # the whole-block residual adapter bypasses the block (out +=
            # x @ A @ B of the block INPUT) — not foldable into any single
            # weight; silently dropping it would discard trained adaptation
            raise ValueError(
                "merge_lora cannot fold block-level LoRA (residual on the "
                "block input); export the adapters instead")
        if "in_proj" in tree and "lora_a_q" in tree:
            kernel = np.array(tree["in_proj"]["kernel"])
            d = kernel.shape[0]
            dq = np.asarray(tree["lora_a_q"]) @ np.asarray(tree["lora_b_q"])
            dv = np.asarray(tree["lora_a_v"]) @ np.asarray(tree["lora_b_v"])
            kernel[:, :d] += dq
            kernel[:, 2 * d :] += dv
            out = {k: v for k, v in tree.items() if not k.startswith("lora_")}
            out["in_proj"] = dict(tree["in_proj"], kernel=jnp.asarray(kernel))
            return out
        return {k: walk(v) for k, v in tree.items()}

    return walk(params)


def count_trainable(params, extra_trainable: Sequence[str] = ()) -> tuple[int, int]:
    """(trainable, total) parameter counts under the LoRA mask."""
    mask = lora_mask(params, extra_trainable)
    sizes = jax.tree.map(lambda p: int(np.prod(np.shape(p))), params)
    total = sum(jax.tree.leaves(sizes))
    trainable = sum(
        s for s, m in zip(jax.tree.leaves(sizes), jax.tree.leaves(mask)) if m
    )
    return trainable, total
