"""CLAM attention-MIL heads (single- and multi-branch) + ABMIL.

Behavioral reference ``/root/reference/models/model_clam.py:77-326``:
  * features → Dense+ReLU → (gated) attention scores;
  * slide embedding ``M = softmax(A) @ h``; SB: one shared classifier on
    ``M[0]``; MB: per-class attention branches + per-class 1-d classifiers;
  * instance-level clustering loss: for the slide's class, the k most
    attended patches are positives and the k least attended negatives for a
    per-class 2-way instance classifier; for other classes (subtyping only)
    the top-k are negatives (``inst_eval``/``inst_eval_out``, lines 130-167).

TPU-native differences: padded bags + masks (masked softmax/top-k); the
per-class Python loops become stacked heads + one-hot weighting, so the whole
forward is a single traced program; batching is ``jax.vmap`` instead of the
reference's ``forward_batch`` loop. ABMIL is CLAM-SB with the instance loss
unused (``utils/core_utils.py:171-172``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from moc_tpu.models.layers import (
    AttnNet,
    GatedAttnNet,
    StackedDense,
    masked_attention_weights,
    masked_topk_feats,
)

# size_arg → (in_dim, hidden, attn_hidden), ref model_clam.py:81-83
CLAM_SIZES = {
    "small": (1024, 512, 256),
    "big": (1024, 512, 384),
    "benchmark": (384, 512, 256),
    "conch": (512, 512, 384),
    "gigapath": (1536, 512, 256),
    "virchow": (2560, 512, 256),
}


@dataclasses.dataclass(frozen=True)
class ClamConfig:
    n_classes: int = 2
    size_arg: str = "conch"
    gate: bool = True
    dropout: float = 0.0
    k_sample: int = 8
    subtyping: bool = False
    multi_branch: bool = False  # False=CLAM_SB, True=CLAM_MB


class CLAM(nn.Module):
    cfg: ClamConfig = ClamConfig()

    @nn.compact
    def __call__(self, feats, valid, label=None, *, instance_eval: bool = False,
                 train: bool = False):
        """One padded slide ``feats [N, D]``, ``valid [N]`` → dict with
        ``logits [C]``, ``attention [K, N]``, ``instance_loss`` (scalar).
        vmap over slides for batching."""
        cfg = self.cfg
        _, hidden, attn_hidden = CLAM_SIZES[cfg.size_arg]
        n_branch = cfg.n_classes if cfg.multi_branch else 1

        h = nn.relu(nn.Dense(hidden, name="fc")(feats))
        if cfg.dropout:
            h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        attn_cls = GatedAttnNet if cfg.gate else AttnNet
        scores = attn_cls(attn_hidden, n_branch, cfg.dropout, name="attn")(
            h, train=train
        ).T  # [K, N]
        weights = masked_attention_weights(scores, valid)  # [K, N]
        slide_emb = weights @ h  # [K, hidden]

        if cfg.multi_branch:
            clf = StackedDense(cfg.n_classes, 1, name="classifiers")
            logits = clf(slide_emb)  # [K, C, 1] — head c on branch c's embedding
            logits = jnp.diagonal(logits[:, :, 0])  # [C]
            patch_logits = clf(h)[:, :, 0]  # [N, C] (ref forward_patch_level, 270-278)
        else:
            clf = nn.Dense(cfg.n_classes, name="classifiers")
            logits = clf(slide_emb[0])
            patch_logits = clf(h)  # [N, C] (ref forward_patch_level, 169-173)

        inst_loss = jnp.float32(0.0)
        if instance_eval:
            assert label is not None
            inst_loss = self._instance_loss(scores, h, valid, label)

        return {
            "logits": logits,
            "attention": scores,
            "attention_weights": weights,
            "patch_logits": patch_logits,
            "instance_loss": inst_loss,
        }

    def _instance_loss(self, scores, h, valid, label):
        """Masked, loop-free restatement of ``inst_eval``/``inst_eval_out``."""
        cfg = self.cfg
        k = cfg.k_sample
        inst_heads = StackedDense(cfg.n_classes, 2, name="instance_classifiers")
        one_hot = jax.nn.one_hot(label, cfg.n_classes)  # [C]

        def ce_sums(feats_k, sel_valid, target):
            logits = inst_heads(feats_k)  # [k, C, 2]
            labels = jnp.full((feats_k.shape[0],), target, jnp.int32)
            # per-class CE over the k instances: [k, C]
            per = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels[:, None].repeat(cfg.n_classes, 1)
            )
            w = sel_valid.astype(jnp.float32)[:, None]
            return jnp.sum(per * w, axis=0), jnp.sum(w)  # ([C], scalar)

        total = jnp.zeros((cfg.n_classes,), jnp.float32)
        for branch in range(scores.shape[0]):
            row = scores[branch]
            top_feats, top_valid = masked_topk_feats(row, h, valid, k, largest=True)
            bot_feats, bot_valid = masked_topk_feats(row, h, valid, k, largest=False)
            # one mean over the CONCATENATED [top; bottom] = 2k instances,
            # exactly inst_eval's CrossEntropyLoss(reduction='mean') over
            # all_instances (ref model_clam.py:130-150) — summing two
            # per-half means doubled the in-class term (review r3)
            s_top, n_top = ce_sums(top_feats, top_valid, 1)
            s_bot, n_bot = ce_sums(bot_feats, bot_valid, 0)
            in_class = (s_top + s_bot) / jnp.maximum(n_top + n_bot, 1.0)  # [C]
            s_out, n_out = ce_sums(top_feats, top_valid, 0)
            out_class = s_out / jnp.maximum(n_out, 1.0)  # [C]
            if scores.shape[0] == 1:
                # SB: one attention row supervises every class head
                branch_w = jnp.ones((cfg.n_classes,))
            else:
                branch_w = jax.nn.one_hot(branch, cfg.n_classes)
            contrib = one_hot * in_class
            if cfg.subtyping:
                contrib = contrib + (1.0 - one_hot) * out_class
            total = total + branch_w * contrib
        loss = jnp.sum(total)
        if cfg.subtyping:
            loss = loss / cfg.n_classes
        return loss


def clam_sb(n_classes: int, size_arg: str = "conch", **kw) -> CLAM:
    return CLAM(ClamConfig(n_classes=n_classes, size_arg=size_arg,
                           multi_branch=False, **kw))


def clam_mb(n_classes: int, size_arg: str = "conch", **kw) -> CLAM:
    return CLAM(ClamConfig(n_classes=n_classes, size_arg=size_arg,
                           multi_branch=True, **kw))


def abmil(n_classes: int, size_arg: str = "conch", **kw) -> CLAM:
    """ABMIL = CLAM-SB trained without the instance loss."""
    return clam_sb(n_classes, size_arg, **kw)
