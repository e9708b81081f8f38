"""Dilated-attention cost attribution at the pretrain-matrix shape
(VERDICT r5 item #1: with the honest sparse-FLOPs billing the dilated MFU
is ~18-24%; either a measured optimization or a roofline closure).

Times, on one chip at the standard matrix point (B=1, L=8192, 12 heads,
d_head=64, segments 2048/4096/8192, ratios 1/2/4):

  1. the full ``dilated_attention`` op (fwd; and fwd+bwd),
  2. each branch's pure flash attention at its sparse shape (the compute
     floor: [B·n_seg, H, sl/r, D] self-attention, no relayout),
  3. the ``dense_to_sparse``/``sparse_to_dense`` relayouts alone,
  4. the lse-softmax recombination alone,

so the gap between (1) and Σ(2) is attributed to relayout+recombination
overhead vs kernel-level attention cost.

Run alone on the chip: ``python scripts/dilated_profile.py``
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from moc_tpu.ops.flash_attention import flash_attention_with_lse
    from moc_tpu.parallel.dilated import (DilatedConfig, dense_to_sparse,
                                          dilated_attention, sparse_to_dense)
    from moc_tpu.utils import device_time

    dev = jax.devices()[0]
    log(f"backend: {dev.platform} ({dev.device_kind})")
    np.asarray(jnp.zeros(()) + 1.0)  # absorb first-dispatch toll

    B, L, H, D = 1, 8192, 12, 64
    cfg = DilatedConfig(segment_lengths=(2048, 4096, 8192),
                        dilated_ratios=(1, 2, 4))
    key = jax.random.PRNGKey(0)
    mk = jax.jit(lambda k: jax.random.normal(k, (B, L, H, D), jnp.float32))
    q = mk(key)
    k_ = mk(jax.random.fold_in(key, 1))
    v = mk(jax.random.fold_in(key, 2))
    rows = {}

    # 1. full op: fwd and fwd+bwd
    full = jax.jit(lambda q, k, v: dilated_attention(q, k, v, cfg))
    np.asarray(full(q, k_, v)).sum()
    t = device_time(lambda a: full(a, k_, v), q, iters=10, repeats=5,
                    reduce="median")
    rows["full_fwd_ms"] = round(t * 1e3, 3)

    grad = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(dilated_attention(q, k, v, cfg) ** 2),
        argnums=(0, 1, 2)))
    np.asarray(grad(q, k_, v)[0]).sum()
    t = device_time(lambda a: grad(a, k_, v)[0], q, iters=10, repeats=5,
                    reduce="median")
    rows["full_fwdbwd_ms"] = round(t * 1e3, 3)

    # 2. per-branch flash floor at the sparse shapes
    branch_ms = {}
    total_branch = 0.0
    for sl, r in zip(cfg.segment_lengths, cfg.dilated_ratios):
        n_seg = L // sl
        ls = sl // r
        bq = jax.jit(lambda k: jax.random.normal(
            k, (B * n_seg, H, ls, D), jnp.float32))(key)

        fa = jax.jit(lambda q, k, v: flash_attention_with_lse(q, k, v)[0])
        np.asarray(fa(bq, bq, bq)).sum()
        t = device_time(lambda a: fa(a, bq, bq), bq, iters=10, repeats=5,
                        reduce="median")
        branch_ms[f"sl{sl}_r{r}"] = round(t * 1e3, 3)
        total_branch += t
    rows["branch_flash_ms"] = branch_ms
    rows["branch_flash_total_ms"] = round(total_branch * 1e3, 3)

    # 3. relayout alone (both directions, all branches)
    def relayout(q):
        outs = []
        for sl, r in zip(cfg.segment_lengths, cfg.dilated_ratios):
            n_seg = L // sl
            xs = q.reshape(B * n_seg, sl, H, D)
            sp = dense_to_sparse(xs, r)
            lse = jnp.zeros((B * n_seg, H, sp.shape[1]), jnp.float32)
            dense, _ = sparse_to_dense(sp, lse, r)
            outs.append(jnp.sum(dense))
        return jnp.stack(outs).sum()

    rl = jax.jit(relayout)
    np.asarray(rl(q))
    t = device_time(rl, q, iters=10, repeats=5, reduce="median")
    rows["relayout_roundtrip_ms"] = round(t * 1e3, 3)

    # 4. recombination alone (3 branches of [B, H, L, D] + lse softmax)
    outs = [mk(jax.random.fold_in(key, 10 + i)).transpose(0, 2, 1, 3)
            for i in range(3)]
    lses = [jax.jit(lambda k: jax.random.normal(
        k, (B, H, L), jnp.float32))(jax.random.fold_in(key, 20 + i))
        for i in range(3)]

    def recombine(o0):
        all_lse = jnp.stack([lses[0], lses[1], lses[2]])
        wts = jax.lax.stop_gradient(jax.nn.softmax(all_lse, axis=0))
        comb = (wts[0][..., None] * o0 + wts[1][..., None] * outs[1]
                + wts[2][..., None] * outs[2])
        return comb.transpose(0, 2, 1, 3).reshape(B, L, H * D)

    rc = jax.jit(recombine)
    np.asarray(rc(outs[0])).sum()
    t = device_time(rc, outs[0], iters=10, repeats=5, reduce="median")
    rows["recombine_ms"] = round(t * 1e3, 3)

    rows["overhead_vs_flash_floor"] = round(
        rows["full_fwd_ms"] / max(rows["branch_flash_total_ms"], 1e-9), 2)
    print(json.dumps({"platform": f"{dev.platform}:{dev.device_kind}",
                      "shape": {"B": B, "L": L, "H": H, "D": D},
                      "rows": rows}, indent=2))


if __name__ == "__main__":
    main()
