"""The MOC fusion network: a per-patch classifier-weighting MLP.

Rebuild of the reference ``senet`` (``/root/reference/main_moc.py:299-316``):
512 → 64 ReLU → 4 Sigmoid, producing per-patch weights for the four patch
classifiers (top-j, delta-softmax, delta-diff, bottom-k-irrelevant). Trained
with Adam lr=1e-3, weight-decay=1e-4 (see ``moc_tpu.moc.episode``).

Initialization follows torch ``nn.Linear`` defaults (Kaiming-uniform fan-in
weights, uniform fan-in bias) rather than flax's LeCun-normal, keeping the
training trajectory statistically comparable to the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import nn as jnn


def _torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    # torch kaiming_uniform_(a=sqrt(5)) on a [out, in] weight == U(-1/sqrt(in), 1/sqrt(in));
    # flax kernels are [in, out] so fan_in = shape[0].
    import jax

    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_linear_bias_init(fan_in: int):
    import jax

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class SENet(nn.Module):
    """Per-patch weighting MLP: ``[..., in_dim] -> [..., out_dim]`` in (0, 1)."""

    in_dim: int = 512
    hidden_dim: int = 64
    out_dim: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(
            self.hidden_dim,
            kernel_init=_torch_linear_kernel_init,
            bias_init=_torch_linear_bias_init(self.in_dim),
        )(x)
        x = nn.relu(x)
        x = nn.Dense(
            self.out_dim,
            kernel_init=_torch_linear_kernel_init,
            bias_init=_torch_linear_bias_init(self.hidden_dim),
        )(x)
        return jnn.sigmoid(x)
