"""MLP building blocks with torch-parity initialization and masked BatchNorm.

Replicates the semantics of the reference's `get_mlp`
(`gnn/gnn_models.py:137-178` in /root/reference): a Linear stack with optional
BatchNorm+ReLU between layers, laid out exactly as

    hidden=[]          : Linear(in, out)
    hidden=[h]         : Linear(in,h) · [BN] · ReLU · Linear(h,out)
    hidden=[h1,h2,...] : Linear(in,h1) · ([BN]·ReLU·Linear)* · [BN]·ReLU·Linear(.,out)

BatchNorm here is *masked*: statistics are computed over valid (un-padded)
rows only — the silent-correctness-killer under static padding (SURVEY.md §7
hard part 3). Eval mode uses running statistics, torch momentum semantics
(running ← (1-m)·running + m·batch_stat, unbiased variance in the running
estimate, biased in the normalization), eps 1e-5.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_init():
    """torch.nn.Linear default init: kaiming_uniform(a=√5) ⇒ U(±1/√fan_in)
    for both weight and bias (matches the reference's PyG Linear)."""
    kernel = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

    def bias(key, shape, dtype, fan_in):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return kernel, bias


class TorchLinear(nn.Module):
    """Dense layer with torch-default initialization.

    `dtype` selects the matmul compute dtype (params stay float32;
    bfloat16 inputs feed the MXU at full rate with float32 accumulation).
    """

    features: int
    use_bias: bool = True
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel_init, bias_init = torch_linear_init()
        kernel = self.param("kernel", kernel_init, (fan_in, self.features))
        if self.dtype != "float32":
            cd = jnp.dtype(self.dtype)
            y = jnp.dot(x.astype(cd), kernel.astype(cd),
                        preferred_element_type=jnp.float32)
        else:
            y = x @ kernel
        if self.use_bias:
            bias = self.param(
                "bias", lambda k, s: jax.random.uniform(
                    k, s, jnp.float32, -1.0 / jnp.sqrt(fan_in),
                    1.0 / jnp.sqrt(fan_in)),
                (self.features,))
            y = y + bias
        return y


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the leading (node/edge) axis with a validity mask.

    Parity with `torch.nn.BatchNorm1d` / PyG `BatchNorm`
    (`gnn/gnn_models.py:71,126` in /root/reference), plus masking so padded
    rows never contaminate the statistics.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = True) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,)))

        if train:
            if mask is None:
                n = jnp.asarray(x.shape[0], jnp.float32)
                mean = jnp.mean(x, axis=0)
                var = jnp.mean(jnp.square(x - mean), axis=0)
            else:
                m = mask.astype(x.dtype)[:, None]
                n = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x * m, axis=0) / n
                var = jnp.sum(jnp.square(x - mean) * m, axis=0) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv * scale + bias


class MLP(nn.Module):
    """The reference `get_mlp` layer stack (see module docstring)."""

    out_size: int
    hidden_layer_sizes: Sequence[int] = ()
    batch_norm: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = True) -> jnp.ndarray:
        hidden: List[int] = list(self.hidden_layer_sizes)
        if not hidden:
            return TorchLinear(self.out_size, dtype=self.dtype, name="lin_0")(x)

        x = TorchLinear(hidden[0], dtype=self.dtype, name="lin_0")(x)
        li, bi = 1, 0
        for layer_size in hidden[1:]:
            if self.batch_norm:
                x = MaskedBatchNorm(name=f"bn_{bi}")(x, mask, train)
                bi += 1
            x = nn.relu(x)
            x = TorchLinear(layer_size, dtype=self.dtype, name=f"lin_{li}")(x)
            li += 1
        if self.batch_norm:
            x = MaskedBatchNorm(name=f"bn_{bi}")(x, mask, train)
        x = nn.relu(x)
        return TorchLinear(self.out_size, dtype=self.dtype, name=f"lin_{li}")(x)


class LinearReluStack(nn.Module):
    """Linear · (ReLU · Linear)^(n-1) — the conv pre/post MLP shape
    (`gnn/mpnn_layers.py:64-74` in /root/reference)."""

    layer_sizes: Sequence[int]          # output size of each Linear
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, size in enumerate(self.layer_sizes):
            if i > 0:
                x = nn.relu(x)
            x = TorchLinear(size, dtype=self.dtype, name=f"lin_{i}")(x)
        return x
