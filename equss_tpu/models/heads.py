"""Projection heads and residual blocks (NHWC Flax).

Functional equivalents of /root/reference/model/blocks/module.py
(SegmentationHead:20, EncResBlock:47, DecResBlock:111, ResBlock:176) and
the expansion head built inline in the EQUSS model
(dino_pqgo.py:104-112).  All 1x1 convs become Dense layers over the
channel axis — identical math, friendlier to XLA fusion in NHWC.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class ExpansionHead(nn.Module):
    """cluster1 (linear) + cluster2 (linear-ReLU-linear), summed.

    The EQUSS expansion head (dino_pqgo.py:104-112,127-128): projects
    frozen DINO features (d_in, e.g. 384) to the high-dimensional PQ
    space (hidden_dim, e.g. 1024).  Identical to SegmentationHead
    (blocks/module.py:20-44).
    """

    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_in = x.shape[-1]
        c1 = nn.Dense(self.hidden_dim, dtype=self.dtype, name="cluster1")(x)
        h = nn.Dense(d_in, dtype=self.dtype, name="cluster2_fc1")(x)
        h = nn.relu(h)
        c2 = nn.Dense(self.hidden_dim, dtype=self.dtype, name="cluster2_fc2")(h)
        return c1 + c2


# SegmentationHead in the reference is the same computation
SegmentationHead = ExpansionHead


def dropout2d(key: jax.Array, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Channel dropout (torch nn.Dropout2d) for NHWC: zeroes whole
    channels per sample, scales survivors by 1/(1-p)
    (dino_pqgo.py:25,126)."""
    if rate <= 0.0:
        return x
    b, _, _, c = x.shape
    keep = jax.random.bernoulli(key, 1.0 - rate, (b, 1, 1, c))
    return jnp.where(keep, x / (1.0 - rate), 0.0)


class EncResBlock(nn.Module):
    """Residual 1x1-conv MLP, identity norms (blocks/module.py:47-108)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        h = nn.Dense(c_in, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="conv_shortcut")(x)
        return h + x


class DecResBlock(nn.Module):
    """Residual block with BatchNorm (blocks/module.py:111-173) — the only
    BatchNorm in the reference model (hence its SyncBatchNorm wrap,
    train.py:415).  Under pjit/GSPMD the batch statistics are computed on
    the global sharded batch, so cross-replica sync is automatic; under
    shard_map pass ``axis_name``.
    """

    out_channels: int
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    momentum: float = 0.9   # torch BN momentum 0.1 -> flax momentum 0.9

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        c_in = x.shape[-1]

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=self.momentum,
                epsilon=1e-5, dtype=self.dtype, name=name,
                axis_name=self.axis_name,
            )

        h = bn("norm1")(x)
        h = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                     name="conv1")(h)
        h = bn("norm2")(h)
        h = nn.leaky_relu(h, 0.1)
        h = nn.Dense(self.out_channels, use_bias=True, dtype=self.dtype,
                     name="conv2")(h)
        if c_in != self.out_channels:
            s = bn("norm_shortcut")(x)
            x = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                         name="conv_shortcut")(s)
        return h + x


class ResBlock(nn.Module):
    """LeakyReLU 3x3/1x1 residual conv block (blocks/module.py:176-192)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        h = nn.leaky_relu(x, 0.1)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.leaky_relu(h, 0.1)
        h = nn.Dense(c_in, dtype=self.dtype, name="conv2")(h)
        return h + x


class CLUBEncoder(nn.Module):
    """Variational encoder for the CLUB MI bound
    (blocks/club_encoder.py:32-108): deep MLP producing p_mu / p_logvar
    with a residual connection; logvar squashed by tanh.
    """

    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        d = x.shape[-1]
        flat = x.reshape(-1, d)

        def mlp(name):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"{name}_fc1")(flat)
            h = nn.relu(h)
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"{name}_fc2")(h)
            h = nn.relu(h)
            h = nn.Dense(self.out_dim, dtype=self.dtype, name=f"{name}_out")(h)
            return h

        p_mu = mlp("p_mu") + (flat if d == self.out_dim else 0.0)
        p_logvar = jnp.tanh(mlp("p_logvar"))
        return p_mu, p_logvar
