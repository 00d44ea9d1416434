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


# ---------------------------------------------------------------------------
# resnet_linear.py flavor — the OTHER block library the reference ships.
# dino_unseg / dino_vae / dino_res / dino_contra / dino_info import their
# blocks from model/blocks/resnet_linear.py, whose Enc/Dec blocks differ
# from blocks/module.py in activation placement and widths.  (module.py's
# flavor, mirrored above, is what dino_cluster / dino_new_vq use.)
# ---------------------------------------------------------------------------


class LinEncResBlock(nn.Module):
    """resnet_linear.EncResBlock (blocks/resnet_linear.py:20-82):
    ReLU -> Linear(in,out) -> ReLU -> Linear(out,out), Linear shortcut
    when widths differ; norms are Identity."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        h = nn.relu(x)
        h = nn.Dense(self.out_channels, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="conv_shortcut")(x)
        return h + x


class LinDecResBlock(nn.Module):
    """resnet_linear.DecResBlock (blocks/resnet_linear.py:85-147):
    BN -> LeakyReLU(0.1) -> Linear(in,out) -> BN -> LeakyReLU ->
    Linear(out,out); BN + Linear shortcut when widths differ.  Unlike the
    module.py flavor (DecResBlock above) the first activation exists and
    both Linears carry bias."""

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
        h = nn.leaky_relu(h, 0.1)
        h = nn.Dense(self.out_channels, dtype=self.dtype, name="conv1")(h)
        h = bn("norm2")(h)
        h = nn.leaky_relu(h, 0.1)
        h = nn.Dense(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if c_in != self.out_channels:
            s = bn("norm_shortcut")(x)
            x = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="conv_shortcut")(s)
        return h + x


class ReLUResBlock(nn.Module):
    """resnet_linear.ResBlock (blocks/resnet_linear.py:149-165):
    ReLU -> Conv3x3(in,ch) -> ReLU -> Conv1x1(ch,in), residual — the
    dino_vae decoder's block (dino_vae.py:122-144).

    The residual shortcut is relu(x), NOT x: the reference's first
    ReLU(inplace=True) (resnet_linear.py:154) mutates `input` before
    `out += input` runs (resnet_linear.py:164), so the tensor added back
    is already rectified."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        h = nn.relu(x)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Dense(c_in, dtype=self.dtype, name="conv2")(h)
        return h + nn.relu(x)


class ConvTranspose2dTorch(nn.Module):
    """torch nn.ConvTranspose2d(k=4, stride=2, padding=1) equivalent
    (dino_vae.py:92-94,130-132): implemented as the gradient-of-conv it
    is — lhs-dilated conv with a spatially flipped kernel — so torch
    weights of shape (in, out, kh, kw) transplant exactly.  Kernel param
    layout here: (kh, kw, out, in) pre-flipped; doubles H and W."""

    features: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        k, s, p = self.kernel, self.stride, self.padding
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, self.features, c_in), self.dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.dtype)
        pad = k - 1 - p
        out = jax.lax.conv_general_dilated(
            x, w,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWOI", "NHWC"),
        )
        return out + bias


class CLUBEncoder(nn.Module):
    """Variational encoder for the CLUB MI bound
    (blocks/club_encoder.py:19-108): p_mu is a 5-Linear ReLU MLP at
    hidden//2 width, p_logvar a 6-Linear one, and a Linear residual of
    the INPUT is added to the logvar (club_encoder.py:77-91 — the
    residual lands on logvar, not mu; no tanh on the live path)."""

    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, residual: bool = True):
        """residual=True mirrors forward() (club_encoder.py:75-90);
        residual=False mirrors get_mu_logvar() (club_encoder.py:92-96),
        the path loglikeli trains against — the residual Linear is NOT
        part of the inner likelihood objective."""
        d = x.shape[-1]
        flat = x.reshape(-1, d)
        half = self.hidden_dim // 2

        def mlp(name, n_hidden):
            h = flat
            for i in range(n_hidden):
                h = nn.Dense(half, dtype=self.dtype, name=f"{name}_fc{i}")(h)
                h = nn.relu(h)
            return nn.Dense(self.out_dim, dtype=self.dtype,
                            name=f"{name}_out")(h)

        p_mu = mlp("p_mu", 4)
        p_logvar = mlp("p_logvar", 5)
        res = nn.Dense(self.out_dim, dtype=self.dtype,
                       name="p_residual")(flat)
        if residual:
            p_logvar = p_logvar + res
        return p_mu, p_logvar
