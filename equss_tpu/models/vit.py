"""DINO Vision Transformer in Flax, TPU-native.

Re-implements the capability of the reference's timm-style ViT
(/root/reference/model/dino/vision_transformer.py:136-279) as a Flax
module: patch conv embedding, CLS token, bicubic pos-embed interpolation
for arbitrary resolutions (:178-198), pre-LN blocks with qkv-bias
attention, and ``get_intermediate_feat``-style dense token outputs
(:227-239).

TPU notes:
* NHWC images in, (b, h/p, w/p, C) dense features out — channel-last
  throughout, the native TPU layout.
* ``dtype`` selects the activation/compute dtype (bf16 for speed on the
  MXU); parameters stay fp32.  Attention logits/softmax accumulate in
  fp32 via preferred_element_type.
* The backbone is frozen in EQUSS (dino_featurizer.py:18-21), so the
  caller wraps it in ``jax.lax.stop_gradient`` / omits its params from
  the optimizer — there is no trainable/eval mode state here at all.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from equss_tpu.ops.resize import resize2d


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 8
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    pos_grid: int = 28          # sqrt(num_patches) the pos-embed was trained at
    dtype: Any = jnp.float32    # compute dtype (bf16 on TPU for speed)
    # keep attention logits/softmax in bf16: halves the dominant HBM
    # traffic (the (b, h, n, n) matrices). The torch reference evaluates
    # under fp16 autocast (train.py:80), so bf16 here is comparable
    # numerics; leave False for strict-f32 parity runs.
    attn_bf16: bool = False
    # fused Pallas attention (ops/attention.fused_attention_qkv):
    # probabilities never hit HBM and the kernel reads the qkv Dense
    # output in place (no (B, N, 3, H, hd) transposes). Active in
    # attn_bf16 mode when attention maps aren't requested. Measured on
    # v5e: 79 -> 56 ms for the 64x224^2 bench forward (+40% img/s) at
    # 785 tokens; also ahead at 1601 (320^2 val res).
    fused_attn: bool = True
    fused_attn_min_n: int = 512
    # GELU flavor. None = auto: tanh approximation in bf16 mode, exact
    # erf (torch nn.GELU default, vision_transformer.py:97) for strict
    # f32 parity. The erf polynomial is VPU-transcendental-bound on TPU
    # (measured 9.7 ms of the 56 ms 64x224^2 bench forward, +21% img/s
    # with tanh); the tanh approximation's ~1e-3 activation error is the
    # same fidelity class as the fp16-erf the torch reference evaluates
    # under autocast (train.py:80).
    gelu_tanh: Any = None
    # fused Pallas add+LayerNorm in bf16 mode (ops/layernorm.py): each
    # block's residual add rides INSIDE the LN kernel's VMEM pass, with
    # the MLP output threaded as a pending residual into the next
    # block's norm1.  Measured a LOSS on the chip even in this
    # add-carrying form (A/B same-process: 35.60 vs 35.15 ms train
    # step) — XLA's own lowering already fuses the residual add + f32
    # convert into its LN reduce and additionally overlaps it with
    # neighbouring matmuls, which an opaque kernel boundary forbids.
    # Kept as a tested option + an honest record (PERF.md r3 #9);
    # strict-f32 parity mode keeps the stock flax path regardless.
    fused_ln: bool = False
    # OPT-IN bf16 LayerNorm statistics (model.pretrained.ln_stats:
    # 'bf16'): mean/var reduce in bf16 instead of flax's f32 upcast —
    # the "one 2x lever left" on the LN floor named by PERF.md #15.
    # This LEAVES the reference's autocast fidelity class (torch
    # autocast keeps layer_norm fp32), so it is default-off and parity
    # presets pin f32; A/B + numerics delta recorded in PERF.md r5.
    ln_stats_bf16: bool = False

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def gelu_approximate(self) -> bool:
        if self.gelu_tanh is None:
            return self.dtype == jnp.bfloat16
        return bool(self.gelu_tanh)


VIT_PRESETS = {
    # (embed_dim, depth, num_heads) — vision_transformer.py:261-279
    "vit_tiny": (192, 12, 3),
    "vit_small": (384, 12, 6),
    "vit_base": (768, 12, 12),
    # CI/testing-only micro backbone (not in the reference)
    "vit_micro": (32, 2, 2),
}


def make_vit_config(model_type: str, patch_size: int, dtype=jnp.float32,
                    img_size: int = 224, attn_bf16: bool = False,
                    gelu: Any = None, ln_stats: str = "f32") -> ViTConfig:
    """gelu: None = auto (tanh in bf16, erf in f32 — see ViTConfig),
    'erf'/False = exact erf even in bf16 (parity-sensitive runs),
    'tanh'/True = force the approximation.  Exposed to configs as
    model.pretrained.gelu.  ln_stats: 'f32' (default, torch-autocast
    class) | 'bf16' (opt-in speed mode; see ViTConfig.ln_stats_bf16) —
    exposed as model.pretrained.ln_stats."""
    if model_type not in VIT_PRESETS:
        raise ValueError(f"Unknown arch {model_type}")
    dim, depth, heads = VIT_PRESETS[model_type]
    if isinstance(gelu, str):
        if gelu not in ("erf", "tanh"):
            raise ValueError(f"model.pretrained.gelu must be erf|tanh, got {gelu}")
        gelu = gelu == "tanh"
    if ln_stats not in ("f32", "bf16"):
        raise ValueError(
            f"model.pretrained.ln_stats must be f32|bf16, got {ln_stats}")
    return ViTConfig(
        patch_size=patch_size, embed_dim=dim, depth=depth, num_heads=heads,
        pos_grid=img_size // patch_size, dtype=dtype, attn_bf16=attn_bf16,
        gelu_tanh=gelu, ln_stats_bf16=(ln_stats == "bf16"),
    )


class FusedLayerNorm(nn.Module):
    """Drop-in nn.LayerNorm replacement backed by the Pallas kernels
    (ops/layernorm.py); identical param names ('scale'/'bias') so torch
    checkpoint conversion is unaffected.  Called with a second operand
    it fuses the residual add: ``(x, y) -> (x+y, LN(x+y))`` — still
    measured slightly behind XLA's own lowering (PERF.md r3 #9)."""

    epsilon: float
    dtype: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: Optional[jnp.ndarray] = None):
        from equss_tpu.ops.layernorm import (
            fused_add_layernorm,
            fused_layernorm,
        )

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        # nn.LayerNorm computes f32 stats on the UNCAST input; a silent
        # astype here would round an f32 stream to bf16 before the
        # stats, a numerics divergence no caller should get implicitly —
        # the kernels are bf16-in/f32-stats, so demand bf16 loudly
        for name, v in (("x", x), ("y", y)):
            if v is not None and v.dtype != self.dtype:
                raise TypeError(
                    f"FusedLayerNorm({self.dtype}) got {name} of dtype "
                    f"{v.dtype}; cast explicitly (stats semantics differ "
                    f"from nn.LayerNorm for wider inputs)")
        if y is None:
            return fused_layernorm(x, scale, bias, self.epsilon)
        return fused_add_layernorm(x, y, scale, bias, self.epsilon)


class BF16StatsLayerNorm(nn.Module):
    """LayerNorm with bf16 mean/var reductions (ViTConfig.ln_stats_bf16).

    flax nn.LayerNorm always upcasts the reduction to f32 — on the
    profile that upcast IS the LN cost (12x convert_reduce, PERF.md
    #12/#15).  Here the stats stay bf16 end to end; same param names
    ('scale'/'bias', f32) as nn.LayerNorm so torch checkpoint
    conversion is unaffected.  Opt-in speed mode: numerics leave the
    torch-autocast class (autocast keeps layer_norm fp32)."""

    epsilon: float
    dtype: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        xb = x.astype(jnp.bfloat16)
        mean = jnp.mean(xb, axis=-1, keepdims=True)
        xc = xb - mean
        var = jnp.mean(jax.lax.square(xc), axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + jnp.bfloat16(self.epsilon))
        y = y * scale.astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)
        return y.astype(self.dtype)


def _use_fused_ln(cfg: ViTConfig) -> bool:
    """Single source of truth for the fused-LN gate — Block's pending-
    residual threading is only valid when _layer_norm returns a
    FusedLayerNorm, so both MUST branch on this same predicate."""
    return cfg.fused_ln and cfg.dtype == jnp.bfloat16


def _layer_norm(cfg: ViTConfig, name: str):
    if _use_fused_ln(cfg):
        return FusedLayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name=name)
    if cfg.ln_stats_bf16 and cfg.dtype == jnp.bfloat16:
        return BF16StatsLayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype,
                                  name=name)
    return nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name=name)


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 want_attn: bool = False,
                 n_real: Optional[int] = None) -> Tuple[jnp.ndarray, Any]:
        cfg = self.cfg
        B, N, C = x.shape
        qkv_flat = nn.Dense(3 * C, use_bias=cfg.qkv_bias, dtype=cfg.dtype,
                            name="qkv")(x)                     # (B, N, 3C)
        scale = cfg.head_dim ** -0.5
        if n_real is not None and n_real != N and want_attn:
            # the fused kernel (the only path that can mask padded keys)
            # does not materialize attention maps; callers wanting maps
            # must not pre-pad the token stream
            raise ValueError(
                "want_attn is unsupported with a padded token stream "
                "(n_real != N): the fused kernel returns no attention maps")
        if (cfg.fused_attn and not want_attn and N >= cfg.fused_attn_min_n
                and cfg.attn_bf16 and cfg.dtype == jnp.bfloat16) \
                or (n_real is not None and n_real != N):
            from equss_tpu.ops.attention import fused_attention_qkv

            # transpose-free kernel: consumes the Dense output directly
            # and returns (B, N, C); the (B, N, 3, H, hd) reshape path
            # below costs ~as much in layout copies as the attention
            # math itself at 785 tokens (profiled).  n_real < N = the
            # token stream is pre-padded (VisionTransformer pads once
            # after the pos-embed); the kernel masks the padded keys,
            # which the einsum path could not.
            out = fused_attention_qkv(qkv_flat, num_heads=cfg.num_heads,
                                      scale=scale, n_real=n_real)
            out = nn.Dense(C, dtype=cfg.dtype, name="proj")(out)
            return out, None
        qkv = qkv_flat.reshape(B, N, 3, cfg.num_heads, cfg.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]     # (B, N, H, hd)
        acc_t = cfg.dtype if (cfg.attn_bf16 and cfg.dtype == jnp.bfloat16) \
            else jnp.float32
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=acc_t) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(cfg.dtype), v)
        out = out.reshape(B, N, C).astype(cfg.dtype)
        out = nn.Dense(C, dtype=cfg.dtype, name="proj")(out)
        return out, attn


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        hidden = int(cfg.embed_dim * cfg.mlp_ratio)
        x = nn.Dense(hidden, dtype=cfg.dtype, name="fc1")(x)
        # torch nn.GELU is exact erf; see ViTConfig.gelu_tanh for when
        # the tanh approximation is used instead
        x = nn.gelu(x, approximate=cfg.gelu_approximate)
        x = nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name="fc2")(x)
        return x


class Block(nn.Module):
    """Returns ``(x, pending, attn)``: in the fused-LN path the MLP
    output rides as a PENDING residual that the NEXT block's norm1 (or
    the final norm) folds into its add+LN kernel — keeping every
    residual add fused with a LayerNorm pass, which is where XLA's own
    lowering gets its speed (PERF.md r3 #9).  pending is None on the
    stock path (the add happens here as usual)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 pending: Optional[jnp.ndarray] = None,
                 want_attn: bool = False,
                 n_real: Optional[int] = None):
        cfg = self.cfg
        if _use_fused_ln(cfg):
            ln1 = FusedLayerNorm(cfg.ln_eps, cfg.dtype, name="norm1")
            ln2 = FusedLayerNorm(cfg.ln_eps, cfg.dtype, name="norm2")
            if pending is None:
                h1 = ln1(x)
            else:
                x, h1 = ln1(x, pending)
            y, attn = Attention(cfg, name="attn")(
                h1, want_attn=want_attn, n_real=n_real)
            x, h2 = ln2(x, y)
            m = Mlp(cfg, name="mlp")(h2)
            return x, m, attn
        if pending is not None:
            x = x + pending
        y, attn = Attention(cfg, name="attn")(
            _layer_norm(cfg, "norm1")(x),
            want_attn=want_attn, n_real=n_real,
        )
        x = x + y
        x = x + Mlp(cfg, name="mlp")(
            _layer_norm(cfg, "norm2")(x)
        )
        return x, None, attn


class VisionTransformer(nn.Module):
    """DINO ViT.  ``__call__(img)`` -> dict with dense features.

    img: (b, H, W, 3) NHWC; H, W divisible by patch_size.
    """

    cfg: ViTConfig

    def _interpolate_pos_embed(self, pos_embed: jnp.ndarray,
                               gh: int, gw: int) -> jnp.ndarray:
        """Bicubic pos-embed interpolation, matching
        vision_transformer.py:178-198 (incl. the +0.1 scale fudge)."""
        n = pos_embed.shape[1] - 1
        g0 = int(math.sqrt(n))
        if gh == g0 and gw == g0:
            return pos_embed
        cls_pe = pos_embed[:, :1]
        patch_pe = pos_embed[:, 1:].reshape(1, g0, g0, -1)
        # reference: w0, h0 = w0+0.1, h0+0.1; scale_factor = w0/sqrt(N)
        sf = ((gh + 0.1) / g0, (gw + 0.1) / g0)
        patch_pe = resize2d(patch_pe, (gh, gw), method="bicubic",
                            scale_factor=sf)
        patch_pe = patch_pe.reshape(1, gh * gw, -1)
        return jnp.concatenate([cls_pe, patch_pe], axis=1)

    @nn.compact
    def __call__(
        self,
        img: jnp.ndarray,
        *,
        n_last: int = 1,
        want_attn: bool = False,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        b, H, W, _ = img.shape
        gh, gw = H // cfg.patch_size, W // cfg.patch_size

        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=cfg.dtype,
            name="patch_embed",
        )(img.astype(cfg.dtype))
        x = x.reshape(b, gh * gw, cfg.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, cfg.embed_dim), jnp.float32,
        )
        pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, cfg.pos_grid * cfg.pos_grid + 1, cfg.embed_dim), jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, cfg.embed_dim)).astype(cfg.dtype), x],
            axis=1,
        )
        x = x + self._interpolate_pos_embed(pos_embed, gh, gw).astype(cfg.dtype)

        # pad the token stream to the fused-attention kernel's 128
        # granularity ONCE, instead of a (B, npad, 3C) pad copy in every
        # block (12 x 0.4 ms at the 224^2 bench shape).  The pad rows are
        # inert: LayerNorm/MLP are per-token and the kernel masks padded
        # keys; rows are sliced away before the dense output.
        n_tokens = x.shape[1]
        n_real = None
        if (cfg.fused_attn and not want_attn and cfg.attn_bf16
                and cfg.dtype == jnp.bfloat16
                and n_tokens >= cfg.fused_attn_min_n
                and n_tokens % 128 != 0):
            n_real = n_tokens
            x = jnp.pad(x, ((0, 0), (0, (-n_tokens) % 128), (0, 0)))

        final_ln = _layer_norm(cfg, "norm")
        feats: List[jnp.ndarray] = []
        attns: List[jnp.ndarray] = []
        pending = None
        for i in range(cfg.depth):
            x, pending, attn = Block(cfg, name=f"blocks_{i}")(
                x, pending, want_attn=want_attn, n_real=n_real)
            if cfg.depth - i <= n_last:
                if pending is None:
                    feats.append(final_ln(x[:, :n_tokens]))
                else:
                    # pending is produced ONLY under _use_fused_ln, the
                    # same gate that made final_ln a FusedLayerNorm —
                    # fold the block's pending MLP residual into the
                    # final norm's add+LN kernel
                    assert isinstance(final_ln, FusedLayerNorm)
                    feats.append(final_ln(x[:, :n_tokens],
                                          pending[:, :n_tokens])[1])
                if want_attn:
                    attns.append(attn)

        tokens = feats[-1]                                  # (b, 1+ghw, C)
        dense = tokens[:, 1:, :].reshape(b, gh, gw, cfg.embed_dim)
        out: Dict[str, Any] = {
            "dense": dense,                                 # (b, gh, gw, C)
            "cls": tokens[:, 0, :],
            "tokens": tokens,
            "intermediates": feats,
        }
        if want_attn:
            out["attn"] = attns
        return out


# ---------------------------------------------------------------------------
# Torch DINO checkpoint -> Flax params converter
# ---------------------------------------------------------------------------

def convert_dino_torch_state(state_dict: Dict[str, Any], cfg: ViTConfig) -> Dict[str, Any]:
    """Convert an official DINO torch state_dict (numpy-valued) into this
    module's Flax param tree.

    Accepts keys as produced by the FB checkpoints consumed at
    dino_featurizer.py:38-51 ('patch_embed.proj.weight', 'blocks.0....').
    Values may be torch tensors or numpy arrays.
    """
    import numpy as np

    def get(name):
        v = state_dict[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    def dense(prefix):
        return {
            "kernel": get(prefix + ".weight").T,   # torch (out,in) -> (in,out)
            "bias": get(prefix + ".bias"),
        }

    def ln(prefix):
        return {"scale": get(prefix + ".weight"), "bias": get(prefix + ".bias")}

    params: Dict[str, Any] = {
        "cls_token": get("cls_token"),
        "pos_embed": get("pos_embed"),
        "patch_embed": {
            # torch conv (out,in,kh,kw) -> flax (kh,kw,in,out)
            "kernel": get("patch_embed.proj.weight").transpose(2, 3, 1, 0),
            "bias": get("patch_embed.proj.bias"),
        },
        "norm": ln("norm"),
    }
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": ln(f"{p}.norm1"),
            "norm2": ln(f"{p}.norm2"),
            "attn": {
                "qkv": dense(f"{p}.attn.qkv"),
                "proj": dense(f"{p}.attn.proj"),
            },
            "mlp": {
                "fc1": dense(f"{p}.mlp.fc1"),
                "fc2": dense(f"{p}.mlp.fc2"),
            },
        }
    return jax.tree.map(jnp.asarray, params)


def load_dino_backbone(
    model_type: str,
    patch_size: int,
    pretrained_path: Optional[str] = None,
    dtype=jnp.float32,
) -> Tuple[VisionTransformer, Optional[Dict[str, Any]]]:
    """Build the ViT and (optionally) load converted DINO weights.

    The reference downloads from dl.fbaipublicfiles.com
    (dino_featurizer.py:27-51); this framework converts a local ``.pth``
    (no network egress in the build environment).  Returns
    (module, params-or-None).
    """
    cfg = make_vit_config(model_type, patch_size, dtype=dtype)
    module = VisionTransformer(cfg)
    params = None
    if pretrained_path is not None:
        import torch

        sd = torch.load(pretrained_path, map_location="cpu", weights_only=True)
        if "teacher" in sd:
            sd = sd["teacher"]
            sd = {k.replace("module.", "").replace("backbone.", ""): v
                  for k, v in sd.items()}
        params = convert_dino_torch_state(sd, cfg)
    return module, params
