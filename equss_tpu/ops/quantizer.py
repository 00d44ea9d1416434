"""Product/vector quantization ops, TPU-first.

Re-designs the quantizer family of the reference
(/root/reference/model/dino_pqgo.py:157-776, model/quantizer.py:12-614):
``Codebook`` (learned codebook: codebook + commitment loss),
``EMACodebook`` (EMA codebook with Laplace-smoothed updates), and
``ProductQuantizerWrapper`` (M independent subspace quantizers).

Key TPU design decisions (vs. the reference's per-subspace Python loop,
dino_pqgo.py:757-768):

* All M subspaces are quantized in ONE batched einsum
  ``(n, M, d) x (M, K, d) -> (n, M, K)`` that XLA tiles onto the MXU —
  no Python loop, no per-module state.
* State is explicit and functional: EMA buffers are inputs/outputs of the
  pure ``pq_forward`` function, so they thread cleanly through ``jit`` /
  ``pjit`` and checkpointing.
* Cross-replica statistics (the all_reduce of counts/sums at
  dino_pqgo.py:418-419) happen automatically under GSPMD because the pixel
  axis ``n`` is the sharded batch axis; an optional ``axis_name`` supports
  explicit ``shard_map`` use.
* Distances accumulate in fp32 with first-minimum argmin tie-break,
  matching ``torch.argmin`` semantics for bit-identical assignments.
* Dead-code restart/split use an explicit PRNG key and operate on the
  global batch, fixing the reference's per-rank RNG divergence
  (model/quantizer.py:83-91, noted as a latent race).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PQConfig:
    """Static quantizer configuration (mirrors cfg['model']['vq'],
    config/pqgo_baseline.yaml:32-48)."""

    num_pq: int = 64                 # M subspaces; 1 => plain VQ
    num_codebook: int = 256          # K entries per subspace
    embed_dim: int = 1024            # D = M * dsub
    vq_type: str = "param"           # "param" | "ema"
    beta: float = 0.25               # commitment loss weight
    book: float = 1.0                # codebook loss weight (param type)
    normalize: str = "l2"            # none | l2 | z_norm | z_trainable
    use_weighted_sum: bool = False
    use_gumbel: bool = False
    use_restart: bool = False
    use_split: bool = False
    need_initialized: str = "none"   # none | kmeans | uni | normal | rand
    pq_dropout: float = 0.0
    decay: float = 0.99              # EMA decay
    eps: float = 1.0e-5              # Laplace smoothing eps
    jsd_ts: float = 1.0              # softmax temperature for distance prob
    # fused Pallas assignment kernel (ops/pq_pallas.py).  Measured
    # IN-MODEL on the chip (r4, ViT-S/8 @224 + PQ 64x256, PERF.md #20):
    # the kernel beats the XLA in-graph path at EVERY batch — b=1:
    # 1.31 vs 1.50 ms; b=8: 4.54 vs 5.00 ms; b=128: 1834 vs 1685 img/s
    # (+8.8%) bf16, 1493 vs 1454 (+2.7%) exact — XLA pads the (n, M, d)
    # layouts its consumers read to 128 lanes (8x HBM traffic at d=16)
    # while the kernel emits flat (n, D), and the kernel never
    # materializes the (n, M, K) distance tensor so it also keeps
    # working past the ~13 GB HBM wall that kills the XLA path.  So:
    #   "auto" (default): kernel whenever eligible on a TPU backend;
    #     XLA path on other backends (the kernel would run interpreted)
    #     and for symbolic n (jax.export), where the XLA path's HBM
    #     ceiling is pallas_auto_bytes;
    #   True: always kernel; False: always XLA.
    use_pallas: Any = "auto"
    # HBM wall for the XLA path's materialized (n, M, K) distance
    # tensor (measured alive at 12.3 GB; 16 GB is the hard wall): the
    # non-TPU "auto" crossover, and the export-artifact batch-ceiling
    # warning (serve.py)
    pallas_auto_bytes: float = 1.3e10
    # how many ways the pixel axis n is sharded across the mesh: the
    # gate must compare PER-CHIP bytes (the Trainer sets this from its
    # mesh's data axis; n inside jit is the GLOBAL pixel count, but each
    # chip only ever holds n/shards of the distance tensor)
    pallas_auto_shards: int = 1
    # distance arithmetic for the kernel path: "exact" = f32 HIGHEST
    # distances, bit-identical argmin vs the torch fp32 reference;
    # "bf16" = one-pass MXU distances with f32 accumulation — the same
    # arithmetic the reference's production fp16 autocast runs
    # (train.py:80); flips ~0.4% of assignments on random data (99.6%
    # agreement measured on-chip), within the reference's own
    # fp32-vs-autocast variation
    assign_precision: str = "exact"

    def __post_init__(self):
        if self.embed_dim % self.num_pq != 0:
            raise ValueError(
                f"embed_dim {self.embed_dim} not divisible by num_pq {self.num_pq}"
            )
        if self.use_weighted_sum and self.normalize != "none":
            raise ValueError("use_weighted_sum requires normalize='none'")
        if self.use_gumbel and self.use_weighted_sum:
            # NB the reference asserts gumbel->weighted_sum and checks the
            # weighted-sum branch first (dino_pqgo.py:503-504,658-663),
            # which makes its gumbel path unreachable dead code; here
            # gumbel is standalone and the combination is rejected.
            raise ValueError("use_gumbel and use_weighted_sum are exclusive")

    @property
    def sub_dim(self) -> int:
        return self.embed_dim // self.num_pq


def pq_init(key: jax.Array, cfg: PQConfig) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Initialize (params, state).

    * param type: trainable ``codebook`` in params, uniform(-1/K, 1/K)
      (dino_pqgo.py:492-493).
    * ema type: codebook lives in state with ``weight_avg``/``count``
      buffers (dino_pqgo.py:169-175).
    """
    M, K, d = cfg.num_pq, cfg.num_codebook, cfg.sub_dim
    k_w, k_z = jax.random.split(key)
    if cfg.need_initialized == "uni":
        # xavier_uniform over each (K, d) codebook (dino_pqgo.py:357-359),
        # applied eagerly at init instead of lazily at the first step
        bound = math.sqrt(6.0 / (K + d))
        weight = jax.random.uniform(k_w, (M, K, d), jnp.float32, -bound, bound)
    elif cfg.need_initialized == "normal":
        std = math.sqrt(2.0 / (K + d))
        weight = std * jax.random.normal(k_w, (M, K, d), jnp.float32)
    else:
        # default uniform(-1/K, 1/K) (dino_pqgo.py:170,492-493); "kmeans"
        # and "rand" are data-dependent — the Trainer calls the model's
        # ``data_init`` hook (-> pq_data_init below) on the FIRST train
        # batch before the first step, mirroring the reference's lazy
        # first-forward init (dino_pqgo.py:341-366)
        weight = jax.random.uniform(
            k_w, (M, K, d), jnp.float32, minval=-1.0 / K, maxval=1.0 / K
        )

    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {
        # cumulative usage counter (reference self.vq_count)
        "vq_count": jnp.zeros((M, K), jnp.float32),
    }
    if cfg.vq_type == "param":
        params["codebook"] = weight
    elif cfg.vq_type == "ema":
        state["ema_weight"] = weight
        # distinct buffer (not an alias): donated train-state pytrees must
        # not contain the same buffer twice
        state["ema_weight_avg"] = weight + jnp.zeros_like(weight)
        state["ema_count"] = jnp.zeros((M, K), jnp.float32)
    else:
        raise ValueError(f"Unsupported vq_type {cfg.vq_type}")

    if cfg.normalize == "z_trainable":
        params["z_mean"] = jnp.zeros((M, d), jnp.float32)
        params["z_log_var"] = jnp.zeros((M, d), jnp.float32)
    return params, state


def pq_data_init(
    key: jax.Array,
    zf: jnp.ndarray,
    params: Dict[str, Any],
    state: Dict[str, Any],
    cfg: PQConfig,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Data-dependent codebook init from the first training batch.

    zf: (n, M, d) raw (pre-normalization) subspace features, matching
    the reference which clusters ``z_flat`` before its normalize step
    (dino_pqgo.py:341-355).

    * ``kmeans``: per-subspace k-means++ Lloyd on device (the sklearn
      ``KMeans(init='k-means++')`` analogue, dino_pqgo.py:348-355) —
      batched over all M subspaces in one call instead of a host loop.
    * ``rand``: every codeword replaced by a random batch vector (the
      reference's prepare_restart(zeros)+restart, dino_pqgo.py:343-346).

    Both the live codebook and the EMA average buffer are overwritten
    (reference copies into weight AND weight_avg, :354-355); counts stay
    zero.  No-op for other ``need_initialized`` modes.
    """
    if cfg.need_initialized not in ("kmeans", "rand"):
        return params, state
    M, K, d = cfg.num_pq, cfg.num_codebook, cfg.sub_dim
    zf = zf.reshape(-1, M, d).astype(jnp.float32)
    zm = zf.transpose(1, 0, 2)                            # (M, n, d)
    if cfg.need_initialized == "kmeans":
        from equss_tpu.ops.kmeans import kmeans

        weight, _ = kmeans(key, zm, k=K, n_iters=25)      # (M, K, d)
    else:  # rand
        n = zm.shape[1]
        cand = jax.random.randint(key, (M, K), 0, n)
        weight = jnp.take_along_axis(zm, cand[..., None], axis=1)
    params = dict(params)
    state = dict(state)
    if cfg.vq_type == "param":
        params["codebook"] = weight
    else:
        state["ema_weight"] = weight
        state["ema_weight_avg"] = weight + jnp.zeros_like(weight)
    return params, state


def normalize_vectors(x: jnp.ndarray, mode: str, axis: int = -1) -> jnp.ndarray:
    """`l2` / `z_norm` / `none` normalization (dino_pqgo.py:369-390).

    Epsilon placement matches the reference exactly: l2 uses torch
    F.normalize semantics (clamp norm to 1e-12); z_norm divides by
    (std + 1e-5) with Bessel-corrected std (torch.std default).
    """
    if mode == "none":
        return x
    if mode == "l2":
        norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
        return x / jnp.maximum(norm, 1e-12)
    if mode == "z_norm":
        mean = jnp.mean(x, axis=axis, keepdims=True)
        n = x.shape[axis]
        var = jnp.sum((x - mean) ** 2, axis=axis, keepdims=True) / max(n - 1, 1)
        return (x - mean) / (jnp.sqrt(var) + 1e-5)
    raise ValueError(f"Unsupported normalize mode {mode}")


def pairwise_sqdist(z: jnp.ndarray, codebook: jnp.ndarray,
                    precision: str = "exact") -> jnp.ndarray:
    """Squared L2 distances for every subspace at once.

    z: (n, M, d), codebook: (M, K, d) -> (n, M, K).
    Identity x^2 + c^2 - 2 x.c, same formulation as dino_pqgo.py:397-399
    (required for bit-exact parity with the reference's argmin).

    precision="exact": f32 operands on the MXU in full-f32 (multi-pass)
    mode, f32 output — bit-identical distances/argmin vs the torch fp32
    reference.  "bf16": bf16 operands with f32 accumulation (the
    reference's fp16-autocast arithmetic, train.py:80) and a bf16
    result tensor — halves the dominant HBM cost of the (n, M, K)
    round trip and skips the 6-pass f32 emulation.
    """
    if precision == "bf16":
        zb = z.astype(jnp.bfloat16)
        cb = codebook.astype(jnp.bfloat16)
        z_sq = jnp.sum(zb * zb, axis=-1,
                       dtype=jnp.float32)[:, :, None]         # (n, M, 1)
        c_sq = jnp.sum(cb * cb, axis=-1, dtype=jnp.float32)[None]
        cross = jnp.einsum("nmd,mkd->nmk", zb, cb,
                           preferred_element_type=jnp.float32)
        return (z_sq + c_sq - 2.0 * cross).astype(jnp.bfloat16)
    z = z.astype(jnp.float32)
    codebook = codebook.astype(jnp.float32)
    z_sq = jnp.sum(z * z, axis=-1)[:, :, None]            # (n, M, 1)
    c_sq = jnp.sum(codebook * codebook, axis=-1)[None]    # (1, M, K)
    # precision='highest' keeps the MXU in full-f32 mode: required for the
    # bit-identical-assignment north star (TPU default would downcast to
    # bf16 inputs and break argmin ties differently than the reference).
    cross = jnp.einsum(
        "nmd,mkd->nmk", z, codebook,
        preferred_element_type=jnp.float32, precision="highest",
    )
    return z_sq + c_sq - 2.0 * cross


def _gather_codewords(codebook: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """codebook: (M, K, d), indices: (n, M) -> (n, M, d).

    One-hot f32 matmul at HIGHEST precision, not take_along_axis: the
    dynamic row gather is DMA-bound on TPU (~18 ms for the 64x224^2
    batch, ~4x slower than the MXU selection), while the one-hot
    product is EXACT — every product is 1.0 x codeword or 0.0, and the
    f32 accumulation adds exact zeros, so the result is bit-identical
    to the gather.  It is also linear in the codebook, so the backward
    pass is another matmul instead of a scatter-add (the scatter was
    5.4 ms of the pqgo train step)."""
    K = codebook.shape[1]
    oh = jax.nn.one_hot(indices, K, dtype=jnp.float32)          # (n, M, K)
    return jnp.einsum("nmk,mkd->nmd", oh, codebook.astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision="highest")


def _maybe_psum(x: jnp.ndarray, axis_name: Optional[str]) -> jnp.ndarray:
    if axis_name is not None:
        return jax.lax.psum(x, axis_name)
    return x


def _usage_aux(count: jnp.ndarray, K: int) -> Dict[str, jnp.ndarray]:
    """Codebook health telemetry from (M, K) usage counts: live-codeword
    ratio (dino_pqgo.py:436-437) and usage-CDF percentiles — fraction of
    codewords covering 10/50/90% of assignments (quantizer.py:15-30
    get_histogram_count), subspace-averaged."""
    aux = {"codebook-usage": jnp.mean(
        jnp.sum((count > 0).astype(jnp.float32), axis=-1) / K)}
    prob = count / (jnp.sum(count, axis=-1, keepdims=True) + 1.0)
    prob = jnp.sort(prob, axis=-1)[:, ::-1]
    c_sum = jnp.cumsum(prob, axis=-1)
    for q in (10, 50, 90):
        idx_q = jnp.argmax(c_sum >= q / 100.0, axis=-1)
        aux[f"current-p{q}"] = jnp.mean(idx_q / K)
    return aux


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pallas_assign_ste(zf, codebook, codebook_norm, normalize, exact):
    """Differentiable wrapper over the fused Pallas assignment kernel
    (ops/pq_pallas.py) for TRAINING on param-type codebooks.

    Forward: the kernel (normalize + distance + argmin + codeword gather
    fused in VMEM — none of the (n, M, K) distance / one-hot tensors and
    none of the (n, M, d) layout copies the XLA path materializes).
    Backward (analytic — what XLA's autodiff computes for the same math):

      * d z: the assignment indices are piecewise-constant (argmin kills
        the distance cotangent), so z's gradient flows only through the
        z_norm output — the VJP of ``normalize_vectors`` recomputed on
        the saved input (rematerialization, not storage).
      * d codebook: the gather's transpose, a scatter-add of the z_q
        cotangent at the assignment indices — expressed as the one-hot
        einsum ``(n,M,K)ᵀ(n,M,d)`` so it rides the MXU exactly like the
        backward of the XLA one-hot-gather path (the dynamic-scatter
        form measured 5.4 ms DMA-bound, quantizer.py bf16 branch note).
        The bf16 fast mode's codeword rounding gets the same
        convert-is-identity gradient XLA applies to ``astype(bf16)``.
      * d codebook_norm: zero — it feeds only the argmin.
    """
    out, _ = _pallas_assign_ste_fwd(zf, codebook, codebook_norm,
                                    normalize, exact)
    return out


def _pallas_assign_ste_fwd(zf, codebook, codebook_norm, normalize, exact):
    from equss_tpu.ops.pq_pallas import pq_assign_pallas

    indices, zn, zq = pq_assign_pallas(
        zf, codebook_norm, codebook, normalize=normalize, exact=exact)
    return (indices, zn, zq), (zf, indices, codebook_norm)


def _pallas_assign_ste_bwd(normalize, exact, res, cts):
    zf, indices, codebook_norm = res
    _, d_zn, d_zq = cts                      # d indices: int output, no grad
    K = codebook_norm.shape[1]
    if normalize == "none":
        d_z = d_zn
    else:
        _, vjp_n = jax.vjp(lambda z: normalize_vectors(z, normalize), zf)
        (d_z,) = vjp_n(d_zn)
    oh = jax.nn.one_hot(indices, K, dtype=d_zq.dtype)
    d_c = jnp.einsum("nmk,nmd->mkd", oh, d_zq,
                     preferred_element_type=jnp.float32)
    return d_z, d_c.astype(zf.dtype), jnp.zeros_like(codebook_norm)


_pallas_assign_ste.defvjp(_pallas_assign_ste_fwd, _pallas_assign_ste_bwd)


def ema_codebook_update(
    state: Dict[str, Any],
    count: jnp.ndarray,
    vec_sum: jnp.ndarray,
    cfg: PQConfig,
) -> Dict[str, Any]:
    """EMA weight update with Laplace smoothing (dino_pqgo.py:187-208)."""
    decay, eps = cfg.decay, cfg.eps
    ema_count = state["ema_count"] * decay + count * (1.0 - decay)
    ema_weight_avg = state["ema_weight_avg"] * decay + vec_sum * (1.0 - decay)
    n = jnp.sum(ema_count, axis=-1, keepdims=True)                      # (M, 1)
    smoothed = (ema_count + eps) / (n + cfg.num_codebook * eps) * n      # (M, K)
    weight = ema_weight_avg / smoothed[..., None]
    return dict(
        state,
        ema_count=ema_count,
        ema_weight_avg=ema_weight_avg,
        ema_weight=weight,
    )


def _restart_dead_codes(
    key: jax.Array,
    codebook: jnp.ndarray,
    count: jnp.ndarray,
    z: jnp.ndarray,
) -> jnp.ndarray:
    """Replace dead entries (count==0) with random batch vectors.

    Functional, static-shape version of prepare_restart/restart
    (dino_pqgo.py:263-293).  Every replica computes the same result
    (explicit key + global batch), unlike the reference where each DDP
    rank restarted with different candidates.
    """
    M, K, d = codebook.shape
    n = z.shape[0]
    # draw K candidate pixels per subspace (with replacement if K > n)
    cand_idx = jax.random.randint(key, (M, K), 0, n)
    # z is (n, M, d): take pixel cand_idx[m, k] in subspace m
    candidates = jnp.take_along_axis(
        z.transpose(1, 0, 2),                                  # (M, n, d)
        cand_idx[..., None],                                   # (M, K, 1)
        axis=1,
    )                                                          # (M, K, d)
    dead = (count == 0)[..., None]                             # (M, K, 1)
    return jnp.where(dead, candidates, codebook)


def _split_codes(
    key: jax.Array,
    codebook: jnp.ndarray,
    total_count: jnp.ndarray,
    current_count: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split the most-used entries into dead slots (dino_pqgo.py:295-331).

    Static-shape version: the j-th dead entry copies the j-th most used
    entry plus noise; both get half the count.  Returns (codebook, count).
    """
    M, K, d = codebook.shape
    dead = current_count == 0                                  # (M, K)
    # rank of each dead slot among dead slots, 0-based
    dead_rank = jnp.cumsum(dead.astype(jnp.int32), axis=-1) - 1
    # entries sorted by descending total usage
    order = jnp.argsort(-total_count, axis=-1)                 # (M, K)
    src = jnp.take_along_axis(order, jnp.clip(dead_rank, 0, K - 1), axis=-1)
    noise = 0.02 * jax.random.normal(key, codebook.shape, codebook.dtype)
    src_weight = jnp.take_along_axis(codebook, src[..., None], axis=1)
    src_count = jnp.take_along_axis(total_count, src, axis=-1)

    new_codebook = jnp.where(dead[..., None], src_weight + noise, codebook)
    # halve source counts: a source is any entry selected by some dead slot
    n_dead = jnp.sum(dead, axis=-1, keepdims=True)             # (M, 1)
    pos = jnp.argsort(order, axis=-1)                          # usage rank of each k
    is_src = pos < n_dead
    new_count = jnp.where(dead, src_count / 2.0, total_count)
    new_count = jnp.where(is_src, new_count / 2.0, new_count)
    # subtract noise from the split sources, like the reference
    new_codebook = jnp.where(is_src[..., None], new_codebook - noise, new_codebook)
    return new_codebook, new_count


def pq_forward(
    z: jnp.ndarray,
    params: Dict[str, Any],
    state: Dict[str, Any],
    cfg: PQConfig,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    want_prob: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, Any], Dict[str, Any]]:
    """Quantize features in all M subspaces.

    z: (..., D) with D = M * dsub (typically (b, h, w, D) NHWC).

    Returns ``(z_q, indices, aux, new_state)`` where z_q has the shape of
    ``z`` (straight-through in training), indices is (..., M) int32, and
    aux carries losses/telemetry:
      vq-loss, codebook-usage, codebook-sum, jsd (ema), entropy (ema),
      distance_prob (..., M, K).

    Mirrors Codebook.forward / EMACodebook.forward + ProductQuantizerWrapper
    (dino_pqgo.py:333-457,579-776) with subspace-averaged outputs.
    """
    M, K, d = cfg.num_pq, cfg.num_codebook, cfg.sub_dim
    lead_shape = z.shape[:-1]
    zf = z.reshape(-1, M, d).astype(jnp.float32)   # chunk channels into M groups
    n = zf.shape[0]

    codebook = params["codebook"] if cfg.vq_type == "param" else state["ema_weight"]

    # ---- codebook normalization (dino_pqgo.py:369-390) ----
    z_mean = z_std = None
    if cfg.normalize == "z_trainable":
        z_mean = params["z_mean"]                           # (M, d)
        z_std = jnp.sqrt(jnp.exp(params["z_log_var"]))
        c_mean = jnp.mean(codebook, axis=1, keepdims=True)  # over K, per dim
        c_var = jnp.sum((codebook - c_mean) ** 2, axis=1, keepdims=True) / max(K - 1, 1)
        codebook_norm = (codebook - c_mean) / (jnp.sqrt(c_var) + 1e-5)
    else:
        codebook_norm = normalize_vectors(codebook, cfg.normalize)

    if want_prob is None:
        want_prob_eff = cfg.use_weighted_sum or (training and cfg.vq_type == "ema")
    else:
        want_prob_eff = want_prob or cfg.use_weighted_sum

    # ---- fused Pallas path (inference assignment) ----
    # eligible when nothing needs the dense distance tensor: the kernel
    # fuses normalize + distance + argmin + codeword gather in VMEM
    # (ops/pq_pallas.py); loss/straight-through math then runs on the
    # kernel's FLAT (n, D) outputs — the (n, M, d) layout XLA would pick
    # for them pads d=16 to 128 lanes and costs ~8x the HBM traffic.
    if cfg.use_pallas == "auto":
        if not isinstance(n, int):
            # symbolic n (jax.export shape polymorphism): size unknown
            # at trace time and Pallas needs concrete shapes — XLA path
            want_pallas = False
        elif jax.default_backend() == "tpu":
            # measured r4 (PERF.md #20): in-model the kernel wins at
            # every batch, b=1 through the b=128 flagship, in both
            # precisions — kernel whenever eligible
            want_pallas = True
        else:
            # non-TPU: the kernel runs in interpret mode (tests) — XLA
            # path unless the materialized (n, M, K) distance tensor
            # would cross the HBM wall the gate contract pins.  Only
            # ONE such tensor is live at a time on the XLA path (dist
            # dies at the argmin before the gather's one-hot is built —
            # measured alive at a 12.3 GB dist tensor, PERF.md #10), so
            # compare 1x dist bytes (f32 exact / bf16 fast) per chip.
            elt = 2 if cfg.assign_precision == "bf16" else 4
            per_chip = n * M * K * elt / max(1, cfg.pallas_auto_shards)
            want_pallas = per_chip > cfg.pallas_auto_bytes
    else:
        want_pallas = bool(cfg.use_pallas)
    # Training eligibility for the kernel route (the _pallas_assign_ste
    # custom-VJP wrapper): param-type only (EMA's vec_sum needs the
    # unnormalized one-hot einsum regardless), no restart/split (they
    # consume tensors beyond the kernel outputs), and running-stat-free
    # normalization.  Engaged only by an EXPLICIT use_pallas=1 — 'auto'
    # keeps the measured inference-only routing until the in-model
    # train A/B is recorded (the PERF.md #20 lesson: benchmark a kernel
    # in the graph position it will occupy before routing to it).
    train_route_ok = (
        cfg.use_pallas != "auto"
        and cfg.vq_type == "param"
        and not cfg.use_restart
        and not cfg.use_split
        and cfg.normalize != "z_trainable"
    )
    use_pallas = (
        want_pallas
        and (not training or train_route_ok)
        and not want_prob_eff
        and not cfg.use_weighted_sum
        and not cfg.use_gumbel
        and cfg.pq_dropout == 0.0
        and cfg.sub_dim % 8 == 0
        and cfg.num_codebook % 128 == 0
    )
    if use_pallas:
        exact = cfg.assign_precision != "bf16"
        if training:
            # custom-VJP route: gradients flow to z (normalize chain)
            # and codebook (one-hot MXU scatter) — see _pallas_assign_ste
            indices, zn_m, zq_m = _pallas_assign_ste(
                zf, codebook, codebook_norm, cfg.normalize, exact)
        else:
            from equss_tpu.ops.pq_pallas import pq_assign_pallas

            indices, zn_m, zq_m = pq_assign_pallas(
                zf, codebook_norm, codebook,
                normalize=cfg.normalize, z_mean=z_mean, z_std=z_std,
                exact=exact,
            )
        zn_flat = zn_m.reshape(n, M * d)
        zq_flat = zq_m.reshape(n, M * d)
        aux: Dict[str, Any] = {}
        new_state = dict(state)
        sg = jax.lax.stop_gradient
        commitment = jnp.mean((zn_flat - sg(zq_flat)) ** 2)
        if cfg.vq_type == "param":
            codebook_loss = jnp.mean((zq_flat - sg(zn_flat)) ** 2)
            aux["vq-loss"] = cfg.book * codebook_loss + cfg.beta * commitment
        else:
            aux["vq-loss"] = cfg.beta * commitment
        z_q = zn_flat + sg(zq_flat - zn_flat)
        aux["codebook-sum"] = jnp.sum(jnp.abs(codebook)) / M
        if training:
            # same stats/state contract as the XLA training path.  The
            # one-hot count sum is deliberate: a segment-sum from the
            # indices looks cheaper on paper but is a DMA-bound scatter
            # on TPU — measured 37.0 vs 31.3 ms on the b=16 flagship
            # train step (PERF.md #23)
            count = _maybe_psum(
                jnp.sum(jax.nn.one_hot(indices, K, dtype=jnp.float32),
                        axis=0), axis_name)
            new_state["vq_count"] = state["vq_count"] + count
            aux.update(_usage_aux(count, K))
        z_q = z_q.reshape(*lead_shape, M * d)
        indices = indices.reshape(*lead_shape, M)
        return z_q, indices, aux, new_state

    # ---- z normalization, XLA path (dino_pqgo.py:369-390) ----
    if cfg.normalize == "z_trainable":
        z_norm = (zf - z_mean[None]) / (z_std[None] + 1e-5)
    else:
        z_norm = normalize_vectors(zf, cfg.normalize)

    # ---- distances + assignment ----
    dist = pairwise_sqdist(z_norm, codebook_norm,
                           precision=cfg.assign_precision)  # (n, M, K)

    if cfg.pq_dropout > 0.0 and training:
        # deviation (documented): the reference physically removes masked
        # rows (dino_pqgo.py:393-395), which re-means the returned indices
        # against the REDUCED codebook while the EMA gather still uses the
        # full table — a latent misindexing bug. Masking distances to +inf
        # keeps global index semantics and static shapes.
        if rng is None:
            raise ValueError("pq_dropout requires rng")
        rng, k_drop = jax.random.split(rng)
        keep = jax.random.uniform(k_drop, (M, K)) > cfg.pq_dropout
        # ensure at least the first entry stays alive per subspace
        keep = keep.at[:, 0].set(True)
        dist = jnp.where(keep[None], dist, jnp.inf)

    indices = jnp.argmin(dist, axis=-1).astype(jnp.int32)   # (n, M); first-min ties
    # the (n, M, K) softmax is pure HBM traffic when nothing consumes it
    # (inference / param-type training): compute only on demand
    distance_prob = (jax.nn.softmax(-dist.astype(jnp.float32) / cfg.jsd_ts, axis=-1)
                     if want_prob_eff else None)

    if cfg.use_gumbel and training:
        # hard gumbel-softmax assignment (the reference's intended but
        # unreachable branch, dino_pqgo.py:660-663)
        if rng is None:
            raise ValueError("use_gumbel requires rng")
        rng, k_g = jax.random.split(rng)
        g = jax.random.gumbel(k_g, dist.shape)
        indices = jnp.argmax(-dist + g, axis=-1).astype(jnp.int32)
        z_q = _gather_codewords(codebook, indices)
    elif cfg.use_weighted_sum:
        if distance_prob is None:
            distance_prob = jax.nn.softmax(-dist.astype(jnp.float32) / cfg.jsd_ts, axis=-1)
        z_q = jnp.einsum(
            "nmk,mkd->nmd", distance_prob, codebook_norm,
            preferred_element_type=jnp.float32,
        )
    elif cfg.assign_precision == "bf16":
        # one-hot matmul gather: the dynamic row gather (and, for param
        # codebooks, its backward scatter) is DMA-bound on TPU —
        # profiled 4.6 + 5.4 ms of a 64 ms pqgo b=16 train step; as a
        # (n, M, K) x (M, K, d) einsum both directions ride the MXU.
        # Codeword values round to bf16 — the same rounding the torch
        # reference's fp16-autocast production training applies.
        oh = jax.nn.one_hot(indices, K, dtype=jnp.bfloat16)
        z_q = jnp.einsum("nmk,mkd->nmd", oh,
                         codebook.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    else:
        # raw (unnormalized) codebook gather, as in dino_pqgo.py:409,665
        z_q = _gather_codewords(codebook, indices)

    aux: Dict[str, Any] = {}
    new_state = dict(state)

    # ---- training statistics + EMA / restart / split ----
    if training:
        one_hot = jax.nn.one_hot(indices, K, dtype=jnp.float32)     # (n, M, K)
        count = _maybe_psum(jnp.sum(one_hot, axis=0), axis_name)    # (M, K)
        new_state["vq_count"] = state["vq_count"] + count
        aux.update(_usage_aux(count, K))

        if cfg.vq_type == "ema":
            # EMA sums use the *unnormalized* z (dino_pqgo.py:417)
            vec_sum = _maybe_psum(
                jnp.einsum("nmk,nmd->mkd", one_hot, zf,
                           preferred_element_type=jnp.float32,
                           precision="highest"),
                axis_name,
            )
            new_state = ema_codebook_update(new_state, count, vec_sum, cfg)
            if cfg.use_restart:
                if rng is None:
                    raise ValueError("use_restart requires rng")
                rng, k_r = jax.random.split(rng)
                restarted = _restart_dead_codes(
                    k_r, new_state["ema_weight"], count, zf
                )
                any_dead = jnp.any(count == 0)
                new_state["ema_weight"] = restarted
                # reference resets avg to weight and count to 0 on restart
                new_state["ema_weight_avg"] = jnp.where(
                    any_dead, restarted, new_state["ema_weight_avg"]
                )
                new_state["ema_count"] = jnp.where(
                    any_dead, jnp.zeros_like(new_state["ema_count"]),
                    new_state["ema_count"],
                )
            if cfg.use_split:
                if rng is None:
                    raise ValueError("use_split requires rng")
                rng, k_s = jax.random.split(rng)
                new_w, new_c = _split_codes(
                    k_s, new_state["ema_weight"], new_state["ema_count"], count
                )
                new_state["ema_weight"] = new_w
                new_state["ema_count"] = new_c
        elif cfg.use_restart:
            if rng is None:
                raise ValueError("use_restart requires rng")
            rng, k_r = jax.random.split(rng)
            # param-type restart rewrites the (trainable) codebook; exposed
            # via aux so the trainer can apply it out-of-band if enabled.
            aux["restarted-codebook"] = _restart_dead_codes(
                k_r, codebook, count, z_norm
            )

    # ---- losses (dino_pqgo.py:440-444, 684-690) ----
    sg = jax.lax.stop_gradient
    commitment = jnp.mean((z_norm - sg(z_q)) ** 2)
    if cfg.vq_type == "param":
        codebook_loss = jnp.mean((z_q - sg(z_norm)) ** 2)
        aux["vq-loss"] = cfg.book * codebook_loss + cfg.beta * commitment
    else:
        aux["vq-loss"] = cfg.beta * commitment

    if not cfg.use_weighted_sum:
        z_q = z_norm + sg(z_q - z_norm)     # straight-through estimator

    # reference sums |weight| per subspace then averages over subspaces
    # (dino_pqgo.py:450 + ProductQuantizerWrapper averaging :771-772)
    aux["codebook-sum"] = jnp.sum(jnp.abs(codebook)) / M
    if distance_prob is not None:
        aux["distance_prob"] = distance_prob.reshape(*lead_shape, M, K)

    z_q = z_q.reshape(*lead_shape, M * d)
    indices = indices.reshape(*lead_shape, M)
    return z_q, indices, aux, new_state


def ema_jsd_entropy(
    prob_a: jnp.ndarray, prob_b: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """JSD + negative-entropy telemetry between two distance-prob chunks,
    averaged over subspaces (EMACodebook path, dino_pqgo.py:452-455).

    prob_*: (..., M, K).  Vectorized over M (no Python loop): each
    subspace gets the reference's batchmean-KL JSD and batch-entropy,
    then results are averaged over subspaces as ProductQuantizerWrapper
    does (dino_pqgo.py:762-772).
    """
    pa = prob_a.reshape(-1, prob_a.shape[-2], prob_a.shape[-1])  # (n, M, K)
    pb = prob_b.reshape(-1, prob_b.shape[-2], prob_b.shape[-1])

    def kl_batchmean(log_input, p_target):
        # sum over K of p * (log p - log_input), mean over n
        log_t = jnp.log(p_target + 1e-6)
        return jnp.mean(jnp.sum(p_target * (log_t - log_input), axis=-1), axis=0)

    log_m = jnp.log(0.5 * (pa + pb) + 1e-6)
    jsd_per_m = 0.5 * (kl_batchmean(log_m, pa) + kl_batchmean(log_m, pb))  # (M,)
    jsd = jnp.mean(jsd_per_m)

    avg_p = jnp.mean(pa, axis=0)                                   # (M, K)
    ent_per_m = jnp.sum(-avg_p * jnp.log(avg_p + 1e-8), axis=-1)   # (M,)
    ent = jnp.mean(-ent_per_m)   # EntropyLoss returns NEGATIVE entropy
    return jsd, ent
