"""Twin-training accuracy-parity harness.

Trains the SAME configuration (flagship pqgo, the STEGO baseline family
via ``variant='stego'``, or the train_vq.py soft-PQ family via
``variant='spq'``) in BOTH frameworks — the torch
reference at /root/reference (imported as an oracle, never copied) and
this framework's own Trainer — from identical weights on an identical
miniature corpus, with every stochastic knob either disabled or fed
identical draws, and compares:

  (a) per-step loss trajectories (stego / vq / linear / cluster / total),
  (b) final Hungarian cluster + linear mIoU, each computed by each
      framework's OWN metric stack,
  (c) per-pixel codeword indices (the BASELINE.md dump protocol) at the
      full flagship shape.

Determinism strategy: dropout off (drop_prob=0), no photometric aug
(pqgo consumes none), pq_dropout=0, no restart/split; the one remaining
stochastic element — STEGO's sampled coordinates/negative permutations
(loss.py:708-727) — is drawn ONCE per step by the harness from a numpy
RNG with the reference's exact distributions and injected into BOTH
sides (the reference via a shim module that calls the reference's own
``sample``/``helper``; this framework via ``stego_loss``'s
``sample_override`` seam).

Reference call stack mirrored: train.py:60-160 (zero_grad -> wrapper
forward -> backward -> clip(model params) -> 3 Adam steps),
wrapper/PQGOWrapper.py:52-103 (loss assembly + probes on detached out),
model/metric.py:13-100 (Hungarian mIoU).
"""
from __future__ import annotations

import os
import sys
import tempfile
import types
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# reference import (oracle only)
# --------------------------------------------------------------------------

def import_reference():
    """Make /root/reference importable (stubs torchmetrics, absent here)."""
    import torch  # noqa: F401

    if not torch.cuda.is_available():
        # the reference's forward calls torch.cuda.synchronize()
        # unconditionally around its stego timing (dino_pqgo.py:145-148)
        # — a no-op stand-in lets the oracle run on CPU
        torch.cuda.synchronize = lambda *a, **k: None
        torch.cuda.empty_cache = lambda *a, **k: None
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if "torchmetrics" not in sys.modules:
        import torch.nn.functional as F

        tm = types.ModuleType("torchmetrics")
        tm_f = types.ModuleType("torchmetrics.functional")

        def pairwise_cosine_similarity(x):
            xn = F.normalize(x, dim=-1)
            return xn @ xn.T

        tm_f.pairwise_cosine_similarity = pairwise_cosine_similarity
        tm.functional = tm_f
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.functional"] = tm_f
    if "torchvision" not in sys.modules:
        # crf_utils imports torchvision.transforms.functional at module
        # level; only its CRF path (never exercised here) would use it
        tv = types.ModuleType("torchvision")
        tv_t = types.ModuleType("torchvision.transforms")
        tv_f = types.ModuleType("torchvision.transforms.functional")
        tv.transforms = tv_t
        tv_t.functional = tv_f
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_t
        sys.modules["torchvision.transforms.functional"] = tv_f
    if "pydensecrf" not in sys.modules:
        # the reference's evaluator module imports utils.crf_utils at
        # module level; the CRF path itself is never exercised by the
        # twin run (is_crf=False throughout)
        pd = types.ModuleType("pydensecrf")
        pd_d = types.ModuleType("pydensecrf.densecrf")
        pd_u = types.ModuleType("pydensecrf.utils")
        pd.densecrf = pd_d
        pd.utils = pd_u
        sys.modules["pydensecrf"] = pd
        sys.modules["pydensecrf.densecrf"] = pd_d
        sys.modules["pydensecrf.utils"] = pd_u


# --------------------------------------------------------------------------
# shared configuration
# --------------------------------------------------------------------------

#: per-variant loss keys compared step-by-step (stego has no quantizer;
#: spq's objective is jsd-only per its reference config, spq_baseline.yaml)
TWIN_LOSS_KEYS = {
    "pqgo": ("loss", "stego-loss", "vq-loss", "linear-loss", "cluster-loss"),
    "stego": ("loss", "stego-loss", "linear-loss", "cluster-loss"),
    "spq": ("loss", "jsd", "linear-loss", "cluster-loss"),
    # sl: total IS the CE loss; stego-loss is computed-but-unused
    # telemetry on both sides (SupervisedWrapper.py:40-47)
    "sl": ("loss", "linear-loss", "stego-loss"),
}


def make_twin_config(
    *,
    variant: str = "pqgo",
    model_type: str = "vit_small",
    patch_size: int = 8,
    embed_dim: int = 64,
    num_pq: int = 8,
    num_codebook: int = 32,
    num_classes: int = 4,
    feature_samples: int = 5,
    neg_samples: int = 2,
    lr_model: float = 3.0e-4,
    lr_probe: float = 3.0e-3,
) -> Dict[str, Any]:
    """One config dict BOTH frameworks parse (the schemas intentionally
    match, core/config.py).  variant: 'pqgo' (flagship, quantized) or
    'stego' (STEGO baseline family, dino_stego.py:11-66)."""
    cfg = {
        "seed": 0,
        "num_classes": num_classes,
        "dataset_name": "cocostuff27",
        "model": {
            "name": "pqgo",
            "pretrained": {
                "model_type": model_type,
                "dino_patch_size": patch_size,
                "freeze_backbone": True,
                "dropout": False,
                "drop_prob": 0.0,              # determinism: no dropout
                "pretrained_weights": None,     # set by the harness
                "precision": "f32",
            },
            "vq": {
                "vq_type": "param",
                "num_codebooks": [num_codebook],
                "embed_dims": [embed_dim],
                "beta": 0.25,
                "book": 1.0,
                "normalize": "l2",
                "use_restart": False,
                "use_split": False,
                "use_weighted_sum": False,
                "use_gumbel": False,
                "need_initialized": "none",
                "pq_dropout": 0.0,
                "num_pq": [num_pq],
                "assign_precision": "exact",
            },
        },
        "loss": {
            "stego_weight": 1.0,
            "vq_weight": 1.0,
            "stego": {
                "neg_inter_weight": 0.63, "pos_inter_weight": 0.25,
                "pos_intra_weight": 0.67, "neg_inter_shift": 0.66,
                "pos_inter_shift": 0.02, "pos_intra_shift": 0.08,
                "zero_clamp": True, "pointwise": True, "stabilize": False,
                "feature_samples": feature_samples,
                "neg_samples": neg_samples,
            },
            "jsd": {"temperature": 1.0},
        },
        "optimizer": {
            "model": {"name": "adam", "lr": lr_model, "weight_decay": 0.0},
            "cluster": {"name": "adam", "lr": lr_probe},
            "linear": {"name": "adam", "lr": lr_probe},
        },
        "scheduler": {
            "model": {"name": "constant"},
            "cluster": {"name": "constant"},
            "linear": {"name": "constant"},
        },
        "eval": {"output_type": "vq0", "extra_classes": 0,
                 "probe_res": "label"},        # reference-exact probes
        "train": {"max_epochs": 1, "clip_grad": 10.0, "num_accum": 1,
                  "print_interval_iters": 1000,
                  "valid_interval_iters": 100000},
    }
    cfg["model"]["name"] = variant
    if variant == "sl":
        # supervised family (sl_train.py + SupervisedWrapper): total IS
        # the probe CE; the stego loss is computed but never added
        # (SupervisedWrapper.py:45), and the probe itself is never in an
        # optimizer (sl_train.py:412-416 builds ONLY the model opt) —
        # mirrored here with linear lr=0 so our always-stepped probe
        # receives zero updates
        cfg["model"]["pretrained"]["dim"] = embed_dim
        cfg["loss"].update(cfg["loss"]["stego"])
        cfg["loss"].pop("vq_weight", None)
        cfg["loss"].pop("stego_weight", None)
        cfg["eval"]["output_type"] = "feat"
        cfg["optimizer"]["linear"] = {"name": "adam", "lr": 0.0}
    elif variant == "stego":
        # head/code dim the reference wrapper sizes its evaluator with
        # (StegoWrapper.py:28-33)
        cfg["model"]["pretrained"]["dim"] = embed_dim
        # the reference's STEGO model reads the loss knobs directly off
        # cfg['loss'] (dino_stego.py:25 STEGOLoss(cfg['loss']), keys used
        # flat, loss.py:682-708); our side reads loss['stego'] — expose
        # the SAME values both ways
        cfg["loss"].update(cfg["loss"]["stego"])
        # no quantizer: a configured vq_weight without a vq-loss aux key
        # fails loudly in the Trainer (trainer.py:209-226)
        cfg["loss"].pop("vq_weight", None)
        # probes see the code map, not a quantized output
        # (StegoWrapper.py:50-53)
        cfg["eval"]["output_type"] = "feat"
    elif variant == "spq":
        # the VQ-trainer family (train_vq.py + NewVQWrapper + DINOSPQ):
        # jsd-only objective per spq_baseline.yaml:50-55; every other
        # weight present-but-zero because the wrapper reads them
        # unconditionally (NewVQWrapper.py:28-32)
        cfg["model"]["vq"]["use_kmeans_sampling"] = False
        cfg["loss"].pop("stego_weight", None)
        cfg["loss"].update({
            "recon_weight": 0.0, "vq_weight": 0.0, "info_nce_weight": 0.0,
            "jsd_weight": 1.0, "margin_weight": 0.0,
            "info_nce": {"normalize": "l2", "neg_sample": 2,
                         "temperature": 1.0, "cal_type": "cosine"},
            "jsd": {"temperature": 1.0, "entropy_weight": 0.0},
        })
    return cfg


def stego_samples(rng: np.random.RandomState, b: int, fs: int,
                  neg: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One step's STEGO draws with the reference's exact distributions
    (loss.py:708-727: uniform coords in [-1,1], derangement perms)."""
    c1 = (rng.rand(b, fs, fs, 2).astype(np.float32) * 2.0 - 1.0)
    c2 = (rng.rand(b, fs, fs, 2).astype(np.float32) * 2.0 - 1.0)
    perms = np.zeros((neg, b), np.int64)
    for i in range(neg):
        p = rng.permutation(b)
        p[p == np.arange(b)] += 1
        perms[i] = p % b
    return c1, c2, perms


# --------------------------------------------------------------------------
# torch (reference) twin
# --------------------------------------------------------------------------

class TorchTwin:
    """The reference model/wrapper driven by train.py's step recipe."""

    def __init__(self, cfg: Dict[str, Any], seed: int = 0,
                 variant: str = "pqgo"):
        import_reference()
        import torch

        import model.dino.vision_transformer as vits

        self.torch = torch
        self.variant = variant
        self.loss_keys = TWIN_LOSS_KEYS[variant]
        torch.manual_seed(seed)
        # random-init backbone saved to a local .pth: DinoFeaturizer
        # downloads from the internet when no path is given (no egress
        # here), so hand it a file (dino_featurizer.py:38-47)
        pre = cfg["model"]["pretrained"]
        bb = vits.__dict__[pre["model_type"]](
            patch_size=pre["dino_patch_size"], num_classes=0)
        fd, self._pth = tempfile.mkstemp(suffix=".pth")
        os.close(fd)
        torch.save({"teacher": bb.state_dict()}, self._pth)
        ref_model_cfg = dict(cfg["model"], pretrained=dict(
            pre, pretrained_weights=self._pth))
        if variant == "stego":
            from model.dino_stego import DINOStego
            from wrapper.StegoWrapper import StegoWrapper

            ref_cfg = dict(cfg, model=ref_model_cfg)
            self.model = DINOStego(ref_cfg)
            # DINOStego hardcodes Dropout2d(p=.1) (dino_stego.py:19)
            # with no config gate — disable it for determinism (our
            # side runs dropout=False)
            self.model.dropout = torch.nn.Identity()
            self.wrapper = StegoWrapper(ref_cfg, self.model)
        elif variant == "sl":
            from model.dino_stego import DINOStego
            from wrapper.SupervisedWrapper import SupervisedWrapper

            ref_cfg = dict(cfg, model=ref_model_cfg)
            self.model = DINOStego(ref_cfg)
            self.model.dropout = torch.nn.Identity()
            self.wrapper = SupervisedWrapper(ref_cfg, self.model)
            # SupervisedWrapper.forward unpacks FOUR values from
            # DINOStego, which returns three (SupervisedWrapper.py:40 vs
            # dino_stego.py:66) — the reference's sl path crashes as
            # shipped; pad the tuple so the oracle can run
            class _Returns4(torch.nn.Module):
                def __init__(self, m):
                    super().__init__()
                    self.m = m          # registered child: train()/eval()
                                        # mode propagates through

                def forward(self, *a, **k):
                    f, c, o = self.m(*a, **k)
                    return f, c, o, None

            self.wrapper.model = _Returns4(self.model)
        elif variant == "spq":
            from model.dino_spq import DINOSPQ
            from wrapper.NewVQWrapper import DINONewVQWrapper

            ref_cfg = dict(cfg, model=ref_model_cfg)
            self.model = DINOSPQ(ref_model_cfg, cfg["loss"])
            self.wrapper = DINONewVQWrapper(ref_cfg, self.model)
        else:
            from model.dino_pqgo import DIONPQGO
            from wrapper.PQGOWrapper import PQGOWrapper

            self.model = DIONPQGO(ref_model_cfg, cfg["loss"])
            self.wrapper = PQGOWrapper(cfg, self.model)
        # the checkpoint is consumed inside DinoFeaturizer's __init__;
        # drop the ~85 MB tempfile now so repeated twin constructions
        # (4 variant fixtures + the dump protocol per suite run) don't
        # accumulate in /tmp
        os.unlink(self._pth)
        self.clip = float(cfg["train"]["clip_grad"])

        opt = cfg["optimizer"]
        mk = lambda ps, c: torch.optim.Adam(  # noqa: E731
            ps, lr=c["lr"], weight_decay=c.get("weight_decay", 0.0))
        if variant == "sl":
            # sl_train.py:412-416: ONE optimizer, model params only —
            # the wrapper's linear probe is never stepped
            self.opts = [
                mk([p for p in self.model.parameters() if p.requires_grad],
                   opt["model"]),
            ]
        else:
            self.opts = [
                mk([p for p in self.model.parameters() if p.requires_grad],
                   opt["model"]),
                mk(self.wrapper.evaluator.cluster_probe.parameters(),
                   opt["cluster"]),
                mk(self.wrapper.evaluator.linear_probe.parameters(),
                   opt["linear"]),
            ]
        if variant != "spq":                  # spq has no STEGO loss
            self._install_stego_shim()

    # -- identical-draw injection ------------------------------------------
    def _install_stego_shim(self):
        """Replace the reference STEGOLoss's internal draws with the
        harness-injected samples, still computing through the
        reference's OWN sample()/helper() (model/loss.py:655-739)."""
        import torch
        from model.loss import sample as ref_sample

        # DINOStego names its loss module corr_loss (dino_stego.py:25);
        # DIONPQGO names it stego_loss (dino_pqgo.py:94)
        attr = ("corr_loss" if self.variant in ("stego", "sl")
                else "stego_loss")
        inner = getattr(self.model, attr)
        holder: Dict[str, Any] = {}
        self._stego_holder = holder

        class _Injected(torch.nn.Module):
            def forward(self, f, fp, c, cp):
                cfg = inner.cfg
                c1, c2, perms = holder["samples"]
                feats = ref_sample(f, c1)
                code = ref_sample(c, c1)
                feats_pos = ref_sample(fp, c2)
                code_pos = ref_sample(cp, c2)
                pos_intra, _ = inner.helper(
                    feats, feats, code, code, cfg["pos_intra_shift"])
                pos_inter, _ = inner.helper(
                    feats, feats_pos, code, code_pos, cfg["pos_inter_shift"])
                negs = []
                for i in range(cfg["neg_samples"]):
                    perm = perms[i]
                    negs.append(inner.helper(
                        feats, ref_sample(f[perm], c2),
                        code, ref_sample(c[perm], c2),
                        cfg["neg_inter_shift"])[0])
                neg_inter = torch.cat(negs, dim=0)
                return (cfg["pos_intra_weight"] * pos_intra.mean()
                        + cfg["pos_inter_weight"] * pos_inter.mean()
                        + cfg["neg_inter_weight"] * neg_inter.mean())

        setattr(self.model, attr, _Injected())

    # -- helpers ------------------------------------------------------------
    def to_torch_img(self, img_nhwc_norm: np.ndarray):
        return self.torch.from_numpy(
            np.ascontiguousarray(img_nhwc_norm.transpose(0, 3, 1, 2)))

    def step(self, img, img_pos, label,
             samples: Optional[Tuple[np.ndarray, ...]] = None,
             aug_img: Optional[np.ndarray] = None,
             it: int = 0) -> Dict[str, float]:
        """One train step (train.py:74-100 / train_vq.py:63-105:
        zero_grad, wrapper forward, backward, clip on model params,
        three Adam steps).  img and the second view (img_pos for the
        STEGO families, aug_img for spq) are normalized NHWC numpy;
        label int numpy."""
        torch = self.torch
        self.wrapper.train()
        if samples is not None:
            self._stego_holder["samples"] = (
                torch.from_numpy(samples[0]),
                torch.from_numpy(samples[1]),
                torch.from_numpy(samples[2]),
            )
        img_t = self.to_torch_img(img)
        label_t = torch.from_numpy(label).long()
        for o in self.opts:
            o.zero_grad(set_to_none=True)
        if self.variant == "spq":
            total, output, _ = self.wrapper(
                img=img_t, aug_img=self.to_torch_img(aug_img),
                label=label_t, it=it)
        elif self.variant == "sl":
            total, output, _ = self.wrapper(
                img=img_t, aug_img=img_t, label=label_t,
                img_pos=self.to_torch_img(img_pos))
            # the CE the wrapper calls ce-loss is our linear-loss
            output["linear-loss"] = output["ce-loss"]
        else:
            total, output, _, _ = self.wrapper(
                img=img_t, aug_img=img_t, label=label_t,
                img_pos=self.to_torch_img(img_pos))
        total.backward()
        torch.nn.utils.clip_grad_norm_(
            [p for p in self.model.parameters() if p.requires_grad],
            max_norm=self.clip)
        for o in self.opts:
            o.step()
        out = {"loss": float(total.detach())}
        for k in self.loss_keys:
            if k != "loss":
                out[k] = float(output[k].detach())
        return out

    def validate(self, val_batches, num_classes: int,
                 extra_classes: int = 0) -> Dict[str, float]:
        """Reference-side eval: wrapper forward (eval mode) + the
        reference's OWN UnSegMetrics (model/metric.py)."""
        import torch
        from model.metric import UnSegMetrics

        dev = torch.device("cpu")
        cluster_m = UnSegMetrics(num_classes, extra_classes, True, dev)
        linear_m = UnSegMetrics(num_classes, 0, False, dev)
        cluster_m.reset()
        linear_m.reset()
        self.wrapper.eval()
        with torch.no_grad():
            for batch in val_batches:
                img_t = self.to_torch_img(batch["img_norm"])
                label_t = torch.from_numpy(batch["label"]).long()
                if self.variant == "spq":
                    # eval through cat(img, img): DINOSPQ.forward always
                    # splits back to the first half (dino_spq.py:96-98)
                    _, _, (linear_preds, cluster_preds) = self.wrapper(
                        img=img_t, aug_img=img_t, label=label_t, it=0)
                elif self.variant == "sl":
                    # supervised eval is linear-only (sl_train.py:330-331)
                    _, _, linear_preds = self.wrapper(
                        img=img_t, aug_img=img_t, label=label_t)
                    cluster_preds = None
                else:
                    _, _, (linear_preds, cluster_preds), _ = self.wrapper(
                        img=img_t, aug_img=img_t, label=label_t)
                if cluster_preds is not None:
                    cluster_m.update(cluster_preds, label_t)
                linear_m.update(linear_preds, label_t)
        # compute() mkdirs ./class_matrix under cwd (metric.py:99) — run
        # it from a temp dir so the side effect stays out of the repo
        old = os.getcwd()
        with tempfile.TemporaryDirectory() as td:
            try:
                os.chdir(td)
                c = (None if self.variant == "sl"
                     else cluster_m.compute(prefix="twin"))
                li = linear_m.compute(prefix="twin")
            finally:
                os.chdir(old)
        res = {
            "Linear_mIoU": float(li["iou"]),
            "Linear_Accuracy": float(li["accuracy"]),
        }
        if c is not None:
            res["Cluster_mIoU"] = float(c["iou"])
            res["Cluster_Accuracy"] = float(c["accuracy"])
        return res

    def backbone_state_dict(self):
        return self.model.extractor.backbone.state_dict()


# --------------------------------------------------------------------------
# weight transplant torch -> jax
# --------------------------------------------------------------------------

def transplant_weights(torch_twin: TorchTwin, trainer, ts) -> Dict[str, Any]:
    """Copy every trainable tensor of the torch twin into this
    framework's train state: backbone (converter), expansion head
    (cluster1/cluster2, dino_pqgo.py:104-112), PQ codebooks, linear +
    cluster probes (evaluator.py:22-24)."""
    from equss_tpu.models.vit import convert_dino_torch_state
    from equss_tpu.parallel.mesh import replicate

    def arr(t):
        return jnp.asarray(t.detach().cpu().numpy())

    def conv1x1_to_dense(conv):
        w = conv.weight.detach().cpu().numpy()       # (out, in, 1, 1)
        return {"kernel": jnp.asarray(w[:, :, 0, 0].T),
                "bias": arr(conv.bias)}

    m = torch_twin.model
    backbone = convert_dino_torch_state(
        torch_twin.backbone_state_dict(), trainer.model.vit_cfg)
    new_params = dict(ts["params"], backbone=backbone)
    if hasattr(m, "cluster1"):
        # both DIONPQGO (dino_pqgo.py:104-112) and DINOStego
        # (dino_stego.py:22-43) expose the identical two-branch head
        new_params["head"] = {
            "cluster1": conv1x1_to_dense(m.cluster1[0]),
            "cluster2_fc1": conv1x1_to_dense(m.cluster2[0]),
            "cluster2_fc2": conv1x1_to_dense(m.cluster2[2]),
        }
    if hasattr(m, "enc_proj"):
        # spq: 1x1-conv encoder + single (K, M*d) codebook parameter
        # (dino_spq.py:30, :148-150)
        new_params["enc"] = conv1x1_to_dense(m.enc_proj)
        new_params["codebook"] = arr(m.vq_blocks[0].C)
    elif hasattr(m, "vq_blocks") and "pq" in ts["params"]:
        vq0 = m.vq_blocks[0]
        if hasattr(vq0, "quantizers"):
            codebook = jnp.stack([arr(q.embedding.weight)
                                  for q in vq0.quantizers])
        else:
            codebook = arr(vq0.embedding.weight)[None]
        new_params["pq"] = dict(ts["params"]["pq"], codebook=codebook)
    if hasattr(torch_twin.wrapper, "evaluator"):
        ev = torch_twin.wrapper.evaluator
        probes = {
            "linear_probe": {"linear": conv1x1_to_dense(ev.linear_probe)},
            "cluster_probe": {"clusters": arr(ev.cluster_probe.clusters)},
        }
    else:
        # SupervisedWrapper carries a bare LinearProbe, no cluster probe
        # (SupervisedWrapper.py:29, :50-58)
        probes = {"linear_probe": {"linear": conv1x1_to_dense(
            torch_twin.wrapper.linear_probe.linear_probe)}}
    new_ts = dict(ts, params=new_params, probe_params=probes)
    return replicate(trainer.mesh, new_ts)


# --------------------------------------------------------------------------
# corpus
# --------------------------------------------------------------------------

def make_corpus(seed: int, n_train: int, n_val: int, batch_size: int,
                res: int, num_classes: int) -> Tuple[List[Dict], List[Dict]]:
    """Miniature corpus: both sides receive the SAME normalized float
    images (the in-graph normalize is the identity transform applied on
    the host for torch)."""
    from equss_tpu.data.synthetic import synthetic_batches
    from equss_tpu.data.transforms import normalize_images

    def prep(batches, with_pos):
        out = []
        for b in batches:
            # jax side gets the RAW image (the Trainer normalizes
            # in-graph); torch gets the SAME normalize applied on the
            # host — both models see bit-identical pixels
            item = {
                "label": b["label"],
                "img": b["img"],
                "img_norm": np.asarray(normalize_images(jnp.asarray(b["img"]))),
            }
            if with_pos:
                item["img_pos"] = b["img_pos"]
                item["img_pos_norm"] = np.asarray(
                    normalize_images(jnp.asarray(b["img_pos"])))
                item["aug_img"] = b["aug_img"]
                item["aug_img_norm"] = np.asarray(
                    normalize_images(jnp.asarray(b["aug_img"])))
            out.append(item)
        return out

    train = prep(synthetic_batches(seed, n_train, batch_size, res=res,
                                   num_classes=num_classes), True)
    val = prep(synthetic_batches(seed + 1000, n_val, batch_size, res=res,
                                 num_classes=num_classes,
                                 with_pos=False), False)
    return train, val


# --------------------------------------------------------------------------
# the twin run
# --------------------------------------------------------------------------

def run_twin_training(
    n_steps: int = 30,
    batch_size: int = 4,
    res: int = 64,
    seed: int = 0,
    variant: str = "pqgo",
    cfg_overrides: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Train both twins from identical weights on an identical corpus.

    Returns {'steps': [per-step {jax: {...}, ref: {...}}],
             'final': {'jax': metrics, 'ref': metrics},
             'loss_keys': the per-variant keys compared}.
    """
    from equss_tpu.parallel.mesh import make_mesh
    from equss_tpu.train.trainer import Trainer

    cfg = make_twin_config(variant=variant, **(cfg_overrides or {}))
    stego = cfg["loss"]["stego"]
    fs, neg = stego["feature_samples"], stego["neg_samples"]
    nc = cfg["num_classes"]

    ref = TorchTwin(cfg, seed=seed, variant=variant)
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state(jax.random.PRNGKey(seed), img_hw=(res, res))
    ts = transplant_weights(ref, trainer, ts)

    n_batches = max(n_steps, 1)
    train, val = make_corpus(seed, n_batches, 2, batch_size, res, nc)

    draw_rng = np.random.RandomState(seed + 7)
    steps = []
    for i in range(n_steps):
        batch = train[i % len(train)]
        if variant == "spq":
            # the one stochastic input is the photometric second view —
            # precomputed on the host and fed identically to both sides
            # (our Trainer skips in-graph aug when aug_img is supplied)
            jb = {"img": batch["img"], "aug_img": batch["aug_img"],
                  "label": batch["label"]}
            ts, metrics = trainer.train_step(ts, jb)
            rm = ref.step(batch["img_norm"], None, batch["label"],
                          aug_img=batch["aug_img_norm"], it=i)
        else:
            c1, c2, perms = stego_samples(draw_rng, batch_size, fs, neg)
            jb = {
                "img": batch["img"], "img_pos": batch["img_pos"],
                "label": batch["label"],
                "stego_coords1": c1, "stego_coords2": c2,
                "stego_perms": perms.astype(np.int32),
            }
            ts, metrics = trainer.train_step(ts, jb)
            rm = ref.step(batch["img_norm"], batch["img_pos_norm"],
                          batch["label"], (c1, c2, perms))
        jm = {k: float(metrics[k]) for k in TWIN_LOSS_KEYS[variant]}
        steps.append({"jax": jm, "ref": rm})

    jax_final = trainer.validate(ts, iter(val))
    ref_final = ref.validate(val, nc)
    return {"steps": steps, "final": {"jax": jax_final, "ref": ref_final},
            "loss_keys": list(TWIN_LOSS_KEYS[variant])}


def run_dump_protocol(
    *,
    model_type: str = "vit_small",
    patch_size: int = 8,
    embed_dim: int = 1024,
    num_pq: int = 64,
    num_codebook: int = 256,
    res: int = 224,
    batch: int = 2,
    seed: int = 0,
) -> Dict[str, Any]:
    """BASELINE.md per-pixel codeword-index dump protocol at the full
    flagship shape: identical weights + identical input -> both models'
    end-to-end forward (backbone -> head -> PQ assignment); returns the
    two index dumps and prediction agreement stats."""
    from equss_tpu.parallel.mesh import make_mesh
    from equss_tpu.train.trainer import Trainer

    cfg = make_twin_config(model_type=model_type, patch_size=patch_size,
                           embed_dim=embed_dim, num_pq=num_pq,
                           num_codebook=num_codebook)
    ref = TorchTwin(cfg, seed=seed)
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state(jax.random.PRNGKey(seed), img_hw=(res, res))
    ts = transplant_weights(ref, trainer, ts)

    rng = np.random.RandomState(seed + 3)
    img = rng.rand(batch, res, res, 3).astype(np.float32)
    from equss_tpu.data.transforms import normalize_images

    img_n = np.asarray(normalize_images(jnp.asarray(img)))

    # jax side: model forward, per-pixel indices (b, h, w, M)
    out, _ = trainer.model.apply(
        jax.device_get(ts["params"]), jax.device_get(ts["model_state"]),
        jnp.asarray(img_n), training=False)
    idx_jax = np.asarray(out["indices"])                  # (b, h, w, M)

    # torch side: DIONPQGO forward returns z_quantized_index stacked
    # (num_pq, b, h, w) (dino_pqgo.py:150-154)
    torch = ref.torch
    ref.wrapper.eval()
    with torch.no_grad():
        _, _, (_, _, idx_t), _ = ref.model(
            img=ref.to_torch_img(img_n))
    idx_ref = idx_t.cpu().numpy()                          # (M, b, h, w)
    idx_ref_nhwm = np.transpose(idx_ref, (1, 2, 3, 0))

    agree = float(np.mean(idx_jax == idx_ref_nhwm))
    return {"idx_jax": idx_jax, "idx_ref": idx_ref_nhwm, "agreement": agree}
