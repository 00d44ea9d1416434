"""Twin-training parity report generator.

Runs the full twin-training comparison (equss_tpu.parity.twin) on CPU —
both frameworks, identical weights/corpus/draws — and writes PARITY.md
at the repo root with per-step loss trajectories, final mIoU from each
framework's own metric stack, the module-seam twin table for the six
families without trainer twins (hihi/vae/res/contra/cluster/ema), and
the BASELINE.md full-shape codeword dump protocol.  Covers the flagship
pqgo model and the STEGO baseline family (--variants).

Refuses to write the record from a dirty working tree (the stamp records
the git SHA); pass --allow-dirty to override during development.

Usage:
    python -m equss_tpu.parity.run [--steps 300] [--skip-dump]
                                   [--skip-module-twins]
                                   [--variants pqgo stego]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

# Files whose behavior the PARITY.md record depends on.  The generator
# stamps a content hash of these into the report; a default-suite test
# (tests/test_twin_parity.py) recomputes it and fails when the record
# has drifted from the code — the VERDICT r3 weak-#5 freshness guard.
PARITY_DEPENDENCIES = [
    "equss_tpu/parity/twin.py",
    "equss_tpu/parity/module_twin.py",
    "equss_tpu/parity/run.py",
    "configs/pqgo_cocostuff27_parity.yaml",
    "equss_tpu/models/variants.py",
    "equss_tpu/train/trainer.py",
    "equss_tpu/train/optim.py",
    "equss_tpu/ops/quantizer.py",
    "equss_tpu/models/equss.py",
    "equss_tpu/models/stego.py",
    "equss_tpu/models/heads.py",
    "equss_tpu/models/vit.py",
    "equss_tpu/losses/basic.py",
    "equss_tpu/losses/stego.py",
    "equss_tpu/losses/sinkhorn.py",
    "equss_tpu/eval/probes.py",
    "equss_tpu/eval/metrics.py",
    "equss_tpu/parity/crf_compare.py",
    "equss_tpu/ops/crf.py",
    "equss_tpu/ops/crf_native.py",
]


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def parity_fingerprint() -> str:
    """Content hash over PARITY_DEPENDENCIES (order-stable, hex)."""
    h = hashlib.sha256()
    root = repo_root()
    for rel in PARITY_DEPENDENCIES:
        with open(os.path.join(root, rel), "rb") as f:
            h.update(rel.encode())
            h.update(f.read())
    return h.hexdigest()[:16]


def _dirty_tracked_files() -> list:
    """Tracked files with uncommitted changes, excluding the report itself
    and the driver's PROGRESS.jsonl log — if any code/config is dirty the
    stamp's git SHA would lie about what produced the record."""
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain"], cwd=repo_root(),
            capture_output=True, text=True, timeout=10).stdout
    except Exception:
        return []
    dirty = []
    for line in out.splitlines():
        status, path = line[:2], line[3:].strip()
        if status.strip().startswith("?"):
            continue                      # untracked: not in the SHA anyway
        if path in ("PARITY.md", "PROGRESS.jsonl"):
            continue
        dirty.append(path)
    return dirty


def _git_sha() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=repo_root(),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _variant_section(variant: str, res, n_steps: int, twin_s: float):
    """Markdown lines for one variant's twin run."""
    steps = res["steps"]
    keys = res["loss_keys"]

    def rel(a, b):
        return abs(a - b) / (abs(b) + 1e-8)

    lines = []
    lines.append(f"## {variant}: per-step loss trajectories "
                 f"({n_steps} steps, {twin_s:.0f}s)\n")
    lines.append("| step | " + " | ".join(
        f"{k} (jax / ref / rel)" for k in keys) + " |")
    lines.append("|---|" + "---|" * len(keys))
    show = sorted(set(
        list(range(min(5, len(steps))))
        + [len(steps) // 4, len(steps) // 2, 3 * len(steps) // 4,
           len(steps) - 1]))
    for i in show:
        s = steps[i]
        cells = []
        for k in keys:
            a, b = s["jax"][k], s["ref"][k]
            cells.append(f"{a:.5f} / {b:.5f} / {rel(a, b):.1e}")
        lines.append(f"| {i} | " + " | ".join(cells) + " |")

    worst = {k: max(rel(s["jax"][k], s["ref"][k]) for s in steps)
             for k in keys}
    worst_abs = {k: max(abs(s["jax"][k] - s["ref"][k]) for s in steps)
                 for k in keys}
    lines.append("")
    lines.append("Worst relative deviation over all steps: "
                 + ", ".join(f"{k}={v:.2e}" for k, v in worst.items()) + "\n")
    lines.append("Worst absolute deviation over all steps: "
                 + ", ".join(f"{k}={v:.2e}" for k, v in worst_abs.items())
                 + "\n")
    lines.append(
        "(A total-loss relative worst at a zero crossing is a vanishing "
        "denominator, not divergence; the absolute deviations bound the "
        "true drift, which is f32 round-off amplified by chaotic steps "
        "and collapses back to matching final metrics below.)\n")

    lines.append(f"## {variant}: final metrics "
                 "(each framework's own eval stack)\n")
    lines.append("| metric | equss_tpu | reference | abs diff |")
    lines.append("|---|---|---|---|")
    for k in ("Cluster_mIoU", "Cluster_Accuracy", "Linear_mIoU",
              "Linear_Accuracy"):
        if k not in res["final"]["ref"]:      # sl is linear-only
            continue
        a = res["final"]["jax"][k]
        b = res["final"]["ref"][k]
        lines.append(f"| {k} | {a:.3f} | {b:.3f} | {abs(a - b):.3f} |")
    lines.append("")
    return lines, worst


def main(argv=None):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--skip-dump", action="store_true")
    p.add_argument("--skip-module-twins", action="store_true")
    p.add_argument("--skip-crf", action="store_true",
                   help="skip the exact-vs-lattice CRF comparison section")
    p.add_argument("--variants", nargs="+",
                   default=["pqgo", "stego", "spq", "sl"],
                   choices=["pqgo", "stego", "spq", "sl"])
    p.add_argument("--out", default="PARITY.md")
    p.add_argument("--allow-dirty", action="store_true",
                   help="write the report even with uncommitted changes "
                        "(the stamp's SHA will not match the sources)")
    args = p.parse_args(argv)

    dirty = _dirty_tracked_files()
    if dirty and not args.allow_dirty:
        print("REFUSING to write the parity record: uncommitted changes in "
              + ", ".join(dirty[:10])
              + (" ..." if len(dirty) > 10 else "")
              + "\nCommit first (the stamp records the git SHA), or pass "
                "--allow-dirty.", file=sys.stderr)
        return 2

    from equss_tpu.parity.twin import run_dump_protocol, run_twin_training

    lines = []
    lines.append("# PARITY — twin-training accuracy parity vs the torch "
                 "reference\n")
    # placeholder — replaced at WRITE time below, so the stamp reflects
    # the dependency sources as of when the record is persisted, not
    # when the (hours-long) run started
    lines.append("<!-- parity-stamp -->\n")
    lines.append(
        f"Generated by `python -m equss_tpu.parity.run --steps {args.steps} "
        f"--variants {' '.join(args.variants)}` (CPU, f32, both "
        f"frameworks).\n")
    lines.append(
        "Protocol: identical random-init weights (torch init transplanted "
        "into this framework via the checkpoint converter), identical "
        "miniature corpus, dropout/aug off, identical injected STEGO "
        "sample coordinates; the reference twin runs the actual "
        "/root/reference model/wrapper/optimizers with train.py's step "
        "recipe; this framework's twin runs `Trainer.train_step` "
        "unmodified.  Variants cover every reference trainer entry "
        "point: pqgo (flagship, train.py), stego (STEGO baseline "
        "family), spq (train_vq.py soft-PQ family; identical "
        "host-precomputed aug view fed to both sides) and sl "
        "(sl_train.py supervised family).  See equss_tpu/parity/"
        "twin.py.\n")

    summary = {"steps": args.steps, "variants": {}}
    for variant in args.variants:
        t0 = time.time()
        res = run_twin_training(n_steps=args.steps,
                                batch_size=args.batch_size,
                                res=args.res, variant=variant)
        twin_s = time.time() - t0
        sec, worst = _variant_section(variant, res, args.steps, twin_s)
        lines.extend(sec)
        summary["variants"][variant] = {
            "worst_rel": worst, "final": res["final"]}

    if not args.skip_module_twins:
        from equss_tpu.parity.module_twin import (
            FAMILIES, run_module_twin, verify_ema_enqueue)

        t0 = time.time()
        lines.append("## Module-seam twins: the six families without "
                     "trainer twins\n")
        lines.append(
            "One training-mode forward through the torch reference module "
            "(driven at the module seam, wrapper loss assembly mirrored) "
            "vs this framework's model, identical transplanted weights and "
            "inputs (equss_tpu/parity/module_twin.py; enforced in the "
            "suite by tests/test_module_twin.py at rel<1e-3 / "
            "out-diff<1e-4).\n")
        lines.append("| family | loss rows (ref / jax / rel) | "
                     "forward-output max-abs diffs | pass |")
        lines.append("|---|---|---|---|")
        mt_summary = {}
        mt_all_pass = True
        for family in FAMILIES:
            r = run_module_twin(family, seed=0)
            loss_cells = "<br>".join(
                f"{k}: {v['ref']:.6g} / {v['jax']:.6g} / {v['rel']:.1e}"
                for k, v in r["rows"].items())
            out_cells = "<br>".join(
                f"{k}: {v:.1e}" for k, v in r["out_diff"].items())
            ok = (all(v["rel"] < 1e-3 for v in r["rows"].values())
                  and all(v < 1e-4 for v in r["out_diff"].values()))
            mt_all_pass &= ok
            lines.append(f"| {family} | {loss_cells} | {out_cells} | "
                         f"{'PASS' if ok else 'FAIL'} |")
            mt_summary[family] = {
                "worst_loss_rel": max(v["rel"] for v in r["rows"].values()),
                "worst_out_diff": max(r["out_diff"].values()),
                "pass": ok}
        enq = verify_ema_enqueue()
        lines.append(
            f"| ema-enqueue | queue-set semantics (margin gate open) | "
            f"per-cluster match: {enq['matches']} | "
            f"{'PASS' if enq['all_match'] else 'FAIL'} |")
        mt_all_pass &= enq["all_match"]
        lines.append(f"\n({time.time() - t0:.0f}s; all families "
                     f"{'PASS' if mt_all_pass else 'CONTAIN FAILURES'}.)\n")
        summary["module_twins"] = mt_summary
        if not mt_all_pass:
            print("module twins FAILED thresholds", file=sys.stderr)

    if not args.skip_crf:
        from equss_tpu.parity.crf_compare import run_crf_compare

        t0 = time.time()
        crf = run_crf_compare()
        lines.append("## CRF refinement: exact MXU mean field vs native "
                     "lattice (the pydensecrf story)\n")
        lines.append(
            "The reference's final eval refines probe log-probs through "
            "pydensecrf (utils/crf_utils.py:62-71), whose bilateral "
            "message pass is itself an APPROXIMATION (Krähenbühl "
            "permutohedral lattice).  pydensecrf cannot be installed "
            "here (zero egress), so bitwise parity against it is "
            "unknowable in this environment; what IS checkable is the "
            "mean-field objective both implement.  `ops/crf.py` computes "
            "that objective EXACTLY (dense blocked kernel on the MXU, no "
            "lattice approximation) — the ground truth of the shared "
            "objective — while `native/permutohedral.cpp` mirrors "
            "pydensecrf's approximation structure (lattice "
            "splat/blur/slice).  Their agreement below bounds the "
            "metric-level effect of lattice approximation: the same "
            "order as pydensecrf's own deviation from the exact mean "
            "field.  Protocol: train the flagship twin config "
            f"({crf['n_imgs']} val images @ {crf['res']}², "
            "equss_tpu/parity/crf_compare.py), compute each val batch's "
            "probe log-probs ONCE, refine the SAME log-probs through "
            "both stacks, score all three with the same metric stack.\n")
        lines.append("| probe metric | no CRF | exact MXU CRF | "
                     "native lattice CRF |")
        lines.append("|---|---|---|---|")
        m = crf["metrics"]
        for k in ("Cluster_mIoU", "Cluster_Accuracy", "Linear_mIoU",
                  "Linear_Accuracy"):
            lines.append(f"| {k} | {m['none'][k]:.3f} | "
                         f"{m['exact'][k]:.3f} | {m['lattice'][k]:.3f} |")
        ag = crf["agreement"]
        lines.append(
            f"\nPer-pixel refined-argmax agreement exact-vs-lattice: "
            f"cluster {100 * ag['cluster']:.1f}%, linear "
            f"{100 * ag['linear']:.1f}%.  (CPU harness wall-clock, not a "
            f"perf number: exact {crf['ms_per_img']['exact']:.0f} "
            f"ms/img, lattice {crf['ms_per_img']['lattice']:.0f} ms/img "
            f"at {crf['res']}²; the TPU-measured 320² exact-CRF cost is "
            f"the README table's 281 ms/img row.  "
            f"{time.time() - t0:.0f}s.)\n")
        summary["crf"] = {"metrics": m, "agreement": ag}

    dump = None
    if not args.skip_dump and "pqgo" in args.variants:
        t0 = time.time()
        dump = run_dump_protocol()
        dump_s = time.time() - t0
        lines.append("## Codeword dump protocol (BASELINE.md, full shape)\n")
        lines.append(
            f"vit_small/8 @224, dim=1024, M=64, K=256, b=2: per-pixel "
            f"codeword-index agreement **{100 * dump['agreement']:.3f}%** "
            f"({dump['idx_jax'].size} indices compared; {dump_s:.0f}s).\n")
        summary["dump_agreement"] = dump["agreement"]

    lines[1] = (f"<!-- parity-stamp: sha={_git_sha()} "
                f"deps={parity_fingerprint()} -->\n")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    summary["out"] = args.out
    print(json.dumps(summary))


if __name__ == "__main__":
    sys.exit(main())
