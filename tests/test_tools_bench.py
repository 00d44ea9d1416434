"""Smoke coverage for the perf tools (tools/bench_train_step.py,
tools/bench_serving.py): the PERF.md / README numbers are produced by
these scripts, so a bit-rotted tool would silently orphan the records
(the same failure mode VERDICT r4 flagged for unwired harnesses).

Tiny shapes on the CPU backend — these check the tools run and emit
their result dicts, not performance.
"""
import os
import runpy
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")

extended = pytest.mark.skipif(
    os.environ.get("EQUSS_SUITE_FULL", "") != "1",
    reason="extended tool smoke (two flagship-config exports); "
           "set EQUSS_SUITE_FULL=1",
)


def _run_tool(script, argv, capsys):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(TOOLS, script), run_name="__main__")
    finally:
        sys.argv = old
    return capsys.readouterr().out


def test_bench_train_step_smoke(capsys):
    out = _run_tool("bench_train_step.py",
                    ["--batch", "2", "--res", "32",
                     "--windows", "1", "--iters", "2",
                     # the CPU backend has no bf16 dot kernels — pin the
                     # flagship fast preset's bf16 knobs back to f32
                     "--override", "model.pretrained.precision=f32",
                     "--override", "model.vq.assign_precision=exact",
                     "--override",
                     "loss.stego.correlation_precision=f32"], capsys)
    assert "ms_per_step_best" in out and "img_per_sec_best" in out
    assert "'ln_stats': 'f32'" in out


@extended
def test_bench_serving_smoke(capsys):
    out = _run_tool("bench_serving.py",
                    ["--batch", "2", "--res", "32"], capsys)
    assert "symbolic_batch=auto" in out
    assert "symbolic_batch=off" in out
    assert "img_per_sec" in out
