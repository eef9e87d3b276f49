"""bench.py --check: the regression envelope gate (VERDICT r3 #7).

Pure-logic tests — no TPU, no model build. The envelope itself is
measured hardware truth (STATUS.md); these pin the gate semantics:
inside passes, below fails (regression), above fails (trap-#6b-style
phantom speedup), unknown config reports 'nothing to regress against'.
"""

import os
import sys

import conftest  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import ENVELOPES, SPREAD, check_envelope  # noqa: E402

M = "yolov8n_640_int8_e2e"


def test_inside_envelope_passes():
    lo, hi = ENVELOPES[M]
    assert check_envelope(M, (lo + hi) / 2) == 0
    # the 2-spread guard band is part of the pass region
    assert check_envelope(M, lo * (1 - 1.9 * SPREAD)) == 0
    assert check_envelope(M, hi * (1 + 1.9 * SPREAD)) == 0


def test_regression_fails():
    lo, _ = ENVELOPES[M]
    assert check_envelope(M, lo * (1 - 2.1 * SPREAD)) == 1


def test_phantom_speedup_fails():
    _, hi = ENVELOPES[M]
    assert check_envelope(M, hi * (1 + 2.1 * SPREAD)) == 1


def test_unknown_metric_reports_no_envelope():
    assert check_envelope("yolov8n_999_int8_e2e", 1234.0) == 2


def test_bench_main_traces_default_and_coalesced(capsys):
    """The official harness (tuple-input loop after the --coalesce
    refactor) must trace and emit valid JSON on both paths at toy size.
    Guards the driver's plain `python bench.py` contract."""
    import json

    import bench as bench_mod

    bench_mod.main(image_size=64, batch=4, iters=2)
    bench_mod.main(image_size=64, batch=2, iters=2, coalesce=2)
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert len(lines) == 2
    d0, d1 = (json.loads(ln) for ln in lines)
    assert d0["metric"] == "yolov8n_64_int8_e2e" and d0["value"] > 0
    assert d1["metric"] == "yolov8n_64_int8_e2e_co2x2" and d1["value"] > 0


def test_envelopes_cover_the_recorded_k_sweep():
    # the per-K expected ranges the verdict asked to record
    for m in ("yolov8n_640_int8_e2e", "yolov8n_640_int6_e2e",
              "yolov8n_640_int4_e2e", "yolov8s_640_int8_e2e",
              "yolov8n_320_int8_e2e"):
        assert m in ENVELOPES
        lo, hi = ENVELOPES[m]
        assert 0 < lo <= hi


def test_bench_main_dp_on_virtual_mesh(capsys):
    """bench --dp (VERDICT r4 #3): the multi-chip slope-timed protocol
    traces and emits valid JSON on the 8-device virtual mesh. dp>1
    appends _dp{N} and normalizes vs_baseline PER CHIP; dp=1 keeps the
    base metric name so --check gates it against the single-chip
    envelope (N=1 equivalence)."""
    import json

    import bench as bench_mod

    bench_mod.main(image_size=64, batch=8, iters=2, dp=8)
    bench_mod.main(image_size=64, batch=4, iters=2, dp=1)
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert len(lines) == 2
    d8, d1 = (json.loads(ln) for ln in lines)
    assert d8["metric"] == "yolov8n_64_int8_e2e_dp8" and d8["value"] > 0
    assert d8["vs_baseline"] == round(d8["value"] / 8 / 2000.0, 4)
    assert d1["metric"] == "yolov8n_64_int8_e2e" and d1["value"] > 0


def test_bench_dp_rejects_bad_combos():
    import pytest

    import bench as bench_mod

    with pytest.raises(SystemExit):
        bench_mod.main(image_size=64, batch=6, iters=2, dp=4)  # 4 !| 6
    with pytest.raises(SystemExit):
        bench_mod.main(image_size=64, batch=8, iters=2, dp=2, coalesce=2)
