"""Stage-4/5 calibration-artifact byte gates: the reference's stage_5
reduction executed from the mount over synthetic per-image statistics vs
``utils.io`` + ``quantize.calibrate`` (VERDICT r4 #1).

Covers all six MAX_ACTIVATIONS_MODEs: the five n_max modes end-to-end
through the stage_5 leaf (byte-equal max_a.txt), and min_mae through the
leaf's search (best_koeff parity + the documented KeyError from its
best_koeff path bug) plus the healed intent tail run through the mount's
own create_std_koef/n_update_std (byte-equal max_a.txt). Also pins the
stage-4 handoff quirk: max_a_all.txt entries are torch scalar reprs
rounded to 4 decimals, which both sides parse identically.
"""

import os

import numpy as np
import pytest

import conftest  # noqa: F401
import reference_stage5 as r5

from alpha_yolo_quant_tpu.quantize.calibrate import (
    min_mae_search, reduce_stats,
)
from alpha_yolo_quant_tpu.utils.io import read_max_a_all, write_max_a

ref_exists = pytest.mark.skipif(not conftest.reference_available(),
                                reason="reference tree not mounted")

N_MAX_MODES = ["max", "mode", "median", "std", "n=1"]


def _fixture_tree(tmp_path, records, k=8):
    main = os.path.join(str(tmp_path), f"{k}_nano")
    os.makedirs(os.path.join(main, "results"), exist_ok=True)
    r5.write_ref_max_a_all(
        os.path.join(main, "results", "max_a_all.txt"), records)
    return main


@ref_exists
@pytest.mark.parametrize("mode", N_MAX_MODES)
def test_stage5_nmax_byte_parity(tmp_path, mode):
    """reference stage_5 (mount) and reduce_stats+write_max_a produce
    byte-identical max_a.txt from the same stage-4-format dump."""
    records = r5.synth_records(seed=11)
    main = _fixture_tree(tmp_path, records)
    err = r5.run_stage5(str(tmp_path), mode)
    assert err is None, f"reference stage_5({mode}) raised: {err!r}"
    ref_bytes = open(os.path.join(main, "results", "max_a.txt"),
                     "rb").read()

    parsed = read_max_a_all(os.path.join(main, "results", "max_a_all.txt"))
    ours = os.path.join(str(tmp_path), "ours_max_a.txt")
    write_max_a(ours, reduce_stats(parsed, mode))
    assert open(ours, "rb").read() == ref_bytes


def test_mode_tiebreak_first_appearance():
    """pandas value_counts().index[0] semantics: among top-count ties the
    FIRST-APPEARING value wins, not the smallest (stage-5 byte gate
    found np.unique+argmax diverging here)."""
    got = reduce_stats({"t": [0.7, 0.3, 0.3, 0.7, 0.1]}, "mode")
    assert got["t"] == 0.7
    got = reduce_stats({"t": [0.3, 0.7, 0.7, 0.3, 0.1]}, "mode")
    assert got["t"] == 0.3


def test_parser_reads_reference_and_plain_formats(tmp_path):
    """read_max_a_all parses the reference's cuda-tensor-repr dump and
    our plain float lists to identical values, 4-decimal torch rounding
    included."""
    records = r5.synth_records(seed=3, n_images=7)
    p_cuda = str(tmp_path / "cuda.txt")
    p_cpu = str(tmp_path / "cpu.txt")
    r5.write_ref_max_a_all(p_cuda, records, cuda=True)
    r5.write_ref_max_a_all(p_cpu, records, cuda=False)
    a, b = read_max_a_all(p_cuda), read_max_a_all(p_cpu)
    assert a == b and list(a) == list(records)
    # entries are the ROUNDED reprs, not the raw f32 values
    raw = float(records["conv_p1"][0])
    assert a["conv_p1"][0] == float(repr(records["conv_p1"][0])[7:-1])
    assert abs(a["conv_p1"][0] - raw) < 6e-4


@ref_exists
def test_stage5_min_mae_search_and_intent_byte_parity(tmp_path):
    """min_mae: the leaf's sigma search from the mount picks the same
    koef per layer as min_mae_search (and dies in n_update_std with the
    documented best_koeff path-bug KeyError); the healed intent tail,
    run through the mount's create_std_koef/n_update_std, byte-matches
    reduce_stats(min_mae) + write_max_a, including the hardcoded
    'conv_p1: 3' fallback."""
    import torch

    rng = np.random.default_rng(7)
    taps = ("start", "conv_p1", "conv_p2", "conv_0_c2f", "sppf_conv_1")
    searched = taps[2:]
    n_img = 6
    samples = {t: rng.normal(0.0, 3.0, (n_img, 4, 8, 8)).astype(np.float32)
               for t in searched}
    records = {}
    for t in taps:
        if t in samples:
            vals = np.max(np.abs(samples[t]), axis=(1, 2, 3))
        else:
            vals = rng.uniform(0.5, 12.0, n_img).astype(np.float32)
        records[t] = [torch.tensor(np.float32(v)) for v in vals]

    main = _fixture_tree(tmp_path, records)
    r5.write_batches(main, samples)
    err = r5.run_stage5(str(tmp_path), "min_mae")
    assert isinstance(err, KeyError), (
        "expected the reference's best_koeff path bug to surface as a "
        f"KeyError in n_update_std, got {err!r}")

    parsed = read_max_a_all(os.path.join(main, "results", "max_a_all.txt"))
    # search parity per layer: the reference appends one (identical)
    # line per chunk pass; each must equal our searched koef
    ref_koeffs = r5.read_best_koeff(os.path.join(main, "best_koeff.txt"))
    assert {n for n, _ in ref_koeffs} == set(searched)
    ours = {}
    for t in searched:
        koef, a_best, errs = min_mae_search(np.asarray(parsed[t]),
                                            samples[t], 8, full=True)
        ours[t] = koef
        # the argmin must be stable against the one non-replicable seam
        # (f32 sum reduction order). err = |sum(diff)/N| with per-element
        # diffs bit-exact on both sides and |diff| <= half an LSB =
        # a/(2*qmax); a tree-vs-sequential f32 sum differs by at most
        # ~log2(N)*eps*sum|diff|, so the err noise floor is
        # log2(N)*eps*a/(2*qmax) — require a 10x winner margin over it
        es = sorted(errs)
        n = samples[t].size
        noise = (np.log2(n) * np.finfo(np.float32).eps
                 * abs(a_best) / (2 * 127))
        assert es[1] - es[0] > 10 * noise, (t, es[:3], noise)
    for name, koef in ref_koeffs:
        assert koef == ours[name], (name, koef, ours[name])

    ref_final = r5.finish_min_mae_intent(str(tmp_path), 8, "yolov8n",
                                         parsed)
    ours_p = os.path.join(str(tmp_path), "ours_min_mae.txt")
    write_max_a(ours_p, reduce_stats(parsed, "min_mae", 8, samples))
    assert open(ours_p, "rb").read() == open(ref_final, "rb").read()


def test_min_mae_conv_p1_fallback_requires_known_tap():
    """Taps without samples fall back only through DEFAULT_MIN_MAE_KOEF;
    anything else still demands samples."""
    v = [1.0, 2.0, 3.0]
    out = reduce_stats({"conv_p1": v}, "min_mae", 8, samples={})
    want = np.asarray(v).mean() + 3.0 * np.std(v, ddof=1)
    assert out["conv_p1"] == pytest.approx(float(want), abs=0)
    with pytest.raises(ValueError, match="needs samples"):
        reduce_stats({"conv_p2": v}, "min_mae", 8, samples={})
