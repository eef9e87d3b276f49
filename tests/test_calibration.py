"""Calibration statistic reductions (stage-5 analog) and min-MAE search."""

import numpy as np
import pytest

import conftest  # noqa: F401

from alpha_yolo_quant_tpu.quantize.calibrate import (
    min_mae_search, reduce_stats,
)


def test_reduce_modes():
    records = {"layer_a": [1.0, 3.0, 2.0, 3.0, 2.5],
               "layer_b": [-4.0, 1.0, 2.0, 2.0, 1.5]}
    assert reduce_stats(records, "max")["layer_a"] == 3.0
    assert reduce_stats(records, "max")["layer_b"] == 4.0   # abs max
    assert reduce_stats(records, "mode")["layer_a"] == 3.0
    assert reduce_stats(records, "median")["layer_a"] == 2.5
    v = np.array(records["layer_a"])
    want = v.mean() + 3 * v.std(ddof=1)
    assert reduce_stats(records, "std")["layer_a"] == pytest.approx(want)
    # n=1: second-largest unique (the reference's effective behavior)
    assert reduce_stats(records, "n=1")["layer_a"] == 2.5
    assert reduce_stats(records, "n=2")["layer_a"] == 2.0
    # always includes the pinned input entry
    assert reduce_stats(records, "max")["start"] == 1.0


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        reduce_stats({"x": [1.0]}, "bogus")


def test_min_mae_picks_low_bias_scale():
    rng = np.random.default_rng(0)
    acts = rng.normal(0, 1.0, (50, 4, 8, 8)).astype(np.float32)
    per_image_max = np.abs(acts).max(axis=(1, 2, 3))
    _, a = min_mae_search(per_image_max, acts, k=8)
    # the chosen clip must be positive and within the swept sigma band
    mean, std = per_image_max.mean(), per_image_max.std(ddof=1)
    assert mean - 2.01 * std <= a <= mean + 4.01 * std
    # and it must beat a terrible candidate on the |sum of error| metric
    def err(aa):
        s = 127 / aa
        q = np.round(np.clip(acts, -aa, aa) * s)
        return abs(float(np.sum(acts - q / s))) / acts.size

    assert err(a) <= err(mean + 4 * std) + 1e-12


def test_min_mae_requires_samples():
    with pytest.raises(ValueError):
        reduce_stats({"x": [1.0, 2.0]}, "min_mae")


def test_batches_artifact_roundtrip(tmp_path):
    """batches/{tap}/b_{i}.pickle dumps: reference format (gzip level 3,
    protocol-4 pickle of the per-image tensor — utils/save_weights.py:
    13-21) and exact reload for resumable min_mae."""
    import gzip
    import os
    import pickle

    from alpha_yolo_quant_tpu.quantize.calibrate import (
        load_batches, save_batches,
    )

    rng = np.random.default_rng(3)
    samples = {"conv_p1": rng.normal(0, 1, (3, 4, 8, 8)).astype(np.float32),
               "conv_p2": rng.normal(0, 2, (3, 6, 4, 4)).astype(np.float32)}
    out = str(tmp_path)
    save_batches(out, samples)
    # file layout + payload format
    f0 = os.path.join(out, "batches", "conv_p1", "b_0.pickle")
    assert os.path.exists(f0)
    with open(f0, "rb") as fh:
        assert fh.read(2) == b"\x1f\x8b"          # gzip magic
    with gzip.open(f0, "rb") as fh:
        payload = fh.read()
    assert payload[:2] == b"\x80\x04"             # pickle protocol 4
    arr = pickle.loads(payload)
    np.testing.assert_array_equal(arr, samples["conv_p1"][0:1])
    # exact round trip
    loaded = load_batches(out, ["conv_p1", "conv_p2"])
    for tap in samples:
        np.testing.assert_array_equal(loaded[tap], samples[tap])
    # missing tap -> None (caller falls back to capture)
    assert load_batches(out, ["conv_p1", "nope"]) is None


def test_min_mae_resumes_from_batches(tmp_path):
    """reduce_stats(min_mae) over reloaded dumps equals the in-memory
    result bit-for-bit."""
    from alpha_yolo_quant_tpu.quantize.calibrate import (
        load_batches, reduce_stats, save_batches,
    )

    rng = np.random.default_rng(5)
    samples = {"t": rng.normal(0, 3, (6, 2, 4, 4)).astype(np.float32)}
    records = {"t": np.abs(samples["t"]).max(axis=(1, 2, 3)).tolist()}
    want = reduce_stats(records, "min_mae", 8, samples)
    save_batches(str(tmp_path), samples)
    got = reduce_stats(records, "min_mae", 8,
                       load_batches(str(tmp_path), ["t"]))
    assert got == want
