"""Calibration statistic reductions (stage-5 analog) and min-MAE search."""

import numpy as np
import pytest

import conftest  # noqa: F401

from alpha_yolo_quant_tpu.quantize.calibrate import (
    _min_mae_value, reduce_stats,
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
    acts = rng.normal(0, 1.0, (50, 4, 8, 8))
    per_image_max = np.abs(acts).max(axis=(1, 2, 3))
    a = _min_mae_value(per_image_max, acts, k=8)
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
