"""Bit-exactness of host-side quantization primitives vs the reference."""

import numpy as np
import pytest

import conftest
from reference_oracle import load as load_ref

from alpha_yolo_quant_tpu.quantize.primitives import (
    clip_sym, quant_bias, quant_matrix, scale_for,
)
from alpha_yolo_quant_tpu.quantize.luts import exponent_lut, sigmoid_lut

RNG = np.random.default_rng(1)
ref_exists = pytest.mark.skipif(not conftest.reference_available(),
                                reason="no reference mount")


def test_scale_law():
    assert scale_for(1.0, 8) == 127.0
    assert scale_for(7.0, 8) == 127.0 / 7.0
    assert scale_for(1.0, 4) == 7.0


def test_quant_bias_truncates_toward_zero():
    b = np.array([2.7, -2.7, 0.5, -0.5, 3.999])
    np.testing.assert_array_equal(quant_bias(b, 1.0), [2, -2, 0, 0, 3])


def test_clip_sym():
    x = np.array([-300, -127, 0, 127, 300])
    np.testing.assert_array_equal(clip_sym(x.astype(float), 8),
                                  [-127, -127, 0, 127, 127])


@ref_exists
def test_quant_matrix_parity():
    ref = load_ref("utils.quant_matrix")
    for k in (4, 6, 8):
        w = RNG.normal(size=(16, 8, 3, 3)) * RNG.uniform(0.01, 3.0)
        want_m, want_s = ref.quant_matrix(w.copy(), k)
        got_m, got_s = quant_matrix(w, k)
        np.testing.assert_array_equal(got_m, want_m)
        np.testing.assert_array_equal(got_s, want_s)
        # start=True pins a=1
        img = RNG.uniform(0, 1, size=(1, 3, 8, 8))
        want_m, want_s = ref.quant_matrix(img.copy(), k, start=True)
        got_m, got_s = quant_matrix(img, k, start=True)
        np.testing.assert_array_equal(got_m, want_m)
        np.testing.assert_array_equal(got_s, want_s)


@ref_exists
def test_sigmoid_lut_parity(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "utils").mkdir(exist_ok=True)
    ref = load_ref("utils.silu")
    for domain, k in ((7, 8), (6, 8), (7, 4), (12, 16), (6, 6)):
        want = ref.create_sigmoid_lookup_table(domain, k)
        lut = sigmoid_lut(domain, k)
        keys = sorted(want.keys())
        assert keys[0] == lut.lo and keys[-1] == lut.hi
        got = np.array([lut.raw[i - lut.lo] for i in keys])
        np.testing.assert_array_equal(got, np.array([want[i] for i in keys]))


@ref_exists
def test_exponent_lut_parity(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "utils").mkdir(exist_ok=True)
    ref = load_ref("utils.exponent")
    for domain, k in ((14.8264799118042, 8), (10.0, 8)):
        want = ref.create_exponent_lookup_table(domain, k)
        lut = exponent_lut(domain, k)
        keys = sorted(want.keys())
        assert keys[0] == lut.lo and keys[-1] == lut.hi == 0
        got = np.array([lut.raw[i - lut.lo] for i in keys])
        np.testing.assert_array_equal(got, np.array([want[i] for i in keys]))


@ref_exists
def test_lut_apply_parity():
    ref = load_ref("utils.silu")
    lut = sigmoid_lut(7, 8)
    table = {i: lut.raw[i - lut.lo] for i in range(lut.lo, lut.hi + 1)}
    x = RNG.integers(-127, 128, size=(2, 4, 8, 8))
    want = ref.sigmoid_quant(x.copy(), table)
    got = lut.apply_np(x)
    np.testing.assert_array_equal(got, want)
