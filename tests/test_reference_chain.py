"""End-to-end single-layer arithmetic parity with the reference.

Recomposes the reference's own conv_quant/silu_quant procedure from its
importable utility functions (quant_matrix -> im2col conv -> truncating
bias -> requantize -> sigmoid LUT -> multiply -> requantize; reference
stage_6.py:88-165) and checks our transform+golden produce bit-identical
integers for the same float weights, calibration values, and input. Also
covers the integer maxpool against the reference's loop implementation.
"""

import numpy as np
import pytest

import conftest
from reference_oracle import load as load_ref

from alpha_yolo_quant_tpu.quantize.luts import sigmoid_lut
from alpha_yolo_quant_tpu.quantize.primitives import (
    quant_bias, quant_matrix, requantize_np, scale_for,
)
from alpha_yolo_quant_tpu.runtime.golden import conv2d_int64, maxpool_int64

RNG = np.random.default_rng(99)
ref_exists = pytest.mark.skipif(not conftest.reference_available(),
                                reason="no reference mount")


@ref_exists
def test_conv_silu_chain_parity(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "utils").mkdir()
    r_qm = load_ref("utils.quant_matrix")
    r_rc = load_ref("utils.rescale_coeff")
    r_qb = load_ref("utils.quant_bias")
    r_im = load_ref("utils.im2colSOLO")
    r_silu = load_ref("utils.silu")

    k = 8
    cin, cout, size = 8, 12, 16
    w = RNG.normal(0, 0.3, (cout, cin, 3, 3))
    bias = RNG.normal(0, 0.5, (1, cout, 1, 1))
    x_float = RNG.uniform(0, 1, (1, cin, size, size))
    a_in, a_out = 1.0, 3.7

    # ---- reference chain (stage_6 conv_quant + silu_quant recomposed) ----
    conv_q, conv_scale = r_qm.quant_matrix(w.copy(), k)
    conv_scale_t = np.transpose(conv_scale)                  # (1, C)
    x_q, x_scale = r_qm.quant_matrix(x_float.copy(), k, start=True)
    bias_conv_scale = np.dot(x_scale, conv_scale_t)          # (1, C)
    b4 = bias.transpose(1, 0, 2, 3)
    bq = np.zeros(b4.shape)
    for c in range(cout):
        bq[c, 0] = r_qb.quant_bias(b4[c, 0], bias_conv_scale[0, c])
    bq = np.int64(bq).transpose(1, 0, 2, 3)                  # (1, C, 1, 1)
    res = r_im.im2colzxc(x_q, conv_q, padding=1, stride=1) + bq
    scale_res = np.expand_dims(bias_conv_scale, (2, 3))      # (1,C,1,1)

    lookup = r_silu.create_sigmoid_lookup_table(7, k)
    res_copy = res.copy()
    dom, rescale, shift = r_rc.requantize(res, scale_res,
                                          127.0 / 7.0, k)
    sig = r_silu.sigmoid_quant(dom, lookup)
    prod = np.int64(np.round(sig * res_copy))
    out_ref, _, _ = r_rc.requantize(prod, 127.0 * scale_res,
                                    scale_for(a_out, k), k)

    # ---- our transform + golden primitives ----
    wq_m, ws_m = quant_matrix(w, k)
    np.testing.assert_array_equal(wq_m, conv_q)
    in_s = scale_for(a_in, k)
    acc_scale = (in_s * ws_m[:, 0]).reshape(1, -1, 1, 1)
    bq_m = quant_bias(bias.reshape(-1), acc_scale.reshape(-1))
    np.testing.assert_array_equal(bq_m, bq.reshape(-1))
    xq_m = np.int64(np.round(np.clip(x_float, -1, 1) * 127))
    np.testing.assert_array_equal(xq_m, x_q)
    acc = conv2d_int64(xq_m, wq_m, 1, 1) + bq_m.reshape(1, -1, 1, 1)
    np.testing.assert_array_equal(acc, res_copy)

    lut = sigmoid_lut(7.0, k)
    dom_m, _, _ = requantize_np(acc, acc_scale, scale_for(7.0, k), k)
    np.testing.assert_array_equal(dom_m, dom)
    sig_m = lut.apply_np(dom_m)
    prod_m = sig_m * acc
    np.testing.assert_array_equal(prod_m, prod)
    out_m, _, _ = requantize_np(prod_m, scale_for(1.0, k) * acc_scale,
                                scale_for(a_out, k), k)
    np.testing.assert_array_equal(out_m, out_ref)


@ref_exists
def test_maxpool_parity_with_reference_loops():
    ref = load_ref("utils.maxpooling_batch")
    x = RNG.integers(-127, 128, (1, 4, 12, 12))
    want = ref.maxpooling(x.copy().astype(np.float64), kernel=5, padding=2,
                          stride=1)
    got = maxpool_int64(np.int64(x), 5, 1, 2)
    np.testing.assert_array_equal(got, np.int64(want))


@ref_exists
def test_im2col_conv_parity():
    ref = load_ref("utils.im2colSOLO")
    x = RNG.integers(-127, 128, (2, 3, 10, 10))
    w = RNG.integers(-127, 128, (5, 3, 3, 3))
    for pad, stride in ((1, 1), (1, 2), (0, 1)):
        want = ref.im2colzxc(np.float64(x), np.float64(w), pad, stride)
        got = conv2d_int64(np.int64(x), np.int64(w), stride, pad)
        np.testing.assert_array_equal(got, np.int64(want))
