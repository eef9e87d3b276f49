"""Golden float64/int64 head decodes vs the device (jnp) decodes."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.head import decode_float
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.golden import (
    decode_full_quant_np, decode_partial_np, golden_forward,
)
from alpha_yolo_quant_tpu.runtime.interpreter import (
    decode_full_quant, dequantize_heads, device_plan, int_forward,
    quantize_input,
)

RNG = np.random.default_rng(77)


def _model(full):
    cfg = QuantConfig(model="yolov8n", k=8, image_size=64, full_quant=full)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=6)
    calib = RNG.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
    return cfg, graph, params, build_quantized_model(graph, params, max_a,
                                                     cfg)


def test_full_quant_decode_device_vs_golden():
    cfg, graph, params, model = _model(full=True)
    x = RNG.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    env = golden_forward(model, x)
    want = decode_full_quant_np(model, env)

    plan = device_plan(model)
    outs = int_forward(model, plan, quantize_input(jnp.asarray(x), 8))
    got = np.asarray(decode_full_quant(model, plan, outs), np.float64)
    # classes (exact integers) must match exactly
    np.testing.assert_array_equal(got[:, 4:], want[:, 4:])
    # boxes are exact too: the device softmax (127*e)//sum equals the
    # reference float64 truncation over the ENTIRE reachable (e, sum)
    # domain (test_dfl_softmax_f64_truncation_equals_integer_floor), and
    # every downstream value (dfl_q <= 2^15, anchors_q <= 2^15, dist2bbox
    # sums/halves, *strides <= 32) stays within f32's exact-integer range.
    np.testing.assert_array_equal(got[:, :4], want[:, :4])


def test_dfl_softmax_f64_truncation_equals_integer_floor():
    """PROOF (by exhaustion) that the reference DFL softmax quantization
    p = np.int64(e / sum * 127) — float64 divide, float64 multiply,
    truncate toward zero (stage_6_full_quant.py:731,
    stage_8_torch_full_quant.py:1205) — equals the integer floor
    (127*e) // sum used on device, over the ENTIRE reachable domain:
    e in [0, 127] (exponent-LUT outputs), sum in [127, 2032] (sum of 16
    LUT outputs; the max-subtracted bin contributes exp(0) -> 127).
    Therefore the device path is bit-exact, not 1-LSB-approximate."""
    e = np.arange(0, 128, dtype=np.int64)[:, None]
    s = np.arange(127, 2033, dtype=np.int64)[None, :]
    ref = np.int64(np.float64(e) / np.float64(s) * 127.0)
    exact = (127 * e) // s
    np.testing.assert_array_equal(ref, exact)


def test_exp_lut_top_value_is_127():
    """The domain proof above needs sum >= 127: the max-subtracted DFL bin
    hits exponent-LUT index 0 = quantize(exp(0)) = 127, and no LUT output
    exceeds 127."""
    from alpha_yolo_quant_tpu.quantize.luts import exponent_lut

    lut = exponent_lut(14.8264799118042, 8)
    assert int(lut.apply_np(np.asarray([0]))[0]) == 127
    assert lut.values.max() == 127 and lut.values.min() >= 0


def test_partial_decode_device_vs_golden():
    cfg, graph, params, model = _model(full=False)
    x = RNG.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    env = golden_forward(model, x)
    want = decode_partial_np(model, env)

    plan = device_plan(model)
    outs = int_forward(model, plan, quantize_input(jnp.asarray(x), 8))
    got = np.asarray(decode_float(dequantize_heads(model, outs),
                                  jnp.asarray(params["dfl"]["w"])),
                     np.float64)
    # float32 device vs float64 golden
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
