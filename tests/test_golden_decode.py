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
    # boxes: integer dfl/anchors -> float32 dist2bbox; the quantized softmax
    # division can differ by 1 LSB at exact float64 boundaries
    np.testing.assert_allclose(got[:, :4], want[:, :4], atol=160.0)
    frac_close = np.mean(np.abs(got[:, :4] - want[:, :4]) < 1e-3)
    assert frac_close > 0.99


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
