"""Bit-exactness of the fused Pallas engine vs the XLA interpreter
(interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import (
    device_plan, int_forward, quantize_input,
)

RNG = np.random.default_rng(7)


def _setup(size=64, full=False):
    cfg = QuantConfig(model="yolov8n", k=8, image_size=size,
                      full_quant=full)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=2)
    calib = RNG.uniform(0, 1, (1, 3, size, size)).astype(np.float32)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
    model = build_quantized_model(graph, params, max_a, cfg)
    return cfg, model


def test_pallas_engine_bit_exact():
    cfg, model = _setup()
    x = RNG.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    xq = quantize_input(jnp.asarray(x), 8)
    plan_x = device_plan(model)
    plan_p = device_plan(model, pallas=True)
    want = int_forward(model, plan_x, xq, engine="xla")
    got = int_forward(model, plan_p, xq, engine="pallas")
    for role in model.graph.outputs:
        np.testing.assert_array_equal(
            np.asarray(got[role]).astype(np.int64),
            np.asarray(want[role]).astype(np.int64), err_msg=role)


def test_pallas_sigma_corrections_small():
    from alpha_yolo_quant_tpu.quantize.luts import sigmoid_lut
    from alpha_yolo_quant_tpu.runtime.pallas_ops import (
        pallas_sigma_corrections,
    )

    lut = sigmoid_lut(7, 8)
    corr = pallas_sigma_corrections(lut)
    # arithmetic recomputation should agree almost everywhere
    assert len(corr) < 16


def test_nhwc_engine_bit_exact():
    cfg, model = _setup()
    x = RNG.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    xq = quantize_input(jnp.asarray(x), 8)
    plan = device_plan(model)
    want = int_forward(model, plan, xq, engine="xla")
    got = int_forward(model, plan, xq, engine="nhwc")
    for role in model.graph.outputs:
        np.testing.assert_array_equal(
            np.asarray(got[role]).astype(np.int64),
            np.asarray(want[role]).astype(np.int64), err_msg=role)


def test_s8_engine_bit_exact():
    cfg, model = _setup()
    x = RNG.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    xq = quantize_input(jnp.asarray(x), 8)
    plan = device_plan(model)
    want = int_forward(model, plan, xq, engine="xla")
    got = int_forward(model, plan, xq, engine="s8")
    for role in model.graph.outputs:
        np.testing.assert_array_equal(
            np.asarray(got[role]).astype(np.int64),
            np.asarray(want[role]).astype(np.int64), err_msg=role)


def test_s8_nhwc_engine_bit_exact():
    cfg, model = _setup()
    x = RNG.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    xq = quantize_input(jnp.asarray(x), 8)
    plan = device_plan(model)
    want = int_forward(model, plan, xq, engine="xla")
    got = int_forward(model, plan, xq, engine="s8_nhwc")
    for role in model.graph.outputs:
        np.testing.assert_array_equal(
            np.asarray(got[role]).astype(np.int64),
            np.asarray(want[role]).astype(np.int64), err_msg=role)


def test_fused_engine_bit_exact():
    cfg, model = _setup()
    x = RNG.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    xq = quantize_input(jnp.asarray(x), 8)
    want = int_forward(model, device_plan(model), xq, engine="xla")
    got = int_forward(model, device_plan(model, pallas=True), xq,
                      engine="fused")
    for role in model.graph.outputs:
        np.testing.assert_array_equal(
            np.asarray(got[role]).astype(np.int64),
            np.asarray(want[role]).astype(np.int64), err_msg=role)


def test_auto_engine_bit_exact():
    cfg, model = _setup()
    assert any(c.bf16_single_ok for c in model.convs.values())
    x = RNG.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    xq = quantize_input(jnp.asarray(x), 8)
    plan = device_plan(model)
    want = int_forward(model, plan, xq, engine="xla")
    got = int_forward(model, plan, xq, engine="auto")
    for role in model.graph.outputs:
        np.testing.assert_array_equal(
            np.asarray(got[role]).astype(np.int64),
            np.asarray(want[role]).astype(np.int64), err_msg=role)
