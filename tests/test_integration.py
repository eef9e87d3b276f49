"""Integration smoke tests: yolov8s quantized end-to-end; golden-image run
against the reference's checked-in test photo (read-only mount)."""

import os

import numpy as np
import pytest

import conftest

import jax.numpy as jnp

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.golden import golden_forward
from alpha_yolo_quant_tpu.runtime.interpreter import (
    build_int_pipeline, device_plan, int_forward, quantize_input,
)

RNG = np.random.default_rng(31)
CATS = "/root/reference/quantisation/utils/cats_2_640.jpg"


def test_yolov8s_quantized_end_to_end():
    """The small variant (w=0.5, 512-channel P5) through calibrate ->
    quantize -> int pipeline, interpreter vs golden."""
    cfg = QuantConfig(model="yolov8s", k=8, image_size=64)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=8)
    calib = RNG.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
    model = build_quantized_model(graph, params, max_a, cfg)

    x = RNG.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    env = golden_forward(model, x)
    outs = int_forward(model, device_plan(model),
                       quantize_input(jnp.asarray(x), 8))
    for role in graph.outputs:
        np.testing.assert_array_equal(
            np.asarray(outs[role]).astype(np.int64), env[role],
            err_msg=role)

    fn, _ = build_int_pipeline(model, dfl_w_float=params["dfl"]["w"])
    det, n_det = fn(jnp.asarray(x))
    assert det.shape == (1, 300, 6)


@pytest.mark.skipif(not os.path.exists(CATS), reason="no reference mount")
def test_golden_image_smoke():
    """The reference's bring-up flow runs one checked-in photo through the
    quantized model (stage_6.py:36); same smoke here, checking the full
    image pipeline (load -> quantize -> int forward -> q_NMS) produces a
    well-formed detection set."""
    from alpha_yolo_quant_tpu.data.coco import load_image_square

    cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=256)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=0)
    img = load_image_square(CATS, 256)[None]
    max_a = reduce_stats(collect_stats(graph, params, [img]), "max")
    model = build_quantized_model(graph, params, max_a, cfg)
    fn, _ = build_int_pipeline(model)
    det, n_det = fn(jnp.asarray(img))
    n = int(n_det[0])
    det = np.asarray(det[0])
    assert det.shape == (300, 6)
    # valid rows: boxes in-frame-ish, confidences in (0, 1], classes 0..79
    rows = det[:n]
    if n:
        assert rows[:, 4].min() > 0 and rows[:, 4].max() <= 1.0
        assert rows[:, 5].min() >= 0 and rows[:, 5].max() <= 79
