"""A/B the segment-sort + bitonic top-k merge candidate selection
(SELECT_TOPK_MERGE) vs the full-width 6-operand co-sort (2.35 ms,
latency-bound, r3_trace3): ~55 stages at half width + 33 cheap
elementwise merge stages instead of ~105 full-width sort stages.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax

from _slope import slope_time
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.postprocess import nms as nms_mod
from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
fn, _ = build_int_pipeline(model, engine="auto")

images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))

nms_mod.SELECT_TOPK_MERGE = False
det_a, n_a = jax.jit(fn)(images[:2])
nms_mod.SELECT_TOPK_MERGE = True
det_b, n_b = jax.jit(fn)(images[:2])
ok = (np.array_equal(np.asarray(n_a), np.asarray(n_b))
      and np.array_equal(np.asarray(det_a), np.asarray(det_b)))
print("topk-merge == co-sort on TPU (B=2):", ok, flush=True)

nms_mod.SELECT_TOPK_MERGE = False
slope_time("e2e co-sort    ", fn, images)
nms_mod.SELECT_TOPK_MERGE = True
slope_time("e2e topk-merge ", fn, images)
print("done", flush=True)
