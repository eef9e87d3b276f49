"""A/B the q_NMS candidate selection flavor e2e (with AUTO_BF16_S2 on):
6-operand co-sort (current) vs single-key sort + top-k gathers
(SELECT_GATHER). The r3 profiler trace put the co-sort at 2.37 ms; the
honest component numbers for key sort (0.64) + (128,1000) gathers (~0)
predict ~1.7 ms back.
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

nms_mod.SELECT_GATHER = False
det_a, n_a = jax.jit(fn)(images[:2])
nms_mod.SELECT_GATHER = True
det_b, n_b = jax.jit(fn)(images[:2])
ok = (np.array_equal(np.asarray(n_a), np.asarray(n_b))
      and np.array_equal(np.asarray(det_a), np.asarray(det_b)))
print("gather == co-sort on TPU (B=2):", ok, flush=True)

nms_mod.SELECT_GATHER = False
slope_time("e2e co-sort   ", fn, images)
nms_mod.SELECT_GATHER = True
slope_time("e2e key+gather", fn, images)
print("done", flush=True)
