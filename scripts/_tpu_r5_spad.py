"""Round-5: does the batch-pad policy hold at the yolov8s scale?

bench.py/eval-int8 pad any 32 < B < 128 to 128 for every model; the
pathology zone was measured on yolov8n only. Verify the policy is not
harmful for yolov8s: B=64 native vs padded-to-128.
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
from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline

print("backend:", jax.devices()[0].platform, flush=True)

cfg = QuantConfig(model="yolov8s", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)

images = jax.device_put(rng.uniform(0, 1, (64, 3, 640, 640)).astype(
    np.float32))
for pad in (None, 128):
    fn, _ = build_int_pipeline(model, engine="auto", pad_batch_to=pad)
    dt = slope_time(f"s B=64 pad={pad}", fn, images)
    print(f"  -> {64/dt:,.0f} img/s", flush=True)
print("done", flush=True)
