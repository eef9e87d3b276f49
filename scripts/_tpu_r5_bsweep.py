"""Round-5: serving batch-size sweep — latency/throughput curve for the
README. e2e (quantize + forward(auto) + decode + q_NMS) at B in
{1, 8, 32, 128}, slope-timed with the trap-#6b-fixed harness. B=128
fills the 128 vector lanes (batch-in-lanes conv layout); smaller
batches trade throughput for latency.
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

cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
fn, _ = build_int_pipeline(model, engine="auto")

for b in (1, 8, 32, 128):
    images = jax.device_put(rng.uniform(0, 1, (b, 3, 640, 640)).astype(
        np.float32))
    dt = slope_time(f"e2e B={b:<3}", fn, images)
    print(f"  -> {b/dt:,.0f} img/s, {dt*1e3:.2f} ms/batch", flush=True)
print("done", flush=True)
