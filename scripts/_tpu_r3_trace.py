"""Capture a jax.profiler trace of the dense serving e2e at B=128 to
attribute the ~13 ms decode+select+NMS region across actual fusions
(component probes sum to ~9.5; blind reshuffles haven't moved e2e).
Writes /tmp/ayq_trace; the companion parser aggregates trace.json.gz
events by op name."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
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
fn, _ = build_int_pipeline(model, engine="auto", sparse_select=False)
jfn = jax.jit(fn)

images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))

# warm/compile
jax.block_until_ready(jfn(images))
print("compiled", flush=True)

with jax.profiler.trace("/tmp/ayq_trace"):
    for _ in range(3):
        jax.block_until_ready(jfn(images))
print("trace written", flush=True)
