"""Round-5: small-batch engine A/B.

The conv engines put the BATCH in the 128 vector lanes (the B=128
throughput-optimal layout), so B=32 pays ~the full B=128 wall
(r5_bsweep.log: 29.3 vs 31.8 ms — 25% lane fill). NHWC puts CHANNELS
in lanes (C=16..256 fills them at any batch), which lost at B=128 but
may win at serving batches. e2e at B in {8, 32} for auto (NCHW
batch-in-lanes) vs nhwc (f32-parts) vs s8_nhwc.
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

for b in (8, 32):
    images = jax.device_put(rng.uniform(0, 1, (b, 3, 640, 640)).astype(
        np.float32))
    for engine in ("auto", "nhwc", "s8_nhwc"):
        fn, _ = build_int_pipeline(model, engine=engine)
        dt = slope_time(f"B={b:<3} {engine:<8}", fn, images)
        print(f"  -> {b/dt:,.0f} img/s", flush=True)
print("done", flush=True)
