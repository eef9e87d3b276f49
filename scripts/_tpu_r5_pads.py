"""Round-5: pad-target sweep for the B=64 serving contract.

pad_batch_to=128 fixed B=64 from 38.7 -> ~31.9 ms (2,005 img/s) — thin
vs the ~2.3% run spread. If the native fusion pathology is specific to
B=64, a smaller pad target wastes less padded work: measure native
B=48/96 e2e and B=64 padded to 96 vs 128.
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

for b, pad in ((48, None), (96, None), (64, 96), (64, 128)):
    images = jax.device_put(rng.uniform(0, 1, (b, 3, 640, 640)).astype(
        np.float32))
    fn, _ = build_int_pipeline(model, engine="auto", pad_batch_to=pad)
    dt = slope_time(f"B={b:<3} pad={pad}", fn, images)
    print(f"  -> {b/dt:,.0f} img/s", flush=True)
print("done", flush=True)
