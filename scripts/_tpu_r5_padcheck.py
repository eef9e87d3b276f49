"""Round-5: ON-TPU bitwise check of the pad_batch_to serving path.

The CPU test (test_pipeline_pad_batch_to_bit_exact) proves the padded
pipeline == native on the CPU backend; on TPU the conv stack compiles
DIFFERENT fusions at B=64 vs B=128 (that difference is the whole point
of the knob), so verify on hardware that the per-row integer-exactness
argument holds: fn_pad(x) rows == fn(x) rows bit-for-bit at B=64/48.
"""
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

cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
fn, _ = build_int_pipeline(model, engine="auto")
fn_pad, _ = build_int_pipeline(model, engine="auto", pad_batch_to=128)

for b in (48, 64):
    x = jax.device_put(rng.uniform(0, 1, (b, 3, 640, 640)).astype(
        np.float32))
    det_n, nn = jax.device_get(jax.jit(fn)(x))
    det_p, np_ = jax.device_get(jax.jit(fn_pad)(x))
    same_n = bool((nn == np_).all())
    same_d = bool((det_n == det_p).all())
    print(f"B={b}: n_det identical={same_n}, det identical={same_d}, "
          f"total dets={int(nn.sum())}", flush=True)
    assert same_n and same_d
print("done", flush=True)
