"""Round-3 conf-first sparse serving decode (decode_select_sparse) vs
the dense per-level decode + select path, e2e at B=128 @640.

The honest stage split (r3_split.log) put decode at ~5.6 ms and
NMS+select at ~8.6; the sparse path DFL-decodes only the top-1000
anchors (8.4x less softmax/einsum work) after a single-key conf sort,
reading the box bins through an int8 top-k gather.
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

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)

fn_s, _ = build_int_pipeline(model, engine="auto", sparse_select=True)
fn_d, _ = build_int_pipeline(model, engine="auto", sparse_select=False)

images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))

# parity on TPU at B=2 first
det_s, n_s = jax.jit(fn_s)(images[:2])
det_d, n_d = jax.jit(fn_d)(images[:2])
ok = (np.array_equal(np.asarray(n_s), np.asarray(n_d))
      and np.array_equal(np.asarray(det_s), np.asarray(det_d)))
print("sparse == dense on TPU (B=2):", ok,
      "n_det:", np.asarray(n_s).tolist(), flush=True)

slope_time("e2e dense  B=128", fn_d, images)
slope_time("e2e sparse B=128", fn_s, images)
print("done", flush=True)
