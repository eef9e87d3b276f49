"""A/B probe: f32 vs uint8 image ingest, e2e slope-timed.

Run detached:  python -u scripts/_tpu_r5_u8.py > /tmp/r5_u8.log 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402

from alpha_yolo_quant_tpu.config import QuantConfig  # noqa: E402
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph  # noqa: E402
from alpha_yolo_quant_tpu.models.params import init_params  # noqa: E402
from alpha_yolo_quant_tpu.quantize.calibrate import (  # noqa: E402
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import (  # noqa: E402
    build_quantized_model,
)
from alpha_yolo_quant_tpu.runtime import interpreter as I  # noqa: E402
from scripts._slope import slope_time  # noqa: E402

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
calib = np.random.default_rng(1).uniform(0, 1, (2, 3, 640, 640)).astype(
    np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
qmodel = build_quantized_model(graph, params, max_a, cfg)

imgs_f = np.random.default_rng(0).uniform(
    0, 1, (B, 3, 640, 640)).astype(np.float32)
imgs_u = np.round(imgs_f * 255.0).astype(np.uint8)

fn, plan = I.build_int_pipeline(qmodel, engine="auto")
slope_time("e2e f32", fn, jax.device_put(imgs_f))
slope_time("e2e u8 ", fn, jax.device_put(imgs_u))
# sanity: identical detections for u8-origin pixels
det_f, n_f = fn(jax.device_put((imgs_u.astype(np.float32) / np.float32(255.0))[:8]))
det_u, n_u = fn(jax.device_put(imgs_u[:8]))
assert (np.asarray(det_f) == np.asarray(det_u)).all()
assert (np.asarray(n_f) == np.asarray(n_u)).all()
print("u8 parity OK", flush=True)
print("done", flush=True)
