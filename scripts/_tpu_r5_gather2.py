"""Round-5: re-probe SELECT_GATHER e2e post-diet/post-upsample.

r5_sortcost.log: the shipped 6-operand co-sort costs 2.26 ms at
(128,8400) while a key-only sort is 0.73 — the operand carry through
~91 compare-exchange stages is ~1.5 ms. SELECT_GATHER (sort the packed
key alone, then top-k gathers for boxes/cid) lost e2e by 0.6 ms in
round 3 (40.9 vs 40.3, pre-diet pipeline); the margins have since
moved by 8.5 ms of unrelated work — re-measure both flavors e2e.
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
from alpha_yolo_quant_tpu.postprocess import nms as nms_mod

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))

for flag in (False, True):
    nms_mod.SELECT_GATHER = flag
    fn, _ = build_int_pipeline(model, engine="auto")
    dt = slope_time(f"e2e SELECT_GATHER={flag}", fn, images)
    print(f"  -> {B/dt:,.0f} img/s", flush=True)
nms_mod.SELECT_GATHER = False

# parity spot-check on TPU between the two select flavors (the flag is
# read at TRACE time, so each jit call happens under its flag value)
x = images[:8]
nms_mod.SELECT_GATHER = False
fn_a, _ = build_int_pipeline(model, engine="auto")
da, na = jax.device_get(jax.jit(fn_a)(x))
nms_mod.SELECT_GATHER = True
fn_b, _ = build_int_pipeline(model, engine="auto")
db, nb = jax.device_get(jax.jit(fn_b)(x))
nms_mod.SELECT_GATHER = False
print("parity:", bool((da == db).all() and (na == nb).all()), flush=True)
print("done", flush=True)
