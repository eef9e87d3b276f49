"""Dump the optimized HLO of the serving pipeline (axon backend) so
trace op names (copy.313, add_reduce_fusion, fusion.156, ...) can be
matched to shapes/operations. Writes /tmp/ayq_e2e_hlo.txt."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

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

co = jax.jit(fn).lower(
    jax.ShapeDtypeStruct((B, 3, 640, 640), jnp.float32)).compile()
txt = co.as_text()
open("/tmp/ayq_e2e_hlo.txt", "w").write(txt)
print("HLO chars:", len(txt), flush=True)
