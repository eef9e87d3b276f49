"""A/B int16 storage for the wide (9-bit) residual/concat edges in the
auto engine (r3_trace2 showed ~1.9 ms of s32 layout-churn copies at the
40-level neck). The change is already in the tree; this compares
against the parent build via a forward + e2e measurement and a B=2
parity check vs the golden xla engine.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

from _slope import slope_time
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime import interpreter as it

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
plan = it.device_plan(model)

images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))


def fwd(imgs):
    xq = it.quantize_input(imgs, 8, out_dtype=jnp.bfloat16)
    return it.int_forward(model, plan, xq, engine="auto",
                          head_requant=True)


# parity vs golden xla engine at B=2 (head_requant off for raw outs)
xq2 = it.quantize_input(images[:2], 8)
want = it.int_forward(model, plan, xq2, engine="xla")
got = it.int_forward(model, plan,
                     it.quantize_input(images[:2], 8,
                                       out_dtype=jnp.bfloat16),
                     engine="auto")
ok = all(np.array_equal(np.asarray(got[r]).astype(np.int64),
                        np.asarray(want[r]).astype(np.int64))
         for r in model.graph.outputs)
print("auto(int16 wide) == xla on TPU (B=2):", ok, flush=True)

slope_time("fwd auto int16-wide", fwd, images)
fn, _ = it.build_int_pipeline(model, engine="auto")
slope_time("e2e auto int16-wide", fn, images)
print("done", flush=True)
