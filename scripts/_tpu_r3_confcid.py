"""Packed-key conf/cid reduction (one max instead of max + argmax;
r3_sparse2.log C1 put the old reductions at 4.8 ms of the B=128
budget). D1 isolates the reduction; D2/D3 decide the serving default
(dense vs sparse select) post-fix.
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
from alpha_yolo_quant_tpu.runtime.interpreter import (
    _conf_cid_packed, build_int_pipeline, device_plan, int_forward,
    quantize_input,
)

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
plan = device_plan(model)

images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))


def d1(imgs):
    xq = quantize_input(imgs, 8, out_dtype=jnp.bfloat16)
    outs = int_forward(model, plan, xq, engine="auto", head_requant=True)
    res = []
    for level in ("p3", "p4", "p5"):
        cq = outs[f"{level}_cls"].astype(jnp.int32)
        res.extend(_conf_cid_packed(cq))
    return tuple(res)


fn_d, _ = build_int_pipeline(model, engine="auto", sparse_select=False)
fn_s, _ = build_int_pipeline(model, engine="auto", sparse_select=True)

det_s, n_s = jax.jit(fn_s)(images[:2])
det_d, n_d = jax.jit(fn_d)(images[:2])
ok = (np.array_equal(np.asarray(n_s), np.asarray(n_d))
      and np.array_equal(np.asarray(det_s), np.asarray(det_d)))
print("sparse == dense on TPU (B=2):", ok, flush=True)

slope_time("D1 fwd+packed conf/cid", d1, images)
slope_time("D2 e2e dense          ", fn_d, images)
slope_time("D3 e2e sparse         ", fn_s, images)
print("done", flush=True)
