"""A/B the space-to-depth rewrite of the narrow stride-2 convs
(AUTO_S2D): the r3_trace2 profile has the stem conv at 2.64 ms and the
P2 stride-2 conv at 2.48 ms (34%/31% BW, K=27/144 contraction); s2d
deepens K to 48/256. Bit-exact (unit-verified on CPU).
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
n_s2d = sum(1 for d in plan["convs"].values()
            if d.get("w_s2d_i8") is not None)
print("s2d-eligible convs:", n_s2d, flush=True)

images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))


def make_fwd():
    def fwd(imgs):
        xq = it.quantize_input(imgs, 8, out_dtype=jnp.bfloat16)
        return it.int_forward(model, plan, xq, engine="auto",
                              head_requant=True)
    return fwd


it.AUTO_S2D = False
o_off = jax.jit(make_fwd())(images[:2])
it.AUTO_S2D = True
o_on = jax.jit(make_fwd())(images[:2])
ok = all(np.array_equal(np.asarray(o_off[r]).astype(np.int64),
                        np.asarray(o_on[r]).astype(np.int64))
         for r in model.graph.outputs)
print("s2d == plain on TPU (B=2):", ok, flush=True)

it.AUTO_S2D = False
slope_time("fwd s2d off", make_fwd(), images)
it.AUTO_S2D = True
slope_time("fwd s2d on ", make_fwd(), images)
fn_on, _ = it.build_int_pipeline(model, engine="auto")
slope_time("e2e s2d on ", fn_on, images)
print("done", flush=True)
