"""Round-5 probe: engine flavor A/B for yolov8s after the epilogue diet.

r4_s8.log measured auto(bf16) > s8 > mixed for yolov8n, where the convs
are narrow (C<=256) and the bf16 single-pass covers every layer. yolov8s
doubles every width (C up to 512): the s8 MXU path has 2x the peak of
bf16 and the wider accumulation bounds may push more layers off the
single-pass bf16 route — re-measure forward + e2e for both engines at
the s scale.
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
from alpha_yolo_quant_tpu.runtime import interpreter as interp
from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8s", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
plan = interp.device_plan(model)

n_bf16 = sum(1 for c in model.convs.values() if c.bf16_single_ok)
print(f"bf16_single_ok: {n_bf16}/{len(model.convs)} convs", flush=True)

images = rng.uniform(0, 1, (B, 3, 640, 640)).astype(np.float32)


def fwd_fn(engine, dt):
    x_q = jax.jit(lambda im: interp.quantize_input(im, 8, out_dtype=dt)
                  )(jnp.asarray(images))
    x_q.block_until_ready()

    def fwd(x):
        return interp.int_forward(model, plan, x, engine=engine,
                                  head_requant=True)
    return fwd, x_q


for engine, dt in (("auto", jnp.bfloat16), ("s8", jnp.int8)):
    fwd, x_q = fwd_fn(engine, dt)
    slope_time(f"fwd {engine}", fwd, x_q)

im_dev = jax.device_put(images)
for engine in ("auto", "s8"):
    fn, _ = build_int_pipeline(model, engine=engine)
    slope_time(f"e2e {engine}", fn, im_dev)
print("done", flush=True)
