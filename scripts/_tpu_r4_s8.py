"""Round-4 probe #4: engine flavor A/B after the epilogue diet.

With the fat epilogue gone, the mid convs' cost model changed: bf16
activation storage moves ~2x the bytes of int8 through HBM. Round 2
measured auto(bf16) > s8 — re-measure both engines' forward + e2e, plus
a mixed flavor (bf16 kept only where the s8 path is known-bad: the
narrow stem/P2 and stride-2 geometry; s8 elsewhere).
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

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
plan = interp.device_plan(model)

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

# mixed: flip bf16_single_ok off for the wide stride-1 mid layers, keep
# it for cin<=16 (stem/P2) and all stride-2 convs
saved = {}
for name, c in model.convs.items():
    if (c.bf16_single_ok and c.node.silu and c.node.stride == 1
            and c.node.cin > 16):
        saved[name] = True
        setattr(c, "bf16_single_ok", False)
print(f"mixed: {len(saved)} layers flipped to s8", flush=True)
fwd, x_q = fwd_fn("auto", jnp.bfloat16)
slope_time("fwd auto-mixed(s8 mid)", fwd, x_q)
for name in saved:
    setattr(model.convs[name], "bf16_single_ok", True)
print("done", flush=True)
