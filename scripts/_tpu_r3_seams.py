"""Round-3 composition-seam bisect (VERDICT r2 weak #2 / next #5).

Round 2 timed the four stages in ISOLATION (stages3.log: 1.9 + 27.0 +
2.6 + 10.9 = 42.4 ms) vs 47.9 ms e2e and attributed the ~5.5 ms gap to
"diffuse seams". This probe times composed PREFIXES of the real pipeline
inside single jits, so each increment charges a stage PLUS its
composition boundary:

  P0 quantize
  P1 quantize + forward            (head accs materialized)
  P2 quantize + forward + decode   (reduce_cls serving decode)
  P3 full pipeline incl. q_NMS     (= bench)

Increments vs the round-2 isolated numbers localize the seam cost.
Additionally P2b = P2 but returning only a scalar probe of the decode
output (kills the (B,4,8400)+conf materialization cost at the boundary)
to see how much is output materialization vs compute.
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
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import (
    build_int_pipeline, decode_full_quant, device_plan, int_forward,
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
fn_full, _ = build_int_pipeline(model, engine="auto")

images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))


def p0(imgs):
    return quantize_input(imgs, 8, out_dtype=jnp.bfloat16)


def p1(imgs):
    xq = quantize_input(imgs, 8, out_dtype=jnp.bfloat16)
    outs = int_forward(model, plan, xq, engine="auto")
    return outs["p3_box"]


def p2(imgs):
    xq = quantize_input(imgs, 8, out_dtype=jnp.bfloat16)
    outs = int_forward(model, plan, xq, engine="auto")
    dbox, conf, cid = decode_full_quant(model, plan, outs,
                                        sigmoid_cls=False, reduce_cls=True)
    return dbox, conf, cid


def p2b(imgs):
    dbox, conf, cid = p2(imgs)
    # scalar probes only: boundary materialization removed
    return (dbox[0, 0, 0] + conf[0, 0] + cid[0, 0]).reshape(1)


slope_time("P0 quantize           ", p0, images)
slope_time("P1 +forward(auto)     ", p1, images)
slope_time("P2 +decode(reduce_cls)", p2, images)
slope_time("P2b +decode scalar-out", p2b, images)
slope_time("P3 full e2e (bench fn)", fn_full, images)
print("done", flush=True)
