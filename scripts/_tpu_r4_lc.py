"""Round-4 probe #6: can a layout constraint on the quantize output
eliminate copy.313 (1.16 ms — the bf16[128,3,640,640] relayout between
the quantize fusion and the stem conv, which wants {0,1,3,2:T(4,128)})?

Variants, e2e B=128 slope-timed:
  L0  stock pipeline (baseline, ~32.1 ms)
  L1  with_layout_constraint(x_q, {0,1,3,2:T(4,128)(2,1)}) right after
      quantize_input — if XLA then emits the quantize fusion directly
      into the conv-preferred layout, the copy disappears; if it just
      moves the copy, no change.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.layout import Format, Layout, with_layout_constraint

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
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)

images = rng.uniform(0, 1, (B, 3, 640, 640)).astype(np.float32)
img_dev = jax.device_put(images)

fn0, plan = build_int_pipeline(model, engine="auto")
slope_time("L0 e2e stock", fn0, img_dev)

LC = Layout(major_to_minor=(0, 1, 3, 2), tiling=((4, 128), (2, 1)))

orig_q = interp.quantize_input


def q_lc(x, k, **kw):
    q = orig_q(x, k, **kw)
    return with_layout_constraint(q, LC)


interp.quantize_input = q_lc
fn1, _ = build_int_pipeline(model, engine="auto")
try:
    slope_time("L1 e2e layout-constrained quantize", fn1, img_dev)
except Exception as e:
    print("L1 FAIL:", str(e)[:400], flush=True)
interp.quantize_input = orig_q
print("done", flush=True)
