"""Round-3 hybrid slab/XLA sweep: the full slab engine is bit-exact but
loses whole-forward (39.1 vs 26.6 ms, r3_slab.log) even though the
banded kernel beats the XLA layer at C16@160 (0.59 vs 0.755). Restrict
the slab region by input spatial size (build_slab_plan allow=) to find
where the kernel actually wins; everything filtered bails to the XLA
path with an unpack at the boundary.

Levels in yolov8n@640 (conv input h): 640, 320, 160, 80, 40, 20 (the
20s and wide layers already bail).
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
    device_plan, int_forward, quantize_input,
)
from alpha_yolo_quant_tpu.runtime.slabforward import build_slab_plan

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8n", k=8, image_size=640, full_quant=True)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)

xq = jax.device_put(np.asarray(quantize_input(
    jnp.asarray(rng.uniform(0, 1, (B, 3, 640, 640)).astype(np.float32)),
    8)))

VARIANTS = [
    ("h>=320 (stem only)   ", lambda n, c, h, w: h >= 320),
    ("h>=160 (stem+P2)     ", lambda n, c, h, w: h >= 160),
    ("h>=80                ", lambda n, c, h, w: h >= 80),
    ("80<=h<=160 (no stem) ", lambda n, c, h, w: 80 <= h <= 160),
]

for name, pred in VARIANTS:
    pl = device_plan(model, pallas=True)
    sp = build_slab_plan(model, allow=pred)
    pl["slabplan"] = sp
    print(f"{name}: {len(sp.nodes)} slab nodes", flush=True)

    def fwd(x, _pl=pl):
        return int_forward(model, _pl, x, engine="packed",
                           head_requant=True)

    slope_time("fwd " + name, fwd, xq)
print("done", flush=True)
