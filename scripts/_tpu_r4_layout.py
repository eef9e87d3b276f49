"""Round-4 probe #5: kill the 0.8 ms input relayout copy by compiling
the pipeline with an AUTO input layout and feeding the image batch
already in XLA's preferred device layout (jax.experimental.layout).
Serving owns its input pipeline, so producing the preferred layout at
the source is legitimate — the function signature is unchanged.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.layout import Format, Layout

from _slope import slope_time
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
fn, _ = build_int_pipeline(model, engine="auto")

images = rng.uniform(0, 1, (B, 3, 640, 640)).astype(np.float32)

# baseline: default layout
img_default = jax.device_put(images)
slope_time("e2e default layout", fn, img_default)

# AUTO input layout
jfn = jax.jit(fn, in_shardings=Format(Layout.AUTO))
co = jfn.lower(jax.ShapeDtypeStruct(images.shape, jnp.float32)).compile()
fmt = co.input_formats[0][0]
print("preferred input format:", fmt, flush=True)
img_pref = jax.device_put(images, fmt)
slope_time("e2e AUTO layout", jfn, img_pref)
print("done", flush=True)
