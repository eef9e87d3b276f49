"""A/B probe: sibling-conv merge (head stem pairs) on/off, e2e + forward.

Run detached:  python -u scripts/_tpu_r5_merge.py > /tmp/r5_merge.log 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from alpha_yolo_quant_tpu.config import QuantConfig  # noqa: E402
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph  # noqa: E402
from alpha_yolo_quant_tpu.models.params import init_params  # noqa: E402
from alpha_yolo_quant_tpu.quantize.calibrate import (  # noqa: E402
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import (  # noqa: E402
    build_quantized_model,
)
from alpha_yolo_quant_tpu.runtime import interpreter as I  # noqa: E402
from scripts._slope import slope_time  # noqa: E402

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
calib = np.random.default_rng(1).uniform(0, 1, (2, 3, 640, 640)).astype(
    np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
qmodel = build_quantized_model(graph, params, max_a, cfg)

images = jax.device_put(np.random.default_rng(0).uniform(
    0, 1, (B, 3, 640, 640)).astype(np.float32))

for merge in (False, True):
    I.AUTO_MERGE_SIBLINGS = merge
    fn, plan = I.build_int_pipeline(qmodel, engine="auto")
    slope_time(f"e2e merge={merge}", fn, images)

    def fwd(x):
        xq = I.quantize_input(x, 8, out_dtype=jnp.bfloat16)
        return I.int_forward(qmodel, plan, xq, engine="auto",
                             head_requant=True)

    slope_time(f"quant+fwd merge={merge}", fwd, images)
print("done", flush=True)
