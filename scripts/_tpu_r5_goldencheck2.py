"""Round-5: ON-TPU golden parity across the advertised configs.

Same gate as _tpu_r5_goldencheck.py (all six head accumulator edges of
the auto engine vs the host int64 oracle, full 640), swept over the
other benchmarked configs: yolov8n K=4 and K=6, yolov8s K=8.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.golden import golden_forward
from alpha_yolo_quant_tpu.runtime.interpreter import (
    device_plan, int_forward, quantize_input,
)

print("backend:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(7)
img = rng.uniform(0, 1, (1, 3, 640, 640)).astype(np.float32)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)

for model_name, k in (("yolov8n", 4), ("yolov8n", 6), ("yolov8s", 8)):
    cfg = QuantConfig(model=model_name, k=k, full_quant=True,
                      image_size=640)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=0)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max", k)
    model = build_quantized_model(graph, params, max_a, cfg)
    env_g = golden_forward(model, img)
    plan = device_plan(model)

    def fwd(x, model=model, plan=plan, k=k):
        x_q = quantize_input(x, k, out_dtype=jnp.bfloat16)
        return int_forward(model, plan, x_q, engine="auto")

    outs = jax.device_get(jax.jit(fwd)(img))
    bad = 0
    for role, edge in model.graph.outputs.items():
        ok = bool((np.asarray(env_g[edge])
                   == np.asarray(outs[role]).astype(np.int64)).all())
        bad += 0 if ok else 1
    print(f"{model_name} k={k}: "
          f"{'ALL 6 HEAD EDGES BIT-EXACT' if bad == 0 else f'{bad} DIFFER'}",
          flush=True)
    assert bad == 0
print("done", flush=True)
