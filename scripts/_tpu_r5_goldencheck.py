"""Round-5: ON-TPU bit-exactness of the AUTO engine vs the numpy int64
golden oracle.

The CPU suite proves interpreter == golden for every engine, but
keep_env (the per-edge comparison mode) disables the auto flavor, and
CPU does not exercise the MXU bf16 convs or the hardware tanh/exp LUT
cores with their TPU-validated corrections. This probe runs the REAL
flagship path at full 640 resolution on the TPU and compares all six
head accumulator edges (through which every backbone/neck/head
computation flows) against the host int64 oracle, bit for bit.
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

cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(7)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)

img = rng.uniform(0, 1, (1, 3, 640, 640)).astype(np.float32)
print("golden (host int64) forward ...", flush=True)
env_g = golden_forward(model, img)
print("golden done", flush=True)

plan = device_plan(model)


def fwd(x):
    x_q = quantize_input(x, 8, out_dtype=jnp.bfloat16)
    return int_forward(model, plan, x_q, engine="auto")


outs = jax.device_get(jax.jit(fwd)(img))
bad = 0
for role, edge in model.graph.outputs.items():
    g = np.asarray(env_g[edge])
    t = np.asarray(outs[role]).astype(np.int64)
    ok = bool((g == t).all())
    nd = int((g != t).sum())
    print(f"  {role} ({edge}): bitwise equal={ok} "
          f"shape={t.shape} ndiff={nd}", flush=True)
    bad += 0 if ok else 1
assert bad == 0, f"{bad} head edges differ"
print("ALL SIX HEAD EDGES BIT-EXACT ON TPU (auto engine, 640)",
      flush=True)
