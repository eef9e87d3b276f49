"""Localize stage_8-vs-ours forward divergence: wrap the reference
module's silu()/requantize() to record every intermediate, run our
int_forward(keep_env) on the per-image-quantized input, compare in
execution order.

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python scripts/_r6_stage8_probe2.py
"""
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import reference_stage6 as rs6
import reference_stage8 as rs8

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import ConvNode, build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model

cfg = QuantConfig(model="yolov8n", k=8, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=3)
img = rs6.golden_image()
max_a = reduce_stats(collect_stats(graph, params, [img]), "max")
model = build_quantized_model(graph, params, max_a, cfg)

tmp = tempfile.mkdtemp(prefix="stage8probe2_")
rs8.write_runtime_inputs(tmp, model, params, k=8, full=False)
rs8.run_stage(tmp, "stage_7", k=8)
m8 = rs8.run_stage(tmp, "stage_8_torch", k=8, golden_img=img)

import torch

rec = []
orig_silu = m8.silu


def silu_rec(x, scale_x, a_input):
    out, s = orig_silu(x, scale_x, a_input)
    rec.append(out.detach().numpy().copy())
    return out, s


m8.silu = silu_rec
with torch.no_grad():
    m8.model(torch.from_numpy(img.copy()))
m8.silu = orig_silu
print("reference silu calls:", len(rec))

# ours
import jax.numpy as jnp

from alpha_yolo_quant_tpu.runtime.interpreter import (
    device_plan, int_forward, quantize_input,
)

xq = quantize_input(jnp.asarray(img), 8, per_image_amax=True)
env = int_forward(model, device_plan(model), xq, keep_env=True)
env = env["__env__"] if "__env__" in env else env

silu_edges = [n for n in graph.nodes
              if isinstance(n, ConvNode) and n.silu]
print("our silu convs:", len(silu_edges))
for i, node in enumerate(silu_edges):
    if i >= len(rec):
        break
    ours = np.asarray(env[node.dst], np.int64)
    ref = rec[i].astype(np.int64)
    if ours.shape != ref.shape:
        print(f"{i} {node.name}: SHAPE {ours.shape} vs {ref.shape}")
        continue
    nd = int((ours != ref).sum())
    if nd:
        d = np.abs(ours - ref)
        print(f"{i} {node.name}: ndiff={nd}/{ref.size} maxd={d.max()}")
    else:
        print(f"{i} {node.name}: exact")
