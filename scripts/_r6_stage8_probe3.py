"""Root-cause the first stage_8 divergence (C2F_15_conv_1): recompute the
divergent element's conv accumulator + requant chain in (a) exact int64,
(b) torch f32 exactly as stage_8 does, on the SAME (exact) input edge.

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python scripts/_r6_stage8_probe3.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import torch

import reference_stage6 as rs6

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.golden import golden_forward

cfg = QuantConfig(model="yolov8n", k=8, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=3)
img = rs6.golden_image()
max_a = reduce_stats(collect_stats(graph, params, [img]), "max")
model = build_quantized_model(graph, params, max_a, cfg)

# exact env (per-image amax quant: amax of the golden image)
a = np.abs(img).max()
q = np.round(np.clip(img, -a, a).astype(np.float32)
             * np.float32(127.0 / a))
env = golden_forward(model, q, quantize=False)

node = next(n for n in graph.convs() if n.name == "C2F_15_conv_1")
c = model.convs[node.name]
x = np.int64(env[node.src])          # exact input edge (proven equal)
w = np.int64(c.w_q)
b = np.int64(c.b_q)

# exact acc (1x1 conv)
acc_i = np.einsum("bchw,oc->bohw", x, w[:, :, 0, 0]) + b.reshape(1, -1, 1, 1)

# torch f32 acc exactly as stage_8's nn.Conv2d
conv = torch.nn.Conv2d(x.shape[1], w.shape[0], 1, bias=True)
with torch.no_grad():
    conv.weight.copy_(torch.from_numpy(np.float32(w)))
    conv.bias.copy_(torch.from_numpy(np.float32(b)))
    acc_t = conv(torch.from_numpy(np.float32(x)))
acc_tn = acc_t.numpy().astype(np.int64)
nd = int((acc_i != acc_tn).sum())
print("acc diffs int64 vs torch-f32 conv:", nd, "of", acc_i.size,
      "max |acc|:", np.abs(acc_i).max())
if nd:
    idx = np.argwhere(acc_i != acc_tn)[0]
    print(" first idx", idx, "exact", acc_i[tuple(idx)],
          "torch", acc_tn[tuple(idx)])

# now the requant chain on the exact acc, torch-f32 twin vs int64
from alpha_yolo_quant_tpu.quantize.primitives import requantize_np

sig = model.sig_lut


def silu_exact(acc):
    dom = requantize_np(acc, None, None, 8, r=c.r1.reshape(1, -1, 1, 1),
                        s=c.s1.reshape(1, -1, 1, 1)) \
        if hasattr(requantize_np, "r") else None
    return dom


# do it with the model's stored r/s directly (int64 semantics)
def req_i64(v, r, s):
    r = np.int64(r).reshape(1, -1, 1, 1)
    s = np.int64(s).reshape(1, -1, 1, 1)
    q = (r * np.int64(v)) >> (s - 1)
    q = (q >> 1) + (q & 1)
    return np.clip(q, -127, 127)


def req_torch(v, r, s):
    r = torch.from_numpy(np.float32(r)).reshape(1, -1, 1, 1)
    s = torch.from_numpy(np.float32(s)).reshape(1, -1, 1, 1)
    arr_q = r * torch.from_numpy(np.float32(v))
    arr_q = arr_q // (2 ** (s - 1))
    arr_q = arr_q // 2 + arr_q % 2
    return torch.clip(arr_q, -127, 127).numpy().astype(np.int64)


dom_i = req_i64(acc_i, c.r1, c.s1)
dom_t = req_torch(acc_i, c.r1, c.s1)
nd2 = int((dom_i != dom_t).sum())
print("requant1 diffs (same exact acc) int64 vs torch-f32:", nd2)
if nd2:
    idx = np.argwhere(dom_i != dom_t)[0]
    v = acc_i[tuple(idx)]
    ch = idx[1]
    print(" first idx", idx, "acc", v, "r1", c.r1.reshape(-1)[ch],
          "s1", c.s1.reshape(-1)[ch], "exact", dom_i[tuple(idx)],
          "torch", dom_t[tuple(idx)])
    prod = np.int64(c.r1.reshape(-1)[ch]) * v
    print(" exact product", prod, "f32 product",
          np.float32(c.r1.reshape(-1)[ch]) * np.float32(v))
