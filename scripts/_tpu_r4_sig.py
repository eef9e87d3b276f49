"""Round-4 probe #3: sigma-core variants inside the dieted epilogue, at
the C64@80 element count. Each variant's 255-point domain is validated
on-device (corrections counted) — any variant ships only through the
lutfast corrections machinery, so exactness is by construction.

  S0  current: d = x/scale; clip(round(sigmoid(d)*127))
  S1  d = x * (1/scale)  (f32 divide -> multiply; rounding may differ ->
      corrections)
  S2  S1 without the clip (sigmoid in [0,1] -> round(·*127) in [0,127])
  S3  S2 with sigmoid written as 0.5 + 0.5*tanh(d/2)
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

from _slope import slope_time
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph, ConvNode
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.ops.intmath import (
    requantize_i32_bigshift_folded, requantize_i32_direct,
)

print("backend:", jax.devices()[0].platform, flush=True)

cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
sig = model.sig_lut
SIG_SCALE = np.float32((2 ** (sig.bits - 1) - 1) / sig.max_val)
INV_S = np.float32(1.0) / SIG_SCALE
SIG_QMAX = np.float32(2 ** (sig.bits - 1) - 1)
QMAX = cfg.qmax
dom_all = np.arange(-QMAX, QMAX + 1, dtype=np.int64)
table = np.asarray(sig.values, np.int64)[dom_all - sig.lo]


def s0(dom):
    d = dom.astype(jnp.float32) / SIG_SCALE
    return jnp.clip(jnp.round(jax.nn.sigmoid(d) * SIG_QMAX),
                    -SIG_QMAX, SIG_QMAX).astype(jnp.int32)


def s1(dom):
    d = dom.astype(jnp.float32) * INV_S
    return jnp.clip(jnp.round(jax.nn.sigmoid(d) * SIG_QMAX),
                    -SIG_QMAX, SIG_QMAX).astype(jnp.int32)


def s2(dom):
    d = dom.astype(jnp.float32) * INV_S
    return jnp.round(jax.nn.sigmoid(d) * SIG_QMAX).astype(jnp.int32)


def s3(dom):
    d = dom.astype(jnp.float32) * (INV_S * np.float32(0.5))
    s = jnp.float32(0.5) + jnp.float32(0.5) * jnp.tanh(d)
    return jnp.round(s * SIG_QMAX).astype(jnp.int32)


variants = [("S0 div+clip", s0), ("S1 mul", s1), ("S2 mul-noclip", s2),
            ("S3 tanh-noclip", s3)]
idx = jnp.arange(-QMAX, QMAX + 1, dtype=jnp.int32)
for label, fn in variants:
    nbad = int((np.asarray(jax.jit(fn)(idx)) != table).sum())
    print(f"{label}: corrections={nbad}/255", flush=True)

name = next(n.name for n in graph.nodes
            if isinstance(n, ConvNode) and (n.cin, n.cout) == (64, 64)
            and n.kernel == 3 and n.stride == 1 and n.silu)
c = model.convs[name]
co, ncols = 64, 819200
wabs = np.abs(c.w_q.reshape(co, -1)).sum(1)
src = next(n.src for n in graph.nodes
           if isinstance(n, ConvNode) and n.name == name)
bound = (wabs * model.edge_amax_int[src] + np.abs(c.b_q)).astype(np.int64)
r1 = jnp.asarray(np.asarray(c.r1, np.int32).reshape(co, 1))
s1c = jnp.asarray(np.asarray(c.s1, np.int32).reshape(co, 1))
r2 = jnp.asarray(np.asarray(c.r2, np.int32).reshape(co, 1))
s2c = jnp.asarray(np.asarray(c.s2, np.int32).reshape(co, 1))
acc_np = (rng.random((co, ncols)) * 2 - 1) * bound.reshape(co, 1)
acc = jnp.asarray(np.round(acc_np).astype(np.int32))

for label, fn in variants:
    def epi(a, fn=fn):
        dom = requantize_i32_direct(a, r1, s1c, QMAX)
        sigma = fn(dom)
        return requantize_i32_bigshift_folded(a, sigma * r2, s2c, QMAX
                                              ).astype(jnp.int8)
    slope_time(f"epi {label}", epi, acc)
print("done", flush=True)
