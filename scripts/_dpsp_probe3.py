"""Probe 3: partial-manual shard_map composition for dp x sp.

Outer shard_map manual over 'dp' (bitwise-trivial batch split), GSPMD
auto over 'sp' only (the proven-bitwise pure-sp regime).

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/_dpsp_probe3.py
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

jax.config.update("jax_platforms", "cpu")

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.parallel.mesh import make_mesh_2d
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline

RNG = np.random.default_rng(17)
size = 64
cfg = QuantConfig(model="yolov8n", image_size=size, full_quant=True)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
calib = RNG.uniform(0, 1, (2, 3, size, size)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
fn, _ = build_int_pipeline(model, dfl_w_float=params["dfl"]["w"],
                           with_nms=False, engine="xla")
imgs = RNG.uniform(0, 1, (4, 3, size, size)).astype(np.float32)
want = np.asarray(jax.jit(fn)(imgs))


def check(name, thunk):
    try:
        got = np.asarray(thunk())
        eq = np.array_equal(got, want)
        d = float(np.max(np.abs(got.astype(np.float64) -
                                want.astype(np.float64))))
        print(f"{name}: bitwise={eq} maxdiff={d:.3g}")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


mesh2 = make_mesh_2d(2, 2, axes=("dp", "sp"))


def body(x):
    # inside: manual over dp (local batch), auto over sp
    x = jax.lax.with_sharding_constraint(x, P(None, None, "sp", None))
    out = fn(x)
    return jax.lax.with_sharding_constraint(out, P(None, None, None))


f1 = jax.jit(shard_map(body, mesh=mesh2,
                       in_specs=(P("dp", None, "sp", None),),
                       out_specs=P("dp"), axis_names={"dp"}))
check("e) shard_map(dp manual) + sp auto, specs mention sp",
      lambda: f1(imgs))

f2 = jax.jit(shard_map(body, mesh=mesh2,
                       in_specs=(P("dp"),),
                       out_specs=P("dp"), axis_names={"dp"}),
             in_shardings=(NamedSharding(mesh2, P("dp", None, "sp",
                                                  None)),))
check("f) same but sp sharding only via jit in_shardings",
      lambda: f2(imgs))
