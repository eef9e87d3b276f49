"""Probe 2: which sharding ingredient breaks bitwise parity?

 a) dp-only via jit in_shardings on a 1-D mesh (2 dev)
 b) dp-only via jit on the 2-D (dp,sp) mesh (sp idle)
 c) sp-only via jit on the 2-D (dp,sp) mesh (dp idle)
 d) dp via shard_map wrapping a plain jitted fn (sp unused)
 e) dp shard_map outer + sp jit sharding inner (composed)

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/_dpsp_probe2.py
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
from jax.sharding import NamedSharding, PartitionSpec as P

jax.config.update("jax_platforms", "cpu")

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.parallel.mesh import make_mesh, make_mesh_2d
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


def check(name, got):
    got = np.asarray(got)
    eq = np.array_equal(got, want)
    d = float(np.max(np.abs(got.astype(np.float64) -
                            want.astype(np.float64))))
    print(f"{name}: bitwise={eq} maxdiff={d:.3g}")


mesh1 = make_mesh(2, axis="dp")
f = jax.jit(fn, in_shardings=(NamedSharding(mesh1, P("dp")),),
            out_shardings=NamedSharding(mesh1, P("dp")))
check("a) dp-only jit 1-D mesh", f(imgs))

mesh2 = make_mesh_2d(2, 2, axes=("dp", "sp"))
f = jax.jit(fn, in_shardings=(NamedSharding(mesh2, P("dp")),),
            out_shardings=NamedSharding(mesh2, P("dp")))
check("b) dp-only jit 2-D mesh", f(imgs))

f = jax.jit(fn,
            in_shardings=(NamedSharding(mesh2, P(None, None, "sp")),),
            out_shardings=NamedSharding(mesh2, P()))
check("c) sp-only jit 2-D mesh", f(imgs))

from jax import shard_map

f = jax.jit(shard_map(fn, mesh=mesh1, in_specs=(P("dp"),),
                      out_specs=P("dp")))
check("d) dp shard_map 1-D mesh", f(imgs))
