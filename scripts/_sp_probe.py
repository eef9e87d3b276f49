"""Probe: which forward paths survive GSPMD height-sharding on CPU.

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python scripts/_sp_probe.py
"""
import os
import sys

# append (not setdefault): a pre-set XLA_FLAGS would otherwise silently
# drop the device-count flag and make_mesh(4) fails single-device
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.models.forward import forward_float
from alpha_yolo_quant_tpu.models.head import decode_float
from alpha_yolo_quant_tpu.parallel.mesh import make_mesh, spatial_parallel_fn
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline

RNG = np.random.default_rng(17)


def try_one(name, fn, imgs, mesh):
    try:
        sp = spatial_parallel_fn(fn, mesh)
        got = np.asarray(sp(imgs))
        want = np.asarray(fn(imgs))
        eq = np.array_equal(got, want)
        close = np.allclose(got, want, rtol=1e-5, atol=1e-5)
        md = float(np.max(np.abs(got.astype(np.float64)
                                 - want.astype(np.float64))))
        print(f"{name}: OK bitwise={eq} close={close} maxdiff={md:.3g}")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")


for size, nsp in ((64, 2), (128, 2), (128, 4)):
    cfg = QuantConfig(model="yolov8n", image_size=size)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=0)
    imgs = RNG.uniform(0, 1, (2, 3, size, size)).astype(np.float32)
    mesh = make_mesh(nsp, axis="sp")

    def float_fn(x, graph=graph, params=params):
        outs, _ = forward_float(graph, params, x)
        return decode_float(outs, params["dfl"]["w"])

    try_one(f"float s={size} sp={nsp}", float_fn, imgs, mesh)

    calib = RNG.uniform(0, 1, (2, 3, size, size)).astype(np.float32)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
    model = build_quantized_model(graph, params, max_a, cfg)
    for eng in ("xla", "auto"):
        fn, _ = build_int_pipeline(model, dfl_w_float=params["dfl"]["w"],
                                   with_nms=False, engine=eng)
        try_one(f"int_{eng} s={size} sp={nsp}", fn, imgs, mesh)
