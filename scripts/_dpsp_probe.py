"""Probe: dp x sp combined-mesh parity vs unsharded (which engines/sizes
diverge, and by how much).

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/_dpsp_probe.py
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

jax.config.update("jax_platforms", "cpu")

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.parallel.mesh import (
    dp_sp_parallel_fn, make_mesh_2d,
)
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline

RNG = np.random.default_rng(17)

for size, full_quant, engine in ((64, True, "xla"), (64, True, "auto"),
                                 (64, False, "xla")):
    cfg = QuantConfig(model="yolov8n", image_size=size,
                      full_quant=full_quant)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=0)
    calib = RNG.uniform(0, 1, (2, 3, size, size)).astype(np.float32)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
    model = build_quantized_model(graph, params, max_a, cfg)
    fn, _ = build_int_pipeline(model, dfl_w_float=params["dfl"]["w"],
                               with_nms=False, engine=engine)
    mesh = make_mesh_2d(2, 2, axes=("dp", "sp"))
    imgs = RNG.uniform(0, 1, (4, 3, size, size)).astype(np.float32)
    got = np.asarray(dp_sp_parallel_fn(fn, mesh)(imgs))
    want = np.asarray(jax.jit(fn)(imgs))
    eq = np.array_equal(got, want)
    d = np.abs(got.astype(np.float64) - want.astype(np.float64))
    n_bad = int((d > 0).sum())
    print(f"s={size} fq={full_quant} eng={engine}: bitwise={eq} "
          f"maxdiff={float(d.max()):.3g} n_diff={n_bad}/{d.size} "
          f"shape={got.shape}")
    if not eq:
        idx = np.unravel_index(np.argmax(d), d.shape)
        print(f"  worst at {idx}: got={got[idx]!r} want={want[idx]!r}")
        # which batch rows differ?
        rows = sorted(set(np.argwhere(d > 0)[:, 0].tolist()))
        print(f"  differing batch rows: {rows}")
