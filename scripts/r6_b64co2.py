"""r6: coalescing seam comparison on REAL TPU.

v0 native B=128 single buffer (harness sanity — expect ~31.7 ms)
v1 f32-level coalescing (serving.coalesced_fn) — measured 37.3 ms in
   r6_b64co.log: the concatenated f32 batch materializes + two carries
v2 pipeline-level coalescing (build_int_pipeline(coalesce_requests=2)):
   per-request quantize, bf16-level concat — the request seam never
   touches a concatenated f32 batch.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import numpy as np
import jax

sys.path.insert(0, "/root/repo/scripts")
from _slope import slope_time  # noqa: E402

from alpha_yolo_quant_tpu.config import QuantConfig  # noqa: E402
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph  # noqa: E402
from alpha_yolo_quant_tpu.models.params import init_params  # noqa: E402
from alpha_yolo_quant_tpu.quantize.calibrate import (  # noqa: E402
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import (  # noqa: E402
    build_quantized_model,
)
from alpha_yolo_quant_tpu.runtime.interpreter import (  # noqa: E402
    build_int_pipeline,
)

print("backend:", jax.default_backend(), flush=True)

cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
calib = np.random.default_rng(1).uniform(
    0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
qmodel = build_quantized_model(graph, params, max_a, cfg)

rng = np.random.default_rng(0)
a = jax.device_put(rng.uniform(0, 1, (64, 3, 640, 640)).astype(np.float32))
b = jax.device_put(rng.uniform(0, 1, (64, 3, 640, 640)).astype(np.float32))
x128 = jax.device_put(rng.uniform(
    0, 1, (128, 3, 640, 640)).astype(np.float32))

fn, _ = build_int_pipeline(qmodel, engine="auto")
dt0 = slope_time("v0 native 128", fn, x128)
print(f"v0: {128/dt0:.1f} img/s", flush=True)

fn_co, _ = build_int_pipeline(qmodel, engine="auto", coalesce_requests=2)

# bitwise parity of the new seam on TPU vs the per-request padded runs
fn_pad, _ = build_int_pipeline(qmodel, engine="auto", pad_batch_to=128)
jref = jax.jit(fn_pad)
(det_a, n_a), (det_b, n_b) = jax.tree_util.tree_map(
    np.asarray, jax.jit(fn_co)(a, b))
wa = jax.tree_util.tree_map(np.asarray, jref(a))
wb = jax.tree_util.tree_map(np.asarray, jref(b))
assert np.array_equal(det_a, wa[0]) and np.array_equal(n_a, wa[1])
assert np.array_equal(det_b, wb[0]) and np.array_equal(n_b, wb[1])
print("v2 parity ok (bitwise, on-TPU)", flush=True)

dt2 = slope_time("v2 coalesce_requests=2", lambda xs: fn_co(*xs), (a, b),
                 carry_all=True)
print(f"v2: {128/dt2:.1f} img/s total ({64/dt2:.1f} per 64-request)",
      flush=True)
