"""r6: coalesced B=64 serving protocol on REAL TPU (VERDICT r3 #3).

Two queued 64-image requests ride one native B=128 step via
serving.coalesced_fn — the robust form of the BASELINE's literal
batch-64 config (pad_batch_to=128 alone only reaches ~2,005 img/s
because half the computed rows are padding; coalescing makes every row
a real image). Asserts on-TPU bitwise parity of each request's
detections vs the jitted per-request run, then slope-times the step
(carry into BOTH request inputs — trap #6).
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
from alpha_yolo_quant_tpu.serving import coalesced_fn  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
calib = np.random.default_rng(1).uniform(
    0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
qmodel = build_quantized_model(graph, params, max_a, cfg)
fn, _ = build_int_pipeline(qmodel, engine="auto")
step = coalesced_fn(fn, 2)

rng = np.random.default_rng(0)
a = rng.uniform(0, 1, (64, 3, 640, 640)).astype(np.float32)
b = rng.uniform(0, 1, (64, 3, 640, 640)).astype(np.float32)

# ---- on-TPU bitwise parity: coalesced vs per-request (jit vs jit) ----
jstep = jax.jit(step)
(det_a, n_a), (det_b, n_b) = jax.tree_util.tree_map(
    np.asarray, jstep(a, b))
# per-request reference runs the PADDED serving program (the shipped
# B=64 contract, bit-exact vs native by r5_padcheck) — one extra
# compile instead of the pathological 64-native program
fn_pad, _ = build_int_pipeline(qmodel, engine="auto", pad_batch_to=128)
jref = jax.jit(fn_pad)
want_a = jax.tree_util.tree_map(np.asarray, jref(a))
want_b = jax.tree_util.tree_map(np.asarray, jref(b))
assert np.array_equal(det_a, want_a[0]) and np.array_equal(
    n_a, want_a[1]), "request A diverges"
assert np.array_equal(det_b, want_b[0]) and np.array_equal(
    n_b, want_b[1]), "request B diverges"
print("parity ok: coalesced == per-request (bitwise) on "
      f"{jax.default_backend()}", flush=True)

# ---- slope-timed throughput ----
da, db = jax.device_put(a), jax.device_put(b)
dt = slope_time("coalesced 2x64", lambda xs: step(*xs), (da, db),
                carry_all=True)
print(f"coalesced 2x64: {128/dt:.1f} img/s total "
      f"({64/dt:.1f} effective per 64-request)", flush=True)

# reference point in the same session: the padded single-64 contract
dt_pad = slope_time("pad64->128 single", fn_pad, da)
print(f"pad64: {64/dt_pad:.1f} img/s", flush=True)
