"""Round-2 component breakdown at batch 128 with dependency-chained timing
(the axon executor reports buffers ready lazily — chain every iteration
through a data dependency and fetch a scalar)."""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import time

import numpy as np
import jax
import jax.numpy as jnp

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, \
    reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import (
    decode_full_quant, device_plan, int_forward, quantize_input,
)
from alpha_yolo_quant_tpu.postprocess.nms import (
    non_max_suppression, q_nms_params,
)

B = 128
ITERS = 8
cfg = QuantConfig(k=8, full_quant=True, image_size=640)
g = build_yolov8_graph(cfg)
p = init_params(g, seed=0)
calib = np.random.default_rng(1).uniform(0, 1, (1, 3, 640, 640)).astype(
    np.float32)
max_a = reduce_stats(collect_stats(g, p, [calib]), "max")
qm = build_quantized_model(g, p, max_a, cfg)
plan = device_plan(qm)
nmsp = q_nms_params(qm.head.anchor_scale)


def chained(name, fn, probe, x0, iters=ITERS):
    """fn: x -> out; probe(out) -> scalar float; x0 perturbed per iter via
    the probe value so iterations are data-dependent."""
    @jax.jit
    def loop(x, n):
        def body(i, carry):
            x, acc = carry
            out = fn(x)
            s = probe(out)
            x = x + (s * 0.0).astype(x.dtype)
            return x, acc + s
        return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))[1]

    float(loop(x0, 2))
    t0 = time.perf_counter()
    float(loop(x0, iters))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1000:.2f} ms  ({B / dt:.0f} img/s)", flush=True)
    return dt


x = jnp.asarray(np.random.default_rng(2).uniform(
    0, 1, (B, 3, 640, 640)).astype(np.float32))
xq = quantize_input(x, 8)
xq = jax.block_until_ready(xq)

chained("quantize_input", lambda a: quantize_input(a, 8),
        lambda o: o[0, 0, 0, 0].astype(jnp.float32), x)

fwd = lambda a: int_forward(qm, plan, a, engine="auto")  # noqa: E731
probe_f = lambda o: o["p3_box"][0, 0, 0, 0].astype(jnp.float32)  # noqa
chained("int_forward(auto)", fwd, probe_f, xq)
outs = jax.block_until_ready(jax.jit(fwd)(xq))

n_det_probe = lambda o: o[0][0, 0, 0]  # noqa: E731
dec = lambda o: decode_full_quant(qm, plan, o)  # noqa: E731
# decode takes a dict; chain via p3_box perturbation
p3 = outs["p3_box"]


def dec_fn(t):
    o2 = dict(outs)
    o2["p3_box"] = t
    return dec(o2)


chained("decode_full", dec_fn, lambda o: o[0, 0, 0], p3)
preds = jax.block_until_ready(jax.jit(dec)(outs))

chained("q_nms", lambda pr: non_max_suppression(pr, nmsp),
        lambda o: o[0][0, 0, 0], preds)

# conf-threshold survivor stats on this data (NMS cost driver)
cls = np.asarray(preds[:, 4:, :])
conf = cls.max(axis=1)
print("survivors>8192 per image: mean",
      float((conf > 8192).sum(1).mean()),
      "max", int((conf > 8192).sum(1).max()), flush=True)

full = lambda a: non_max_suppression(  # noqa: E731
    dec(int_forward(qm, plan, quantize_input(a, 8), engine="auto")), nmsp)
chained("full e2e", full, lambda o: o[0][0, 0, 0], x)
print("done", flush=True)
