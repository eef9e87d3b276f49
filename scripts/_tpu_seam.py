"""Composition-seam bisection at B=128: forward+decode | decode+NMS |
full pipeline, vs the individual stage times (stages2.log:
quant 1.9 fwd 27.1 dec 2.6 nms 15.8 = 47.4; e2e bench 54.3)."""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from _slope import slope_time  # noqa: E402

from alpha_yolo_quant_tpu.config import QuantConfig  # noqa: E402
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph  # noqa
from alpha_yolo_quant_tpu.models.params import init_params  # noqa: E402
from alpha_yolo_quant_tpu.quantize.calibrate import (  # noqa: E402
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import (  # noqa: E402
    build_quantized_model,
)
from alpha_yolo_quant_tpu.runtime.interpreter import (  # noqa: E402
    build_int_pipeline, cls_int_conf_threshold, decode_full_quant,
    device_plan, int_forward, quantize_input,
)
from alpha_yolo_quant_tpu.postprocess.nms import (  # noqa: E402
    non_max_suppression, q_nms_params,
)

B = 128
print("backend:", jax.default_backend(), flush=True)

cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
calib = np.random.default_rng(1).uniform(
    0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
plan = device_plan(model, pallas=False)

imgs = jax.device_put(np.random.default_rng(0).uniform(
    0, 1, (B, 3, 640, 640)).astype(np.float32))
xq = jax.block_until_ready(jax.jit(lambda t: quantize_input(t, 8))(imgs))
outs = {k: jax.block_until_ready(v) for k, v in jax.jit(
    lambda t: int_forward(model, plan, t, engine="auto"))(xq).items()}

nms_params = dataclasses.replace(
    q_nms_params(model.head.anchor_scale),
    conf_thres=cls_int_conf_threshold(model))
score_map = plan["head"]["cls_sig_lut"].apply

fn, _ = build_int_pipeline(model, engine="auto")


def fwd_dec(t):
    o = int_forward(model, plan, t, engine="auto")
    return decode_full_quant(model, plan, o, sigmoid_cls=False)


def dec_nms(o):
    p = decode_full_quant(model, plan, o, sigmoid_cls=False)
    return non_max_suppression(p, nms_params, score_map=score_map)[0]


slope_time("fwd+decode     ", fwd_dec, xq)
slope_time("decode+NMS     ", dec_nms, outs)
slope_time("full pipeline  ", fn, imgs)
print("done", flush=True)
