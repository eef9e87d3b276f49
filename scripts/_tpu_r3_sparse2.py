"""Bisect the sparse serving decode (r3_sparse.log: 43.7 ms e2e vs
dense 42.2): which stage eats the 8.4x DFL saving?

  C1 fwd + cls conf/cid reductions
  C2 C1 + packed-key sort (B,8400) + slice
  C3 C2 + box-bin gather, lane-dim (take_along_axis axis=2 on (B,64,N))
  C3b C2 + box-bin gather, row-major (transpose to (B,N,64) int8 first,
      gather contiguous 64-byte rows)
  C4 C3b + DFL decode on (B,1000)
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

from _slope import slope_time
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import (
    device_plan, int_forward, quantize_input, requantize_i32,
)

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
M = 1000
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
plan = device_plan(model)

images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))


def fwd(imgs):
    xq = quantize_input(imgs, 8, out_dtype=jnp.bfloat16)
    return int_forward(model, plan, xq, engine="auto", head_requant=True)


def conf_cid(outs):
    confs, cids, boxes = [], [], []
    for level in ("p3", "p4", "p5"):
        cq = outs[f"{level}_cls"].astype(jnp.int32)
        b = cq.shape[0]
        confs.append(jnp.max(cq, axis=1).reshape(b, -1))
        cids.append(jnp.argmax(cq, axis=1).reshape(b, -1)
                    .astype(jnp.float32))
        boxes.append(outs[f"{level}_box"].reshape(b, 64, -1))
    return (jnp.concatenate(confs, 1), jnp.concatenate(cids, 1),
            jnp.concatenate(boxes, 2))


def sortk(conf, cid):
    n = conf.shape[1]
    key = ((conf + (1 << 15)) << 14) \
        | (n - 1 - jnp.arange(n, dtype=jnp.int32))[None]
    srt = jax.lax.sort((-key, cid), num_keys=1, dimension=1)
    skey = -srt[0][:, :M]
    idx = (n - 1) - (skey & ((1 << 14) - 1))
    return skey, srt[1][:, :M], idx


def c1(imgs):
    conf, cid, box = conf_cid(fwd(imgs))
    return conf, cid


def c2(imgs):
    conf, cid, box = conf_cid(fwd(imgs))
    return sortk(conf, cid)


def c3(imgs):
    conf, cid, box = conf_cid(fwd(imgs))
    skey, cid_s, idx = sortk(conf, cid)
    g = jnp.take_along_axis(box, idx[:, None, :], axis=2)
    return skey, cid_s, g


def c3b(imgs):
    conf, cid, box = conf_cid(fwd(imgs))
    skey, cid_s, idx = sortk(conf, cid)
    rows = box.transpose(0, 2, 1)
    g = jnp.take_along_axis(rows, idx[:, :, None], axis=1)
    return skey, cid_s, g


def c4(imgs):
    conf, cid, box = conf_cid(fwd(imgs))
    skey, cid_s, idx = sortk(conf, cid)
    rows = box.transpose(0, 2, 1)
    g = jnp.take_along_axis(rows, idx[:, :, None], axis=1)  # (b,M,64)
    bins = g.astype(jnp.int32).transpose(0, 2, 1).reshape(-1, 4, 16, M)
    hp = plan["head"]
    y = bins - jnp.max(bins, axis=2, keepdims=True)
    e = hp["exp_lut"].apply(y)
    ssum = jnp.maximum(jnp.sum(e, axis=2, keepdims=True), 1)
    ne = 127 * e
    q0 = jnp.floor(ne.astype(jnp.float32) /
                   ssum.astype(jnp.float32)).astype(jnp.int32)
    r = ne - q0 * ssum
    p = q0 + (r >= ssum).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    acc = jnp.einsum("bcrn,r->bcn", p.astype(jnp.float32),
                     hp["dfl_w"].astype(jnp.float32),
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    h = model.head
    dfl_q = requantize_i32(acc, jnp.int32(h.dfl_r), jnp.int32(h.dfl_s),
                           2 ** 15 - 1)
    return skey, cid_s, dfl_q


slope_time("C1 fwd+conf/cid      ", c1, images)
slope_time("C2 +key sort         ", c2, images)
slope_time("C3 +gather lane-dim  ", c3, images)
slope_time("C3b +gather row-major", c3b, images)
slope_time("C4 +DFL on top-k     ", c4, images)
print("done", flush=True)
