"""Round-4 probe #2: candidate op-diet formulations of the SiLU epilogue,
standalone at the C64@80 element count (52.4M), each checked bit-identical
to the exact baseline on the sampled accumulators before timing.

r4_epi.log established the epilogue is 9.6ms of the 25.7ms forward
(sigmoid block 5.5 + exact requants 4.2). Candidates:

  A0  current production epilogue (baseline; 0.495 ms in r4_epi)
  A1  rhu folded into the shift in BOTH bigshift requants:
      rhu(t >> k) == (t + 2^k) >> (k+1)   [floor-div nesting identity],
      and the low-15-bit remainder r < 2^15 <= 2^(s-1) can never carry
      the biased sum past a 2^s boundary (max offset 2^s - 2^15 + r
      <= 2^s - 1), so the fold is exact end-to-end.
  A2  A1 + req1 via the DIRECT int32 path: when the layer's true
      accumulator bound gives max_c(r1_c * bound_c) + 2^(s1_c - 1) < 2^31,
      q = (r1*acc + 2^(s1-1)) >> s1 is exact in int32 (one mul).
  A3  A2 + corrections-free polynomial sigma (deg-13 odd, rounding-aware
      iterative fit so all 255 integer dom points round identically),
      with the domain mask dropped (dom is clipped to +-qmax which is
      inside the LUT domain).
"""
import os
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
from alpha_yolo_quant_tpu.ops.intmath import requantize_i32_bigshift

print("backend:", jax.devices()[0].platform, flush=True)

SMOKE = os.environ.get("EPI_SMOKE") == "1"
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
sig = model.sig_lut
SIG_SCALE = np.float32((2 ** (sig.bits - 1) - 1) / sig.max_val)
SIG_QMAX = np.float32(2 ** (sig.bits - 1) - 1)
QMAX = cfg.qmax

# exact integer sigma table over the dom range the epilogue can produce
assert sig.lo <= -QMAX and sig.hi >= QMAX
dom_all = np.arange(-QMAX, QMAX + 1, dtype=np.int64)
table = np.asarray(sig.values, np.int64)[dom_all - sig.lo]

# ---- how many layers qualify for the small req1 path / bigshift?
n_silu = n_big = n_small1 = 0
for n in graph.nodes:
    if not (isinstance(n, ConvNode) and n.silu):
        continue
    c = model.convs[n.name]
    n_silu += 1
    n_big += bool(c.bigshift_ok)
    wabs = np.abs(c.w_q.reshape(c.w_q.shape[0], -1)).sum(1)
    bound = wabs * model.edge_amax_int[n.src] + np.abs(c.b_q)
    ok = np.all(c.r1.reshape(-1) * bound.astype(np.int64)
                + (1 << (c.s1.reshape(-1).astype(np.int64) - 1)) < 2 ** 31)
    n_small1 += bool(ok)
print(f"silu convs: {n_silu}, bigshift_ok: {n_big}, "
      f"req1-small-eligible: {n_small1}", flush=True)

# ---- probe layer
name = next(n.name for n in graph.nodes
            if isinstance(n, ConvNode) and (n.cin, n.cout) == (64, 64)
            and n.kernel == 3 and n.stride == 1 and n.silu)
c = model.convs[name]
co = 64
ncols = 8192 if SMOKE else 819200
wabs = np.abs(c.w_q.reshape(co, -1)).sum(1)
src = next(n.src for n in graph.nodes
           if isinstance(n, ConvNode) and n.name == name)
bound = (wabs * model.edge_amax_int[src] + np.abs(c.b_q)).astype(np.int64)
r1v = c.r1.reshape(-1).astype(np.int64)
s1v = c.s1.reshape(-1).astype(np.int64)
small1_ok = np.all(r1v * bound + (1 << (s1v - 1)) < 2 ** 31)
print(f"layer {name}: bigshift={c.bigshift_ok} small1_ok={small1_ok} "
      f"max r1*bound+2^(s1-1) = {(r1v*bound + (1 << (s1v-1))).max():.3g}",
      flush=True)

r1 = jnp.asarray(np.asarray(c.r1, np.int32).reshape(co, 1))
s1 = jnp.asarray(np.asarray(c.s1, np.int32).reshape(co, 1))
r2 = jnp.asarray(np.asarray(c.r2, np.int32).reshape(co, 1))
s2 = jnp.asarray(np.asarray(c.s2, np.int32).reshape(co, 1))
# folded-rhu per-channel constants
b1 = jnp.asarray((1 << (np.asarray(c.s1, np.int64) - 16)
                  ).astype(np.int32).reshape(co, 1))
b2 = jnp.asarray((1 << (np.asarray(c.s2, np.int64) - 16)
                  ).astype(np.int32).reshape(co, 1))
bd1 = jnp.asarray((1 << (np.asarray(c.s1, np.int64) - 1)
                   ).astype(np.int32).reshape(co, 1))
sm15_1 = jnp.asarray(np.asarray(c.s1, np.int32).reshape(co, 1) - 15)
sm15_2 = jnp.asarray(np.asarray(c.s2, np.int32).reshape(co, 1) - 15)

# per-channel accumulators within the true bound
acc_np = (rng.random((co, ncols)) * 2 - 1) * bound.reshape(co, 1)
acc = jnp.asarray(np.round(acc_np).astype(np.int32))


def req_bf(x, m, bias, sm15):
    """bigshift requant with rhu folded into the final shift."""
    a_h = jnp.right_shift(x, 15)
    a_l = jnp.bitwise_and(x, 0x7FFF)
    t = m * a_h + jnp.right_shift(m * a_l, 15)
    return jnp.clip(jnp.right_shift(t + bias, sm15), -QMAX, QMAX)


def req_direct(x, m, bias, s):
    """single-multiply requant; needs |m*x| + 2^(s-1) < 2^31."""
    return jnp.clip(jnp.right_shift(m * x + bias, s), -QMAX, QMAX)


def sigma_exact(dom):
    d = dom.astype(jnp.float32) / SIG_SCALE
    return jnp.clip(jnp.round(jax.nn.sigmoid(d) * SIG_QMAX),
                    -SIG_QMAX, SIG_QMAX).astype(jnp.int32)


# ---- rounding-aware poly fit: sigma = round(qmax/2 + d * p(d^2)) with
# d = dom / S (|d| <= max_val keeps the lstsq columns conditioned).
d64 = dom_all.astype(np.float64) / np.float64(SIG_SCALE)
t64 = table.astype(np.float64) - float(SIG_QMAX) / 2
powers = [1, 3, 5, 7, 9, 11, 13]
A = np.stack([d64 ** p for p in powers], 1)
w = np.ones_like(d64)
INV_S = np.float32(1.0) / SIG_SCALE
HALF = np.float32(float(SIG_QMAX) / 2)
coef = None
for it in range(300):
    coef, *_ = np.linalg.lstsq(A * w[:, None], t64 * w, rcond=None)
    # evaluate exactly as the f32 kernel will
    cf = coef.astype(np.float32)
    xf = dom_all.astype(np.float32)
    df = (xf * INV_S).astype(np.float32)
    u = (df * df).astype(np.float32)
    p = np.full_like(df, cf[6])
    for cc in cf[5::-1]:
        p = ((p * u).astype(np.float32) + cc).astype(np.float32)
    val = np.round((df * p).astype(np.float32) + HALF).astype(np.int64)
    val = np.clip(val, 0, int(SIG_QMAX))
    bad = np.nonzero(val != table)[0]
    if len(bad) == 0:
        break
    w[bad] *= 1.3
print(f"poly fit: iters={it+1} residual mismatches={len(bad)}", flush=True)
cf = coef.astype(np.float32)


def sigma_poly(dom):
    df = dom.astype(jnp.float32) * INV_S
    u = df * df
    p = jnp.float32(cf[6])
    for cc in cf[5::-1]:
        p = p * u + jnp.float32(cc)
    v = jnp.round(df * p + HALF)
    return jnp.clip(v, 0, SIG_QMAX).astype(jnp.int32)


# on-device exhaustive check of the poly (must be 0 for the lib change)
idx = jnp.arange(-QMAX, QMAX + 1, dtype=jnp.int32)
nbad = int((np.asarray(jax.jit(sigma_poly)(idx)) != table).sum())
print(f"poly on-device mismatches: {nbad}/255", flush=True)


def a0(a):
    dom = requantize_i32_bigshift(a, r1, s1, QMAX)
    sigma = sigma_exact(dom)
    return requantize_i32_bigshift(a, sigma * r2, s2, QMAX
                                   ).astype(jnp.int8)


def a1(a):
    dom = req_bf(a, r1, b1, sm15_1)
    sigma = sigma_exact(dom)
    return req_bf(a, sigma * r2, b2, sm15_2).astype(jnp.int8)


def a2(a):
    dom = req_direct(a, r1, bd1, s1)
    sigma = sigma_exact(dom)
    return req_bf(a, sigma * r2, b2, sm15_2).astype(jnp.int8)


def a3(a):
    dom = req_direct(a, r1, bd1, s1)
    sigma = sigma_poly(dom)
    return req_bf(a, sigma * r2, b2, sm15_2).astype(jnp.int8)


ref = np.asarray(jax.jit(a0)(acc))
for label, fn in (("A1 folded-rhu", a1),
                  ("A2 +direct-req1", a2),
                  ("A3 +poly-sigma", a3)):
    got = np.asarray(jax.jit(fn)(acc))
    ok = np.array_equal(got, ref)
    print(f"{label}: exact={ok}", flush=True)
    if not ok:
        bad = np.argwhere(got != ref)[:3]
        print("   diffs at", bad, got[tuple(bad[0])], ref[tuple(bad[0])],
              flush=True)

slope_time("A0 exact baseline", a0, acc)
slope_time("A1 folded-rhu", a1, acc)
slope_time("A2 +direct-req1", a2, acc)
slope_time("A3 +poly-sigma", a3, acc)
print("done", flush=True)
