"""Round-4 probe: how much of the 24ms auto-engine forward is the SiLU
epilogue's VPU work (requant -> sigmoid -> fold -> requant)?

Motivation: the r4_imgemm probe's epilogue-ONLY Pallas kernel costs MORE
than XLA's whole fused conv layer for 2 of 3 probed shapes (1.407 vs
0.850ms at C64@80 B=128), i.e. the epilogue's elementwise chain plausibly
bounds the forward, not the convs — which would explain why every conv
reformulation (banded/slab/s2d/imgemm) lost. Attribution by ablation,
forward-only, all head leaves live, slope-timed:

  V0   stock auto engine
  V1   sigma := dom (sigmoid + corrections + domain mask stripped)
  V2   V1 + both exact requants replaced by shift+clip (epilogue reduced
       to ~4 ops) — V0-V2 ~= the whole epilogue's marginal VPU cost

plus standalone XLA-jitted epilogue kernels at the C64@80 element count
(52.4M) to compare codegen against the Pallas epi-only 1.407ms:
  xepi       the exact production epilogue
  xepi_id    identity sigma (requants only)
  xepi_poly  sigmoid replaced by a degree-13 odd Chebyshev-fit polynomial
             (corrections counted on-device; candidate replacement if the
             sigmoid share is large)

NOTE: V1/V2 are TIMING-ONLY (results are numerically wrong); nothing here
ships. Any shipped change must go through the validated-corrections
machinery (ops/lutfast.py) and the bit-exactness suite.
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
from alpha_yolo_quant_tpu.ops import lutfast
from alpha_yolo_quant_tpu.ops import intmath
from alpha_yolo_quant_tpu.runtime import interpreter as interp

print("backend:", jax.devices()[0].platform, flush=True)

B = int(os.environ.get("EPI_B", "128"))
SMOKE = os.environ.get("EPI_SMOKE") == "1"
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
plan = interp.device_plan(model)

# ---- epilogue element census (host-side): SiLU conv outputs per batch
hw = {graph.input_edge: 640}
n_epi = 0
for n in graph.nodes:
    if isinstance(n, ConvNode):
        hw[n.dst] = hw[n.src] // n.stride
        if n.silu:
            n_epi += n.cout * hw[n.dst] ** 2
    else:
        srcs = [getattr(n, a) for a in ("src", "srcs", "base")
                if hasattr(n, a)]
        flat = []
        for s in srcs:
            flat += list(s) if isinstance(s, (list, tuple)) else [s]
        h = None
        for s in flat:
            if s in hw:
                h = hw[s]
        if type(n).__name__.lower().startswith("up") and h:
            h *= 2
        for a in ("dst", "dst1", "dst2"):
            if hasattr(n, a) and h:
                hw[getattr(n, a)] = h
print(f"SiLU epilogue elements: {n_epi/1e6:.2f}M/img = "
      f"{n_epi*B/1e6:.0f}M per batch of {B}", flush=True)

images = rng.uniform(0, 1, (B, 3, 640, 640)).astype(np.float32)
x_q = jax.jit(lambda im: interp.quantize_input(im, 8, out_dtype=jnp.bfloat16)
              )(jnp.asarray(images))
x_q.block_until_ready()


def fwd(x):
    return interp.int_forward(model, plan, x, engine="auto",
                              head_requant=True)


orig_apply = lutfast.FastLut.apply
orig_applyc = lutfast.FastLut.apply_clipped
orig_req = interp.requantize_i32
orig_reqb = interp.requantize_i32_bigshift
orig_reqf = interp.requantize_i32_bigshift_folded
orig_reqd = interp.requantize_i32_direct

def _trivial_req(x, m, shift, qmax):
    return jnp.clip(jnp.right_shift(x, 8), -qmax, qmax)


if SMOKE:
    # just verify each variant traces + executes at this batch
    for label, patch in (("V0", None), ("V1", "sig"), ("V2", "req")):
        if patch in ("sig", "req"):
            lutfast.FastLut.apply = lambda self, x: x
        if patch == "req":
            interp.requantize_i32 = _trivial_req
            interp.requantize_i32_bigshift = _trivial_req
        out = jax.jit(fwd)(x_q)
        print(label, "ok:",
              {k: (v.shape, str(v.dtype)) for k, v in out.items()},
              flush=True)
        lutfast.FastLut.apply = orig_apply
        interp.requantize_i32 = orig_req
        interp.requantize_i32_bigshift = orig_reqb
else:
    # ---- V0: stock
    slope_time("V0 fwd auto (stock)", fwd, x_q)

    # ---- V1: sigma := dom (timing-only)
    lutfast.FastLut.apply = lambda self, x: x
    lutfast.FastLut.apply_clipped = lambda self, x: x
    slope_time("V1 fwd sigma=identity", fwd, x_q)

    # ---- V2: V1 + trivial requants (timing-only)
    interp.requantize_i32 = _trivial_req
    interp.requantize_i32_bigshift = _trivial_req
    interp.requantize_i32_bigshift_folded = _trivial_req
    interp.requantize_i32_direct = _trivial_req
    slope_time("V2 fwd trivial-epilogue", fwd, x_q)

    lutfast.FastLut.apply = orig_apply
    lutfast.FastLut.apply_clipped = orig_applyc
    interp.requantize_i32 = orig_req
    interp.requantize_i32_bigshift = orig_reqb
    interp.requantize_i32_bigshift_folded = orig_reqf
    interp.requantize_i32_direct = orig_reqd

# -------------------------------------------------------------------
# Standalone XLA epilogue kernels at the C64@80 element count.
# -------------------------------------------------------------------
if os.environ.get("EPI_SKIP_XEPI") == "1":
    print("done", flush=True)
    sys.exit(0)
sig = model.sig_lut
SIG_SCALE = np.float32((2 ** (sig.bits - 1) - 1) / sig.max_val)
SIG_QMAX = np.float32(2 ** (sig.bits - 1) - 1)
QMAX = cfg.qmax
flut = plan["sig_lut"]
CORR = flut.corrections
print(f"sig lut: bits={sig.bits} max_val={sig.max_val} "
      f"dom=[{flut.lut.lo},{flut.lut.hi}] corrections={len(CORR)}",
      flush=True)

co, ncols = 64, (2048 if SMOKE else 819200)
name = next(n.name for n in graph.nodes
            if isinstance(n, ConvNode) and (n.cin, n.cout) == (64, 64)
            and n.kernel == 3 and n.stride == 1 and n.silu)
c = model.convs[name]
r1 = jnp.asarray(np.asarray(c.r1, np.int32).reshape(co, 1))
s1 = jnp.asarray(np.asarray(c.s1, np.int32).reshape(co, 1))
r2 = jnp.asarray(np.asarray(c.r2, np.int32).reshape(co, 1))
s2 = jnp.asarray(np.asarray(c.s2, np.int32).reshape(co, 1))
acc = jnp.asarray(rng.integers(-(1 << 23), 1 << 23, (co, ncols),
                               dtype=np.int32))


def _sigma_exact(dom):
    d = dom.astype(jnp.float32) / SIG_SCALE
    sigma = jnp.clip(jnp.round(jax.nn.sigmoid(d) * SIG_QMAX),
                     -SIG_QMAX, SIG_QMAX).astype(jnp.int32)
    for i, v in CORR:
        sigma = jnp.where(dom == i, jnp.int32(v), sigma)
    return sigma


# Degree-13 odd polynomial fit of sigmoid on the +-max_val domain,
# evaluated at the 255 integer dom points (the only inputs that occur).
dgrid = np.arange(flut.lut.lo, flut.lut.hi + 1) / float(SIG_SCALE)
targ = 1.0 / (1.0 + np.exp(-dgrid)) - 0.5
A = np.stack([dgrid ** p for p in (1, 3, 5, 7, 9, 11, 13)], 1)
coef, *_ = np.linalg.lstsq(A, targ, rcond=None)
coef = coef.astype(np.float32)
print("poly coef:", coef, flush=True)


def _sigma_poly(dom):
    d = dom.astype(jnp.float32) * np.float32(1.0 / SIG_SCALE)
    u = d * d
    p = jnp.float32(coef[6])
    for cc in coef[5::-1]:
        p = p * u + jnp.float32(cc)
    s = d * p + jnp.float32(0.5)
    return jnp.clip(jnp.round(s * SIG_QMAX), -SIG_QMAX, SIG_QMAX
                    ).astype(jnp.int32)


# on-device correction count for the poly (vs the exact integer table)
idx = jnp.arange(flut.lut.lo, flut.lut.hi + 1, dtype=jnp.int32)
got = np.asarray(jax.jit(_sigma_poly)(idx))
n_bad = int((got != flut.lut.values).sum())
print(f"poly corrections needed on this backend: {n_bad}/255", flush=True)

req = intmath.requantize_i32_bigshift


def xepi(a, sigma_fn):
    dom = req(a, r1, s1, QMAX)
    sigma = sigma_fn(dom)
    return req(a, sigma * r2, s2, QMAX).astype(jnp.int8)


slope_time(f"xepi exact ({co}x{ncols})", lambda a: xepi(a, _sigma_exact),
           acc)
slope_time("xepi identity-sigma", lambda a: xepi(a, lambda d: d), acc)
slope_time("xepi poly-sigma", lambda a: xepi(a, _sigma_poly), acc)
slope_time("xepi requant1-only",
           lambda a: req(a, r1, s1, QMAX).astype(jnp.int8), acc)
print("done", flush=True)
