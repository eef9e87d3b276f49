"""Round-4 probe: batch-in-lanes implicit-GEMM Pallas conv with the whole
integer epilogue fused in-register.

The closed round-2/3 routes (banded/packed/slab) all put SPATIAL in lanes
and channels in the dot's N dimension (N=16 -> 1/8 lane fill, the r3_dots
"skinny dot catastrophe"). This probe measures the OPPOSITE mapping, never
tried: activations stored (H, C, W, B) int8 with B=128 exactly filling the
lanes, one contiguous 3-row DMA window per output row, and per-position s8
MXU dots

    acc[co, b] += W_kx[co, (ky,ci)] @ win[(ky,ci), x+kx, b]   kx in 0..2

where the (3C, 128) rhs is a zero-copy leading-dim reshape of a strided
VMEM slice (K = 3*C_in fills the contraction; M = C_out; N = 128 full).
The requant->sigmoid->fold->requant epilogue runs in-register on the
(co,128) accumulator; in/out are int8 (vs the auto engine's bf16 storage
+ f32 accumulator HBM roundtrip — a ~4x traffic cut if the MXU/VPU keep
up).

Variants, slope-timed per layer (vs the auto engine's bf16+XLA epilogue):
  epi-only   pure-epilogue kernel at the same element count -> VPU ceiling
  dots-only  V1 without the epilogue -> MXU + DMA ceiling
  V1         full fused kernel
  V1p        V1 with a one-iteration software pipeline (epilogue of x
             overlaps the dots of x+1)
"""
import functools
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _slope import slope_time
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph, ConvNode
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.ops.intmath import (
    requantize_i32, requantize_i32_bigshift,
)
from alpha_yolo_quant_tpu.ops.nn import conv2d_bf16_exact
from alpha_yolo_quant_tpu.runtime.pallas_ops import pallas_sigma_corrections

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
sig = model.sig_lut
SIG_SCALE = float((2 ** (sig.bits - 1) - 1) / sig.max_val)
SIG_QMAX = float(2 ** (sig.bits - 1) - 1)
QMAX = cfg.qmax
CORR = pallas_sigma_corrections(sig)
print("corrections:", CORR, flush=True)

# spatial sizes per edge
hw = {graph.input_edge: 640}
targets = {}
for n in graph.nodes:
    if isinstance(n, ConvNode):
        hin = hw[n.src]
        hout = hin // n.stride
        hw[n.dst] = hout
        amax_in = model.edge_amax_int[n.src]
        if (n.kernel, n.stride) == (3, 1) and n.silu and amax_in <= 127:
            key = (n.cin, n.cout, hout)
            targets.setdefault(key, n.name)
    else:
        srcs = [getattr(n, a) for a in ("src", "srcs", "base") if
                hasattr(n, a)]
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

SHAPES = [(64, 64, 80), (64, 64, 40), (128, 128, 20)]
print("targets:", {s: targets.get(s) for s in SHAPES}, flush=True)


def epilogue(acc, b, r1, s1, r2, s2, bigshift):
    """The exact integer epilogue on an int32 accumulator block; per-channel
    constants are (co, 1) int32 (broadcast over lanes)."""
    req = requantize_i32_bigshift if bigshift else requantize_i32
    acc = acc + b
    dom = req(acc, r1, s1, QMAX)
    d = dom.astype(jnp.float32) / np.float32(SIG_SCALE)
    sigma = jnp.clip(jnp.round(jax.nn.sigmoid(d) * np.float32(SIG_QMAX)),
                     -SIG_QMAX, SIG_QMAX).astype(jnp.int32)
    for i, v in CORR:
        sigma = jnp.where(dom == i, jnp.int32(v), sigma)
    return req(acc, sigma * r2, s2, QMAX).astype(jnp.int8)


def make_v1(C, co, H, W, bigshift, mode="full", pipelined=False):
    Hp, Wp = H + 2, W + 2

    def kernel(x_hbm, w_ref, b_ref, r1_ref, s1_ref, r2_ref, s2_ref,
               out_ref, win, sem):
        y = pl.program_id(0)
        slot = jax.lax.rem(y, 2)

        @pl.when(y == 0)
        def _():
            pltpu.make_async_copy(x_hbm.at[pl.ds(0, 3)], win.at[0],
                                  sem.at[0]).start()

        @pl.when(y + 1 < H)
        def _():
            nslot = jax.lax.rem(y + 1, 2)
            pltpu.make_async_copy(x_hbm.at[pl.ds(y + 1, 3)], win.at[nslot],
                                  sem.at[nslot]).start()

        pltpu.make_async_copy(x_hbm.at[pl.ds(y, 3)], win.at[slot],
                              sem.at[slot]).wait()

        dn = (((1,), (0,)), ((), ()))

        def dots(x):
            acc = jnp.zeros((co, 128), jnp.int32)
            for kx in range(3):
                v = win[slot, :, :, x + kx, :].reshape(3 * C, 128)
                acc = acc + jax.lax.dot_general(
                    w_ref[kx], v, dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
            return acc

        consts = (b_ref[:], r1_ref[:], s1_ref[:], r2_ref[:], s2_ref[:])

        def finish(acc):
            if mode == "full":
                return epilogue(acc, *consts, bigshift)
            return jnp.clip(acc, -127, 127).astype(jnp.int8)

        if pipelined:
            def body(x, acc_prev):
                acc = dots(x)
                out_ref[0, :, x - 1, :] = finish(acc_prev)
                return acc

            acc_last = jax.lax.fori_loop(1, W, body, dots(0))
            out_ref[0, :, W - 1, :] = finish(acc_last)
        else:
            def body(x, _):
                out_ref[0, :, x, :] = finish(dots(x))
                return 0

            jax.lax.fori_loop(0, W, body, 0)

    def run(x_pad, w3, b, r1, s1, r2, s2):
        cspec = pl.BlockSpec((co, 1), lambda y: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(H,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((3, co, 3 * C), lambda y: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                cspec, cspec, cspec, cspec, cspec,
            ],
            out_specs=pl.BlockSpec((1, co, W, 128), lambda y: (y, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((H, co, W, 128), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((2, 3, C, Wp, 128), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(x_pad, w3, b, r1, s1, r2, s2)

    return run


def make_epi_only(co, ncols):
    """Pure epilogue at the same element count: (co, ncols) int32 blocks."""
    COLB = 2048

    def kernel(acc_ref, b_ref, r1_ref, s1_ref, r2_ref, s2_ref, out_ref):
        out_ref[:] = epilogue(acc_ref[:], b_ref[:], r1_ref[:], s1_ref[:],
                              r2_ref[:], s2_ref[:], True)

    def run(acc, b, r1, s1, r2, s2):
        cspec = pl.BlockSpec((co, 1), lambda j: (0, 0),
                             memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec((co, COLB), lambda j: (0, j),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(ncols // COLB,),
            in_specs=[dspec, cspec, cspec, cspec, cspec, cspec],
            out_specs=dspec,
            out_shape=jax.ShapeDtypeStruct((co, ncols), jnp.int8),
        )(acc, b, r1, s1, r2, s2)

    return run


for (C, co, H) in SHAPES:
    name = targets.get((C, co, H))
    if name is None:
        print(f"-- no layer for C{C}->co{co}@{H}, skipping", flush=True)
        continue
    c = model.convs[name]
    W = H
    print(f"== {name}: C{C}->{co} @{H}  bigshift={c.bigshift_ok}",
          flush=True)
    w_q = np.asarray(c.w_q, np.int8)                      # (co,ci,3,3)
    b_q = np.asarray(c.b_q, np.int32).reshape(co, 1)
    r1 = np.asarray(c.r1, np.int32).reshape(co, 1)
    s1 = np.asarray(c.s1, np.int32).reshape(co, 1)
    r2 = np.asarray(c.r2, np.int32).reshape(co, 1)
    s2 = np.asarray(c.s2, np.int32).reshape(co, 1)
    x = rng.integers(-127, 128, (B, C, H, W), dtype=np.int32)

    # ---- V0 baseline: the auto engine's layer (bf16 conv + XLA epilogue)
    w_i8 = jnp.asarray(w_q)
    bq4 = jnp.asarray(b_q.reshape(1, co, 1, 1))
    r1_4, s1_4 = (jnp.asarray(v.reshape(1, co, 1, 1)) for v in (r1, s1))
    r2_4, s2_4 = (jnp.asarray(v.reshape(1, co, 1, 1)) for v in (r2, s2))
    req0 = requantize_i32_bigshift if c.bigshift_ok else requantize_i32

    def v0(xb, w_i8=w_i8, bq4=bq4, r1_4=r1_4, s1_4=s1_4, r2_4=r2_4,
           s2_4=s2_4, req0=req0):
        acc = conv2d_bf16_exact(xb, w_i8, 1, 1) + bq4
        dom = req0(acc, r1_4, s1_4, QMAX)
        d = dom.astype(jnp.float32) / np.float32(SIG_SCALE)
        sigma = jnp.clip(
            jnp.round(jax.nn.sigmoid(d) * np.float32(SIG_QMAX)),
            -SIG_QMAX, SIG_QMAX).astype(jnp.int32)
        for i, v in CORR:
            sigma = jnp.where(dom == i, jnp.int32(v), sigma)
        return req0(acc, sigma * r2_4, s2_4, QMAX).astype(jnp.bfloat16)

    x_bf = jnp.asarray(x, jnp.bfloat16)
    ref = np.asarray(jax.jit(v0)(x_bf), np.float32).astype(np.int8)
    slope_time(f"{name} V0 auto(bf16+XLA epi)", v0, x_bf)

    # ---- Pallas layout: (Hp, C, Wp, B) padded int8
    x_pad = np.zeros((H + 2, C, W + 2, B), np.int8)
    x_pad[1:-1, :, 1:-1, :] = x.transpose(2, 1, 3, 0)
    w3 = jnp.asarray(
        w_q.transpose(3, 0, 2, 1).reshape(3, co, 3 * C))   # (kx,co,(ky,ci))
    consts = tuple(jnp.asarray(v) for v in (b_q, r1, s1, r2, s2))
    xp = jnp.asarray(x_pad)

    for label, mode, pipe in (("dots-only", "plain", False),
                              ("V1 fused", "full", False),
                              ("V1p fused+pipe", "full", True)):
        run = make_v1(C, co, H, W, c.bigshift_ok, mode=mode,
                      pipelined=pipe)
        try:
            out = np.asarray(jax.jit(run)(xp, w3, *consts))
        except Exception as e:
            print(f"  {label}: FAIL {str(e)[:300]}", flush=True)
            continue
        if mode == "full":
            got = out.transpose(3, 1, 0, 2)               # -> (B,co,H,W)
            print(f"  {label}: exact={np.array_equal(got, ref)}",
                  flush=True)
        slope_time(f"{name} {label}",
                   lambda a, run=run, w3=w3, consts=consts:
                   run(a, w3, *consts), xp)

    # ---- epilogue-only VPU ceiling at this element count
    ncols = (B * H * W + 2047) // 2048 * 2048
    acc32 = jnp.asarray(rng.integers(-(1 << 23), 1 << 23, (co, ncols),
                                     dtype=np.int32))
    epi = make_epi_only(co, ncols)
    try:
        slope_time(f"{name} epi-only ({co}x{ncols})",
                   lambda a, epi=epi, cs=consts: epi(a, *cs), acc32)
    except Exception as e:
        print(f"  epi-only FAIL {str(e)[:300]}", flush=True)

print("done", flush=True)
