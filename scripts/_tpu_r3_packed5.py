"""Round-3 packed epilogue optimization probe (C16@160 mock, B=128).

r3_packed4.log: dots 0.34 | +req1 0.56 | full epi 1.05 | +iota-mask 1.33
(XLA auto layer: 0.755). Try to reach <0.7:

  F1 bigshift both requants + PATTERN-input mask (precomputed (gp2,128)
     int8 tile replaces iota/mod/cmp)
  F2 F1 + manual software pipeline: chunk q's dots issued before chunk
     q-1's epilogue (gives the scheduler independent MXU/VPU streams)
  F3 F1 with the epilogue computed on (rows,128) bf16 sigmoid (same
     corrections contract; probes VPU cost of the transcendental)
"""
import sys, time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alpha_yolo_quant_tpu.ops.intmath import requantize_i32_bigshift

print("backend:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)

B, GP2, H = 128, 22, 160
M = H * GP2
ROW_CHUNK = 880
TAPS = [dy * GP2 + g for dy in (0, 1, 2) for g in (0, 1, 2)]
N_IN = M + 2 * GP2 + 8
SIG_SCALE = np.float32(18.142857)
SIG_QMAX = np.float32(127.0)
N_CHUNKS = M // ROW_CHUNK


def epilogue(acc, b, r1, s1, r2, s2, bf16=False):
    acc = acc + b
    dom = requantize_i32_bigshift(acc, r1, s1, 127)
    if bf16:
        d = dom.astype(jnp.bfloat16) / jnp.asarray(SIG_SCALE, jnp.bfloat16)
        sigma = jnp.clip(jnp.round(
            jax.nn.sigmoid(d).astype(jnp.float32) * SIG_QMAX),
            -SIG_QMAX, SIG_QMAX).astype(jnp.int32)
    else:
        d = dom.astype(jnp.float32) / SIG_SCALE
        sigma = jnp.clip(jnp.round(jax.nn.sigmoid(d) * SIG_QMAX),
                         -SIG_QMAX, SIG_QMAX).astype(jnp.int32)
    return requantize_i32_bigshift(acc, sigma * r2, s2, 127)


def dots(x_ref, w_ref, q0, rows):
    acc = None
    for t, off in enumerate(TAPS):
        xs = x_ref[0, pl.ds(off + q0, rows), :]
        d = jnp.dot(xs, w_ref[pl.ds(t * 128, 128), :],
                    preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    return acc


def make_kernel(variant):
    def kernel(x_ref, w_ref, b_ref, r1_ref, s1_ref, r2_ref, s2_ref,
               pat_ref, o_ref):
        args = (b_ref[:], r1_ref[:], s1_ref[:], r2_ref[:], s2_ref[:])

        def finish(q0, rows, acc):
            out = epilogue(acc, *args, bf16=(variant == "F3"))
            out = jnp.where(pat_ref[pl.ds(q0 % GP2 * 0, rows), :] > 0,
                            out, 0)
            o_ref[0, pl.ds(q0, rows), :] = \
                jnp.clip(out, -127, 127).astype(jnp.int8)

        if variant == "F2":
            pend = None
            for q0 in range(0, M, ROW_CHUNK):
                rows = min(ROW_CHUNK, M - q0)
                acc = dots(x_ref, w_ref, q0, rows)
                if pend is not None:
                    finish(pend[0], pend[1], pend[2])
                pend = (q0, rows, acc)
            finish(*pend)
        else:
            for q0 in range(0, M, ROW_CHUNK):
                rows = min(ROW_CHUNK, M - q0)
                finish(q0, rows, dots(x_ref, w_ref, q0, rows))
    return kernel


W9 = jnp.asarray(rng.integers(-127, 128, (9 * 128, 128), np.int8))
X0 = jnp.asarray(rng.integers(-127, 128, (B, N_IN, 128), np.int8))
LB = jnp.asarray(rng.integers(-1000, 1000, (1, 128)), jnp.int32)
LR1 = jnp.asarray(rng.integers(100, 255, (1, 128)), jnp.int32)
LS1 = jnp.full((1, 128), 20, jnp.int32)
LR2 = jnp.asarray(rng.integers(100, 255, (1, 128)), jnp.int32)
LS2 = jnp.full((1, 128), 21, jnp.int32)
# pattern tile: rows % GP2 in {1..GP2-2} -> 1 else 0, tiled to ROW_CHUNK
pat = (np.arange(ROW_CHUNK) % GP2)
PAT = jnp.asarray(((pat >= 1) & (pat <= GP2 - 2))
                  .reshape(-1, 1).repeat(128, 1).astype(np.int32))


def build(variant):
    def f(xx):
        return pl.pallas_call(
            make_kernel(variant),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, N_IN, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * 128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)] +
            [pl.BlockSpec((1, 128), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)] * 5 +
            [pl.BlockSpec((ROW_CHUNK, 128), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, M, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, M, 128), jnp.int8),
        )(xx, W9, LB, LR1, LS1, LR2, LS2, PAT)
    return f


def slope_int8(name, f, x0, n_lo=10, n_hi=40):
    @jax.jit
    def loop(x, n):
        def body(i, c):
            x, acc = c
            out = f(x)
            p = out[0, 0, 0].astype(jnp.int32)
            x = x.at[0, 0, 0].set(
                (x[0, 0, 0].astype(jnp.int32) ^ (p & 1)).astype(jnp.int8))
            return x, acc + p
        return lax.fori_loop(0, n, body, (x, jnp.int32(0)))[1]

    try:
        int(loop(x0, jnp.int32(2)))
        ts = {}
        for n in (n_lo, n_hi):
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                int(loop(x0, jnp.int32(n)))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        dt = (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)
        print(f"{name}: {dt*1000:.3f} ms", flush=True)
    except Exception as e:
        print(name, "FAIL:", str(e)[-300:], flush=True)


slope_int8("F1 bigshift+pattern-mask", build("F1"), X0)
slope_int8("F2 F1+software pipeline ", build("F2"), X0)
slope_int8("F3 F1+bf16 sigmoid      ", build("F3"), X0)
print("done", flush=True)
