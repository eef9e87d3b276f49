"""Round-3 packed epilogue cost isolation (C16@160 mock, B=128).

r3_packed3.log: the nine misaligned s8 tap dots cost only 0.403 ms —
near dense rate. So round-2's 1.84 ms packed kernel must be dominated by
the in-kernel epilogue (two emulated int32 requants + f32 sigmoid +
corrections). Measure the mock kernel with epilogue stages added:

  E0 dots only (re-baseline)
  E1 + bias + requant1 (requantize_i32)
  E2 + f32 sigmoid + fold + requant2 (the FULL real epilogue)
  E2b full epilogue, bigshift variant
  E3 full epilogue + pad-group mask + head/tail zeroing (= real kernel
     structure)
"""
import sys, time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alpha_yolo_quant_tpu.ops.intmath import (
    requantize_i32, requantize_i32_bigshift,
)

print("backend:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)

B, GP2, H = 128, 22, 160
M = H * GP2
ROW_CHUNK = 880
TAPS = [dy * GP2 + g for dy in (0, 1, 2) for g in (0, 1, 2)]
N_IN = M + 2 * GP2 + 8
SIG_SCALE = np.float32(18.142857)
SIG_QMAX = np.float32(127.0)


def make_kernel(stage, bigshift=False):
    req = requantize_i32_bigshift if bigshift else requantize_i32

    def kernel(x_ref, w_ref, b_ref, r1_ref, s1_ref, r2_ref, s2_ref,
               o_ref):
        for q0 in range(0, M, ROW_CHUNK):
            rows = min(ROW_CHUNK, M - q0)
            acc = None
            for t, off in enumerate(TAPS):
                xs = x_ref[0, pl.ds(off + q0, rows), :]
                d = jnp.dot(xs, w_ref[pl.ds(t * 128, 128), :],
                            preferred_element_type=jnp.int32)
                acc = d if acc is None else acc + d
            if stage >= 1:
                acc = acc + b_ref[:]
                dom = req(acc, r1_ref[:], s1_ref[:], 127)
                out = dom
            if stage >= 2:
                d32 = dom.astype(jnp.float32) / SIG_SCALE
                sigma = jnp.clip(
                    jnp.round(jax.nn.sigmoid(d32) * SIG_QMAX),
                    -SIG_QMAX, SIG_QMAX).astype(jnp.int32)
                out = req(acc, sigma * r2_ref[:], s2_ref[:], 127)
            if stage == 0:
                out = acc
            if stage >= 3:
                u = q0 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
                u = u % GP2
                ok = (u >= 1) & (u <= GP2 - 2)
                out = jnp.where(ok, out, 0)
            o_ref[0, pl.ds(q0, rows), :] = \
                jnp.clip(out, -127, 127).astype(jnp.int8)
    return kernel


W9 = jnp.asarray(rng.integers(-127, 128, (9 * 128, 128), np.int8))
X0 = jnp.asarray(rng.integers(-127, 128, (B, N_IN, 128), np.int8))
LB = jnp.asarray(rng.integers(-1000, 1000, (1, 128)), jnp.int32)
LR1 = jnp.asarray(rng.integers(100, 255, (1, 128)), jnp.int32)
LS1 = jnp.full((1, 128), 20, jnp.int32)
LR2 = jnp.asarray(rng.integers(100, 255, (1, 128)), jnp.int32)
LS2 = jnp.full((1, 128), 21, jnp.int32)


def build(stage, bigshift=False):
    def f(xx):
        return pl.pallas_call(
            make_kernel(stage, bigshift),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, N_IN, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)] +
            [pl.BlockSpec((9 * 128, 128), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)] +
            [pl.BlockSpec((1, 128), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec((1, M, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, M, 128), jnp.int8),
        )(xx, W9, LB, LR1, LS1, LR2, LS2)
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


slope_int8("E0 dots only        ", build(0), X0)
slope_int8("E1 +bias+requant1   ", build(1), X0)
slope_int8("E2 full epilogue    ", build(2), X0)
slope_int8("E2b full bigshift   ", build(2, True), X0)
slope_int8("E3 +mask (real str.)", build(3), X0)
print("done", flush=True)
