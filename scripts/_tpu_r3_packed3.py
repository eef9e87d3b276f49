"""r3_packed retry with an int8-safe slope harness: the generic _slope
tree-map dependency (`reshape(-1).at[0].set(t + (s*0))`) crashes the
backend when the input is a large int8 slab ("TPU backend error
(Internal)", r3_packed2.log) — kernels run fine materialized
(r3_packed_a.log). Chain via a data-dependent (p & 1) xor instead."""
import sys, time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)

B, GP2, H = 128, 22, 160
M = H * GP2
ROW_CHUNK = 880
TAPS = [dy * GP2 + g for dy in (0, 1, 2) for g in (0, 1, 2)]
N_IN = M + 2 * GP2 + 8


def make_kernel(offsets, row_chunk=ROW_CHUNK):
    def kernel(x_ref, w_ref, o_ref):
        for q0 in range(0, M, row_chunk):
            rows = min(row_chunk, M - q0)
            acc = None
            for t, off in enumerate(offsets):
                xs = x_ref[0, pl.ds(off + q0, rows), :]
                d = jnp.dot(xs, w_ref[pl.ds(t * 128, 128), :],
                            preferred_element_type=jnp.int32)
                acc = d if acc is None else acc + d
            o_ref[0, pl.ds(q0, rows), :] = \
                jnp.clip(acc, -127, 127).astype(jnp.int8)
    return kernel


W9 = jnp.asarray(rng.integers(-127, 128, (9 * 128, 128), np.int8))
X0 = jnp.asarray(rng.integers(-127, 128, (B, N_IN, 128), np.int8))


def build(offsets, row_chunk=ROW_CHUNK):
    def f(xx):
        return pl.pallas_call(
            make_kernel(offsets, row_chunk),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, N_IN, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * 128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, M, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, M, 128), jnp.int8),
        )(xx, W9)
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


slope_int8("A misaligned 9-tap", build(TAPS), X0)
slope_int8("B aligned-0 9-tap ", build([0] * 9), X0)
slope_int8("B2 aligned-mult8  ", build([8 * t for t in range(9)]), X0)
slope_int8("A rc=3520 (1 chunk)", build(TAPS, 3520), X0)
slope_int8("B2 rc=3520        ", build([8 * t for t in range(9)], 3520), X0)
print("done", flush=True)
