"""Round-3 quantize bisection: where do 943 MB take 4-5 ms?

r3_quant.log: XLA quantize bf16 3.87 ms, Pallas (1,3,160,640) blocks
5.28 ms, vs a ~1.15 ms HBM roofline. Isolate:

  R0 f32 -> f32 (+1.0)        pure rw  (1.26 GB -> ~1.5 ms roofline)
  R1 f32 -> bf16 astype       convert  (0.95 GB -> ~1.2 ms)
  R2 XLA quantize bf16        baseline
  R3 quantize, f32 out        round w/o narrowing store
  R4 Pallas on (B*3*640,640)  2D blocks (2048,640)
  R5 Pallas (1,1,160,640)     per-plane blocks
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from _slope import slope_time
from alpha_yolo_quant_tpu.runtime.interpreter import quantize_input

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
rng = np.random.default_rng(1)
images = jax.device_put(
    rng.uniform(0, 1, (B, 3, 640, 640)).astype(np.float32))


def _qk(x_ref, o_ref):
    x = x_ref[...]
    o_ref[...] = jnp.round(
        jnp.clip(x, -1.0, 1.0) * np.float32(127.0)).astype(o_ref.dtype)


def pallas_q_2d(x, rows=2048):
    b, c, h, w = x.shape
    x2 = x.reshape(b * c * h, w)
    m = x2.shape[0]
    out = pl.pallas_call(
        _qk,
        grid=(m // rows,),
        in_specs=[pl.BlockSpec((rows, w), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rows, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, w), jnp.bfloat16),
    )(x2)
    return out.reshape(b, c, h, w)


def pallas_q_plane(x, rows=160):
    b, c, h, w = x.shape
    return pl.pallas_call(
        _qk,
        grid=(b, c, h // rows),
        in_specs=[pl.BlockSpec((1, 1, rows, w),
                               lambda i, j, k: (i, j, k, 0))],
        out_specs=pl.BlockSpec((1, 1, rows, w),
                               lambda i, j, k: (i, j, k, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.bfloat16),
    )(x)


slope_time("R0 f32+1.0 -> f32      ", lambda a: a + 1.0, images)
slope_time("R1 astype bf16         ", lambda a: a.astype(jnp.bfloat16),
           images)
slope_time("R2 XLA quantize bf16   ",
           lambda a: quantize_input(a, 8, out_dtype=jnp.bfloat16), images)
slope_time("R3 quantize f32-out    ",
           lambda a: jnp.round(jnp.clip(a, -1.0, 1.0) * 127.0), images)
slope_time("R4 Pallas 2D (2048,640)", pallas_q_2d, images)
slope_time("R5 Pallas per-plane    ", pallas_q_plane, images)
print("done", flush=True)
