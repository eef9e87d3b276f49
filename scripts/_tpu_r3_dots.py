"""Round-3 decisive probe: Mosaic matmul throughput vs XLA, bf16 vs s8.

Round 2 concluded "Mosaic dots run ~2.4 rows/cycle vs XLA conv's ~9" from
the banded lane-packed kernels. Hypothesis to test: that figure was shape
starvation (cout<=64 fills <=half the lanes, K=144 splits into 2 passes),
not a Mosaic deficiency — and native s8 MXU dots (2x bf16 peak, or
256-deep K) could put a fused conv kernel UNDER the XLA conv+epilogue
time. Measurements (slope-timed):

  1. XLA bf16 4096^3 dot          (sanity: ~0.7 ms at ~197 TFLOPs)
  2. XLA s8  4096^3 dot -> s32    (native int8: ~0.35 ms if 2x)
  3. Pallas bf16 4096^3 (512-tile grid)
  4. Pallas s8  4096^3 (512-tile grid)   <- THE decisive number
  5. Pallas bf16 conv-shaped dot M=1.05M K=144 N=16 (C16@160-like)
  6. Pallas s8  conv-shaped dot M=1.05M K=144 N=16
  7. XLA s8 conv C16@160 B=128 + epilogue-like requant (current flagship
     reference point; round-2 measured 0.755 ms for the layer)
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _slope import slope_time

print("backend:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)

# ---------------- 1+2: XLA dots ----------------
N = 4096
Ab = jnp.asarray(rng.integers(-3, 4, (N, N)), jnp.bfloat16)
Bb = jnp.asarray(rng.integers(-3, 4, (N, N)), jnp.bfloat16)
slope_time("1 XLA bf16 4096^3", lambda a: jnp.dot(
    a, Bb, preferred_element_type=jnp.float32), Ab)

As = jnp.asarray(rng.integers(-127, 128, (N, N), np.int8))
Bs = jnp.asarray(rng.integers(-127, 128, (N, N), np.int8))
slope_time("2 XLA s8 4096^3", lambda a: jnp.dot(
    a, Bs, preferred_element_type=jnp.int32), As)


# ---------------- 3+4: Pallas tiled dots ----------------
def mm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                       preferred_element_type=o_ref.dtype)


def pallas_mm(a, b, tile=512, out_dtype=jnp.float32):
    m, k = a.shape
    _, n = b.shape
    return pl.pallas_call(
        mm_kernel,
        grid=(m // tile, n // tile),
        in_specs=[
            pl.BlockSpec((tile, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
    )(a, b)


try:
    f = functools.partial(pallas_mm, b=Bb, out_dtype=jnp.float32)
    np.asarray(f(Ab[:1024]))  # compile check on a slice
    slope_time("3 Pallas bf16 4096^3", lambda a: pallas_mm(
        a, Bb, out_dtype=jnp.float32), Ab)
except Exception as e:
    print("3 Pallas bf16 FAIL:", str(e)[-300:], flush=True)

try:
    np.asarray(pallas_mm(As[:1024], Bs, out_dtype=jnp.int32))
    slope_time("4 Pallas s8 4096^3", lambda a: pallas_mm(
        a, Bs, out_dtype=jnp.int32), As)
except Exception as e:
    print("4 Pallas s8 FAIL:", str(e)[-300:], flush=True)

# ---------------- 5+6: conv-starved shapes ----------------
M = 1024 * 1024
K, Co = 144, 16
MT = 4096


def pallas_skinny(a, b, out_dtype):
    return pl.pallas_call(
        mm_kernel,
        grid=(M // MT,),
        in_specs=[
            pl.BlockSpec((MT, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((MT, Co), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Co), out_dtype),
    )(a, b)


Am_b = jnp.asarray(rng.integers(-3, 4, (M, K)), jnp.bfloat16)
Bm_b = jnp.asarray(rng.integers(-3, 4, (K, Co)), jnp.bfloat16)
Am_s = jnp.asarray(rng.integers(-127, 128, (M, K), np.int8))
Bm_s = jnp.asarray(rng.integers(-127, 128, (K, Co), np.int8))
try:
    slope_time("5 Pallas bf16 M1M K144 N16",
               lambda a: pallas_skinny(a, Bm_b, jnp.float32), Am_b)
except Exception as e:
    print("5 FAIL:", str(e)[-300:], flush=True)
try:
    slope_time("6 Pallas s8 M1M K144 N16",
               lambda a: pallas_skinny(a, Bm_s, jnp.int32), Am_s)
except Exception as e:
    print("6 FAIL:", str(e)[-300:], flush=True)

# ---------------- 7: XLA s8 conv reference layer ----------------
B, C, H = 128, 16, 160
x0 = jnp.asarray(rng.integers(-127, 128, (B, C, H, H), np.int8))
wc = jnp.asarray(rng.integers(-127, 128, (C, C, 3, 3), np.int8))
r1 = jnp.asarray(rng.integers(100, 200, (1, C, 1, 1)), jnp.int32)


def xla_layer(a):
    acc = lax.conv_general_dilated(
        a, wc, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.int32)
    # epilogue shaped like requant+sigmoid+requant (exact ops differ;
    # traffic shape is what matters here)
    q = (acc * r1) >> 8
    sig = jnp.clip(q, -127, 127)
    out = jnp.clip((acc * (sig * r1)) >> 15, -127, 127)
    return out.astype(jnp.int8)


slope_time("7 XLA s8 conv+epi C16@160 B128", xla_layer, x0)
print("done", flush=True)
