"""Round-3 packed-conv bottleneck isolation (C16@160-equivalent, B=128).

Hypothesis: the round-2 packed engine's 2.4-rows/cycle ceiling is the
SUBLANE-MISALIGNED tap loads (slab row offsets dy*gp2+g with gp2=22 —
every (rows,128) tap stream gets a vector rotate), not Mosaic dot
throughput (dense s8 4096^3 measured 296 TOPS ~ 75% peak, r3_dots.log).

Mock kernels over the packed C16@160 shape (slab rows/img m=3520, nine
(rows,128)@(128,128) s8 dots, int32 accumulate, int8 store):

  A misaligned 9-tap: taps at the real offsets {dy*22+g} (2 of 9 aligned)
  B aligned-0 9-tap:  all taps at offset 0 (upper bound, wrong math)
  B2 aligned-mult8:   taps at {0,8,...,64} (aligned, distinct slices)
  D real packed_conv_slab C16@160 (round-2 engine as-is, re-measured)

Round-2 reference points: packed C16@160 kernel 1.84 ms; XLA auto layer
0.755 ms; dense-rate estimate for these nine dots ~0.42 ms
(9*3520*128 rows / 8 rows/cycle / 940MHz * 128 imgs... = per-image
9*3520/8 = 3960 cycles -> 0.54 ms for B=128 at 940 MHz).
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _slope import slope_time

print("backend:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)

B = 128
GP2 = 22
H = 160
M = H * GP2         # 3520 rows per image
ROW_CHUNK = 880
TAPS = [dy * GP2 + g for dy in (0, 1, 2) for g in (0, 1, 2)]
PAD = 2 * GP2 + 8


def make_kernel(offsets, m, row_chunk):
    def kernel(x_ref, w_ref, o_ref):
        for q0 in range(0, m, row_chunk):
            rows = min(row_chunk, m - q0)
            acc = None
            for t, off in enumerate(offsets):
                xs = x_ref[0, pl.ds(off + q0, rows), :]
                d = jnp.dot(xs, w_ref[pl.ds(t * 128, 128), :],
                            preferred_element_type=jnp.int32)
                acc = d if acc is None else acc + d
            o_ref[0, pl.ds(q0, rows), :] = \
                jnp.clip(acc, -127, 127).astype(jnp.int8)
    return kernel


def build(offsets, m, row_chunk):
    n_in = m + PAD
    w = jnp.asarray(rng.integers(-127, 128, (9 * 128, 128), np.int8))
    x = jnp.asarray(rng.integers(-127, 128, (B, n_in, 128), np.int8))

    def f(xx):
        return pl.pallas_call(
            make_kernel(offsets, m, row_chunk),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, n_in, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * 128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, m, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, m, 128), jnp.int8),
        )(xx, w)
    return f, x


for name, offs in (("A misaligned 9-tap", TAPS),
                   ("B aligned-0 9-tap  ", [0] * 9),
                   ("B2 aligned-mult8   ", [8 * t for t in range(9)])):
    try:
        f, x = build(offs, M, ROW_CHUNK)
        np.asarray(f(x[:2]))
        slope_time(name, f, x)
    except Exception as e:
        print(name, "FAIL:", str(e)[-400:], flush=True)

# D: the real engine, re-measured as-is
try:
    from alpha_yolo_quant_tpu.runtime import packed_conv as pc

    plan = pc.make_plan(16, 16, 1, 160)
    w = rng.integers(-127, 128, (16, 16, 3, 3)).astype(np.int64)
    mats = pc.packed_weight_mats(w, plan)
    lane0 = pc.pack_lane_const(np.zeros(16, np.int64), plan)
    lane1 = pc.pack_lane_const(np.ones(16, np.int64), plan, fill=1)
    x = jnp.asarray(rng.integers(-127, 128, (B, 16, 160, 160), np.int8))

    def run_d(xx):
        slab = pc.pack_tensor_jnp(xx, plan)
        return pc.packed_conv_slab(
            slab, mats, lane0, lane1, lane1, lane1, lane1, plan, 160,
            qmax=127, sig_scale=18.142857, sig_qmax=127.0,
            corrections=(), bigshift=False, silu=True)

    np.asarray(run_d(x[:2]))
    slope_time("D real packed_conv_slab", run_d, x)
except Exception as e:
    print("D FAIL:", str(e)[-400:], flush=True)

print("done", flush=True)
