"""Floor follow-up. Facts so far: every pallas_call costs ~3ms in the
chained fori_loop harness, flat in B (8/32/128) and in work (copy == 9
dots). Questions:
  A. harness calibration: XLA full-copy op (flip) in the same harness
  B. is the floor per iteration? iters=10 vs 50
  C. unrolled 10 kernels inside ONE jit call (no fori_loop)
  D. TWO chained packed layers inside ONE pallas call (VMEM scratch)
  E. full Mosaic error for the chunked-grid compile failure
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
import jax.experimental.pallas.tpu as pltpu

from alpha_yolo_quant_tpu.runtime import packed_conv as pc


def chain_time(name, fn, x0, iters=10):
    @jax.jit
    def loop(x, n):
        def body(i, carry):
            x, acc = carry
            out = fn(x)
            s = out.reshape(-1)[0].astype(jnp.float32)
            x = x + (s * 0).astype(x.dtype)
            return x, acc + s
        return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))[1]

    float(loop(x0, 2))
    t0 = time.perf_counter()
    float(loop(x0, iters))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.2f} ms  (iters={iters})", flush=True)
    return dt


def make_slab(b, cin, hw, seed=0):
    plan = pc.make_plan(cin, cin, 1, hw)
    rng = np.random.default_rng(seed)
    x = rng.integers(-127, 128, (b, cin, hw, hw)).astype(np.int8)
    slab = np.asarray(pc.pack_tensor_jnp(jnp.asarray(x).astype(jnp.int32),
                                         plan))
    wt = rng.integers(-4, 5, (cin, cin, 3, 3)).astype(np.int64)
    mats = pc.packed_weight_mats(wt, plan)
    wlist = [mats[dy, gg] for dy in range(3) for gg in range(3)]
    w_cat = jnp.asarray(np.concatenate(wlist, 0))
    return plan, jnp.asarray(slab), w_cat


B = 32
plan, slab, w_cat = make_slab(B, 16, 160)
gp2 = plan.g + 2
m = 160 * gp2
m32 = -(-m // 32) * 32
r_in_ext = slab.shape[1]


def run_copy(s):
    def kern(x_ref, out_ref):
        out_ref[0] = x_ref[0, pl.ds(pc.FRONT_PAD, m32), :]

    return pl.pallas_call(
        kern, grid=(B,),
        in_specs=[pl.BlockSpec((1, r_in_ext, 128), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, m32, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, m32, 128), jnp.int8),
    )(s)


# A: XLA copy baseline in the same harness
chain_time("A xla flip    ", lambda s: jnp.flip(s, axis=1), slab)
# B: per-iteration scaling
chain_time("B copy iters10", run_copy, slab, iters=10)
chain_time("B copy iters50", run_copy, slab, iters=50)


# C: unrolled 10 inside one jit — dependency-chain via slab re-extension
@jax.jit
def unrolled(s):
    for _ in range(10):
        out = run_copy(s)                       # (B, m32, 128)
        s = jnp.pad(out, ((0, 0), (pc.FRONT_PAD, r_in_ext - pc.FRONT_PAD
                                   - m32), (0, 0)))
    return out.reshape(-1)[0].astype(jnp.float32)


float(unrolled(slab))
t0 = time.perf_counter()
for _ in range(3):
    r = unrolled(slab)
float(r)
print(f"C unrolled10: {(time.perf_counter()-t0)/3/10*1000:.2f} ms/kernel",
      flush=True)


# D: two chained conv layers inside ONE pallas call via VMEM scratch
def run_two_layer(s):
    def kern(x_ref, w_ref, out_ref, scratch):
        # layer 1: 9 taps from x_ref -> scratch (interior written at the
        # same extended offsets, pads zeroed wholesale first)
        scratch[0] = jnp.zeros((r_in_ext, 128), jnp.int8)
        acc = None
        for t in range(9):
            dy, gg = divmod(t, 3)
            base = pc.FRONT_PAD + dy * gp2 + gg - 1
            xs = x_ref[0, pl.ds(base, m32), :]
            d = jnp.dot(xs, w_ref[pl.ds(t * 128, 128), :],
                        preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
        head = pc.FRONT_PAD + gp2
        u = jax.lax.broadcasted_iota(jnp.int32, (m32, 1), 0) % gp2
        ok = (u >= 1) & (u <= gp2 - 2)
        scratch[0, pl.ds(head, m32), :] = jnp.where(
            ok, jnp.clip(acc, -127, 127), 0).astype(jnp.int8)
        # layer 2: same conv from scratch -> out
        acc = None
        for t in range(9):
            dy, gg = divmod(t, 3)
            base = pc.FRONT_PAD + dy * gp2 + gg - 1
            xs = scratch[0, pl.ds(base, m32), :]
            d = jnp.dot(xs, w_ref[pl.ds(t * 128, 128), :],
                        preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
        out_ref[0] = jnp.clip(acc, -127, 127).astype(jnp.int8)

    return pl.pallas_call(
        kern, grid=(B,),
        in_specs=[pl.BlockSpec((1, r_in_ext, 128), lambda i: (i, 0, 0)),
                  pl.BlockSpec(w_cat.shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, m32, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, m32, 128), jnp.int8),
        scratch_shapes=[pltpu.VMEM((1, r_in_ext + m32 + 64, 128),
                                   jnp.int8)],
    )(s, w_cat)


try:
    chain_time("D two-layer   ", run_two_layer, slab)
except Exception as e:  # noqa: BLE001
    print("D FAIL:", type(e).__name__, str(e)[:2000], flush=True)


# E: chunked-grid full error
def run_chunked(s, chunk):
    nch = m // chunk

    def kern(x_ref, w_ref, out_ref):
        c = pl.program_id(1)
        q0 = c * chunk
        acc = None
        for t in range(9):
            dy, gg = divmod(t, 3)
            base = pc.FRONT_PAD + dy * gp2 + gg - 1
            xs = x_ref[0, pl.ds(base + q0, chunk), :]
            d = jnp.dot(xs, w_ref[pl.ds(t * 128, 128), :],
                        preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
        out_ref[0] = jnp.clip(acc, -127, 127).astype(jnp.int8)

    return pl.pallas_call(
        kern, grid=(B, nch),
        in_specs=[pl.BlockSpec((1, r_in_ext, 128), lambda i, c: (i, 0, 0)),
                  pl.BlockSpec(w_cat.shape, lambda i, c: (0, 0))],
        out_specs=pl.BlockSpec((1, chunk, 128), lambda i, c: (i, c, 0)),
        out_shape=jax.ShapeDtypeStruct((B, m, 128), jnp.int8),
    )(s, w_cat)


try:
    chain_time("E chunk704    ", lambda s: run_chunked(s, 704), slab)
except Exception as e:  # noqa: BLE001
    print("E FAIL:", type(e).__name__, str(e)[:3000], flush=True)

print("done", flush=True)
