"""Isolate the packed-conv per-call floor (~3ms at B=32 on every shape;
alignment variants V0-V3 all identical -> not load/store alignment).

Experiments (C16@160 slab: gp2=22, m=3520, all timing chained):
  copy        pure in->out block copy, same specs        (DMA+grid floor)
  dot1        single aligned tap dot
  dot9        nine aligned tap dots (V1 twin)
  dot9_bf16   nine taps with bf16 operands / f32 acc
  dot9 B=8/32/128  per-step vs per-call scaling
  chunk512    grid=(B, nchunks): full slab in, interior-only out chunks,
              dynamic ds bases  (the C16@320 VMEM fix candidate)
  chunk C16@320    compile feasibility + time
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

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
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return dt


def make_slab(b, cin, hw, seed=0):
    plan = pc.make_plan(cin, cin, 1, hw)
    rng = np.random.default_rng(seed)
    x = rng.integers(-127, 128, (b, cin, hw, hw)).astype(np.int8)
    xj = jnp.asarray(x)
    slab = np.asarray(pc.pack_tensor_jnp(xj.astype(jnp.int32), plan))
    wt = rng.integers(-127, 128, (cin, cin, 3, 3)).astype(np.int64)
    mats = pc.packed_weight_mats(wt, plan)
    wlist = [mats[dy, gg] for dy in range(3) for gg in range(3)]
    w_cat = jnp.asarray(np.concatenate(wlist, 0))
    return plan, jnp.asarray(slab), w_cat


def run_full(slab, w_cat, plan, h, taps, dtype="int8"):
    """Whole-image kernel, aligned loads at FRONT_PAD (timing only)."""
    gp2 = plan.g + 2
    m = h * gp2
    m32 = -(-m // 32) * 32
    r_in_ext = slab.shape[1]

    def kern(x_ref, w_ref, out_ref):
        acc = None
        for t in range(taps):
            xs = x_ref[0, pl.ds(pc.FRONT_PAD, m32), :]
            if dtype == "bf16":
                d = jnp.dot(xs.astype(jnp.bfloat16),
                            w_ref[pl.ds(t * 128, 128), :].astype(
                                jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                d = d.astype(jnp.int32)
            else:
                d = jnp.dot(xs, w_ref[pl.ds(t * 128, 128), :],
                            preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
        out_ref[0] = jnp.clip(acc, -127, 127).astype(jnp.int8)

    b = slab.shape[0]
    return pl.pallas_call(
        kern, grid=(b,),
        in_specs=[pl.BlockSpec((1, r_in_ext, 128), lambda i: (i, 0, 0)),
                  pl.BlockSpec(w_cat.shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, m32, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m32, 128), jnp.int8),
    )(slab, w_cat)


def run_copy(slab, plan, h):
    gp2 = plan.g + 2
    m32 = -(-(h * gp2) // 32) * 32
    r_in_ext = slab.shape[1]

    def kern(x_ref, out_ref):
        out_ref[0] = x_ref[0, pl.ds(pc.FRONT_PAD, m32), :]

    b = slab.shape[0]
    return pl.pallas_call(
        kern, grid=(b,),
        in_specs=[pl.BlockSpec((1, r_in_ext, 128), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, m32, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m32, 128), jnp.int8),
    )(slab)


def run_chunked(slab, w_cat, plan, h, chunk):
    """grid=(B, m/chunk): full slab input per step, interior-only output
    chunk, REAL 9-tap offsets via dynamic ds bases."""
    gp2 = plan.g + 2
    m = h * gp2
    assert m % chunk == 0 and chunk % 32 == 0
    nch = m // chunk
    r_in_ext = slab.shape[1]
    bases = [pc.FRONT_PAD + dy * gp2 + gg - 1 + gp2
             for dy in range(3) for gg in range(3)]
    # bases relative to interior row 0 of the INPUT slab; interior starts
    # at FRONT_PAD + gp2 for the (dy=1,g=1) center tap == FRONT_PAD+gp2+0

    def kern(x_ref, w_ref, out_ref):
        c = pl.program_id(1)
        q0 = c * chunk
        acc = None
        for t, base in enumerate(bases):
            xs = x_ref[0, pl.ds(base - gp2 + q0, chunk), :]
            d = jnp.dot(xs, w_ref[pl.ds(t * 128, 128), :],
                        preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
        out_ref[0] = jnp.clip(acc, -127, 127).astype(jnp.int8)

    b = slab.shape[0]
    return pl.pallas_call(
        kern, grid=(b, nch),
        in_specs=[pl.BlockSpec((1, r_in_ext, 128), lambda i, c: (i, 0, 0)),
                  pl.BlockSpec(w_cat.shape, lambda i, c: (0, 0))],
        out_specs=pl.BlockSpec((1, chunk, 128), lambda i, c: (i, c, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m, 128), jnp.int8),
    )(slab, w_cat)


print("backend:", jax.default_backend(), flush=True)

plan, slab, w_cat = make_slab(32, 16, 160)
chain_time("copy  C16@160 B=32", lambda s: run_copy(s, plan, 160), slab)
chain_time("dot1  C16@160 B=32",
           lambda s: run_full(s, w_cat, plan, 160, 1), slab)
chain_time("dot9  C16@160 B=32",
           lambda s: run_full(s, w_cat, plan, 160, 9), slab)
chain_time("dot9bf16 C16@160 B=32",
           lambda s: run_full(s, w_cat, plan, 160, 9, "bf16"), slab)

for b in (8, 128):
    plan_b, slab_b, wc_b = make_slab(b, 16, 160)
    chain_time(f"dot9  C16@160 B={b}",
               lambda s: run_full(s, wc_b, plan_b, 160, 9), slab_b)

for chunk in (352, 704, 1760):
    try:
        chain_time(f"chunk{chunk} C16@160 B=32",
                   lambda s, ck=chunk: run_chunked(s, w_cat, plan, 160, ck),
                   slab)
    except Exception as e:  # noqa: BLE001
        print(f"chunk{chunk} FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)

plan3, slab3, w3 = make_slab(8, 16, 320)
for chunk in (672, 1344):
    try:
        chain_time(f"chunk{chunk} C16@320 B=8",
                   lambda s, ck=chunk: run_chunked(s, w3, plan3, 320, ck),
                   slab3)
    except Exception as e:  # noqa: BLE001
        print(f"chunk{chunk} C16@320 FAIL {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)

print("done", flush=True)
