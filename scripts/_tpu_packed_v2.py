"""Isolate the packed-conv kernel's per-call floor (~3.4ms at B=32 on all
shapes). Variants (timing-only; V1/V2 compute wrong results by design):

V0 current kernel          — 9 misaligned loads + 3 dynamic stores
V1 aligned loads           — all taps read base=FRONT_PAD (wrong math)
V2 full-block store        — out block = m rows only, single aligned store
V3 V1+V2
V4 rolled-results          — loads at 3 aligned bases (dy*gp2 fixed to
                             32-mult via per-dy pad), ±1 shift applied to
                             int32 dot RESULTS via jnp.roll on sublanes
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from alpha_yolo_quant_tpu.runtime import packed_conv as pc

B = 32


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
    print(f"{name}: {dt*1000:.2f} ms (B={B})", flush=True)
    return dt


def make_kernel(m, gp2, r_out_ext, taps, variant):
    def kern(x_ref, w_ref, out_ref):
        acc = None
        for t, base in taps:
            b2 = pc.FRONT_PAD if variant in (1, 3) else base
            xs = x_ref[0, pl.ds(b2, m), :]
            d = jnp.dot(xs, w_ref[pl.ds(t * 128, 128), :],
                        preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
        out = jnp.clip(acc, -127, 127)
        if variant in (2, 3):
            out_ref[0] = out.astype(jnp.int8)
        else:
            dt8 = jnp.int8
            head = pc.FRONT_PAD + gp2
            out_ref[0, pl.ds(0, head), :] = jnp.zeros((head, 128), dt8)
            out_ref[0, pl.ds(head, m), :] = out.astype(dt8)
            tail = r_out_ext - head - m
            out_ref[0, pl.ds(head + m, tail), :] = jnp.zeros((tail, 128),
                                                             dt8)
    return kern


def run_variant(plan, h, x_slab, w_cat, taps, variant):
    gp2 = plan.g + 2
    m = h * gp2
    m32 = -(-m // 32) * 32
    r_in_ext = x_slab.shape[1]
    r_out_ext = pc.slab_rows_ext(plan, h)
    out_rows = m32 if variant in (2, 3) else r_out_ext
    kern = make_kernel(m if variant not in (2, 3) else m32, gp2, r_out_ext,
                       taps, variant)
    f = pl.pallas_call(
        kern, grid=(B,),
        in_specs=[pl.BlockSpec((1, r_in_ext, 128), lambda i: (i, 0, 0)),
                  pl.BlockSpec(w_cat.shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, out_rows, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, 128), jnp.int8))
    return lambda s: f(s, w_cat)


rng = np.random.default_rng(0)
for (cin, cout, hw) in [(16, 16, 160), (64, 64, 40)]:
    plan = pc.make_plan(cin, cout, 1, hw)
    x = rng.integers(-127, 128, (B, cin, hw, hw)).astype(np.int8)
    wt = rng.integers(-4, 5, (cout, cin, 3, 3)).astype(np.int64)
    mats = pc.packed_weight_mats(wt, plan)
    gp2 = plan.g + 2
    taps, wlist = [], []
    for dy in range(3):
        for gg in range(3):
            base = pc.FRONT_PAD + dy * gp2 + gg - 1
            taps.append((len(wlist), base))
            wlist.append(mats[dy, gg])
    w_cat = jnp.asarray(np.concatenate(wlist, 0))
    slab = jax.block_until_ready(
        pc.pack_tensor_jnp(jnp.asarray(x, jnp.int32), plan))
    for v in (0, 1, 2, 3):
        try:
            fn = run_variant(plan, hw, slab, w_cat, taps, v)
            chain_time(f"V{v} C{cin}@{hw}", fn, slab)
        except Exception as e:
            print(f"V{v} C{cin}@{hw}: FAIL {repr(e)[:200]}", flush=True)

print("done", flush=True)
