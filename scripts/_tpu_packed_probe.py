"""Packed banded-conv kernel on real TPU: Mosaic compile feasibility,
bit-exactness vs the s8 direct conv, and timing vs XLA for the narrow
stride-1 layers (chained timing)."""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import time

import numpy as np
import jax
import jax.numpy as jnp

from alpha_yolo_quant_tpu.runtime import packed_conv as pc
from alpha_yolo_quant_tpu.ops.nn import conv2d_s8_exact

B = 32
rng = np.random.default_rng(0)


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


for (cin, cout, hw) in [(16, 16, 160), (32, 32, 80), (64, 64, 40),
                        (16, 16, 320)]:
    plan = pc.make_plan(cin, cout, 1, hw)
    x = rng.integers(-127, 128, (B, cin, hw, hw)).astype(np.int8)
    wt = rng.integers(-127, 128, (cout, cin, 3, 3)).astype(np.int64)
    bias = rng.integers(-1000, 1000, (cout,)).astype(np.int64)
    mats = pc.packed_weight_mats(wt, plan)
    z = pc.pack_lane_const(np.zeros(cout), plan)
    o = pc.pack_lane_const(np.ones(cout), plan, fill=1)
    bl = pc.pack_lane_const(bias, plan)
    xj = jnp.asarray(x)

    # correctness on the real chip first
    try:
        slab = pc.pack_tensor_jnp(xj.astype(jnp.int32), plan)
        out_slab = pc.packed_conv_slab(slab, mats, bl, z, o, z, o,
                                       plan, hw, silu=False,
                                       interpret=False)
        got = np.asarray(pc.unpack_tensor_jnp(out_slab, plan, hw),
                         np.int64)
        want = np.asarray(
            conv2d_s8_exact(xj, jnp.asarray(wt, jnp.int8), 1, 1),
            np.int64) + bias.reshape(1, -1, 1, 1)
        print(f"C{cin}@{hw}: exact={np.array_equal(got, want)}",
              flush=True)
    except Exception as e:
        print(f"C{cin}@{hw}: COMPILE FAIL {repr(e)[:300]}", flush=True)
        continue

    wt8 = jnp.asarray(wt, jnp.int8)

    def xla_conv(a):
        return conv2d_s8_exact(a, wt8, 1, 1)

    chain_time(f"xla s8 direct C{cin}@{hw}", xla_conv, xj)

    slab0 = jax.block_until_ready(pc.pack_tensor_jnp(
        xj.astype(jnp.int32), plan))

    def packed_only(s):
        return pc.packed_conv_slab(s, mats, bl, z, o, z, o, plan, hw,
                                   silu=False, interpret=False)

    chain_time(f"packed kernel C{cin}@{hw}", packed_only, slab0)

    def packed_e2e(a):
        s = pc.pack_tensor_jnp(a.astype(jnp.int32), plan)
        out = pc.packed_conv_slab(s, mats, bl, z, o, z, o, plan, hw,
                                  silu=False, interpret=False)
        return pc.unpack_tensor_jnp(out, plan, hw)

    chain_time(f"packed+pack/unpack C{cin}@{hw}", packed_e2e, xj)

print("done", flush=True)
