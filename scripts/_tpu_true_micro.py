"""TRUE per-shape conv costs at B=128 with slope timing (fixed-cost
cancelled). packed Mosaic kernel vs XLA bf16-single vs XLA s8-direct,
plus C16@320 with the in-kernel row-chunked accumulator, the stride-2
P2 shape, and quantize_input.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from _slope import slope_time  # noqa: E402

from alpha_yolo_quant_tpu.runtime import packed_conv as pc  # noqa: E402
from alpha_yolo_quant_tpu.ops.nn import (  # noqa: E402
    conv2d_bf16_exact, conv2d_s8_exact,
)

B = 128
rng = np.random.default_rng(0)
print("backend:", jax.default_backend(), flush=True)

for cin, hw in [(16, 160), (32, 80), (64, 40), (128, 20), (16, 320)]:
    plan = pc.make_plan(cin, cin, 1, hw)
    x = rng.integers(-127, 128, (B, cin, hw, hw)).astype(np.int8)
    xj = jnp.asarray(x)
    wt = rng.integers(-127, 128, (cin, cin, 3, 3)).astype(np.int64)
    mats = pc.packed_weight_mats(wt, plan)
    z = pc.pack_lane_const(np.zeros(cin), plan)
    o = pc.pack_lane_const(np.ones(cin), plan, fill=1)
    bl = pc.pack_lane_const(np.zeros(cin), plan)
    w8 = jnp.asarray(wt, jnp.int8)

    slab0 = pc.pack_tensor_jnp(xj.astype(jnp.int32), plan)

    def packed(s, mats=mats, bl=bl, z=z, o=o, plan=plan, hw=hw):
        return pc.packed_conv_slab(s, mats, bl, z, o, z, o, plan, hw,
                                   silu=False, interpret=False)

    def packed_silu(s, mats=mats, bl=bl, z=z, o=o, plan=plan, hw=hw):
        return pc.packed_conv_slab(s, mats, bl, z, o, z, o, plan, hw,
                                   sig_scale=20.0, bigshift=False,
                                   silu=True, interpret=False)

    try:
        # exactness at B=4 (cheap compile), timing at B=128
        x4 = jnp.asarray(x[:4])
        s4 = pc.pack_tensor_jnp(x4.astype(jnp.int32), plan)
        got = np.asarray(pc.unpack_tensor_jnp(
            pc.packed_conv_slab(s4, mats, bl, z, o, z, o, plan, hw,
                                silu=False, interpret=False), plan, hw),
            np.int64)
        want = np.asarray(conv2d_s8_exact(x4, w8, 1, 1), np.int64)
        print(f"C{cin}@{hw}: exact={np.array_equal(got, want)}",
              flush=True)
        slope_time(f"packed+silu C{cin}@{hw} B={B}", packed_silu, slab0)
    except Exception as e:  # noqa: BLE001
        print(f"packed C{cin}@{hw} FAIL {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    slope_time(f"xla bf16    C{cin}@{hw} B={B}",
               lambda t, w8=w8: conv2d_bf16_exact(t, w8, 1, 1)
               .astype(jnp.int8), xj)
    slope_time(f"xla s8      C{cin}@{hw} B={B}",
               lambda t, w8=w8: jnp.clip(
                   conv2d_s8_exact(t, w8, 1, 1), -127, 127)
               .astype(jnp.int8), xj)

# quantize_input true cost
from alpha_yolo_quant_tpu.runtime.interpreter import quantize_input  # noqa
imgs = jnp.asarray(rng.uniform(0, 1, (B, 3, 640, 640)).astype(np.float32))
slope_time("quantize_input B=128", lambda t: quantize_input(t, 8), imgs)

print("done", flush=True)
