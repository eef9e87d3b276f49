"""Attribute the packed-engine e2e regression (1367 vs 2332 img/s):
per-component slope-timed costs at B=128 for a representative shallow
(C16@160) and deep (C64@40) layer:
  pack | unpack | kernel slab->slab | pack+kernel+unpack |
  auto-engine equivalent (bf16 conv + int epilogue, NCHW int8->int8) |
  9x chained kernels (steady-state slab residency) vs 9x chained auto.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from _slope import slope_time  # noqa: E402

from alpha_yolo_quant_tpu.runtime import packed_conv as pc  # noqa: E402
from alpha_yolo_quant_tpu.ops.nn import conv2d_bf16_exact  # noqa: E402
from alpha_yolo_quant_tpu.ops.intmath import requantize_i32  # noqa: E402

B = 128
rng = np.random.default_rng(0)
print("backend:", jax.default_backend(), flush=True)


def auto_layer(x_i8, w8, r1, s1, r2, s2):
    """The auto engine's per-layer reality: bf16 conv -> int32 acc ->
    requant -> sigmoid -> fold -> requant -> int8 (NCHW)."""
    acc = conv2d_bf16_exact(x_i8, w8, 1, 1)
    dom = requantize_i32(acc, r1, s1, 127)
    sig = jnp.clip(jnp.round(jax.nn.sigmoid(dom.astype(jnp.float32)
                                            / np.float32(20.0)) * 127),
                   -127, 127).astype(jnp.int32)
    out = requantize_i32(acc, sig * r2, s2, 127)
    return out.astype(jnp.int8)


for cin, hw in [(16, 160), (64, 40)]:
    plan = pc.make_plan(cin, cin, 1, hw)
    x = rng.integers(-127, 128, (B, cin, hw, hw)).astype(np.int8)
    xj = jnp.asarray(x)
    wt = rng.integers(-127, 128, (cin, cin, 3, 3)).astype(np.int64)
    w8 = jnp.asarray(wt, jnp.int8)
    mats = pc.packed_weight_mats(wt, plan)
    z = pc.pack_lane_const(np.zeros(cin), plan)
    o = pc.pack_lane_const(np.ones(cin), plan, fill=1)
    bl = pc.pack_lane_const(np.zeros(cin), plan)
    slab0 = jax.block_until_ready(pc.pack_tensor_jnp(
        xj.astype(jnp.int32), plan))

    def kern(s, mats=mats, bl=bl, z=z, o=o, plan=plan, hw=hw):
        return pc.packed_conv_slab(s, mats, bl, z, o, z, o, plan, hw,
                                   sig_scale=20.0, silu=True,
                                   interpret=False)

    def pko(t, plan=plan, hw=hw, kern=kern):
        s = pc.pack_tensor_jnp(t, plan)
        return pc.unpack_tensor_jnp(kern(s), plan, hw)

    def chain9(s, kern=kern):
        for _ in range(9):
            s = kern(s)
        return s

    r1 = jnp.full((1, cin, 1, 1), 3, jnp.int32)
    s1 = jnp.full((1, cin, 1, 1), 9, jnp.int32)

    def auto1(t, w8=w8, r1=r1, s1=s1):
        return auto_layer(t, w8, r1, s1, r1, s1)

    def auto9(t, w8=w8, r1=r1, s1=s1):
        for _ in range(9):
            t = auto_layer(t, w8, r1, s1, r1, s1)
        return t

    tag = f"C{cin}@{hw}"
    slope_time(f"pack        {tag}",
               lambda t, plan=plan: pc.pack_tensor_jnp(t, plan), xj)
    slope_time(f"kernel      {tag}", kern, slab0)
    slope_time(f"unpack      {tag}",
               lambda s, plan=plan, hw=hw:
               pc.unpack_tensor_jnp(s.astype(jnp.int8), plan, hw), slab0)
    slope_time(f"pack+k+unp  {tag}", pko, xj)
    slope_time(f"auto-layer  {tag}", auto1, xj)
    slope_time(f"9x kernel   {tag}", chain9, slab0)
    slope_time(f"9x auto     {tag}", auto9, xj)

print("done", flush=True)
