"""Kernel variants vs the auto layer, slope-timed at B=128, C16@160.

V1 merged-grid: 4 images per grid step, ONE (4*r_ext, 128) dot per tap
   (correct relative offsets because r_in_ext == r_out_ext; junk rows at
   image boundaries are masked). Timing-only prototype.
V2 bf16 dots (same merged grid).
V3 auto layer with bf16 inter-layer storage (no int8->bf16 convert).
V4 auto layer chain x9 bf16-storage (steady state).
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo/scripts")
from _slope import slope_time  # noqa: E402

from alpha_yolo_quant_tpu.runtime import packed_conv as pc  # noqa: E402
from alpha_yolo_quant_tpu.ops.intmath import requantize_i32  # noqa: E402
from jax import lax  # noqa: E402

B = 128
IB = 4     # images per grid step
rng = np.random.default_rng(0)
print("backend:", jax.default_backend(), flush=True)

cin, hw = 16, 160
plan = pc.make_plan(cin, cin, 1, hw)
gp2 = plan.g + 2
m = hw * gp2
x = rng.integers(-127, 128, (B, cin, hw, hw)).astype(np.int8)
xj = jnp.asarray(x)
wt = rng.integers(-127, 128, (cin, cin, 3, 3)).astype(np.int64)
mats = pc.packed_weight_mats(wt, plan)
wlist = [mats[dy, gg] for dy in range(3) for gg in range(3)]
w_cat = jnp.asarray(np.concatenate(wlist, 0))
slab0 = jax.block_until_ready(pc.pack_tensor_jnp(xj.astype(jnp.int32),
                                                 plan))
r_ext = slab0.shape[1]
mm = (IB - 1) * r_ext + m          # merged dot rows covering IB images


CHUNK = 3584      # rows per in-kernel chunk (int32 acc = 1.8MB VMEM)


def run_merged(s, dtype="int8"):
    def kern(x_ref, w_ref, out_ref):
        head = pc.FRONT_PAD + gp2
        out_ref[0, pl.ds(0, head), :] = jnp.zeros((head, 128), jnp.int8)
        tail = IB * r_ext - head - mm
        out_ref[0, pl.ds(head + mm, tail), :] = jnp.zeros(
            (tail, 128), jnp.int8)
        for q0 in range(0, mm, CHUNK):
            rows = min(CHUNK, mm - q0)
            acc = None
            for t in range(9):
                dy, gg = divmod(t, 3)
                base = pc.FRONT_PAD + dy * gp2 + gg - 1 + q0
                xs = x_ref[0, pl.ds(base, rows), :]
                if dtype == "bf16":
                    d = jnp.dot(xs.astype(jnp.bfloat16),
                                w_ref[pl.ds(t * 128, 128), :]
                                .astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                    d = d.astype(jnp.int32)
                else:
                    d = jnp.dot(xs, w_ref[pl.ds(t * 128, 128), :],
                                preferred_element_type=jnp.int32)
                acc = d if acc is None else acc + d
            # epilogue (sigmoid requant) on the chunk
            dom = requantize_i32(acc, 3, 9, 127)
            sig = jnp.clip(jnp.round(jax.nn.sigmoid(
                dom.astype(jnp.float32) / np.float32(20.0)) * 127),
                -127, 127).astype(jnp.int32)
            out = requantize_i32(acc, sig * 3, 9, 127)
            u = q0 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
            ok = ((u % r_ext) < m) & ((u % gp2) >= 1) \
                & ((u % gp2) <= gp2 - 2)
            out = jnp.where(ok, out, 0).astype(jnp.int8)
            out_ref[0, pl.ds(head + q0, rows), :] = out

    s4 = s.reshape(B // IB, IB * r_ext, 128)
    out = pl.pallas_call(
        kern, grid=(B // IB,),
        in_specs=[pl.BlockSpec((1, IB * r_ext, 128), lambda i: (i, 0, 0)),
                  pl.BlockSpec(w_cat.shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, IB * r_ext, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B // IB, IB * r_ext, 128),
                                       jnp.int8),
    )(s4, w_cat)
    return out.reshape(B, r_ext, 128)


w8 = jnp.asarray(wt, jnp.int8)
wb = jnp.asarray(wt, jnp.bfloat16)
r1 = jnp.full((1, cin, 1, 1), 3, jnp.int32)
s1 = jnp.full((1, cin, 1, 1), 9, jnp.int32)


def auto_layer_bf16(t):
    """bf16 in (integer-valued), bf16 out — no convert pass."""
    acc = lax.conv_general_dilated(
        t, wb, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    dom = requantize_i32(acc, r1, s1, 127)
    sig = jnp.clip(jnp.round(jax.nn.sigmoid(dom.astype(jnp.float32)
                                            / np.float32(20.0)) * 127),
                   -127, 127).astype(jnp.int32)
    out = requantize_i32(acc, sig * r1, s1, 127)
    return out.astype(jnp.bfloat16)


xb = jax.block_until_ready(xj.astype(jnp.bfloat16))

for name, fn, x0 in [
    ("V1 merged-int8 ", lambda s: run_merged(s, "int8"), slab0),
    ("V2 merged-bf16 ", lambda s: run_merged(s, "bf16"), slab0),
    ("V3 auto-bf16st ", auto_layer_bf16, xb),
    ("V4 9x auto-bf16",
     lambda t: [t := auto_layer_bf16(t) for _ in range(9)][-1], xb),
]:
    try:
        slope_time(name, fn, x0)
    except Exception as e:  # noqa: BLE001
        print(f"{name} FAIL {type(e).__name__}: {str(e)[:400]}",
              flush=True)

print("done", flush=True)
