"""Epilogue-fusion hypothesis, B=128 slope-timed.

auto-layer C16@160 measured 0.755ms == roofline WITH an unfused f32
accumulator roundtrip (conv-in 105MB + acc-out 210 + epi-in 210 +
out 105 = 630MB -> 0.77ms). Tests:
  conv alone        (expect ~0.38 if the conv itself is roofline)
  conv+epi          (0.755 known)
  1x1 conv+epi      C128->64@80 NCHW
  1x1 as dot+epi    NHWC x: (B*H*W,128)@(128,64) — XLA fuses elementwise
                    into dot outputs; expect ~(in+out) traffic only
  3x3 as 9-dot +epi NHWC: 9 shifted dots accumulated, epi fused
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo/scripts")
from _slope import slope_time  # noqa: E402

from alpha_yolo_quant_tpu.ops.nn import conv2d_bf16_exact  # noqa: E402
from alpha_yolo_quant_tpu.ops.intmath import requantize_i32  # noqa: E402

B = 128
rng = np.random.default_rng(0)
print("backend:", jax.default_backend(), flush=True)


def epi_bf16(acc):
    dom = requantize_i32(acc, 3, 9, 127)
    sig = jnp.clip(jnp.round(jax.nn.sigmoid(
        dom.astype(jnp.float32) / np.float32(20.0)) * 127),
        -127, 127).astype(jnp.int32)
    return requantize_i32(acc, sig * 3, 9, 127).astype(jnp.bfloat16)


# --- C16@160 3x3 ---
x = jnp.asarray(rng.integers(-127, 128, (B, 16, 160, 160)),
                jnp.bfloat16)
w = jnp.asarray(rng.integers(-127, 128, (16, 16, 3, 3)), jnp.int8)
slope_time("conv3 alone C16@160 ",
           lambda t: conv2d_bf16_exact(t, w, 1, 1), x)
slope_time("conv3+epi   C16@160 ",
           lambda t: epi_bf16(conv2d_bf16_exact(t, w, 1, 1)), x)

# --- 1x1 C128->64@80 ---
xc = jnp.asarray(rng.integers(-127, 128, (B, 128, 80, 80)), jnp.bfloat16)
w1 = jnp.asarray(rng.integers(-127, 128, (64, 128, 1, 1)), jnp.int8)
slope_time("conv1+epi  C128@80  ",
           lambda t: epi_bf16(conv2d_bf16_exact(t, w1, 1, 0)), xc)

xh = jnp.asarray(rng.integers(-127, 128, (B, 80, 80, 128)), jnp.bfloat16)
wm = jnp.asarray(np.asarray(w1)[:, :, 0, 0].T, jnp.bfloat16)  # (128,64)


def dot1(t):
    acc = jax.lax.dot_general(
        t, wm, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    return epi_bf16(acc)


slope_time("dot1+epi   C128@80  ", dot1, xh)

# --- 3x3 as 9 shifted NHWC dots: C16@160 ---
xh3 = jnp.asarray(rng.integers(-127, 128, (B, 160, 160, 16)),
                  jnp.bfloat16)
wt = np.asarray(rng.integers(-127, 128, (9, 16, 16)), np.float32)
wtj = jnp.asarray(wt, jnp.bfloat16)


def dot9(t):
    tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for k in range(9):
        dy, dx = divmod(k, 3)
        xs = lax.dynamic_slice(tp, (0, dy, dx, 0), t.shape)
        d = jax.lax.dot_general(
            xs, wtj[k], (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return epi_bf16(acc.astype(jnp.int32))


slope_time("dot9+epi   C16@160  ", dot9, xh3)
print("done", flush=True)
