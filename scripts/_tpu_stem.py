"""Stem (quant + Conv_P1 + Conv_P2) variants at B=128, slope-timed.
Round-1 rejected space-to-depth with artifact-inflated timing; re-test:
  A current: quant -> bf16 P1 (3->16@640 s2) + epi -> bf16 P2 (16->32
     @320 s2) + epi
  B s2d P1 only: P1 as 12->16 2x2 s1 over s2d(input)
  C s2d both: P2 as 64->32 2x2 s1 over s2d(P1 out)
  D s8 direct both (int8 MXU path)
Exactness of each conv rewrite is asserted vs the direct conv first.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo/scripts")
from _slope import slope_time  # noqa: E402

from alpha_yolo_quant_tpu.ops.nn import (  # noqa: E402
    conv2d_bf16_exact, conv2d_s8_exact, s2d_weights, space_to_depth2,
)
from alpha_yolo_quant_tpu.ops.intmath import requantize_i32  # noqa: E402
from alpha_yolo_quant_tpu.runtime.interpreter import (  # noqa: E402
    quantize_input,
)

B = 128
rng = np.random.default_rng(0)
print("backend:", jax.default_backend(), flush=True)

w1 = rng.integers(-127, 128, (16, 3, 3, 3)).astype(np.int64)
w2 = rng.integers(-127, 128, (32, 16, 3, 3)).astype(np.int64)
w1j = jnp.asarray(w1, jnp.int8)
w2j = jnp.asarray(w2, jnp.int8)
w1s2d = jnp.asarray(s2d_weights(w1), jnp.int8)      # (16, 12, 2, 2)
w2s2d = jnp.asarray(s2d_weights(w2), jnp.int8)      # (32, 64, 2, 2)
imgs = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640))
                      .astype(np.float32))


def conv_s2d_bf16(x_int, w_s2d):
    y = space_to_depth2(x_int.astype(jnp.bfloat16))
    return lax.conv_general_dilated(
        y, w_s2d.astype(jnp.bfloat16), window_strides=(1, 1),
        padding=[(1, 0), (1, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32).astype(jnp.int32)


def epi(acc, c):
    dom = requantize_i32(acc, 3, 9, 127)
    sig = jnp.clip(jnp.round(jax.nn.sigmoid(
        dom.astype(jnp.float32) / np.float32(20.0)) * 127),
        -127, 127).astype(jnp.int32)
    return requantize_i32(acc, sig * 3, 9, 127).astype(jnp.bfloat16)


# exactness of the s2d rewrites (small input)
xs = jnp.asarray(rng.integers(-127, 128, (2, 3, 64, 64)), jnp.int8)
a = np.asarray(conv2d_s8_exact(xs, w1j, 2, 1))
b = np.asarray(space_to_depth2(xs.astype(jnp.int8)))
b = np.asarray(lax.conv_general_dilated(
    jnp.asarray(b), w1s2d, window_strides=(1, 1), padding=[(1, 0), (1, 0)],
    dimension_numbers=("NCHW", "OIHW", "NCHW"),
    preferred_element_type=jnp.int32))
print("s2d P1 exact:", np.array_equal(a, b), flush=True)


def variant(p1_mode, p2_mode):
    def fn(t):
        xq = quantize_input(t, 8)
        if p1_mode == "bf16":
            acc1 = conv2d_bf16_exact(xq, w1j, 2, 1)
        elif p1_mode == "s8":
            acc1 = conv2d_s8_exact(xq, w1j, 2, 1)
        else:
            acc1 = conv_s2d_bf16(xq, w1s2d)
        x1 = epi(acc1, 16)
        if p2_mode == "bf16":
            acc2 = conv2d_bf16_exact(x1, w2j, 2, 1)
        elif p2_mode == "s8":
            acc2 = conv2d_s8_exact(x1.astype(jnp.int8), w2j, 2, 1)
        else:
            acc2 = conv_s2d_bf16(x1, w2s2d)
        return epi(acc2, 32)
    return fn


for name, m1, m2 in [("A bf16/bf16", "bf16", "bf16"),
                     ("B s2d /bf16", "s2d", "bf16"),
                     ("C s2d /s2d ", "s2d", "s2d"),
                     ("D s8  /s8  ", "s8", "s8"),
                     ("E bf16/s2d ", "bf16", "s2d")]:
    try:
        slope_time(f"{name}", variant(m1, m2), imgs)
    except Exception as e:  # noqa: BLE001
        print(f"{name} FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)
print("done", flush=True)
