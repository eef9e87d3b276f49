"""Isolate the sibling-merge pathology: time the merged conv alone vs two
separate convs, and the slice/epilogue structure, at the p3 head shape.

Run detached:  python -u scripts/_tpu_r5_merge2.py > /tmp/r5_merge2.log 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from scripts._slope import slope_time  # noqa: E402

B, C, H = 128, 64, 80
rng = np.random.default_rng(0)
x = jax.device_put(rng.integers(-127, 128, (B, C, H, H)).astype(np.int8)
                   .astype(jnp.bfloat16))
w_a = jnp.asarray(rng.integers(-127, 128, (64, C, 3, 3)), jnp.bfloat16)
w_b = jnp.asarray(rng.integers(-127, 128, (80, C, 3, 3)), jnp.bfloat16)
w_cat = jnp.concatenate([w_a, w_b], 0)


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)


def epi(acc):
    # stand-in epilogue: convert + clip + scale + bf16 store
    a = acc.astype(jnp.int32)
    return jnp.clip(a >> 8, -127, 127).astype(jnp.bfloat16)


def two_convs(x):
    return epi(conv(x, w_a)), epi(conv(x, w_b))


def merged_slice(x):
    a = conv(x, w_cat)
    return (epi(lax.slice_in_dim(a, 0, 64, axis=1)),
            epi(lax.slice_in_dim(a, 64, 144, axis=1)))


def merged_whole(x):
    a = epi(conv(x, w_cat))
    return (lax.slice_in_dim(a, 0, 64, axis=1),
            lax.slice_in_dim(a, 64, 144, axis=1))


def merged_conv_only(x):
    return conv(x, w_cat)


def conv144_only(x):
    return conv(x, w_cat) * jnp.float32(1.0)


slope_time("two separate convs+epi   ", two_convs, x)
slope_time("merged conv, sliced epi  ", merged_slice, x)
slope_time("merged conv, whole epi   ", merged_whole, x)
slope_time("merged conv only (144out)", merged_conv_only, x)
print("done", flush=True)
