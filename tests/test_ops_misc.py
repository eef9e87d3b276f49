"""Misc op-level exactness: the space-to-depth conv rewrite and the exact
bf16 single-pass conv."""

import numpy as np

import conftest  # noqa: F401

import jax.numpy as jnp

from alpha_yolo_quant_tpu.ops.nn import (
    conv2d_bf16_exact, conv2d_int_exact, conv2d_s8_exact, conv2d_s8_s2d,
    s2d_weights,
)

RNG = np.random.default_rng(33)


def test_s2d_rewrite_exact():
    """The space-to-depth transform of a 3x3 stride-2 pad-1 conv is an
    exact integer rewrite (kept for documentation — measured slower than
    XLA's direct conv on v5e, see STATUS.md)."""
    x = jnp.asarray(RNG.integers(-127, 128, (2, 3, 32, 32), dtype=np.int8))
    w = RNG.integers(-127, 128, (8, 3, 3, 3)).astype(np.int8)
    want = conv2d_int_exact(x, jnp.asarray(w, jnp.int32), 2, 1)
    got = conv2d_s8_s2d(x, jnp.asarray(s2d_weights(w), jnp.int8))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_conv_flavors_agree():
    x = jnp.asarray(RNG.integers(-254, 255, (2, 8, 16, 16), dtype=np.int16))
    w = jnp.asarray(RNG.integers(-127, 128, (12, 8, 3, 3), dtype=np.int32))
    want = conv2d_int_exact(x, w, 1, 1)
    got_s8 = conv2d_s8_exact(x, w.astype(jnp.int8), 1, 1, wide_input=True)
    got_bf = conv2d_bf16_exact(x, w.astype(jnp.int8), 1, 1)
    np.testing.assert_array_equal(np.asarray(got_s8), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got_bf), np.asarray(want))
