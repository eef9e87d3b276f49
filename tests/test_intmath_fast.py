"""The specialized requantizers must agree with the general emulated path
over their full preconditions."""

import numpy as np

import conftest  # noqa: F401

import jax.numpy as jnp

from alpha_yolo_quant_tpu.ops.intmath import (
    requantize_i32, requantize_i32_bigshift, requantize_i32_small,
)

RNG = np.random.default_rng(21)


def test_small_variant_matches_general():
    x = RNG.integers(-510, 511, size=50000).astype(np.int32)
    for m in (1, 7, 128, 255):
        for s in (2, 8, 9, 12, 20):
            want = np.asarray(requantize_i32(jnp.asarray(x), jnp.int32(m),
                                             jnp.int32(s), 127))
            got = np.asarray(requantize_i32_small(jnp.asarray(x),
                                                  jnp.int32(m),
                                                  jnp.int32(s), 127))
            np.testing.assert_array_equal(got, want, err_msg=f"m={m} s={s}")


def test_bigshift_variant_matches_general():
    # full int32 range inputs, m up to the sigma*rescale bound
    x = RNG.integers(-(2**31) + 1, 2**31 - 1, size=50000).astype(np.int32)
    x = np.concatenate([x, np.array([-(2**31) + 1, 2**31 - 1, 0, -1, 1,
                                     32767, -32768], np.int32)])
    for m in (1, 255, 32385):
        for s in (16, 17, 24, 31, 40):
            want = np.asarray(requantize_i32(jnp.asarray(x), jnp.int32(m),
                                             jnp.int32(s), 127))
            got = np.asarray(requantize_i32_bigshift(jnp.asarray(x),
                                                     jnp.int32(m),
                                                     jnp.int32(s), 127))
            np.testing.assert_array_equal(got, want, err_msg=f"m={m} s={s}")


def test_bigshift_per_channel_arrays():
    x = RNG.integers(-(2**28), 2**28, size=(2, 8, 4, 4)).astype(np.int32)
    m = RNG.integers(1, 32000, size=(1, 8, 1, 1)).astype(np.int32)
    s = RNG.integers(16, 30, size=(1, 8, 1, 1)).astype(np.int32)
    want = np.asarray(requantize_i32(jnp.asarray(x), jnp.asarray(m),
                                     jnp.asarray(s), 127))
    got = np.asarray(requantize_i32_bigshift(jnp.asarray(x), jnp.asarray(m),
                                             jnp.asarray(s), 127))
    np.testing.assert_array_equal(got, want)
