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
    got_s8 = conv2d_s8_exact(x, w.astype(jnp.int8), 1, 1, parts=2)
    got_bf = conv2d_bf16_exact(x, w.astype(jnp.int8), 1, 1)
    np.testing.assert_array_equal(np.asarray(got_s8), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got_bf), np.asarray(want))


def _conv_np_i64(x, w, stride, pad):
    """int64 numpy oracle conv (NCHW/OIHW)."""
    x = np.asarray(x, np.int64)
    w = np.asarray(w, np.int64)
    b, ci, h, ww = x.shape
    o, _, kh, kw = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (ww + 2 * pad - kw) // stride + 1
    out = np.zeros((b, o, oh, ow), np.int64)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, :, i * stride:i * stride + kh,
                       j * stride:j * stride + kw]
            out[:, :, i, j] = np.einsum("bchw,ochw->bo", patch, w)
    return out


def test_s8_three_part_split_exact_at_381():
    """Chained-residual concat edges reach 3*qmax = 381 (c2f4.cat /
    c2f6.cat, transform.edge_amax_int); |x| in (254, 381] overflows a
    two-part int8 split. The 3-part split must stay exact — checked against
    an int64 numpy oracle, with the extremes +-381 forced into the input."""
    x_np = RNG.integers(-381, 382, (2, 8, 12, 12)).astype(np.int32)
    x_np[0, 0, 0, 0] = 381
    x_np[0, 1, 0, 0] = -381
    x_np[1, 2, 3, 3] = 255        # first value outside the 2-part range
    w_np = RNG.integers(-127, 128, (12, 8, 3, 3)).astype(np.int8)
    want = _conv_np_i64(x_np, w_np, 1, 1)
    got3 = conv2d_s8_exact(jnp.asarray(x_np), jnp.asarray(w_np), 1, 1,
                           parts=3)
    np.testing.assert_array_equal(np.asarray(got3, np.int64), want)
    # nibble-split path must also stay exact at 381 (|x>>4| <= 24 in bf16)
    got_nib = conv2d_int_exact(jnp.asarray(x_np),
                               jnp.asarray(w_np, jnp.int32), 1, 1)
    np.testing.assert_array_equal(np.asarray(got_nib, np.int64), want)
    # and the 2-part split genuinely wraps there (guards the regression)
    got2 = conv2d_s8_exact(jnp.asarray(x_np), jnp.asarray(w_np), 1, 1,
                           parts=2)
    assert not np.array_equal(np.asarray(got2, np.int64), want)


def test_fast_lut_backend_tracking():
    """FastLut corrections are only valid on the backend they were
    validated on; for_current_backend() is a no-op on the same backend and
    records where validation ran."""
    import jax

    from alpha_yolo_quant_tpu.ops.lutfast import build_fast_lut
    from alpha_yolo_quant_tpu.quantize.luts import sigmoid_lut

    lut = sigmoid_lut(7, 8)
    fl = build_fast_lut(lut, "sigmoid")
    assert fl.validated_backend == jax.default_backend()
    assert fl.for_current_backend() is fl
    idx = jnp.arange(lut.lo, lut.hi + 1, dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(fl.apply(idx)), lut.values)


def test_fast_lut_backend_guard_fires():
    """The cross-backend contract is CODE, not docstring (VERDICT r3 #5):
    applying a FastLut under a different default backend than it was
    validated on raises with the for_current_backend remedy. Simulated by
    rebinding validated_backend (this env has one backend); the exact-
    gather fallback stays backend-agnostic and must NOT raise."""
    import dataclasses

    import pytest

    from alpha_yolo_quant_tpu.ops.lutfast import build_fast_lut
    from alpha_yolo_quant_tpu.quantize.luts import sigmoid_lut

    lut = sigmoid_lut(7, 8)
    fl = build_fast_lut(lut, "sigmoid")
    idx = jnp.arange(lut.lo, lut.hi + 1, dtype=jnp.int32)
    moved = dataclasses.replace(fl, validated_backend="some-other")
    with pytest.raises(RuntimeError, match="for_current_backend"):
        moved.apply(idx)
    with pytest.raises(RuntimeError, match="for_current_backend"):
        moved.apply_clipped(idx)
    # the remedy revalidates and works again
    fixed = moved.for_current_backend()
    np.testing.assert_array_equal(np.asarray(fixed.apply(idx)),
                                  lut.values)
    # gather fallback: backend-agnostic, no guard
    gather = dataclasses.replace(moved, use_gather=True)
    np.testing.assert_array_equal(np.asarray(gather.apply(idx)),
                                  lut.values)
