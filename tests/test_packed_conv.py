"""Unit tests for the lane-packed banded conv (runtime/packed_conv.py)
against the plain s8 conv: stride 1 and 2, 1x1, wide (9-bit) two-part
inputs, and the pack/unpack round trip. CPU runs the XLA twin of the
Mosaic kernel (bit-identical math)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from alpha_yolo_quant_tpu.ops.nn import conv2d_s8_exact
from alpha_yolo_quant_tpu.runtime import packed_conv as pc

RNG = np.random.default_rng(3)


def _mk(cin, cout, stride, hw, kernel=3):
    plan = pc.make_plan(cin, cout, stride, hw)
    x = RNG.integers(-127, 128, (2, cin, hw, hw)).astype(np.int64)
    w = RNG.integers(-127, 128, (cout, cin, kernel, kernel)).astype(
        np.int64)
    if kernel == 1:
        w33 = np.zeros((cout, cin, 3, 3), np.int64)
        w33[:, :, 1, 1] = w[:, :, 0, 0]
        w = w33
    bias = RNG.integers(-900, 900, (cout,)).astype(np.int64)
    mats = pc.packed_weight_mats(w, plan)
    lanes = dict(
        bias=pc.pack_lane_const(bias, plan),
        z=pc.pack_lane_const(np.zeros(cout), plan),
        o=pc.pack_lane_const(np.ones(cout), plan, fill=1),
    )
    return plan, x, w, bias, mats, lanes


def _want(x, w, bias, stride):
    pad = 1
    acc = np.asarray(
        conv2d_s8_exact(jnp.asarray(x, jnp.int8),
                        jnp.asarray(w, jnp.int8), stride, pad), np.int64)
    return acc + bias.reshape(1, -1, 1, 1)


@pytest.mark.parametrize("cin,cout,hw,kernel",
                         [(16, 16, 32, 3), (32, 32, 16, 3),
                          (16, 16, 32, 1), (80, 80, 16, 3)])
def test_packed_stride1_exact(cin, cout, hw, kernel):
    plan, x, w, bias, mats, L = _mk(cin, cout, 1, hw, kernel)
    slab = pc.pack_tensor_jnp(jnp.asarray(x, jnp.int32), plan)
    out = pc.packed_conv_slab(slab, mats, L["bias"], L["z"], L["o"],
                              L["z"], L["o"], plan, hw, silu=False)
    got = np.asarray(pc.unpack_tensor_jnp(out, plan, hw), np.int64)
    np.testing.assert_array_equal(got, _want(x, w, bias, 1))


@pytest.mark.parametrize("cin,cout,hw", [(16, 32, 32), (32, 64, 16),
                                         (64, 128, 16)])
def test_packed_stride2_exact(cin, cout, hw):
    """The even/odd row-block de-interleave (Conv_P2/P3/P4 shapes)."""
    plan, x, w, bias, mats, L = _mk(cin, cout, 2, hw)
    sa, sb = pc.pack_tensor_s2_jnp(jnp.asarray(x, jnp.int32), plan)
    out = pc.packed_conv_s2(sa, sb, mats, L["bias"], L["z"], L["o"],
                            L["z"], L["o"], plan, hw, silu=False)
    got = np.asarray(pc.unpack_tensor_jnp(out, plan, hw // 2), np.int64)
    np.testing.assert_array_equal(got, _want(x, w, bias, 2))


def test_packed_wide_two_part_exact():
    """9-bit inputs (residual outputs reach 2*qmax=254): x = x1 + x2
    split, both slabs conv'd and summed in the accumulator."""
    cin = cout = 16
    hw = 32
    plan = pc.make_plan(cin, cout, 1, hw)
    x = RNG.integers(-254, 255, (2, cin, hw, hw)).astype(np.int64)
    w = RNG.integers(-127, 128, (cout, cin, 3, 3)).astype(np.int64)
    bias = RNG.integers(-900, 900, (cout,)).astype(np.int64)
    mats = pc.packed_weight_mats(w, plan)
    z = pc.pack_lane_const(np.zeros(cout), plan)
    o = pc.pack_lane_const(np.ones(cout), plan, fill=1)
    bl = pc.pack_lane_const(bias, plan)
    x32 = jnp.asarray(x, jnp.int32)
    x1 = jnp.clip(x32, -127, 127)
    s1 = pc.pack_tensor_jnp(x1, plan)
    s2 = pc.pack_tensor_jnp(x32 - x1, plan)
    out = pc.packed_conv_slab(s1, mats, bl, z, o, z, o, plan, hw,
                              silu=False, x_slab2=s2)
    got = np.asarray(pc.unpack_tensor_jnp(out, plan, hw), np.int64)
    want = np.asarray(conv2d_s8_exact(x32, jnp.asarray(w, jnp.int8),
                                      1, 1, parts=2), np.int64) \
        + bias.reshape(1, -1, 1, 1)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("cin,cout,hw", [(48, 32, 32), (96, 64, 16),
                                         (128, 64, 16)])
def test_packed_down2_exact(cin, cout, hw):
    """1x1 downpack (cin_pad == 2*cout_pad): C2F_*_conv_1 shapes."""
    plan = pc.make_down2_plan(cin, cout, hw)
    x = RNG.integers(-127, 128, (2, cin, hw, hw)).astype(np.int64)
    w = RNG.integers(-127, 128, (cout, cin, 1, 1)).astype(np.int64)
    bias = RNG.integers(-900, 900, (cout,)).astype(np.int64)
    mats = pc.down2_weight_mats(w, plan)
    z = pc.pack_lane_const(np.zeros(cout), plan)
    o = pc.pack_lane_const(np.ones(cout), plan, fill=1)
    bl = pc.pack_lane_const(bias, plan)
    se, so = pc.pack_tensor_down2_jnp(jnp.asarray(x, jnp.int32), plan)
    out = pc.packed_conv_down2([se, so], mats, bl, z, o, z, o, plan, hw,
                               silu=False)
    got = np.asarray(pc.unpack_tensor_jnp(out, plan, hw), np.int64)
    want = np.asarray(
        conv2d_s8_exact(jnp.asarray(x, jnp.int8),
                        jnp.asarray(w, jnp.int8), 1, 0), np.int64) \
        + bias.reshape(1, -1, 1, 1)
    np.testing.assert_array_equal(got, want)


def test_packed_down2_wide_three_part_exact():
    """Wide concat inputs (|x| up to 3*qmax = 381) through the downpack
    kernel: three int8 part-pairs summed in the accumulator."""
    cin, cout, hw = 48, 32, 32
    plan = pc.make_down2_plan(cin, cout, hw)
    x = RNG.integers(-381, 382, (2, cin, hw, hw)).astype(np.int64)
    w = RNG.integers(-127, 128, (cout, cin, 1, 1)).astype(np.int64)
    mats = pc.down2_weight_mats(w, plan)
    z = pc.pack_lane_const(np.zeros(cout), plan)
    o = pc.pack_lane_const(np.ones(cout), plan, fill=1)
    slabs = []
    x32 = jnp.asarray(x, jnp.int32)
    rem = x32
    for _ in range(3):
        part = jnp.clip(rem, -127, 127)
        rem = rem - part
        slabs += list(pc.pack_tensor_down2_jnp(part, plan))
    out = pc.packed_conv_down2(slabs, mats, z, z, o, z, o, plan, hw,
                               silu=False)
    got = np.asarray(pc.unpack_tensor_jnp(out, plan, hw), np.int64)
    want = np.asarray(conv2d_s8_exact(x32, jnp.asarray(w, jnp.int8),
                                      1, 0, parts=3), np.int64)
    np.testing.assert_array_equal(got, want)


def test_pack_unpack_roundtrip():
    plan = pc.make_plan(32, 32, 1, 16)
    x = RNG.integers(-127, 128, (3, 32, 16, 16)).astype(np.int64)
    slab = pc.pack_tensor_jnp(jnp.asarray(x, jnp.int32), plan)
    # the output-slab unpack expects cout geometry == cin geometry here
    back = np.asarray(pc.unpack_tensor_jnp(slab.astype(jnp.int8), plan,
                                           16), np.int64)
    np.testing.assert_array_equal(back, x)
