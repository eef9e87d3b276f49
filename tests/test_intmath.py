"""Exhaustive randomized checks of the int32-emulated 64-bit fixed-point math
against numpy int64, plus direct parity with the reference requantize."""

import numpy as np
import pytest

import conftest
from reference_oracle import load as load_ref

import jax.numpy as jnp

from alpha_yolo_quant_tpu.ops.intmath import (
    requantize_i32, round_half_up, shr_pair, widen_mul_i15,
)
from alpha_yolo_quant_tpu.quantize.primitives import (
    derive_rescale_shift, requantize_np,
)

RNG = np.random.default_rng(0)


def test_widen_mul_matches_int64():
    m = RNG.integers(0, 1 << 15, size=20000).astype(np.int32)
    x = RNG.integers(-(2**31), 2**31, size=20000).astype(np.int32)
    hi, lo = widen_mul_i15(jnp.asarray(m), jnp.asarray(x))
    got = np.int64(np.asarray(hi)) * (1 << 32) + np.uint64(np.asarray(lo)).astype(np.int64)
    want = np.int64(m) * np.int64(x)
    np.testing.assert_array_equal(got, want)


def test_widen_mul_extremes():
    cases_m = np.array([0, 1, 2, 32767], np.int32)
    cases_x = np.array([-(2**31), -1, 0, 1, 2**31 - 1, 65535, -65536], np.int32)
    m, x = np.meshgrid(cases_m, cases_x)
    hi, lo = widen_mul_i15(jnp.asarray(m.ravel()), jnp.asarray(x.ravel()))
    got = np.int64(np.asarray(hi)) * (1 << 32) + np.uint64(np.asarray(lo)).astype(np.int64)
    np.testing.assert_array_equal(got, np.int64(m.ravel()) * np.int64(x.ravel()))


def test_shr_pair_matches_floor_shift():
    # 64-bit values whose shifted result fits int32.
    vals = RNG.integers(-(2**46), 2**46, size=5000)
    shifts = RNG.integers(16, 47, size=5000)  # keep result within int32
    want = vals >> shifts
    ok = (want >= -(2**31)) & (want < 2**31)
    vals, shifts, want = vals[ok], shifts[ok], want[ok]
    hi = (vals >> 32).astype(np.int32)
    lo = (vals & 0xFFFFFFFF).astype(np.uint32)
    got = np.asarray(shr_pair(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(shifts.astype(np.int32))))
    np.testing.assert_array_equal(got, want)


def test_shr_pair_small_shifts():
    vals = RNG.integers(-(2**30), 2**30, size=2000)
    for s in [0, 1, 2, 31, 32, 40]:
        want = vals >> s
        hi = (vals >> 32).astype(np.int32)
        lo = (vals & 0xFFFFFFFF).astype(np.uint32)
        got = np.asarray(shr_pair(jnp.asarray(hi), jnp.asarray(lo),
                                  jnp.full(vals.shape, s, np.int32)))
        np.testing.assert_array_equal(got, want, err_msg=f"shift={s}")


def test_round_half_up_matches_reference_idiom():
    q = RNG.integers(-(2**20), 2**20, size=10000)
    want = q // 2 + q % 2
    got = np.asarray(round_half_up(jnp.asarray(q.astype(np.int32))))
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference mount")
def test_requantize_parity_with_reference():
    """ops/intmath.requantize_i32 and primitives.requantize_np both reproduce
    the reference utils/rescale_coeff.requantize bit-for-bit."""
    ref = load_ref("utils.rescale_coeff")
    for k in (4, 6, 8, 16):
        qmax = 2 ** (k - 1) - 1
        for trial in range(20):
            c = 8
            old = np.exp(RNG.uniform(np.log(1.0), np.log(5e4), size=(1, c, 1, 1)))
            new = float(np.exp(RNG.uniform(np.log(0.5), np.log(200.0))))
            if np.any(old / new < 2.0):   # keep shift >= 8, like real layer scales
                old = old + 2.0 * new
            arr = RNG.integers(-(2**30), 2**30, size=(2, c, 3, 3))
            try:
                want, r_ref, s_ref = ref.requantize(arr.copy(), old, new, k)
            except SystemExit:
                continue
            got_np, r_np, s_np = requantize_np(arr, old, new, k)
            np.testing.assert_array_equal(got_np, want)
            np.testing.assert_array_equal(np.int64(r_np), np.int64(r_ref))
            np.testing.assert_array_equal(np.int64(s_np), np.int64(s_ref))
            # Device path: int32 emulation with folded multiplier.
            got_dev = np.asarray(requantize_i32(
                jnp.asarray(arr.astype(np.int32)),
                jnp.asarray(np.int64(r_np).astype(np.int32)),
                jnp.asarray(np.int64(s_np).astype(np.int32)),
                qmax))
            np.testing.assert_array_equal(got_dev, want)


def test_requantize_i32_with_folded_sigma():
    """The sigma_q * rescale folding used by the fused SiLU path is exact:
    requant(sigma*x) == round_half_up((sigma*rescale*x) >> (shift-1))."""
    k = 8
    sigma = RNG.integers(0, 128, size=(1, 4, 1, 1))
    acc = RNG.integers(-(2**24), 2**24, size=(2, 4, 8, 8))
    old = np.exp(RNG.uniform(np.log(1e3), np.log(1e6), size=(1, 4, 1, 1)))
    new = 12.7
    prod = sigma * acc
    want, rescale, shift = requantize_np(prod, old, new, k)
    m = np.broadcast_to(np.int64(rescale) * sigma, acc.shape).astype(np.int32)
    assert m.max() < 2**15
    got = np.asarray(requantize_i32(
        jnp.asarray(acc.astype(np.int32)), jnp.asarray(m),
        jnp.asarray(np.broadcast_to(np.int64(shift), acc.shape).astype(np.int32)),
        2 ** (k - 1) - 1))
    np.testing.assert_array_equal(got, want)


def test_derive_rescale_shift_budget():
    r, s = derive_rescale_shift(np.array([[100.0]]), 1.0, koeff_bits=8)
    assert np.all(r <= 255) and np.all(r >= 0)
    # round(2^s / 100) should recover ~2^s/100
    np.testing.assert_allclose(r / 2.0**s, 1 / 100.0, rtol=0.01)


def _rhu_oracle(m, x, s, qmax):
    """int64 golden: clip(round_half_up((m*x) >> (s-1)), -qmax, qmax)."""
    q = (np.int64(m) * np.int64(x)) >> (np.int64(s) - 1)
    return np.clip(q // 2 + q % 2, -qmax, qmax)


def test_requantize_bigshift_folded_matches_int64():
    """Folded-rhu bigshift == the int64 oracle across random draws that
    respect its precondition, including the shift=16 edge and values at
    the precondition's int32 boundary."""
    from alpha_yolo_quant_tpu.ops.intmath import (
        requantize_i32_bigshift_folded,
    )

    for trial in range(50):
        s = int(RNG.integers(16, 40))
        m = RNG.integers(0, 1 << 15, size=4096).astype(np.int64)
        # precondition: floor(m*|x|/2^15) + 1 + 2^(s-16) < 2^31
        t_budget = (np.int64(2) ** 31 - 2 - (np.int64(1) << (s - 16)))
        x_bound = np.minimum((t_budget << 15) // np.maximum(m, 1),
                             np.int64(2) ** 31 - 1)
        x = (RNG.random(4096) * 2 - 1) * x_bound
        x = x.astype(np.int64)
        got = np.asarray(requantize_i32_bigshift_folded(
            jnp.asarray(x.astype(np.int32)),
            jnp.asarray(m.astype(np.int32)),
            jnp.full(4096, s, np.int32), 127))
        np.testing.assert_array_equal(got, _rhu_oracle(m, x, s, 127),
                                      err_msg=f"s={s}")
    # exact precondition boundary: max t + bias == 2^31 - 1
    for s in (16, 20, 31, 40):
        m = np.int64(32767)
        t_max = np.int64(2) ** 31 - 1 - (np.int64(1) << (s - 16)) - 1
        x = np.minimum((t_max << 15) // m, np.int64(2) ** 31 - 1)
        for xv in (x, -x, np.int64(0), np.int64(1), np.int64(-1)):
            got = np.asarray(requantize_i32_bigshift_folded(
                jnp.asarray(np.int32(xv)), jnp.asarray(np.int32(m)),
                jnp.asarray(np.int32(s)), 127))
            np.testing.assert_array_equal(
                got, _rhu_oracle(m, xv, s, 127), err_msg=f"s={s} x={xv}")


def test_requantize_direct_matches_int64():
    """Single-multiply requant == the int64 oracle under its
    precondition |m*x| + 2^(s-1) < 2^31, incl. boundary values."""
    from alpha_yolo_quant_tpu.ops.intmath import requantize_i32_direct

    for trial in range(50):
        s = int(RNG.integers(1, 31))
        m = RNG.integers(0, 256, size=4096).astype(np.int64)
        x_bound = (np.int64(2) ** 31 - 1 - (np.int64(1) << (s - 1))) \
            // np.maximum(m, 1)
        x_bound = np.minimum(x_bound, np.int64(2) ** 31 - 1)
        x = ((RNG.random(4096) * 2 - 1) * x_bound).astype(np.int64)
        got = np.asarray(requantize_i32_direct(
            jnp.asarray(x.astype(np.int32)),
            jnp.asarray(m.astype(np.int32)),
            jnp.full(4096, s, np.int32), 127))
        np.testing.assert_array_equal(got, _rhu_oracle(m, x, s, 127),
                                      err_msg=f"s={s}")
    # boundary: m*x + 2^(s-1) == 2^31 - 1 exactly
    for s in (1, 8, 16, 30):
        m = np.int64(255)
        x = (np.int64(2) ** 31 - 1 - (np.int64(1) << (s - 1))) // m
        for xv in (x, -x, np.int64(0)):
            got = np.asarray(requantize_i32_direct(
                jnp.asarray(np.int32(xv)), jnp.asarray(np.int32(m)),
                jnp.asarray(np.int32(s)), 127))
            np.testing.assert_array_equal(
                got, _rhu_oracle(m, xv, s, 127), err_msg=f"s={s} x={xv}")


def test_fastlut_apply_clipped_matches_apply_in_domain():
    """apply_clipped == apply for in-domain inputs, for both the
    arithmetic and gather paths."""
    import dataclasses as _dc

    from alpha_yolo_quant_tpu.ops.lutfast import build_fast_lut
    from alpha_yolo_quant_tpu.quantize.luts import sigmoid_lut

    import jax

    for k, bits in ((4, None), (6, None), (8, None), (12.0, 16)):
        lut = (sigmoid_lut(6.0, k) if bits is None
               else sigmoid_lut(k, bits))
        flut = build_fast_lut(lut, "sigmoid")
        x = np.arange(lut.lo, lut.hi + 1, dtype=np.int32)
        want = lut.apply_np(x)
        # both EAGER and JITTED evaluation must match the table — XLA's
        # fused f32 transcendentals can round boundary points differently
        # from the eager op-by-op path; build_fast_lut corrects the union
        for mode, wrap in (("eager", lambda f: f), ("jit", jax.jit)):
            np.testing.assert_array_equal(
                np.asarray(wrap(flut.apply)(jnp.asarray(x))), want,
                err_msg=f"k={k} apply {mode}")
            np.testing.assert_array_equal(
                np.asarray(wrap(flut.apply_clipped)(jnp.asarray(x))), want,
                err_msg=f"k={k} apply_clipped {mode}")
        gather = _dc.replace(flut, use_gather=True)
        np.testing.assert_array_equal(
            np.asarray(gather.apply_clipped(jnp.asarray(x))),
            want, err_msg=f"k={k} gather")
