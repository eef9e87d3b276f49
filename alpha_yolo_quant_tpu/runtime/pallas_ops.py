"""Fused Pallas TPU kernels for the quantized hot path.

The integer pipeline's per-layer cost on TPU is dominated not by the convs
(which XLA maps onto the MXU well) but by the elementwise requantization
chain — XLA materializes the emulated-widening intermediates through HBM.
This module fuses the whole post-conv chain

    acc = 16*acc_hi + acc_lo + bias          (combine bf16-split partials)
    dom = requant1(acc)                       (per-channel rescale/shift)
    sigma = sigmoid_lut(dom)                  (validated arithmetic LUT)
    out = requant2(sigma * acc)               (folded sigma*rescale mult)

into one VMEM pass per tile, reading the two f32 conv partials and writing
int8. Arithmetic is the exact same int32 emulation as ops/intmath.py —
bit-identical to the interpreter (tested).

Layout: the NCHW conv output is viewed as (B*C, H*W); blocks are
(ROW_BLOCK, COL_BLOCK) tiles with per-row (per-channel) constants in
(B*C, 1) columns. On CPU backends the kernels run in interpreter mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401

from alpha_yolo_quant_tpu.ops.intmath import (
    requantize_i32, requantize_i32_bigshift,
)

ROW_BLOCK = 32
COL_BLOCK = 1024


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _postconv_silu_kernel(hi_ref, lo_ref, bias_ref, r1_ref, s1_ref, r2_ref,
                          s2_ref, out_ref, *, qmax: int, sig_scale: float,
                          sig_qmax: float,
                          corrections: Tuple[Tuple[int, int], ...],
                          bigshift: bool):
    req = requantize_i32_bigshift if bigshift else requantize_i32
    acc = (hi_ref[:].astype(jnp.int32) * 16) + lo_ref[:].astype(jnp.int32) \
        + bias_ref[:]
    dom = req(acc, r1_ref[:], s1_ref[:], qmax)
    # validated arithmetic sigmoid (ops/lutfast.py contract)
    d = dom.astype(jnp.float32) / np.float32(sig_scale)
    sigma = jnp.clip(jnp.round(jax.nn.sigmoid(d) * np.float32(sig_qmax)),
                     -sig_qmax, sig_qmax).astype(jnp.int32)
    for i, v in corrections:
        sigma = jnp.where(dom == i, jnp.int32(v), sigma)
    m = sigma * r2_ref[:]
    out_ref[:] = req(acc, m, s2_ref[:], qmax).astype(jnp.int8)


def _row_const(x, b):
    """(C,) -> (B*C, 1) per-row constant."""
    c = x.shape[0]
    return jnp.tile(x.reshape(c, 1).astype(jnp.int32), (b, 1))


@functools.partial(jax.jit, static_argnames=("qmax", "sig_scale",
                                             "sig_qmax", "corrections",
                                             "bigshift"))
def fused_postconv_silu(acc_hi, acc_lo, bias_c, r1_c, s1_c, r2_c, s2_c, *,
                        qmax: int, sig_scale: float, sig_qmax: float,
                        corrections: Tuple[Tuple[int, int], ...] = (),
                        bigshift: bool = False):
    """acc_hi/acc_lo: f32 (B,C,H,W) bf16-split conv partials;
    bias_c/r*_c/s*_c: per-channel (C,) int32. Returns int8 (B,C,H,W)."""
    b, c, h, w = acc_hi.shape
    rows, cols = b * c, h * w
    kernel = functools.partial(_postconv_silu_kernel, qmax=qmax,
                               sig_scale=sig_scale, sig_qmax=sig_qmax,
                               corrections=corrections, bigshift=bigshift)
    row_spec = pl.BlockSpec((ROW_BLOCK, 1), lambda i, j: (i, 0))
    data_spec = pl.BlockSpec((ROW_BLOCK, COL_BLOCK), lambda i, j: (i, j))
    out = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(rows, ROW_BLOCK), pl.cdiv(cols, COL_BLOCK)),
        in_specs=[data_spec, data_spec, row_spec, row_spec, row_spec,
                  row_spec, row_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.int8),
        interpret=_interpret(),
    )(acc_hi.reshape(rows, cols), acc_lo.reshape(rows, cols),
      _row_const(bias_c, b), _row_const(r1_c, b), _row_const(s1_c, b),
      _row_const(r2_c, b), _row_const(s2_c, b))
    return out.reshape(b, c, h, w)


def _sigma_probe_kernel(dom_ref, out_ref, *, sig_scale: float,
                        sig_qmax: float):
    d = dom_ref[:].astype(jnp.float32) / np.float32(sig_scale)
    out_ref[:] = jnp.clip(jnp.round(jax.nn.sigmoid(d) *
                                    np.float32(sig_qmax)),
                          -sig_qmax, sig_qmax).astype(jnp.int32)


def pallas_sigma_corrections(lut) -> Tuple[Tuple[int, int], ...]:
    """Validate the IN-KERNEL sigmoid against the bit-exact table on the
    actual backend/compiler (Mosaic's transcendentals may round differently
    from XLA's) and return per-entry fixups."""
    qmax_t = float(2 ** (lut.bits - 1) - 1)
    scale = float((2 ** (lut.bits - 1) - 1) / lut.max_val)
    n = lut.hi - lut.lo + 1
    pad = (-n) % 128
    dom = np.concatenate([np.arange(lut.lo, lut.hi + 1, dtype=np.int32),
                          np.zeros(pad, np.int32)]).reshape(-1, 128)
    kernel = functools.partial(_sigma_probe_kernel, sig_scale=scale,
                               sig_qmax=qmax_t)
    got = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(dom.shape, jnp.int32),
        interpret=_interpret(),
    )(jnp.asarray(dom))
    got = np.asarray(got).reshape(-1)[:n]
    bad = np.nonzero(got != lut.values)[0]
    return tuple((int(i + lut.lo), int(lut.values[i])) for i in bad)


MM_TILE = 512


def _conv1x1_silu_kernel(x_ref, w_ref, bias_ref, r1_ref, s1_ref, r2_ref,
                         s2_ref, out_ref, *, qmax: int, sig_scale: float,
                         sig_qmax: float,
                         corrections: Tuple[Tuple[int, int], ...],
                         bigshift: bool):
    """Fused 1x1 conv: s8 matmul on the MXU + the whole integer epilogue in
    registers. x: (TILE_M, Cin) int8; w: (Cin, Cout) int8; per-output-
    channel constants as (1, Cout) rows."""
    req = requantize_i32_bigshift if bigshift else requantize_i32
    acc = jnp.dot(x_ref[:], w_ref[:],
                  preferred_element_type=jnp.int32) + bias_ref[:]
    dom = req(acc, r1_ref[:], s1_ref[:], qmax)
    d = dom.astype(jnp.float32) / np.float32(sig_scale)
    sigma = jnp.clip(jnp.round(jax.nn.sigmoid(d) * np.float32(sig_qmax)),
                     -sig_qmax, sig_qmax).astype(jnp.int32)
    for i, v in corrections:
        sigma = jnp.where(dom == i, jnp.int32(v), sigma)
    out_ref[:] = req(acc, sigma * r2_ref[:], s2_ref[:], qmax).astype(
        jnp.int8)


def _conv1x1_plain_kernel(x_ref, w_ref, bias_ref, out_ref):
    out_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                         preferred_element_type=jnp.int32) + bias_ref[:]


@functools.partial(jax.jit, static_argnames=("qmax", "sig_scale",
                                             "sig_qmax", "corrections",
                                             "bigshift", "silu"))
def fused_conv1x1(x_nhwc_i8, w_io_i8, bias_c, r1_c=None, s1_c=None,
                  r2_c=None, s2_c=None, *, qmax: int = 127,
                  sig_scale: float = 1.0, sig_qmax: float = 127.0,
                  corrections: Tuple[Tuple[int, int], ...] = (),
                  bigshift: bool = False, silu: bool = True):
    """1x1 conv + integer epilogue, one HBM round trip.

    x_nhwc_i8: (B,H,W,Cin) int8; w_io_i8: (Cin,Cout) int8. Returns NHWC
    int8 (silu) or int32 raw accumulators (plain head convs)."""
    b, h, w, cin = x_nhwc_i8.shape
    cout = w_io_i8.shape[1]
    m = b * h * w
    x2 = x_nhwc_i8.reshape(m, cin)

    def col(t):
        return t.reshape(1, -1).astype(jnp.int32)

    x_spec = pl.BlockSpec((MM_TILE, cin), lambda i: (i, 0))
    w_spec = pl.BlockSpec((cin, cout), lambda i: (0, 0))
    c_spec = pl.BlockSpec((1, cout), lambda i: (0, 0))
    o_spec = pl.BlockSpec((MM_TILE, cout), lambda i: (i, 0))
    grid = (pl.cdiv(m, MM_TILE),)
    if silu:
        kernel = functools.partial(
            _conv1x1_silu_kernel, qmax=qmax, sig_scale=sig_scale,
            sig_qmax=sig_qmax, corrections=corrections, bigshift=bigshift)
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[x_spec, w_spec, c_spec, c_spec, c_spec, c_spec,
                      c_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((m, cout), jnp.int8),
            interpret=_interpret(),
        )(x2, w_io_i8, col(bias_c), col(r1_c), col(s1_c), col(r2_c),
          col(s2_c))
    else:
        out = pl.pallas_call(
            _conv1x1_plain_kernel, grid=grid,
            in_specs=[x_spec, w_spec, c_spec], out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((m, cout), jnp.int32),
            interpret=_interpret(),
        )(x2, w_io_i8, col(bias_c))
    return out.reshape(b, h, w, cout)


ROWS3 = 8  # kept for engine gating (output rows divisibility)


@functools.partial(jax.jit, static_argnames=("stride", "qmax", "sig_scale",
                                             "sig_qmax", "corrections",
                                             "bigshift", "silu"))
def fused_conv3x3(x_nhwc_i8, w_tap_i8, bias_c, r1_c=None, s1_c=None,
                  r2_c=None, s2_c=None, *, stride: int = 1,
                  qmax: int = 127, sig_scale: float = 1.0,
                  sig_qmax: float = 127.0,
                  corrections: Tuple[Tuple[int, int], ...] = (),
                  bigshift: bool = False, silu: bool = True):
    """3x3 pad-1 conv as im2col patches (XLA, NHWC — no transpose) + the
    fused s8-matmul/epilogue kernel.

    x_nhwc_i8: (B,H,W,Cin) int8; w_tap_i8: (9*Cin, Cout) int8 with rows in
    the patches' (c, dy, dx) channel order
    (= w_q.transpose(1,2,3,0).reshape(9*Cin, Cout)).
    Returns NHWC int8 (silu) or int32 raw accumulators.
    """
    from jax import lax

    p = lax.conv_general_dilated_patches(
        x_nhwc_i8, (3, 3), (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return fused_conv1x1(p, w_tap_i8, bias_c, r1_c, s1_c, r2_c, s2_c,
                         qmax=qmax, sig_scale=sig_scale, sig_qmax=sig_qmax,
                         corrections=corrections, bigshift=bigshift,
                         silu=silu)


def _postconv_plain_kernel(hi_ref, lo_ref, bias_ref, out_ref):
    out_ref[:] = (hi_ref[:].astype(jnp.int32) * 16) + \
        lo_ref[:].astype(jnp.int32) + bias_ref[:]


@jax.jit
def fused_postconv_plain(acc_hi, acc_lo, bias_c):
    """Combine + bias only (the head's final convs keep raw int32
    accumulators)."""
    b, c, h, w = acc_hi.shape
    rows, cols = b * c, h * w
    row_spec = pl.BlockSpec((ROW_BLOCK, 1), lambda i, j: (i, 0))
    data_spec = pl.BlockSpec((ROW_BLOCK, COL_BLOCK), lambda i, j: (i, j))
    out = pl.pallas_call(
        _postconv_plain_kernel,
        grid=(pl.cdiv(rows, ROW_BLOCK), pl.cdiv(cols, COL_BLOCK)),
        in_specs=[data_spec, data_spec, row_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.int32),
        interpret=_interpret(),
    )(acc_hi.reshape(rows, cols), acc_lo.reshape(rows, cols),
      _row_const(bias_c, b))
    return out.reshape(b, c, h, w)
