"""Lane-packed banded convolution for narrow-channel layers.

The early YOLOv8 backbone runs C in {16, 32, 64} against a 128x128 MXU —
a direct s8 conv fills 1.5-2% of the array (measured: the C16@320 layer
costs 4-7ms against a ~0.6ms HBM bound). This module packs P = 128/C
consecutive W-pixels into the 128-lane dimension, so every matmul tile is
dense:

    out[y, j] = sum_{dy in 0..2, g in -1..1}  x[y*s + dy - 1, j + g] @ W[dy][g]

where x[y, j] is a 128-lane group (P pixels x C channels, w-major — i.e.
plain NHWC with W*C flattened and W grouped by P), and each W[dy][g] is a
dense (128, 128) matrix carrying every (dx, cin, cout) tap that maps pixel
p_in of group j+g to pixel p_out of output group j at row offset dy. The
whole 3x3 spatial structure lives in the NINE precomputed weight matrices;
the kernel is just nine dense (M,128)@(128,128) s8 MXU dots per tile — no
im2col, no offset-layout slicing (the round-1 Mosaic dead end: tap
concats need non-128-aligned lane offsets; group shifts are 128-aligned).

Utilization: useful fraction = P_out*9*Cin*Cout / (9*128*128) = Cin*Cout/
(128*Cout_pad...) -> 12.5% at C=16, 25% at C=32, 50% at C=64 — of DENSE
matmuls, vs the ~2% effective of the direct conv. Requires Cout = s*Cin
(true for every narrow backbone conv: stride-2 convs double channels,
bottleneck convs preserve them); other shapes (1x1 concat consumers) use
g=0-only variants with channel-padded lanes.

Packed tensor layout (the "slab"): (B, (H+2) * (G+2), 128) int8 where
G = W/P groups, one zero GROUP of padding on each side of every row and
one zero ROW of groups above and below (3x3 pad=1 semantics). Row index
r = (y+1)*(G+2) + (j+1). Junk-free: pad groups/rows hold zeros, and the
kernel re-zeroes its output pad groups so layers chain without repacking.

Reference hot loop being replaced: the reference runs this as one
np.dot per layer over im2col patches (utils/im2colSOLO.py:44-57).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class PackPlan:
    cin: int           # real input channels
    cout: int          # real output channels
    cin_pad: int       # padded to a 128 divisor
    cout_pad: int
    p_in: int          # pixels per input group  = 128 // cin_pad
    p_out: int         # pixels per output group = 128 // cout_pad
    stride: int
    w_in: int
    g: int             # groups per row (same for input and output)

    @property
    def w_out(self) -> int:
        return self.w_in // self.stride


def _pad_channels(c: int) -> int:
    """Smallest power-of-two divisor of 128 that holds c."""
    for cand in (2, 4, 8, 16, 32, 64, 128):
        if cand >= c:
            return cand
    raise ValueError(f"channels {c} > 128: use the direct conv path")


def make_plan(cin: int, cout: int, stride: int, w_in: int) -> PackPlan:
    cin_pad = _pad_channels(cin)
    cout_pad = _pad_channels(cout)
    p_in, p_out = 128 // cin_pad, 128 // cout_pad
    if p_in != stride * p_out:
        raise ValueError(
            f"packed conv needs P_in == stride*P_out "
            f"(cin_pad={cin_pad}, cout_pad={cout_pad}, stride={stride})")
    if w_in % p_in:
        raise ValueError(f"W={w_in} not divisible by P_in={p_in}")
    return PackPlan(cin=cin, cout=cout, cin_pad=cin_pad, cout_pad=cout_pad,
                    p_in=p_in, p_out=p_out, stride=stride, w_in=w_in,
                    g=w_in // p_in)


def packed_weight_mats(w_oihw: np.ndarray, plan: PackPlan) -> np.ndarray:
    """(Cout, Cin, 3, 3) int weights -> (3, 3, 128, 128) int8 banded
    matrices W[dy][g+1][l_in, l_out].

    l_in = p_in*cin_pad + c_in ; l_out = p_out*cout_pad + c_out.
    Output pixel p_out at tap dx reads input pixel q = s*p_out + dx - 1 of
    the same group (g=0), or the edge pixel of the neighbor group
    (q=-1 -> g=-1 last pixel; q>=P_in -> g=+1 first pixel)."""
    co, ci, kh, kw = w_oihw.shape
    assert (co, ci) == (plan.cout, plan.cin) and (kh, kw) == (3, 3)
    mats = np.zeros((3, 3, 128, 128), np.int64)
    s = plan.stride
    for dy in range(3):
        for dx in range(3):
            for p_out in range(plan.p_out):
                q = s * p_out + dx - 1
                if q < 0:
                    g, p_in = 0, plan.p_in - 1       # g index -1 -> slot 0
                elif q >= plan.p_in:
                    g, p_in = 2, 0
                else:
                    g, p_in = 1, q
                li = p_in * plan.cin_pad
                lo = p_out * plan.cout_pad
                mats[dy, g, li:li + ci, lo:lo + co] += \
                    w_oihw[:, :, dy, dx].T
    assert np.abs(mats).max() <= 127
    return mats.astype(np.int8)


def pack_tensor_np(x_nchw: np.ndarray, plan: PackPlan) -> np.ndarray:
    """NCHW -> padded slab (B, (H+2)*(G+2), 128) (numpy reference)."""
    b, c, h, w = x_nchw.shape
    assert c == plan.cin and w == plan.w_in
    g = plan.g
    x = x_nchw.transpose(0, 2, 3, 1)                      # NHWC
    if plan.cin_pad != c:
        x = np.concatenate(
            [x, np.zeros((b, h, w, plan.cin_pad - c), x.dtype)], -1)
    x = x.reshape(b, h, g, 128)
    slab = np.zeros((b, h + 2, g + 2, 128), x.dtype)
    slab[:, 1:-1, 1:-1] = x
    return slab.reshape(b, (h + 2) * (g + 2), 128)


def unpack_tensor_np(slab: np.ndarray, plan: PackPlan, h_out: int
                     ) -> np.ndarray:
    """Padded slab -> NCHW (numpy reference)."""
    b = slab.shape[0]
    g = plan.g
    x = slab.reshape(b, h_out + 2, g + 2, 128)[:, 1:-1, 1:-1]
    x = x.reshape(b, h_out, g * plan.p_out, plan.cout_pad)[..., :plan.cout]
    return x.transpose(0, 3, 1, 2)


FRONT_PAD = 32    # zero rows ahead of the slab (keeps every slice base >=0)
SUBLANE_PAD = 64  # tail extension so every (dy,g) slice stays in-bounds


def slab_rows(plan: PackPlan, h: int) -> int:
    return (h + 2) * (plan.g + 2)


def slab_rows_ext(plan: PackPlan, h: int) -> int:
    r = FRONT_PAD + slab_rows(plan, h) + (plan.g + 2) + SUBLANE_PAD
    return -(-r // 32) * 32          # int8 sublane tile multiple


def pack_lane_const(vals: np.ndarray, plan: PackPlan,
                    fill: int = 0) -> np.ndarray:
    """Per-output-channel (Cout,) int constant -> per-lane (128,) in the
    packed layout (tiled across the P_out pixels; padded channels get
    `fill`)."""
    lane = np.full((plan.p_out, plan.cout_pad), fill, np.int64)
    lane[:, :plan.cout] = np.asarray(vals, np.int64).reshape(1, -1)
    return lane.reshape(128)


def pack_tensor_jnp(x_nchw, plan: PackPlan):
    """NCHW int device tensor -> extended slab (B, R_ext, 128) int8."""
    import jax.numpy as jnp

    b, c, h, w = x_nchw.shape
    x = x_nchw.astype(jnp.int8).transpose(0, 2, 3, 1)     # NHWC
    if plan.cin_pad != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, plan.cin_pad - c)))
    x = x.reshape(b, h, plan.g, 128)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x = x.reshape(b, (h + 2) * (plan.g + 2), 128)
    ext = slab_rows_ext(plan, h) - x.shape[1] - FRONT_PAD
    return jnp.pad(x, ((0, 0), (FRONT_PAD, ext), (0, 0)))


def unpack_tensor_jnp(slab, plan: PackPlan, h_out: int):
    """Extended output slab -> NCHW int8 device tensor."""
    g = plan.g
    b = slab.shape[0]
    x = slab[:, FRONT_PAD:FRONT_PAD + (h_out + 2) * (g + 2)]
    x = x.reshape(b, h_out + 2, g + 2, 128)
    x = x[:, 1:-1, 1:-1].reshape(b, h_out, g * plan.p_out, plan.cout_pad)
    return x[..., :plan.cout].transpose(0, 3, 1, 2)


def packed_conv_np(slab: np.ndarray, mats: np.ndarray, plan: PackPlan,
                   h_in: int) -> np.ndarray:
    """Numpy int64 oracle of the banded-matmul conv over the slab layout.
    Returns the OUTPUT slab (B, (H_out+2)*(G+2), 128) int64 accumulators
    with zero pad groups/rows."""
    b = slab.shape[0]
    g, s = plan.g, plan.stride
    h_out = h_in // s
    x = slab.reshape(b, h_in + 2, g + 2, 128).astype(np.int64)
    out = np.zeros((b, h_out + 2, g + 2, 128), np.int64)
    for dy in range(3):
        for gg in range(3):
            # input rows for output rows 0..h_out-1: s*y + dy (slab row
            # index s*y + dy maps y=0 w/ dy=0 to the zero pad row 0)
            rows = x[:, dy:dy + s * h_out:s, :, :]
            cols = rows[:, :, gg:gg + g, :]               # (b,h_out,g,128)
            out[:, 1:-1, 1:-1] += cols @ mats[dy, gg].astype(np.int64)
    return out.reshape(b, (h_out + 2) * (g + 2), 128)


# ---------------------------------------------------------------------------
# Pallas kernel (stride 1): nine contiguous-slice dots + fused epilogue.
#
# With pad rows interleaved, the operand for tap set (dy, g) is the slab
# itself shifted by the CONSTANT row offset dy*(G+2) + g - 1 relative to
# the result region — so the whole conv is nine dots of shape
# (h_out*(G+2), 128) @ (128, 128) per image, int8 on the MXU, with the
# requant/SiLU epilogue applied in VMEM before a single int8 write in the
# (extended) output slab layout. Junk rows (the interleaved pad groups)
# are zeroed by an iota mask, so the output chains directly into the next
# packed layer.
# ---------------------------------------------------------------------------


def _epilogue(acc, r1, s1, r2, s2, *, qmax, sig_scale, sig_qmax,
              corrections, bigshift, silu, pat=None):
    """Requant/SiLU epilogue. `pat` (rows,128) int32 in {0,1} zeroes the
    interleaved pad-group rows by an integer MULTIPLY folded into the
    second requant's per-element rescale (requant(acc, 0, s) == 0
    exactly) — a vector compare+select here costs ~0.45 ms/layer on
    Mosaic (r3_packed4/6 logs) and the i8-domain where() miscompiles."""
    import jax
    import jax.numpy as jnp

    from alpha_yolo_quant_tpu.ops.intmath import (
        requantize_i32, requantize_i32_bigshift,
    )

    if not silu:
        return acc if pat is None else acc * pat
    req = requantize_i32_bigshift if bigshift else requantize_i32
    dom = req(acc, r1, s1, qmax)
    d = dom.astype(jnp.float32) / np.float32(sig_scale)
    sigma = jnp.clip(jnp.round(jax.nn.sigmoid(d) * np.float32(sig_qmax)),
                     -sig_qmax, sig_qmax).astype(jnp.int32)
    for i, v in corrections:
        sigma = jnp.where(dom == i, jnp.int32(v), sigma)
    if pat is not None:
        sigma = sigma * pat
    return req(acc, sigma * r2, s2, qmax)


def _packed_kernel(*refs, n_x, taps, m, gp2, r_out_ext, qmax, sig_scale,
                   sig_qmax, corrections, bigshift, silu, row_chunk):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    x_refs = refs[:n_x]
    (w_ref, b_ref, r1_ref, s1_ref, r2_ref, s2_ref, pat_ref,
     out_ref) = refs[n_x:]
    dt = out_ref.dtype
    head = FRONT_PAD + gp2
    out_ref[0, pl.ds(0, head), :] = jnp.zeros((head, 128), dt)
    tail = r_out_ext - head - m
    out_ref[0, pl.ds(head + m, tail), :] = jnp.zeros((tail, 128), dt)

    def compute(q0, rows):
        acc = None
        for si, t, base in taps:
            xs = x_refs[si][0, pl.ds(base + q0, rows), :]
            d = jnp.dot(xs, w_ref[pl.ds(t * 128, 128), :],
                        preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
        return acc + b_ref[:]

    def finish(q0, rows, acc):
        # row_chunk is a gp2 multiple, so the pad-group pattern phase at
        # every chunk start is 0 and one (row_chunk,128) tile serves all
        out = _epilogue(acc, r1_ref[:], s1_ref[:], r2_ref[:], s2_ref[:],
                        qmax=qmax, sig_scale=sig_scale, sig_qmax=sig_qmax,
                        corrections=corrections, bigshift=bigshift,
                        silu=silu, pat=pat_ref[pl.ds(0, rows), :])
        # silu: requant already clipped to +-qmax; raw: dt is int32
        out_ref[0, pl.ds(head + q0, rows), :] = out.astype(dt)

    # Static row chunks bound the int32 accumulator's VMEM footprint (the
    # whole-slab accumulator at 320x320 is 6.9MB and fails to compile).
    # Software pipeline: chunk q's MXU dots are issued before chunk q-1's
    # VPU epilogue, giving Mosaic independent MXU/VPU streams to overlap
    # (0.90 -> 0.59 ms on the C16@160 layer, r3_packed6.log).
    pend = None
    for q0 in range(0, m, row_chunk):
        rows = min(row_chunk, m - q0)
        acc = compute(q0, rows)
        if pend is not None:
            finish(*pend)
        pend = (q0, rows, acc)
    finish(*pend)


def _packed_call(x_slabs, taps, wlist, bias_lane, r1_lane, s1_lane,
                 r2_lane, s2_lane, plan: PackPlan, h_out: int, *,
                 qmax, sig_scale, sig_qmax, corrections, bigshift, silu,
                 interpret, row_chunk):
    """Shared core: run the banded-matmul conv given input slab(s) and
    taps ((slab_idx, w_idx, row_base), ...). Returns the extended output
    slab (B, R_out_ext, 128), int8 after SiLU / int32 raw."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    gp2 = plan.g + 2
    m = h_out * gp2
    r_out_ext = slab_rows_ext(plan, h_out)
    w_cat = jnp.asarray(np.concatenate(wlist, 0))        # (T*128, 128)

    def lane(v):
        return jnp.asarray(v, jnp.int32).reshape(1, 128)

    if interpret:
        # plain-XLA twin of the kernel (bit-identical math): pallas
        # interpret mode recompiles each call (~30s for the SiLU variant),
        # which would dominate the CPU test suite
        acc = None
        for si, t, base in taps:
            xs = x_slabs[si][:, base:base + m, :]
            d = jnp.einsum("brk,kn->brn", xs.astype(jnp.int8),
                           jnp.asarray(wlist[t]),
                           preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
        acc = acc + jnp.asarray(bias_lane, jnp.int32).reshape(1, 1, 128)
        out = _epilogue(acc, lane(r1_lane)[None], lane(s1_lane)[None],
                        lane(r2_lane)[None], lane(s2_lane)[None],
                        qmax=qmax, sig_scale=sig_scale, sig_qmax=sig_qmax,
                        corrections=tuple(corrections), bigshift=bigshift,
                        silu=silu)
        u = jnp.arange(m, dtype=jnp.int32).reshape(1, m, 1) % gp2
        dt = jnp.int8 if silu else jnp.int32
        out = jnp.where((u >= 1) & (u <= gp2 - 2), out, 0).astype(dt)
        head = FRONT_PAD + gp2
        b = x_slabs[0].shape[0]
        return jnp.concatenate(
            [jnp.zeros((b, head, 128), dt), out,
             jnp.zeros((b, r_out_ext - head - m, 128), dt)], 1)

    if row_chunk is None:
        # ~4 chunks so the MXU/VPU software pipeline has work to overlap,
        # capped so the int32 accumulator stays small in VMEM (the probe
        # optimum at m=3520 was 880 = m/4, r3_packed6.log)
        row_chunk = min(1024, -(-m // 4))
    row_chunk = -(-min(row_chunk, m) // gp2) * gp2
    kernel = functools.partial(
        _packed_kernel, n_x=len(x_slabs), taps=tuple(taps), m=m, gp2=gp2,
        r_out_ext=r_out_ext, qmax=qmax, sig_scale=sig_scale,
        sig_qmax=sig_qmax, corrections=tuple(corrections),
        bigshift=bigshift, silu=silu, row_chunk=row_chunk)
    u = np.arange(row_chunk) % gp2
    pat = jnp.asarray(((u >= 1) & (u <= gp2 - 2)).astype(np.int32)
                      .reshape(-1, 1).repeat(128, 1))
    b = x_slabs[0].shape[0]
    x_specs = [pl.BlockSpec((1, s.shape[1], 128), lambda i: (i, 0, 0))
               for s in x_slabs]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=x_specs + [
            pl.BlockSpec(w_cat.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
            pl.BlockSpec((row_chunk, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, r_out_ext, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, r_out_ext, 128),
                                       jnp.int8 if silu else jnp.int32),
        interpret=interpret,
    )(*x_slabs, w_cat, lane(bias_lane), lane(r1_lane), lane(s1_lane),
      lane(r2_lane), lane(s2_lane), pat)


def packed_conv_slab(x_slab, mats_i8, bias_lane, r1_lane, s1_lane, r2_lane,
                     s2_lane, plan: PackPlan, h_in: int, *,
                     qmax: int = 127, sig_scale: float = 1.0,
                     sig_qmax: float = 127.0,
                     corrections: Tuple[Tuple[int, int], ...] = (),
                     bigshift: bool = False, silu: bool = True,
                     interpret: Optional[bool] = None,
                     row_chunk: Optional[int] = None, x_slab2=None):
    """x_slab: (B, R_in_ext, 128) int8 extended slab; mats_i8 (3,3,128,128).
    Returns the OUTPUT extended slab (B, R_out_ext, 128) int8 (stride 1).

    x_slab2: optional second int8 slab for 9-bit (wide) inputs — the
    chained-residual concat edges reach 3*qmax (ops/nn.py
    conv2d_s8_exact parts): x = x1 + x2 with x1 = clip(x, +-127),
    each conv'd separately, summed in the int32 accumulator (exact)."""
    assert plan.stride == 1
    gp2 = plan.g + 2
    # keep only nonzero tap matrices (a 1x1 conv has one)
    mats = np.asarray(mats_i8)
    taps, wlist = [], []
    for dy in range(3):
        for gg in range(3):
            if np.any(mats[dy, gg]):
                base = FRONT_PAD + dy * gp2 + gg - 1
                taps.append((0, len(wlist), base))
                if x_slab2 is not None:
                    taps.append((1, len(wlist), base))
                wlist.append(mats[dy, gg])
    x_slabs = [x_slab] if x_slab2 is None else [x_slab, x_slab2]
    return _packed_call(
        x_slabs, taps, wlist, bias_lane, r1_lane, s1_lane, r2_lane,
        s2_lane, plan, h_in, qmax=qmax, sig_scale=sig_scale,
        sig_qmax=sig_qmax, corrections=corrections, bigshift=bigshift,
        silu=silu, interpret=interpret, row_chunk=row_chunk)


# ---------------------------------------------------------------------------
# Stride 2: de-interleave the padded input rows into EVEN/ODD row-block
# slabs (XLA-side strided slice), after which every tap offset is again
# CONSTANT: output block y reads padded input rows 2y (A[y]), 2y+1 (B[y]),
# 2y+2 (A[y+1]) — taps dy=0/2 hit slab A at bases 0 / gp2, dy=1 hits
# slab B at base 0. The stride-2 pixel decimation inside a row lives in
# the tap matrices (packed_weight_mats q = s*p + dx - 1), which also
# covers the channel doubling (p_in = 2*p_out packs the same 128 lanes).
# ---------------------------------------------------------------------------


def pack_tensor_s2_jnp(x_nchw, plan: PackPlan):
    """NCHW int tensor -> (slabA, slabB) extended even/odd row-block slabs
    for the stride-2 kernel. A = padded rows {0,2,..,h}, B = {1,3,..,h+1}."""
    import jax.numpy as jnp

    b, c, h, w = x_nchw.shape
    assert c == plan.cin and w == plan.w_in and h % 2 == 0
    x = x_nchw.astype(jnp.int8).transpose(0, 2, 3, 1)     # NHWC
    if plan.cin_pad != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, plan.cin_pad - c)))
    x = x.reshape(b, h, plan.g, 128)
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))      # group pads
    # padded row p <-> data row p-1: A rows {0,2..h} = zero + odd data
    # rows; B rows {1,3..h+1} = even data rows + zero
    xa = jnp.pad(x[:, 1::2], ((0, 0), (1, 0), (0, 0), (0, 0)))
    xb = jnp.pad(x[:, 0::2], ((0, 0), (0, 1), (0, 0), (0, 0)))
    gp2 = plan.g + 2
    nblk = h // 2 + 1

    def ext(t):
        t = t.reshape(b, nblk * gp2, 128)
        r_ext = -(-(FRONT_PAD + nblk * gp2 + gp2 + SUBLANE_PAD) // 32) * 32
        return jnp.pad(t, ((0, 0), (FRONT_PAD, r_ext - FRONT_PAD
                                    - nblk * gp2), (0, 0)))

    return ext(xa), ext(xb)


def make_down2_plan(cin: int, cout: int, w_in: int) -> PackPlan:
    """Plan for a 1x1 'downpack' conv with cin_pad == 2*cout_pad
    (C2F_*_conv_1 shapes: 48->32, 128->64, 96->64): each output group of
    p_out pixels draws from TWO input groups of p_in = p_out/2 pixels.
    plan.g is the OUTPUT group count (the kernel/unpack geometry); the
    input is packed as even/odd-group slabs in that same geometry."""
    cin_pad = _pad_channels(cin)
    cout_pad = _pad_channels(cout)
    p_in, p_out = 128 // cin_pad, 128 // cout_pad
    if p_out != 2 * p_in:
        raise ValueError(
            f"down2 needs p_out == 2*p_in (cin_pad={cin_pad}, "
            f"cout_pad={cout_pad})")
    if w_in % p_out:
        raise ValueError(f"W={w_in} not divisible by P_out={p_out}")
    return PackPlan(cin=cin, cout=cout, cin_pad=cin_pad,
                    cout_pad=cout_pad, p_in=p_in, p_out=p_out, stride=1,
                    w_in=w_in, g=w_in // p_out)


def down2_weight_mats(w_oihw: np.ndarray, plan: PackPlan) -> np.ndarray:
    """1x1 weights (Cout, Cin, 1, 1) -> (2, 128, 128): W[0] maps the
    even input group (output pixels 0..p_in-1), W[1] the odd group
    (output pixels p_in..p_out-1)."""
    co, ci = w_oihw.shape[:2]
    assert (co, ci) == (plan.cout, plan.cin)
    mats = np.zeros((2, 128, 128), np.int64)
    for q in range(plan.p_out):
        half, lp = divmod(q, plan.p_in)
        li = lp * plan.cin_pad
        lo = q * plan.cout_pad
        mats[half, li:li + ci, lo:lo + co] += w_oihw[:, :, 0, 0].T
    assert np.abs(mats).max() <= 127
    return mats.astype(np.int8)


def pack_tensor_down2_jnp(x_nchw, plan: PackPlan):
    """NCHW -> (slabE, slabO): even/odd input groups, each padded in the
    OUTPUT geometry ((H+2) x (g_out+2) blocks)."""
    import jax.numpy as jnp

    b, c, h, w = x_nchw.shape
    assert c == plan.cin and w == plan.w_in
    x = x_nchw.astype(jnp.int8).transpose(0, 2, 3, 1)     # NHWC
    if plan.cin_pad != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, plan.cin_pad - c)))
    x = x.reshape(b, h, 2 * plan.g, 128)
    g = plan.g
    r_ext = slab_rows_ext(plan, h)

    def ext(t):
        t = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
        t = t.reshape(b, (h + 2) * (g + 2), 128)
        return jnp.pad(t, ((0, 0), (FRONT_PAD,
                                    r_ext - FRONT_PAD - t.shape[1]),
                           (0, 0)))

    return ext(x[:, :, 0::2]), ext(x[:, :, 1::2])


def packed_conv_down2(x_slabs_eo, mats2_i8, bias_lane, r1_lane,
                      s1_lane, r2_lane, s2_lane, plan: PackPlan,
                      h_in: int, *, qmax: int = 127,
                      sig_scale: float = 1.0, sig_qmax: float = 127.0,
                      corrections: Tuple[Tuple[int, int], ...] = (),
                      bigshift: bool = False, silu: bool = True,
                      interpret: Optional[bool] = None,
                      row_chunk: Optional[int] = None):
    """Downpack 1x1 conv: out_row = E_row @ W0 + O_row @ W1, identical
    row indices (the center-tap base). x_slabs_eo is a flat [E, O] list,
    or [E1, O1, E2, O2, ...] for wide inputs split into int8 parts
    (the concat edges reach 3*qmax; each part is conv'd and summed in
    the int32 accumulator — exact)."""
    gp2 = plan.g + 2
    base = FRONT_PAD + gp2
    mats = np.asarray(mats2_i8)
    assert len(x_slabs_eo) % 2 == 0
    taps = []
    for p in range(len(x_slabs_eo) // 2):
        taps += [(2 * p, 0, base), (2 * p + 1, 1, base)]
    return _packed_call(
        list(x_slabs_eo), taps, [mats[0], mats[1]], bias_lane,
        r1_lane, s1_lane, r2_lane, s2_lane, plan, h_in, qmax=qmax,
        sig_scale=sig_scale, sig_qmax=sig_qmax, corrections=corrections,
        bigshift=bigshift, silu=silu, interpret=interpret,
        row_chunk=row_chunk)


def packed_conv_s2(x_slab_a, x_slab_b, mats_i8, bias_lane, r1_lane,
                   s1_lane, r2_lane, s2_lane, plan: PackPlan, h_in: int,
                   *, qmax: int = 127, sig_scale: float = 1.0,
                   sig_qmax: float = 127.0,
                   corrections: Tuple[Tuple[int, int], ...] = (),
                   bigshift: bool = False, silu: bool = True,
                   interpret: Optional[bool] = None,
                   row_chunk: Optional[int] = None):
    """Stride-2 banded conv over even/odd row-block slabs (see above).
    Returns the OUTPUT extended slab at h_out = h_in // 2."""
    assert plan.stride == 2
    gp2 = plan.g + 2
    mats = np.asarray(mats_i8)
    taps, wlist = [], []
    for dy in range(3):
        si = 1 if dy == 1 else 0
        roff = gp2 if dy == 2 else 0
        for gg in range(3):
            if np.any(mats[dy, gg]):
                taps.append((si, len(wlist), FRONT_PAD + roff + gg - 1))
                wlist.append(mats[dy, gg])
    return _packed_call(
        [x_slab_a, x_slab_b], taps, wlist, bias_lane, r1_lane, s1_lane,
        r2_lane, s2_lane, plan, h_in // 2, qmax=qmax, sig_scale=sig_scale,
        sig_qmax=sig_qmax, corrections=corrections, bigshift=bigshift,
        silu=silu, interpret=interpret, row_chunk=row_chunk)
