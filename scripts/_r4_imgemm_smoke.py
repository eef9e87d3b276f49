"""CPU interpret-mode smoke for the r4 implicit-GEMM kernel (tiny shapes).

Checks the (H,C,W,B)-layout Pallas conv kernel (3-row DMA window,
per-position (co,3C)@(3C,128) dots, fused integer epilogue) bit-exactly
against a numpy int64 oracle, both pipelined and not.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alpha_yolo_quant_tpu.ops.intmath import requantize_i32

QMAX = 127
SIG_SCALE = 18.142857142857142    # scale(7, 8)
SIG_QMAX = 127.0
CORR = ()


def epilogue(acc, b, r1, s1, r2, s2):
    acc = acc + b
    dom = requantize_i32(acc, r1, s1, QMAX)
    d = dom.astype(jnp.float32) / np.float32(SIG_SCALE)
    sigma = jnp.clip(jnp.round(jax.nn.sigmoid(d) * np.float32(SIG_QMAX)),
                     -SIG_QMAX, SIG_QMAX).astype(jnp.int32)
    return requantize_i32(acc, sigma * r2, s2, QMAX).astype(jnp.int8)


def make_v1(C, co, H, W, pipelined):
    def kernel(x_hbm, w_ref, b_ref, r1_ref, s1_ref, r2_ref, s2_ref,
               out_ref, win, sem):
        y = pl.program_id(0)
        slot = jax.lax.rem(y, 2)

        @pl.when(y == 0)
        def _():
            pltpu.make_async_copy(x_hbm.at[pl.ds(0, 3)], win.at[0],
                                  sem.at[0]).start()

        @pl.when(y + 1 < H)
        def _():
            nslot = jax.lax.rem(y + 1, 2)
            pltpu.make_async_copy(x_hbm.at[pl.ds(y + 1, 3)], win.at[nslot],
                                  sem.at[nslot]).start()

        pltpu.make_async_copy(x_hbm.at[pl.ds(y, 3)], win.at[slot],
                              sem.at[slot]).wait()
        dn = (((1,), (0,)), ((), ()))

        def dots(x):
            acc = jnp.zeros((co, 128), jnp.int32)
            for kx in range(3):
                v = win[slot, :, :, x + kx, :].reshape(3 * C, 128)
                acc = acc + jax.lax.dot_general(
                    w_ref[kx], v, dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
            return acc

        consts = (b_ref[:], r1_ref[:], s1_ref[:], r2_ref[:], s2_ref[:])

        if pipelined:
            def body(x, acc_prev):
                acc = dots(x)
                out_ref[0, :, x - 1, :] = epilogue(acc_prev, *consts)
                return acc

            acc_last = jax.lax.fori_loop(1, W, body, dots(0))
            out_ref[0, :, W - 1, :] = epilogue(acc_last, *consts)
        else:
            def body(x, _):
                out_ref[0, :, x, :] = epilogue(dots(x), *consts)
                return 0

            jax.lax.fori_loop(0, W, body, 0)

    def run(x_pad, w3, b, r1, s1, r2, s2):
        cspec = pl.BlockSpec((co, 1), lambda y: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(H,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((3, co, 3 * C), lambda y: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                cspec, cspec, cspec, cspec, cspec,
            ],
            out_specs=pl.BlockSpec((1, co, W, 128), lambda y: (y, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((H, co, W, 128), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((2, 3, C, W + 2, 128), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=jax.default_backend() == "cpu",
        )(x_pad, w3, b, r1, s1, r2, s2)

    return run


def oracle(x, w, b, r1, s1, r2, s2):
    """int64 numpy conv + epilogue, NCHW."""
    B_, C, H, W = x.shape
    co = w.shape[0]
    xp = np.zeros((B_, C, H + 2, W + 2), np.int64)
    xp[:, :, 1:-1, 1:-1] = x
    out = np.zeros((B_, co, H, W), np.int64)
    for ky in range(3):
        for kx in range(3):
            patch = xp[:, :, ky:ky + H, kx:kx + W]
            out += np.einsum("bchw,oc->bohw", patch, w[:, :, ky, kx])
    acc = out + b.reshape(1, co, 1, 1)

    def req(v, m4, s):
        q = (m4 * v) >> (s.reshape(1, co, 1, 1) - 1)
        q = (q >> 1) + (q & 1)
        return np.clip(q, -QMAX, QMAX)

    dom = req(acc, r1.reshape(1, co, 1, 1), s1)
    sigma = np.clip(
        np.round(1 / (1 + np.exp(-dom / SIG_SCALE)) * SIG_QMAX),
        -SIG_QMAX, SIG_QMAX).astype(np.int64)
    return req(acc, sigma * r2.reshape(1, co, 1, 1), s2).astype(np.int8)


rng = np.random.default_rng(0)
C, co, H, W, B = 8, 16, 6, 5, 128
x = rng.integers(-127, 128, (B, C, H, W), dtype=np.int64)
w = rng.integers(-127, 128, (co, C, 3, 3), dtype=np.int64)
b = rng.integers(-(1 << 17), 1 << 17, (co,), dtype=np.int64)
r1 = rng.integers(1, 256, (co,), dtype=np.int64)
s1 = np.full((co,), 18, np.int64)
r2 = rng.integers(1, 256, (co,), dtype=np.int64)
s2 = np.full((co,), 20, np.int64)

ref = oracle(x, w, b, r1, s1, r2, s2)

x_pad = np.zeros((H + 2, C, W + 2, B), np.int8)
x_pad[1:-1, :, 1:-1, :] = x.transpose(2, 1, 3, 0).astype(np.int8)
w3 = jnp.asarray(
    w.astype(np.int8).transpose(3, 0, 2, 1).reshape(3, co, 3 * C))
consts = tuple(jnp.asarray(v.astype(np.int32).reshape(co, 1))
               for v in (b, r1, s1, r2, s2))

for pipe in (False, True):
    run = make_v1(C, co, H, W, pipelined=pipe)
    out = np.asarray(jax.jit(run)(jnp.asarray(x_pad), w3, *consts))
    got = out.transpose(3, 1, 0, 2)
    ok = np.array_equal(got, ref)
    print(f"pipelined={pipe}: exact={ok}", flush=True)
    if not ok:
        bad = np.argwhere(got != ref)
        print("  first diffs:", bad[:5], got[tuple(bad[0])],
              ref[tuple(bad[0])], flush=True)
        sys.exit(1)
print("smoke OK", flush=True)
