"""Stepwise isolation of the r3_packed mock-kernel failure."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)

B = 128
GP2, H = 22, 160
M = H * GP2
ROW_CHUNK = 880
TAPS = [dy * GP2 + g for dy in (0, 1, 2) for g in (0, 1, 2)]
PAD = 2 * GP2 + 8
N_IN = M + PAD


def make_kernel(offsets, m, row_chunk):
    def kernel(x_ref, w_ref, o_ref):
        for q0 in range(0, m, row_chunk):
            rows = min(row_chunk, m - q0)
            acc = None
            for t, off in enumerate(offsets):
                xs = x_ref[0, pl.ds(off + q0, rows), :]
                d = jnp.dot(xs, w_ref[pl.ds(t * 128, 128), :],
                            preferred_element_type=jnp.int32)
                acc = d if acc is None else acc + d
            o_ref[0, pl.ds(q0, rows), :] = \
                jnp.clip(acc, -127, 127).astype(jnp.int8)
    return kernel


w = jnp.asarray(rng.integers(-127, 128, (9 * 128, 128), np.int8))
x = jnp.asarray(rng.integers(-127, 128, (B, N_IN, 128), np.int8))


def f(xx):
    return pl.pallas_call(
        make_kernel(TAPS, M, ROW_CHUNK),
        grid=(xx.shape[0],),
        in_specs=[
            pl.BlockSpec((1, N_IN, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * 128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xx.shape[0], M, 128), jnp.int8),
    )(xx, w)


for step, fn in (("small B=2 materialize", lambda: np.asarray(f(x[:2]))),
                 ("full B=128 materialize", lambda: np.asarray(f(x)))):
    try:
        r = fn()
        print(step, "ok", r.shape, int(r.astype(np.int64).sum()),
              flush=True)
    except Exception:
        print(step, "FAILED:", flush=True)
        traceback.print_exc()
        sys.stdout.flush()
        break
print("done", flush=True)
