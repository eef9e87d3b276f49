"""Isolate the r3_packed failure: TPU health check + D (real engine
kernel) alone with a full traceback."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import traceback

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.devices()[0].platform, flush=True)
x = jnp.ones((256, 256), jnp.float32)
print("health:", float(jnp.sum(x @ x)), flush=True)

from alpha_yolo_quant_tpu.runtime import packed_conv as pc

rng = np.random.default_rng(0)
plan = pc.make_plan(16, 16, 1, 160)
w = rng.integers(-127, 128, (16, 16, 3, 3)).astype(np.int64)
mats = pc.packed_weight_mats(w, plan)
lane0 = pc.pack_lane_const(np.zeros(16, np.int64), plan)
lane1 = pc.pack_lane_const(np.ones(16, np.int64), plan, fill=1)
x = jnp.asarray(rng.integers(-127, 128, (2, 16, 160, 160), np.int8))

try:
    slab = pc.pack_tensor_jnp(x, plan)
    out = pc.packed_conv_slab(
        slab, mats, lane0, lane1, lane1, lane1, lane1, plan, 160,
        qmax=127, sig_scale=18.142857, sig_qmax=127.0,
        corrections=(), bigshift=False, silu=True)
    print("D ok:", np.asarray(out).shape, flush=True)
except Exception:
    traceback.print_exc()
print("done", flush=True)
