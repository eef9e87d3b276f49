import sys; sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import dataclasses
import numpy as np, jax, jax.numpy as jnp
from _slope import slope_time
from alpha_yolo_quant_tpu.postprocess import nms as N
print("backend:", jax.default_backend(), flush=True)
B = 128
rng = np.random.default_rng(0)
xy = rng.uniform(4120, 260000, (B, 2, 8400))
wh = rng.uniform(2000, 40000, (B, 2, 8400))
cls = rng.normal(-6000, 3000, (B, 80, 8400))
preds = jnp.asarray(np.concatenate([xy, wh, cls], 1).astype(np.float32))
base = None
for blk in (128, 256, 512):
    p = dataclasses.replace(N.q_nms_params(412.1635), conf_thres=0.0,
                            block=blk)
    det = np.asarray(jax.jit(
        lambda t, p=p: N.non_max_suppression(t, p)[0])(preds[:4]))
    if base is None:
        base = det
    print(f"blk={blk} parity:", np.array_equal(base, det), flush=True)
    slope_time(f"q_NMS blk={blk} ",
               lambda t, p=p: N.non_max_suppression(t, p)[0], preds)
print("done", flush=True)
