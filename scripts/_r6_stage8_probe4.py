"""Localize the 8b tail divergence: capture the reference's dbox_cls
(pre-NMS plane) from the f64-injected run, compare vs our
decode_full_quant preds; then compare NMS keep behavior on the SAME
plane.

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python scripts/_r6_stage8_probe4.py
"""
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import torch

import reference_stage6 as rs6
import reference_stage8 as rs8
import test_stage8_parity as tsp

cfg, params, img, model = tsp._build(True)
tmp = tempfile.mkdtemp(prefix="s8b_")
rs8.write_runtime_inputs(tmp, model, params, k=8, full=True)
rs8.run_stage(tmp, "stage_7", k=8)
m8 = rs8.run_stage(tmp, "stage_8_torch_full_quant", k=8, golden_img=img)
tsp._wrap_f64(m8)

cap = {}
orig_cq = m8.coord_quant


def cq_rec(prediction):
    cap["plane"] = prediction.detach().numpy().copy()
    out = orig_cq(prediction)
    cap["out"] = None if out is None else out[0].detach().numpy().copy()
    return out


m8.coord_quant = cq_rec
with torch.no_grad():
    m8.model(torch.from_numpy(np.asarray(img).copy()))
m8.coord_quant = orig_cq

plane_ref = cap["plane"]          # (1, 84, N)
print("ref plane:", plane_ref.shape, "out:", cap["out"].shape)

# ours: decode only
import jax.numpy as jnp

from alpha_yolo_quant_tpu.runtime.interpreter import (
    EngineOptions, build_int_pipeline,
)

fn, _ = build_int_pipeline(model, dfl_w_float=params["dfl"]["w"],
                           with_nms=False,
                           options=EngineOptions(per_image_amax=True))
preds = np.asarray(fn(jnp.asarray(img)))
print("our preds:", preds.shape)
pr = preds[0]
rf = plane_ref[0]
if pr.shape != rf.shape:
    print("SHAPE MISMATCH", pr.shape, rf.shape)
else:
    nd_box = int((pr[:4] != rf[:4]).sum())
    nd_cls = int((pr[4:] != rf[4:]).sum())
    print("plane diffs: box", nd_box, "cls", nd_cls)
    if nd_box:
        d = np.abs(pr[:4] - rf[:4])
        print("  box maxdiff", d.max(), "at", np.unravel_index(
            d.argmax(), d.shape))
    if nd_cls:
        d = np.abs(pr[4:] - rf[4:])
        print("  cls maxdiff", d.max(), "frac",
              (d > 0).mean())

# NMS on the REFERENCE plane through our NMS vs reference coord_quant
import dataclasses

from alpha_yolo_quant_tpu.postprocess.nms import non_max_suppression
from alpha_yolo_quant_tpu.runtime.interpreter import eval_nms_params

nmsp = dataclasses.replace(eval_nms_params(model, 0.25), trunc_boxes=True)
# eval_nms_params -> build_int_pipeline normally converts conf to
# pre-sigmoid; standalone here the plane is post-decode (sigmoid already
# applied? decode_full_quant with_nms=False -> sigmoid_cls=True) so use
# raw q_nms_params
from alpha_yolo_quant_tpu.postprocess.nms import q_nms_params

nmsp2 = dataclasses.replace(q_nms_params(model.head.anchor_scale),
                            trunc_boxes=True)
det, n = non_max_suppression(jnp.asarray(plane_ref), nmsp2)
n = int(np.asarray(n)[0])
print("our NMS on ref plane:", n, "ref coord_quant out:",
      cap["out"].shape[0])
rows = np.asarray(det)[0][:n]
ro = cap["out"]
mn = min(n, ro.shape[0])
print("first-diverging row:", next(
    (i for i in range(mn)
     if not np.allclose(rows[i, :4], ro[i, :4], atol=1e-4)
     or not np.allclose(rows[i, 4], ro[i, 4], atol=1e-6)
     or rows[i, 5] != ro[i, 5]), mn))
print("ours rows 0-8:\n", rows[:8])
print("ref rows 0-8:\n", ro[:8][:, [0, 1, 2, 3, 4, 5]])
np.savez("/tmp/s8b_plane.npz", plane=plane_ref, out=cap["out"],
         ours=rows)
print("saved /tmp/s8b_plane.npz")
