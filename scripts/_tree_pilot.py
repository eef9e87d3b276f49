"""Pilot for the stage-6 whole-tree byte-diff (VERDICT r2 #2): run the
reference's full straight-line stage_6 at 640 with synthetic fused weights
in /tmp, run export_all on the same inputs, and diff the trees. CPU-only.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python -u scripts/_tree_pilot.py [full] > /tmp/tree_pilot.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

FULL = "full" in sys.argv[1:]
TMP = f"/tmp/tree_pilot_{'full' if FULL else 'partial'}"
os.makedirs(TMP, exist_ok=True)

import reference_stage6 as rs
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.export.artifacts import export_all
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.golden import golden_forward

t0 = time.time()
cfg = QuantConfig(model="yolov8n", k=8, image_size=640, full_quant=FULL)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=3)
img = rs.golden_image()
print(f"img {img.shape} {img.dtype}", flush=True)
max_a = reduce_stats(collect_stats(graph, params, [img]), "max")
print(f"calib done {time.time()-t0:.1f}s", flush=True)

ref_main = rs.write_reference_inputs(TMP, graph, params, max_a)
t1 = time.time()
err = rs.run_stage6(TMP, full=FULL)
print(f"reference stage_6{'_full_quant' if FULL else ''} ran in "
      f"{time.time()-t1:.1f}s, tail err: {type(err).__name__ if err else None}: {err}",
      flush=True)
if err is not None:
    import traceback
    traceback.print_exception(type(err), err, err.__traceback__)

t2 = time.time()
model = build_quantized_model(graph, params, max_a, cfg)
env = golden_forward(model, img)
our_main = os.path.join(TMP, "ours")
export_all(model, env, params, our_main, warn=lambda *a: None)
print(f"our export ran in {time.time()-t2:.1f}s", flush=True)

problems = rs.compare_trees(ref_main, our_main) + \
    rs.compare_lut_tables(TMP, our_main)
print(f"files ref={len(rs.list_tree(ref_main))} "
      f"ours={len(rs.list_tree(our_main))}", flush=True)
print(f"PROBLEMS: {len(problems)}")
for p in problems[:60]:
    print(" ", p)
