"""Round-5 merged-forward profiler trace of the dense serving e2e at B=128 (post
epilogue diet) + inline parser: aggregates device-lane events by op
name, prints the top fusions with per-step ms (3 steps traced).
"""
import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime import interpreter as I
from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
assert I.AUTO_MERGE_SIBLINGS
fn, _ = build_int_pipeline(model, engine="auto", sparse_select=False)
jfn = jax.jit(fn)

images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))
jax.block_until_ready(jfn(images))
print("compiled", flush=True)

shutil.rmtree("/tmp/ayq_trace5", ignore_errors=True)
with jax.profiler.trace("/tmp/ayq_trace5"):
    for _ in range(3):
        jax.block_until_ready(jfn(images))
print("trace written", flush=True)

paths = glob.glob("/tmp/ayq_trace5/**/*.trace.json.gz", recursive=True)
print("trace files:", paths, flush=True)
agg = defaultdict(float)
cnt = defaultdict(int)
total = 0.0
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    # device lanes: pick pids whose process name mentions TPU/device
    dev_pids = set()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower():
                dev_pids.add(ev["pid"])
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
            nm = ev.get("name", "")
            dur = ev.get("dur", 0) / 1e3   # us -> ms
            agg[nm] += dur
            cnt[nm] += 1
            total += dur
for nm in sorted(agg, key=agg.get, reverse=True)[:35]:
    print(f"{agg[nm]/3:8.3f} ms/step  x{cnt[nm]:4d}  {nm[:110]}",
          flush=True)
print(f"TOTAL device {total/3:.2f} ms/step", flush=True)
