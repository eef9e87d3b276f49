"""Round-7 probe: is the K=8 381-wide-edge split conv worth fixing?

The one measured K-asymmetry left open (VERDICT r4 #7 / STATUS): at K=8
the C2F_6 double-residual concat edge reaches |v| <= 381, which is not
bf16-representable (odd ints > 256), so its sole consumer C2F_6_conv_1
(1x1, pad 0) runs the 3-part s8 split conv while every other conv is
single-pass bf16. A PERF-ONLY A/B: force bf16_single_ok on that conv
(numerically wrong for values > 256 — rounding in bf16 — but
cost-identical to the exact offset-fold fix, which would shift the edge
by -128 into bf16-exact range and fold 128*sum(w) into the bias; pad=0
makes that fold exact). If the forced variant wins beyond noise, build
the offset machinery; if not, record the close.

Run: detached, one TPU process at a time (CLAUDE.md).
"""
import dataclasses
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import numpy as np

from _slope import slope_time

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline

B, SIZE = 128, 640


def build(force_wide_bf16: bool):
    cfg = QuantConfig(model="yolov8n", k=8, full_quant=True,
                      image_size=SIZE)
    g = build_yolov8_graph(cfg)
    params = init_params(g, seed=0)
    calib = np.random.default_rng(1).uniform(
        0, 1, (2, 3, SIZE, SIZE)).astype(np.float32)
    max_a = reduce_stats(collect_stats(g, params, [calib]), "max")
    m = build_quantized_model(g, params, max_a, cfg)
    if force_wide_bf16:
        for name, p in m.convs.items():
            if not p.bf16_single_ok:
                print(f"forcing bf16_single_ok on {name} "
                      f"(in_amax {m.edge_amax_int[p.node.src]})",
                      flush=True)
                m.convs[name] = dataclasses.replace(p, bf16_single_ok=True)
    fn, _ = build_int_pipeline(m, engine="auto")
    return fn


# device_put ONCE (measurement trap #8, r7_wideedge.log/-2.log: a host
# numpy x0 re-ships the 629 MB batch over the relay on EVERY loop()
# call — a noisy 16-24 s "fixed" cost that swamps the slope and even
# turns it negative; bench.py and every prior working probe device_put
# the input before timing)
x0 = jax.device_put(np.random.default_rng(0).uniform(
    0, 1, (B, 3, SIZE, SIZE)).astype(np.float32))

for label, force in (("baseline(split-conv)", False),
                     ("forced-bf16(wide)", True)):
    fn = build(force)
    dt = slope_time(label, fn, x0)
    print(f"{label}: {B / dt:.1f} img/s", flush=True)
