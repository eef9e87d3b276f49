"""Cumulative forward cost by graph prefix (auto engine, B=128): time
int_forward over truncated graphs to localize the 27ms. Differences
between consecutive prefixes = segment costs."""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from _slope import slope_time  # noqa: E402

from alpha_yolo_quant_tpu.config import QuantConfig  # noqa: E402
from alpha_yolo_quant_tpu.models.graph import (  # noqa: E402
    ConvNode, build_yolov8_graph,
)
from alpha_yolo_quant_tpu.models.params import init_params  # noqa: E402
from alpha_yolo_quant_tpu.quantize.calibrate import (  # noqa: E402
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import (  # noqa: E402
    build_quantized_model,
)
from alpha_yolo_quant_tpu.runtime.interpreter import (  # noqa: E402
    device_plan, int_forward, quantize_input,
)

B = 128
print("backend:", jax.default_backend(), flush=True)

cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
calib = np.random.default_rng(1).uniform(
    0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
plan = device_plan(model, pallas=False)

imgs = jax.device_put(np.random.default_rng(0).uniform(
    0, 1, (B, 3, 640, 640)).astype(np.float32))
xq = jax.block_until_ready(jax.jit(lambda t: quantize_input(t, 8))(imgs))

nodes = graph.nodes
# prefix cut points: after each named conv milestone
cuts = []
for i, nd in enumerate(nodes):
    if isinstance(nd, ConvNode) and nd.name in (
            "Conv_P2", "C2F_2_conv_1", "C2F_4_conv_1", "C2F_6_conv_1",
            "C2F_8_conv_1", "SPPF_conv_1", "C2F_12_conv_1",
            "C2F_15_conv_1", "C2F_18_conv_1", "C2F_21_conv_1", "x_down_2"):
        cuts.append((i + 1, nd.name, nd.dst))

prev = 0.0
for k, name, edge in cuts:
    g2 = dataclasses.replace(graph, nodes=nodes[:k], outputs={"x": edge})
    m2 = dataclasses.replace(model, graph=g2)
    dt = slope_time(f"prefix@{name:16s}",
                    lambda t, m2=m2: int_forward(m2, plan, t,
                                                 engine="auto")["x"], xq)
    print(f"   segment cost: {(dt - prev)*1000:.2f} ms", flush=True)
    prev = dt
print("done", flush=True)
