"""Conv shape census with roofline bounds (CPU, no TPU needed).

For each conv in the graph: shape, auto-engine flavor, packed-eligibility,
MXU-bound time (int8 394 TOPS / bf16 197 TOPS on v5e-1) and HBM-bound
time (819 GB/s) at a given batch. Prints per-layer and grouped-by-shape
tables sorted by the max() of the two bounds.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import collections

import numpy as np

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import (
    ConvNode, build_yolov8_graph,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
TOPS_S8 = 394e12
TOPS_BF16 = 197e12
HBM = 819e9

cfg = QuantConfig(k=8, image_size=640, full_quant=True)
g = build_yolov8_graph(cfg)

# trace shapes through the graph
shapes = {g.input_edge: (3, 640, 640)}
rows = []
for node in g.nodes:
    cls = type(node).__name__
    if isinstance(node, ConvNode):
        cin, h, w = shapes[node.src]
        ho, wo = h // node.stride, w // node.stride
        cout = node.cout
        shapes[node.dst] = (cout, ho, wo)
        macs = B * ho * wo * cout * cin * node.kernel * node.kernel
        bytes_ = B * (cin * h * w + cout * ho * wo) \
            + cout * cin * node.kernel ** 2
        t_mxu = 2 * macs / TOPS_S8
        t_hbm = bytes_ / HBM
        rows.append((node.name, cin, cout, node.kernel, node.stride,
                     h, macs, bytes_, max(t_mxu, t_hbm) * 1e3))
    elif cls == "ConcatNode":
        cs = [shapes[s] for s in node.srcs]
        shapes[node.dst] = (sum(c[0] for c in cs),) + cs[0][1:]
    elif cls == "SplitNode":
        c, h, w = shapes[node.src]
        shapes[node.dst1] = (c // 2, h, w)
        shapes[node.dst2] = (c // 2, h, w)
    elif cls == "ResidualAddNode":
        shapes[node.dst] = shapes[node.base]
    elif cls == "UpsampleNode":
        c, h, w = shapes[node.src]
        shapes[node.dst] = (c, h * 2, w * 2)
    elif cls == "MaxPoolNode":
        shapes[node.dst] = shapes[node.src]

rows.sort(key=lambda r: -r[8])
tot_mac = sum(r[6] for r in rows)
tot_b = sum(r[7] for r in rows)
print(f"B={B}  total MACs/batch={tot_mac/1e9:.1f}G  "
      f"bytes={tot_b/1e6:.0f}MB  "
      f"mxu-bound={2*tot_mac/TOPS_S8*1e3:.2f}ms  "
      f"hbm-bound={tot_b/HBM*1e3:.2f}ms")
print(f"{'layer':34s} {'cin':>4} {'cout':>4} k s {'H':>4} "
      f"{'GMAC':>7} {'MB':>6} {'bound_ms':>8}")
for r in rows:
    print(f"{r[0]:34s} {r[1]:4d} {r[2]:4d} {r[3]} {r[4]} {r[5]:4d} "
          f"{r[6]/1e9:7.2f} {r[7]/1e6:6.1f} {r[8]:8.3f}")

groups = collections.defaultdict(lambda: [0, 0, 0.0, 0])
for r in rows:
    key = (r[1], r[2], r[3], r[4], r[5])
    grp = groups[key]
    grp[0] += r[6]; grp[1] += r[7]; grp[2] += r[8]; grp[3] += 1  # noqa
print("\ngrouped (cin,cout,k,s,H) x count -> bound_ms")
for key, (mac, by, bnd, n) in sorted(groups.items(),
                                     key=lambda kv: -kv[1][2]):
    print(f"  C{key[0]:>3}->{key[1]:>3} k{key[2]} s{key[3]} @{key[4]:4d} "
          f"x{n}: {bnd:6.3f} ms  ({mac/1e9:.2f} GMAC, {by/1e6:.0f} MB)")
