"""Exploratory: real stage_8_memory from the mount vs hwsim.refmem —
byte-diff memory.txt and final_memory.txt.

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python scripts/_r6_mem_probe.py
"""
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ["JAX_PLATFORMS"] = "cpu"

import reference_stage8 as rs8
import test_stage8_parity as tsp

from alpha_yolo_quant_tpu.hwsim.refmem import simulate_stage8_memory

cfg, params, img, model = tsp._build(False)
tmp = tempfile.mkdtemp(prefix="s8m_")
rs8.write_runtime_inputs(tmp, model, params, k=8, full=False)
rs8.run_stage(tmp, "stage_7", k=8)
m8 = rs8.run_stage(tmp, "stage_8_memory", k=8, golden_img=img)

ref_mem = open(os.path.join(tmp, "results", "memory.txt")).read()
ref_fin = open(os.path.join(tmp, "results", "final_memory.txt")).read()

sim = simulate_stage8_memory(model.graph, 640)
our_mem = sim.memory_txt()
our_fin = sim.final_memory_txt()

for label, a, b in (("memory.txt", ref_mem, our_mem),
                    ("final_memory.txt", ref_fin, our_fin)):
    if a == b:
        print(f"{label}: BYTE-IDENTICAL ({len(a)} bytes)")
        continue
    al, bl = a.splitlines(), b.splitlines()
    print(f"{label}: DIFFER (ref {len(al)} lines, ours {len(bl)})")
    for i in range(min(len(al), len(bl))):
        if al[i] != bl[i]:
            print(f"  first diff line {i}:\n   ref: {al[i]}\n   our: "
                  f"{bl[i]}")
            for j in range(i + 1, min(i + 4, len(al), len(bl))):
                print(f"   ref+: {al[j]}\n   our+: {bl[j]}")
            break
    else:
        print("  common prefix equal; lengths differ")
        longer = al if len(al) > len(bl) else bl
        print("  extra:", longer[min(len(al), len(bl))])
print("tmp:", tmp)
