"""SRAM-trace byte gate: the REAL stage_8_memory executed from the mount
vs hwsim.refmem's static replay (VERDICT r3 item #2).

The reference writes results/memory.txt (one line per annotated
read/write: layer name, read row index, read-tensor channel count, write
row index) and results/final_memory.txt (per-layer merged r/s/w lists +
MAX_MEMORY) while threading a full torch forward through its hand-
annotated mem_ckecker calls. The trace is shape-deterministic, so
hwsim.refmem replays the identical schedule statically — including the
reference's mislabeled conv types, the C2F_21_conv_0 write-tensor slip,
the DOWN-before-UP head order and the set()-based w dedup (see
hwsim/refmem.py's quirk table, each with a stage_8_memory.py citation).
First verified byte-identical in scripts/_r6_mem_probe.py (memory.txt
4,243 bytes / final_memory.txt 3,779 bytes at 640, K=8).

Set AYQ_SKIP_TREE_DIFF=1 to skip (same knob as the other reference-
execution gates)."""

import os

import pytest

import conftest  # noqa: F401
import reference_stage8 as rs8
import test_stage8_parity as tsp

ref_exists = pytest.mark.skipif(not conftest.reference_available(),
                                reason="reference tree not mounted")
not_skipped = pytest.mark.skipif(
    os.environ.get("AYQ_SKIP_TREE_DIFF") == "1",
    reason="AYQ_SKIP_TREE_DIFF=1")


@ref_exists
@not_skipped
def test_stage8_memory_trace_byte_identical(tmp_path):
    from alpha_yolo_quant_tpu.hwsim.refmem import simulate_stage8_memory

    cfg, params, img, model = tsp._build(False)
    tmp = str(tmp_path)
    rs8.write_runtime_inputs(tmp, model, params, k=8, full=False)
    rs8.run_stage(tmp, "stage_7", k=8)
    rs8.run_stage(tmp, "stage_8_memory", k=8, golden_img=img)

    ref_mem = open(os.path.join(tmp, "results", "memory.txt")).read()
    ref_fin = open(os.path.join(tmp, "results",
                                "final_memory.txt")).read()
    assert ref_mem.count("\n") > 50, "reference produced no trace"

    sim = simulate_stage8_memory(model.graph, 640)
    assert sim.memory_txt() == ref_mem
    assert sim.final_memory_txt() == ref_fin


def test_refmem_scales_with_model_and_size():
    """The replay is shape-generic: yolov8s widths and 320px shapes
    produce a consistent trace (every read/write row within the buffer;
    MAX_MEMORY monotone in model width at fixed size)."""
    from alpha_yolo_quant_tpu.config import QuantConfig
    from alpha_yolo_quant_tpu.hwsim.refmem import simulate_stage8_memory
    from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph

    peaks = {}
    for model_name in ("yolov8n", "yolov8s"):
        g = build_yolov8_graph(QuantConfig(model=model_name,
                                           image_size=320))
        sim = simulate_stage8_memory(g, 320)
        for line in sim.lines:
            name, r, s, w = line.strip().split(", ")
            assert 0 <= int(r.split(": ")[1]) < sim.n_rows
            assert 0 <= int(w.split(": ")[1]) < sim.n_rows
        peaks[model_name] = max(sim.mem_max)
    assert peaks["yolov8s"] > peaks["yolov8n"]
