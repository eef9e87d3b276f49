"""Positional checkpoint-order gate against the reference's ACTUAL stage_1
custom model.

The ultralytics weight remap is a blind positional zip (reference
stage_1.py:775-783): custom-model state_dict KEY ORDER is zipped against the
ultralytics checkpoint's VALUE ORDER.  Our ``raw_param_slots`` must therefore
enumerate slots in the reference custom module's REGISTRATION order — which
differs from graph/forward order inside C2F blocks (cv1, cv2 register before
the bottlenecks; reference stage_1.py:296-299) and at the detect heads (the
three "up" branches register before the three "down" branches;
stage_1.py:373-382).

This gate executes the reference's stage_1 from the read-only mount,
TRUNCATED just before the ultralytics load (``model_orig = YOLO(...)``,
stage_1.py:771 — the package is absent in this image), so the instantiated
custom ``Yolov8`` module is real, and asserts that our slot expansion matches
its state_dict positionally: exact key names (via the fused->raw Sequential
index map) and exact tensor shapes from the graph IR.
"""

from __future__ import annotations

import os
import sys
import types

import pytest

import reference_oracle
from reference_stage6 import install_torchvision_shim

pytestmark = pytest.mark.quick

REF_STAGE1 = os.path.join(reference_oracle.REF, "stage_1.py")

needs_ref = pytest.mark.skipif(not os.path.exists(REF_STAGE1),
                               reason="reference mount absent")


def _install_ultralytics_shim():
    """stage_1 does ``from ultralytics import YOLO`` at the top; the call
    site is truncated away, only the import must resolve."""
    if "ultralytics" in sys.modules:
        return
    mod = types.ModuleType("ultralytics")

    class YOLO:  # pragma: no cover - never instantiated (truncated)
        def __init__(self, *a, **k):
            raise AssertionError("YOLO() reached despite truncation")

    mod.YOLO = YOLO
    sys.modules["ultralytics"] = mod


def _reference_custom_model(model: str, tmp_path):
    """Execute stage_1 from the mount (truncated before the ultralytics
    load) and return the instantiated custom Yolov8 module."""
    install_torchvision_shim()
    _install_ultralytics_shim()
    s0 = reference_oracle.load("stage_0")
    s0.MODEL_NAME = {"yolov8n": "yolov8n.pt", "yolov8s": "yolov8s.pt"}[model]
    s0.MAIN_DIR_NAME = "8_" + ("nano" if model == "yolov8n" else "small")
    s0.W = 0.25 if model == "yolov8n" else 0.50
    s0.D, s0.R = 0.33, 2.0
    s0.detect_1_channels = 80 if model == "yolov8n" else 128

    with open(REF_STAGE1) as f:
        src = f.read()
    cut = src.index("model_orig = YOLO(")
    assert cut > 0
    truncated = src[:cut]

    cwd = os.getcwd()
    scratch = tmp_path / f"stage1_{model}"
    scratch.mkdir()
    os.chdir(scratch)
    try:
        ns = {"__name__": f"_ref_stage1_{model}", "__file__": REF_STAGE1}
        exec(compile(truncated, REF_STAGE1, "exec"), ns)
    finally:
        os.chdir(cwd)
    return ns["model"]


def _expected_entries(model: str):
    """(raw_state_dict_key, shape) per slot position, derived from OUR graph
    IR + slot order."""
    from alpha_yolo_quant_tpu.config import QuantConfig
    from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
    from alpha_yolo_quant_tpu.models.params import (
        conv_has_bn, raw_param_slots, registration_conv_order,
    )

    graph = build_yolov8_graph(QuantConfig(model=model))
    nodes = {n.key: n for n in graph.convs()}
    order = [n.key for n in registration_conv_order(graph)] + ["dfl"]
    slots = raw_param_slots(graph)
    assert [k for k, _ in slots] == order

    entries = []
    for key, fields in slots:
        if key == "dfl":
            entries.append(("dfl.weight", (1, 16, 1, 1)))
            continue
        node = nodes[key]
        prefix, fused_i = key.rsplit(".", 1)
        # fused Sequential packs (conv, silu) pairs; raw packs
        # (conv, bn, silu) triples -> raw index = fused_index / 2 * 3
        raw_i = int(fused_i) // 2 * 3
        wshape = (node.cout, node.cin, node.kernel, node.kernel)
        cshape = (node.cout,)
        if conv_has_bn(node):
            entries.extend([
                (f"{prefix}.{raw_i}.weight", wshape),
                (f"{prefix}.{raw_i + 1}.weight", cshape),
                (f"{prefix}.{raw_i + 1}.bias", cshape),
                (f"{prefix}.{raw_i + 1}.running_mean", cshape),
                (f"{prefix}.{raw_i + 1}.running_var", cshape),
                (f"{prefix}.{raw_i + 1}.num_batches_tracked", ()),
            ])
        else:
            entries.extend([(f"{prefix}.{raw_i}.weight", wshape),
                            (f"{prefix}.{raw_i}.bias", cshape)])
    return entries


@needs_ref
@pytest.mark.parametrize("model", ["yolov8n", "yolov8s"])
def test_slot_order_matches_reference_registration(model, tmp_path):
    ref_model = _reference_custom_model(model, tmp_path)
    got = [(k, tuple(v.shape)) for k, v in ref_model.state_dict().items()]
    want = _expected_entries(model)
    assert len(got) == len(want) == 355  # n and s have the same count
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, (f"position {i}: reference {g} != ours {w} "
                        "(positional checkpoint remap would mis-assign)")


def test_registration_order_differs_from_graph_order():
    """The two orders genuinely differ (C2F conv_1 placement, head branch
    grouping) — this documents why raw_param_slots cannot iterate
    graph.convs()."""
    from alpha_yolo_quant_tpu.config import QuantConfig
    from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
    from alpha_yolo_quant_tpu.models.params import registration_conv_order

    graph = build_yolov8_graph(QuantConfig(model="yolov8n"))
    graph_keys = [n.key for n in graph.convs()]
    reg_keys = [n.key for n in registration_conv_order(graph)]
    assert sorted(graph_keys) == sorted(reg_keys)
    assert graph_keys != reg_keys
    # C2F_2: cv1, cv2, then the bottleneck convs
    i = reg_keys.index("cf2_conv_0.0")
    assert reg_keys[i:i + 4] == ["cf2_conv_0.0", "cf2_conv_1.0",
                                 "cf2_bottle_0.0", "cf2_bottle_0.2"]
    # heads: all three up branches, then all three down branches, dfl-less
    tail = reg_keys[-18:]
    assert tail == [f"detect_{lv}_{br}.{j}"
                    for br in ("up", "down")
                    for lv in ("5", "6", "x")
                    for j in (0, 2, 4)]


def test_wrong_scale_checkpoint_diagnosed():
    """A checkpoint from another scale must fail loudly at load time with
    the mismatched slot (or the scale hint), not propagate garbage."""
    from alpha_yolo_quant_tpu.config import QuantConfig
    from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
    from alpha_yolo_quant_tpu.models.params import (
        init_raw_params, load_raw_from_values, raw_param_slots,
    )

    g_n = build_yolov8_graph(QuantConfig(model="yolov8n"))
    g_s = build_yolov8_graph(QuantConfig(model="yolov8s"))
    raw_s = init_raw_params(g_s, seed=1)
    vals_s = [raw_s[k][f] for k, fs in raw_param_slots(g_s) for f in fs]
    # same tensor count (355), wrong shapes -> slot-level diagnostic
    with pytest.raises(ValueError, match="wrong model scale"):
        load_raw_from_values(g_n, vals_s)
    # wrong tensor count -> scale hint
    g_m = build_yolov8_graph(QuantConfig(model="yolov8m"))
    raw_m = init_raw_params(g_m, seed=1)
    vals_m = [raw_m[k][f] for k, fs in raw_param_slots(g_m) for f in fs]
    with pytest.raises(ValueError, match="yolov8m"):
        load_raw_from_values(g_n, vals_m)
    # the happy path still loads
    raw_n = init_raw_params(g_n, seed=1)
    vals_n = [raw_n[k][f] for k, fs in raw_param_slots(g_n) for f in fs]
    out = load_raw_from_values(g_n, vals_n)
    assert set(out) == set(raw_n)
