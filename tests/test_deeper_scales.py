"""Deeper model scales (yolov8m/l/x) — the extension beyond the reference.

The reference supports only n/s (stage_0.py:19-29 has no third branch); the
deeper ultralytics family members share the same D/W/R parameterization
(ultralytics yolov8.yaml scales, with `ratio` encoding the max_channels cap
at the P5 stage). Tap/key names for the extra bottleneck convs are generated
(no reference naming exists) and the state-dict bottleneck indices follow
the reference's own formulas (stage_1.py:628-744), so n/s naming is
untouched — asserted here.

Correctness gates: channel flow vs the known ultralytics channel tables,
float forward vs an independent torch execution of the IR, and the
interpreter==golden bit-exactness gate on the full quantized pipeline.
"""

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU platform)

import jax.numpy as jnp

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import (
    ConcatNode, ConvNode, MaxPoolNode, ResidualAddNode, SplitNode,
    UpsampleNode, build_yolov8_graph,
)
from alpha_yolo_quant_tpu.models.params import (
    init_params, raw_param_slots, registration_conv_order,
)

RNG = np.random.default_rng(7)

# ultralytics channel tables: (P1..P5, head-box hidden, head-cls hidden,
# raw state-dict tensor count)
EXPECTED = {
    "yolov8m": dict(p=(48, 96, 192, 384, 576), box=64, cls=192, tensors=475,
                    bottles=(2, 4, 4, 2, 2, 2, 2, 2)),
    "yolov8l": dict(p=(64, 128, 256, 512, 512), box=64, cls=256, tensors=595,
                    bottles=(3, 6, 6, 3, 3, 3, 3, 3)),
    "yolov8x": dict(p=(80, 160, 320, 640, 640), box=80, cls=320, tensors=595,
                    bottles=(3, 6, 6, 3, 3, 3, 3, 3)),
}


def _edge_channels(g):
    ch = {g.input_edge: 3}
    for n in g.nodes:
        if isinstance(n, ConvNode):
            assert ch[n.src] == n.cin, (n.name, ch[n.src], n.cin)
            ch[n.dst] = n.cout
        elif isinstance(n, SplitNode):
            ch[n.dst1] = ch[n.src] // 2
            ch[n.dst2] = ch[n.src] // 2
        elif isinstance(n, ResidualAddNode):
            assert ch[n.src] == ch[n.base]
            ch[n.dst] = ch[n.src]
        elif isinstance(n, ConcatNode):
            ch[n.dst] = sum(ch[e] for e in n.srcs)
        elif isinstance(n, (MaxPoolNode, UpsampleNode)):
            ch[n.dst] = ch[n.src]
    return ch


@pytest.mark.quick
@pytest.mark.parametrize("model", ["yolov8m", "yolov8l", "yolov8x"])
def test_deeper_graph_consistency(model):
    exp = EXPECTED[model]
    g = build_yolov8_graph(QuantConfig(model=model))
    ch = _edge_channels(g)
    assert (ch["p1"], ch["p2"], ch["p3"], ch["p4"], ch["p5"]) == exp["p"]
    assert ch["c2f21"] == exp["p"][4]
    for role, edge in g.outputs.items():
        assert ch[edge] == (64 if role.endswith("box") else 80)
    box_hidden = g.conv_by_name("x_up_0").cout
    cls_hidden = g.conv_by_name("x_down_0").cout
    assert (box_hidden, cls_hidden) == (exp["box"], exp["cls"])
    taps = [c.tap for c in g.convs()]
    keys = [c.key for c in g.convs()]
    assert len(set(taps)) == len(taps)
    assert len(set(keys)) == len(keys)
    assert sum(len(s[1]) for s in raw_param_slots(g)) == exp["tensors"]
    # bottleneck counts per block
    for block, n in zip(("C2F_2", "C2F_4", "C2F_6", "C2F_8", "C2F_12",
                         "C2F_15", "C2F_18", "C2F_21"), exp["bottles"]):
        got = len([c for c in g.convs()
                   if c.name.startswith(f"{block}_bottle_")])
        assert got == 2 * n, (block, got, n)


@pytest.mark.quick
def test_deeper_scales_leave_ns_naming_untouched():
    """The n/s graphs must keep the exact reference tap/key tables (export
    and calibration parity depend on them)."""
    g = build_yolov8_graph(QuantConfig(model="yolov8n"))
    taps = {c.name: c.tap for c in g.convs()}
    assert taps["C2F_4_bottle_0"] == "conv_b1_c2f"
    assert taps["C2F_6_bottle_3"] == "cf2_bconv1_5"
    keys = [c.key for c in g.convs() if c.name.startswith("C2F_21")]
    assert "cf2_bottle_10.0" in keys and "cf2_conv_15.0" in keys


@pytest.mark.quick
def test_deeper_registration_order_structure():
    """The positional-checkpoint order property (C2f: cv1, cv2 before the
    bottlenecks; Detect: box branches before cls branches) must hold for
    the generated deeper graphs too."""
    g = build_yolov8_graph(QuantConfig(model="yolov8m"))
    reg = [n.key for n in registration_conv_order(g)]
    i = reg.index("cf2_conv_2.0")
    assert reg[i + 1] == "cf2_conv_3.0"           # cv2 right after cv1
    assert reg[i + 2] == "cf2_bottle_3.0"         # C2F_4 starts at n2+1=3
    tail = reg[-18:]
    assert tail == [f"detect_{lv}_{br}.{j}" for br in ("up", "down")
                    for lv in ("5", "6", "x") for j in (0, 2, 4)]


@pytest.mark.parametrize("model", ["yolov8m"])
def test_deeper_float_forward_matches_torch(model):
    from test_model import _torch_forward

    from alpha_yolo_quant_tpu.models.forward import forward_float

    cfg = QuantConfig(model=model, image_size=64)
    g = build_yolov8_graph(cfg)
    params = init_params(g, seed=3)
    x = RNG.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    got, _ = forward_float(g, params, jnp.asarray(x))
    want = _torch_forward(g, params, x)
    for role in want:
        np.testing.assert_allclose(np.asarray(got[role]), want[role],
                                   rtol=2e-4, atol=2e-4, err_msg=str(role))


@pytest.mark.parametrize("model,full_quant", [
    ("yolov8m", False), ("yolov8m", True), ("yolov8x", False),
    ("yolov8l", True),
])
def test_deeper_interpreter_matches_golden(model, full_quant):
    from alpha_yolo_quant_tpu.quantize.calibrate import (
        collect_stats, reduce_stats,
    )
    from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
    from alpha_yolo_quant_tpu.runtime.golden import golden_forward
    from alpha_yolo_quant_tpu.runtime.interpreter import (
        build_int_pipeline, device_plan, int_forward, quantize_input,
    )

    cfg = QuantConfig(model=model, k=8, full_quant=full_quant, image_size=64)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=0)
    calib = RNG.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max", cfg.k)
    model_q = build_quantized_model(graph, params, max_a, cfg)
    x = RNG.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    want_env = golden_forward(model_q, x)
    plan = device_plan(model_q)
    got = int_forward(model_q, plan, quantize_input(jnp.asarray(x), cfg.k),
                      keep_env=True)
    env = got.pop("__env__")
    bad = [n for n, w in want_env.items() if n in env and not np.array_equal(
        np.asarray(env[n]).astype(np.int64), np.asarray(w))]
    assert not bad, f"{model} fq={full_quant}: {bad[:8]}"
    # the jitted end-to-end pipeline must build and run
    fn, _ = build_int_pipeline(model_q, dfl_w_float=params["dfl"]["w"])
    det, n_det = fn(jnp.asarray(np.repeat(x, 2, axis=0)))
    assert det.shape == (2, 300, 6)


def test_deeper_pp_and_dp_seams_bitwise():
    """The parallel seams are IR-generic; prove it on the deeper graph:
    yolov8m full-quant, 4 GPipe stages over a 'pp' mesh bitwise vs the
    unsharded engine, and the shard_map dp serving step bitwise vs the
    local pipeline."""
    import jax

    from alpha_yolo_quant_tpu.parallel.mesh import (
        data_parallel_step, make_mesh, shard_batch,
    )
    from alpha_yolo_quant_tpu.parallel.pipeline import (
        build_pipeline_spec, pipeline_forward,
    )
    from alpha_yolo_quant_tpu.quantize.calibrate import (
        collect_stats, reduce_stats,
    )
    from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
    from alpha_yolo_quant_tpu.runtime.interpreter import (
        build_int_pipeline, device_plan, int_forward, quantize_input,
    )

    cfg = QuantConfig(model="yolov8m", k=8, full_quant=True, image_size=64)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=0)
    calib = RNG.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max", cfg.k)
    model = build_quantized_model(graph, params, max_a, cfg)
    plan = device_plan(model)

    # pp: 4 stages, bitwise on every head edge
    spec = build_pipeline_spec(model, plan, n_stages=4, microbatch=1,
                               n_microbatches=4, engine="auto")
    mesh = make_mesh(4, axis="pp")
    fwd = pipeline_forward(model, plan, spec, mesh)
    images = RNG.uniform(0, 1, (4, 3, 64, 64)).astype(np.float32)
    got = fwd(images)
    x_q = quantize_input(jnp.asarray(images), cfg.k, out_dtype=jnp.bfloat16)
    want = jax.jit(lambda x: int_forward(model, plan, x, engine="auto"))(x_q)
    for role in sorted(model.graph.outputs):
        assert np.array_equal(np.asarray(got[role]),
                              np.asarray(want[role])), role

    # dp: shard_map serving step == local pipeline
    fn, _ = build_int_pipeline(model, dfl_w_float=params["dfl"]["w"])
    dmesh = make_mesh(8)
    step = data_parallel_step(fn, dmesh)
    imgs8 = RNG.uniform(0, 1, (8, 3, 64, 64)).astype(np.float32)
    det_s, n_s = step(shard_batch(dmesh, imgs8))
    det_l, n_l = fn(imgs8)
    np.testing.assert_array_equal(np.asarray(n_s), np.asarray(n_l))
    np.testing.assert_allclose(np.asarray(det_s), np.asarray(det_l),
                               rtol=1e-6)
