"""Offset-folded bf16 conv for wide (amax > 256) input edges.

Three layers of proof:
  1. silu_out_range is EXACT: brute force over every accumulator value
     agrees on synthetic requant constants.
  2. The propagated signed edge bounds ENCLOSE the runtime: every edge
     value of an actual int forward lies in [edge_lo, edge_hi].
  3. When bf16_offset fires, the auto engine is BITWISE equal to the
     plain xla engine (and the plan's exported b_q is untouched).

The offset eligibility requires realistic calibration (the SiLU integer
output range is ~ -0.29/out_scale, so tiny calibrated maxima push the
derived lows to the -qmax clip and the width past 512 — exactly what
the random-weight bench model does, see scripts/r7_wideedge3.log). The
tests force qualification with a uniform large max_a.
"""
import numpy as np

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.models.graph import ConvNode
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.luts import sigmoid_lut
from alpha_yolo_quant_tpu.quantize.transform import (
    _rhu_shift_np, build_quantized_model, silu_out_range,
)

QMAX = 127


def _epilogue_np(acc, r1, s1, r2, s2, sig):
    """The host-int64 SiLU epilogue (the contract every runtime requant
    formulation is proven against)."""
    acc = np.int64(acc)
    dom = np.clip(_rhu_shift_np(np.int64(r1) * acc, s1), -QMAX, QMAX)
    sigma = np.int64(sig.values)[dom - sig.lo]
    return np.clip(_rhu_shift_np(sigma * np.int64(r2) * acc, s2),
                   -QMAX, QMAX)


def test_silu_out_range_matches_exhaustive_brute_force():
    sig = sigmoid_lut(7.0, 8)
    rng = np.random.default_rng(0)

    class P:
        pass

    for _ in range(10):
        c = int(rng.integers(1, 4))
        p = P()
        p.r1 = rng.integers(100, 256, c)
        p.s1 = rng.integers(8, 16, c)
        p.r2 = rng.integers(100, 256, c)
        p.s2 = rng.integers(8, 16, c)
        p.acc_bound = rng.integers(1000, 40000, c)
        lo, hi = silu_out_range(p, sig, QMAX)
        blo, bhi = 0, 0
        for j in range(c):
            accs = np.arange(-int(p.acc_bound[j]), int(p.acc_bound[j]) + 1)
            y = _epilogue_np(accs, p.r1[j], p.s1[j], p.r2[j], p.s2[j], sig)
            blo, bhi = min(blo, int(y.min())), max(bhi, int(y.max()))
        assert (lo, hi) == (blo, bhi)


def _model(size=64, max_a_value=None, seed=0):
    cfg = QuantConfig(model="yolov8n", k=8, full_quant=True,
                      image_size=size)
    g = build_yolov8_graph(cfg)
    params = init_params(g, seed=seed)
    if max_a_value is None:
        calib = np.random.default_rng(1).uniform(
            0, 1, (2, 3, size, size)).astype(np.float32)
        max_a = reduce_stats(collect_stats(g, params, [calib]), "max")
    else:
        max_a = {n.out_tap: float(max_a_value) for n in g.nodes
                 if isinstance(n, ConvNode) and n.silu}
    return build_quantized_model(g, params, max_a, cfg), params, cfg


def test_edge_bounds_enclose_runtime_values():
    from alpha_yolo_quant_tpu.runtime.interpreter import (
        device_plan, int_forward, quantize_input,
    )

    model, _, cfg = _model(size=64)
    plan = device_plan(model)
    x = np.random.default_rng(7).uniform(0, 1, (2, 3, 64, 64)).astype(
        np.float32)
    outs = int_forward(model, plan, quantize_input(x, cfg.k),
                       engine="xla", keep_env=True)
    env = outs["__env__"]
    checked = 0
    for e, lo in model.edge_lo.items():
        if e not in env:
            continue
        v = np.asarray(env[e])
        assert v.min() >= lo, e
        assert v.max() <= model.edge_hi[e], e
        checked += 1
    assert checked > 40


def test_offset_fires_and_auto_engine_is_bitwise():
    import jax

    from alpha_yolo_quant_tpu.runtime.interpreter import (
        build_int_pipeline, device_plan, int_forward, quantize_input,
    )

    # uniform large calibration maxima -> SiLU integer lows ~ -1, so the
    # wide concat edge's proven width collapses well under 512
    model, params, cfg = _model(size=64, max_a_value=8.0)
    cp = model.convs["C2F_6_conv_1"]
    assert cp.bf16_offset is not None
    src = cp.node.src
    assert model.edge_hi[src] - model.edge_lo[src] <= 512
    assert cp.bf16_offset == model.edge_hi[src] - 256
    # the exported/reference-side integers are untouched by the fold
    assert cp.b_q.dtype == np.int32

    plan = device_plan(model)
    x = np.random.default_rng(3).uniform(0, 1, (2, 3, 64, 64)).astype(
        np.float32)
    xq = quantize_input(x, cfg.k)
    want = int_forward(model, plan, xq, engine="xla")
    got = jax.jit(lambda q: int_forward(model, plan, q, engine="auto"))(xq)
    for role in sorted(model.graph.outputs):
        assert np.array_equal(np.asarray(got[role]),
                              np.asarray(want[role])), role

    # and through the full serving pipeline vs the golden host oracle's
    # engine-independence guarantee: auto vs s8 pipelines, same bits
    fn_auto, _ = build_int_pipeline(model, engine="auto")
    fn_s8, _ = build_int_pipeline(model, engine="s8")
    det_a, n_a = jax.jit(fn_auto)(x)
    det_s, n_s = jax.jit(fn_s8)(x)
    assert np.array_equal(np.asarray(n_a), np.asarray(n_s))
    assert np.array_equal(np.asarray(det_a), np.asarray(det_s))


def test_yolov8s_bounds_and_offset_bitwise():
    """The s-scale graph (more C2F blocks, deeper double-residual
    chains) through the same machinery: bounds cover every wide edge,
    qualifying convs go offset-bf16, and the auto engine stays bitwise
    vs xla. Not in the quick tier (s-scale build is several times the
    n-scale cost)."""
    import jax

    from alpha_yolo_quant_tpu.runtime.interpreter import (
        device_plan, int_forward, quantize_input,
    )

    cfg = QuantConfig(model="yolov8s", k=8, full_quant=True, image_size=64)
    g = build_yolov8_graph(cfg)
    params = init_params(g, seed=0)
    max_a = {n.out_tap: 8.0 for n in g.nodes
             if isinstance(n, ConvNode) and n.silu}
    model = build_quantized_model(g, params, max_a, cfg)
    offs = {n: p.bf16_offset for n, p in model.convs.items()
            if p.bf16_offset is not None}
    assert offs, "uniform large max_a should qualify the s-scale " \
        "wide-edge convs too"
    for n, p in model.convs.items():
        if p.bf16_offset is not None:
            src = p.node.src
            assert model.edge_hi[src] - model.edge_lo[src] <= 512, n
            assert p.node.padding == 0, n

    plan = device_plan(model)
    x = np.random.default_rng(5).uniform(0, 1, (2, 3, 64, 64)).astype(
        np.float32)
    xq = quantize_input(x, cfg.k)
    want = int_forward(model, plan, xq, engine="xla")
    got = jax.jit(lambda q: int_forward(model, plan, q, engine="auto"))(xq)
    for role in sorted(model.graph.outputs):
        assert np.array_equal(np.asarray(got[role]),
                              np.asarray(want[role])), role


def test_offset_through_pp_segments_and_coalesced_serving():
    """The offset conv inside the two other engine wrappers that reuse
    the int_forward node loop: a 4-stage GPipe pipeline (segmented
    execution) and the request-coalescing serving pipeline — both
    bitwise vs their unsharded/per-request baselines with
    bf16_offset active."""
    import jax

    from alpha_yolo_quant_tpu.parallel.mesh import make_mesh
    from alpha_yolo_quant_tpu.parallel.pipeline import build_pp_pipeline
    from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline

    model, params, cfg = _model(size=64, max_a_value=8.0)
    assert model.convs["C2F_6_conv_1"].bf16_offset is not None

    fn_pp, spec = build_pp_pipeline(model, make_mesh(4, axis="pp"),
                                    n_stages=4, microbatch=1,
                                    n_microbatches=4)
    assert spec.engine in ("auto", "xla", "s8")
    images = np.random.default_rng(11).uniform(
        0, 1, (4, 3, 64, 64)).astype(np.float32)
    det_pp, n_pp = fn_pp(images)
    fn_1, _ = build_pp_pipeline(model, make_mesh(1, axis="pp"),
                                n_stages=1, microbatch=4,
                                n_microbatches=1)
    det_1, n_1 = fn_1(images)
    assert np.array_equal(np.asarray(n_pp), np.asarray(n_1))
    assert np.array_equal(np.asarray(det_pp), np.asarray(det_1))

    fn_co, _ = build_int_pipeline(model, engine="auto",
                                  coalesce_requests=2)
    fn_single, _ = build_int_pipeline(model, engine="auto")
    a, b = images[:2], images[2:]
    (det_ca, n_ca), (det_cb, n_cb) = jax.jit(fn_co)(a, b)
    jfn = jax.jit(fn_single)
    det_a, n_a = jfn(a)
    det_b, n_b = jfn(b)
    assert np.array_equal(np.asarray(n_ca), np.asarray(n_a))
    assert np.array_equal(np.asarray(n_cb), np.asarray(n_b))
    assert np.array_equal(np.asarray(det_ca), np.asarray(det_a))
    assert np.array_equal(np.asarray(det_cb), np.asarray(det_b))


def test_bench_synthetic_model_width_too_wide_no_offset():
    """The random-weight bench model does NOT qualify (derived width 702
    at 640; scripts/r7_wideedge3.log measured the 1.83 ms that real
    weights will reclaim) — pin that the plan stays on the proven split
    conv rather than an unsound bf16 store."""
    model, _, _ = _model(size=64)
    assert model.convs["C2F_6_conv_1"].bf16_offset is None
    assert not model.convs["C2F_6_conv_1"].bf16_single_ok
