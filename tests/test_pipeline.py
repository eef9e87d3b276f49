"""Pipeline-parallel (pp) seam: bitwise parity on the virtual CPU mesh."""

import numpy as np

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.parallel.mesh import make_mesh
from alpha_yolo_quant_tpu.parallel.pipeline import (
    _choose_cuts, _live_edges, build_pipeline_spec, build_pp_pipeline,
    pipeline_forward,
)
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import (
    build_int_pipeline, device_plan, int_forward, quantize_input,
)

RNG = np.random.default_rng(29)


def _model(size=64, full_quant=True):
    cfg = QuantConfig(model="yolov8n", k=8, full_quant=full_quant,
                      image_size=size)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=3)
    calib = RNG.uniform(0, 1, (2, 3, size, size)).astype(np.float32)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
    return build_quantized_model(graph, params, max_a, cfg), params


def _ref_outs(model, plan, images, engine):
    q_dt = jnp.bfloat16 if engine == "auto" else jnp.int8
    x_q = quantize_input(images, model.cfg.k, out_dtype=q_dt)
    return jax.jit(
        lambda x: int_forward(model, plan, x, engine=engine))(x_q)


def test_cut_planner_covers_graph_with_nonempty_stages():
    model, _ = _model()
    for s in (2, 3, 4, 8):
        bounds = _choose_cuts(model.graph, model.cfg.image_size, s)
        assert bounds[0] == 0 and bounds[-1] == len(model.graph.nodes)
        assert all(b < a for b, a in zip(bounds, bounds[1:]))
        # every boundary's live set is closed: each stage's inputs are
        # produced strictly earlier
        for cut in bounds[1:-1]:
            assert _live_edges(model.graph, cut)


def test_pp_forward_bitwise_matches_unsharded_full_quant():
    model, _ = _model(full_quant=True)
    plan = device_plan(model)
    spec = build_pipeline_spec(model, plan, n_stages=4, microbatch=1,
                               n_microbatches=4, engine="auto")
    mesh = make_mesh(4, axis="pp")
    fwd = pipeline_forward(model, plan, spec, mesh)
    images = RNG.uniform(0, 1, (4, 3, 64, 64)).astype(np.float32)
    got = fwd(images)
    want = _ref_outs(model, plan, images, "auto")
    for role in sorted(model.graph.outputs):
        assert np.array_equal(np.asarray(got[role]),
                              np.asarray(want[role])), role


def test_pp_forward_bitwise_matches_unsharded_partial_quant_xla():
    model, _ = _model(full_quant=False)
    plan = device_plan(model)
    # microbatch > 1 and a 2-stage split exercise the multi-image slots
    spec = build_pipeline_spec(model, plan, n_stages=2, microbatch=2,
                               n_microbatches=2, engine="xla")
    mesh = make_mesh(2, axis="pp")
    fwd = pipeline_forward(model, plan, spec, mesh)
    images = RNG.uniform(0, 1, (4, 3, 64, 64)).astype(np.float32)
    got = fwd(images)
    want = _ref_outs(model, plan, images, "xla")
    for role in sorted(model.graph.outputs):
        assert np.array_equal(np.asarray(got[role]),
                              np.asarray(want[role])), role


def test_pp_eight_stages_bitwise_and_batch_guard():
    """S=8 drives cuts through C2F split/residual/concat interiors; the
    batch guard rejects a mismatched batch instead of silently clamping
    the microbatch slices."""
    import pytest

    model, _ = _model(full_quant=True)
    plan = device_plan(model)
    spec = build_pipeline_spec(model, plan, n_stages=8, microbatch=1,
                               n_microbatches=2, engine="auto")
    mesh = make_mesh(8, axis="pp")
    fwd = pipeline_forward(model, plan, spec, mesh)
    images = RNG.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    got = fwd(images)
    want = _ref_outs(model, plan, images, "auto")
    for role in sorted(model.graph.outputs):
        assert np.array_equal(np.asarray(got[role]),
                              np.asarray(want[role])), role
    with pytest.raises(ValueError, match="pipeline batch"):
        fwd(RNG.uniform(0, 1, (3, 3, 64, 64)).astype(np.float32))


def test_dp_pp_combined_mesh_bitwise_matches_unsharded():
    from alpha_yolo_quant_tpu.parallel.mesh import make_mesh_2d
    from alpha_yolo_quant_tpu.runtime.interpreter import device_plan as dp_

    model, _ = _model(full_quant=True)
    plan = dp_(model)
    spec = build_pipeline_spec(model, plan, n_stages=2, microbatch=1,
                               n_microbatches=2, engine="auto")
    mesh = make_mesh_2d(2, 2, axes=("dp", "pp"))
    fwd = pipeline_forward(model, plan, spec, mesh, dp_axis="dp")
    images = RNG.uniform(0, 1, (4, 3, 64, 64)).astype(np.float32)
    got = fwd(images)
    want = _ref_outs(model, plan, images, "auto")
    for role in sorted(model.graph.outputs):
        assert np.array_equal(np.asarray(got[role]),
                              np.asarray(want[role])), role


def test_pp_detections_match_single_device_pipeline():
    model, params = _model(full_quant=True)
    mesh = make_mesh(4, axis="pp")
    fn_pp, spec = build_pp_pipeline(model, mesh, n_stages=4, microbatch=1,
                                    n_microbatches=4)
    assert spec.n_stages == 4
    images = RNG.uniform(0, 1, (4, 3, 64, 64)).astype(np.float32)
    det_pp, n_pp = fn_pp(images)
    det_pp = np.asarray(det_pp)

    # bitwise vs the SAME decode path unsharded: a 1-stage "pipeline" on
    # a 1-device mesh runs the identical program without pipelining
    fn_1stage, _ = build_pp_pipeline(model, make_mesh(1, axis="pp"),
                                     n_stages=1, microbatch=4,
                                     n_microbatches=1)
    det_1, n_1 = fn_1stage(images)
    assert np.array_equal(np.asarray(n_pp), np.asarray(n_1))
    assert np.array_equal(det_pp, np.asarray(det_1))

    # and against the flagship serving pipeline (deferred-sigmoid q_NMS
    # path): identical keep sets / classes / int-valued confidences; box
    # floats may differ in the last ulp across the two compiled decodes
    fn1, _ = build_int_pipeline(model, dfl_w_float=params["dfl"]["w"],
                                engine="auto")
    det1, n1 = jax.jit(fn1)(images)
    assert np.array_equal(np.asarray(n_pp), np.asarray(n1))
    det1 = np.asarray(det1)
    for b in range(det1.shape[0]):
        k = int(np.asarray(n1)[b])
        assert np.array_equal(det_pp[b, :k, 4:], det1[b, :k, 4:])
        np.testing.assert_allclose(det_pp[b, :k, :4], det1[b, :k, :4],
                                   rtol=0, atol=1e-3)


def test_pp_detections_partial_quant_match_single_device_pipeline():
    """build_pp_pipeline's full_quant=False branch (decode_float over
    dequantize_heads — ADVICE r4: previously untested through
    build_pp_pipeline): bitwise vs the 1-stage run of the same program,
    and keep-set/class parity vs build_int_pipeline's partial-quant
    detections (box/conf floats may differ in the last ulp across the
    two compiled float decodes)."""
    model, params = _model(full_quant=False)
    dfl_w = params["dfl"]["w"]
    mesh = make_mesh(4, axis="pp")
    fn_pp, spec = build_pp_pipeline(model, mesh, n_stages=4, microbatch=1,
                                    n_microbatches=4, dfl_w_float=dfl_w)
    images = RNG.uniform(0, 1, (4, 3, 64, 64)).astype(np.float32)
    det_pp, n_pp = fn_pp(images)
    det_pp = np.asarray(det_pp)

    fn_1stage, _ = build_pp_pipeline(model, make_mesh(1, axis="pp"),
                                     n_stages=1, microbatch=4,
                                     n_microbatches=1, dfl_w_float=dfl_w)
    det_1, n_1 = fn_1stage(images)
    assert np.array_equal(np.asarray(n_pp), np.asarray(n_1))
    assert np.array_equal(det_pp, np.asarray(det_1))

    fn1, _ = build_int_pipeline(model, dfl_w_float=dfl_w, engine="auto")
    det1, n1 = jax.jit(fn1)(images)
    assert np.array_equal(np.asarray(n_pp), np.asarray(n1))
    det1 = np.asarray(det1)
    for b in range(det1.shape[0]):
        k = int(np.asarray(n1)[b])
        assert np.array_equal(det_pp[b, :k, 5], det1[b, :k, 5])
        np.testing.assert_allclose(det_pp[b, :k, :5], det1[b, :k, :5],
                                   rtol=0, atol=1e-3)
