"""Bit-exactness of the jnp int32 interpreter vs the numpy int64 golden
runtime over the full YOLOv8n graph, plus the quantized head decode."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.forward import forward_float
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.luts import Lut
from alpha_yolo_quant_tpu.quantize.primitives import requantize_np, scale_for
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.golden import golden_forward
from alpha_yolo_quant_tpu.runtime.interpreter import (
    build_int_pipeline, decode_full_quant, device_plan, int_forward,
    quantize_input,
)

RNG = np.random.default_rng(42)


def _setup(k=8, full_quant=False, size=64, seed=0):
    cfg = QuantConfig(model="yolov8n", k=k, full_quant=full_quant,
                      image_size=size)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=seed)
    calib = RNG.uniform(0, 1, (2, 3, size, size)).astype(np.float32)
    records = collect_stats(graph, params, [calib])
    max_a = reduce_stats(records, "max", k)
    model = build_quantized_model(graph, params, max_a, cfg)
    return cfg, graph, params, model


@pytest.mark.parametrize("k", [8, 6, 4, 2])
def test_interpreter_matches_golden(k):
    # k=2 is the QuantConfig floor (weights in {-1,0,1}, 1-entry-domain
    # LUT tails) — exercises the scale/requant machinery at its most
    # extreme clamping
    cfg, graph, params, model = _setup(k=k)
    x = RNG.uniform(0, 1, (1, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32)
    want_env = golden_forward(model, x)
    plan = device_plan(model)
    got = int_forward(model, plan, quantize_input(jnp.asarray(x), k),
                      keep_env=True)
    env = got.pop("__env__")
    mismatches = []
    for name, w in want_env.items():
        if name not in env:
            continue
        g = np.asarray(env[name]).astype(np.int64)
        if not np.array_equal(g, np.asarray(w)):
            d = np.abs(g - np.asarray(w))
            mismatches.append((name, int(d.max()),
                               int((d > 0).sum()), g.size))
    assert not mismatches, f"k={k}: {mismatches[:8]}"


def test_interpreter_full_quant_matches_golden_backbone():
    cfg, graph, params, model = _setup(full_quant=True)
    x = RNG.uniform(0, 1, (1, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32)
    want_env = golden_forward(model, x)
    plan = device_plan(model)
    got = int_forward(model, plan, quantize_input(jnp.asarray(x), 8),
                      keep_env=True)
    env = got.pop("__env__")
    for name, w in want_env.items():
        if name in env:
            np.testing.assert_array_equal(
                np.asarray(env[name]).astype(np.int64), np.asarray(w),
                err_msg=name)


def _decode_full_quant_np(model, outs):
    """Independent numpy mirror of the quantized head (float64 requant
    semantics) for parity checking."""
    h = model.head
    boxes, clss, shapes = [], [], []
    for level, (bacc, cacc) in outs.items():
        shapes.append((bacc.shape[2], bacc.shape[3]))
        up = model.convs[{"p3": "x_result_5_up_2", "p4": "x_result_6_up_2",
                          "p5": "x_up_2"}[level]]
        dn = model.convs[{"p3": "x_result_5_down_2",
                          "p4": "x_result_6_down_2",
                          "p5": "x_down_2"}[level]]
        bq, _, _ = requantize_np(bacc, up.acc_scale, h.box_scale, 8)
        cq, _, _ = requantize_np(cacc, dn.acc_scale, h.cls_scale, 16)
        b = bq.shape[0]
        boxes.append(bq.reshape(b, 64, -1))
        clss.append(cq.reshape(b, 80, -1))
    box = np.concatenate(boxes, 2)
    cls = np.concatenate(clss, 2)
    b, _, n = box.shape
    bins = box.reshape(b, 4, 16, n).transpose(0, 2, 1, 3)
    y = bins - bins.max(axis=1, keepdims=True)
    e = h.exp_lut.apply_np(y)
    p = np.int64(e / np.maximum(e.sum(axis=1, keepdims=True), 1) * 127)
    acc = np.einsum("brcn,r->bcn", p, h.dfl_w_q.reshape(16))
    dfl_q, _, _ = requantize_np(acc, np.float64(h.dfl_acc_scale),
                                h.anchor_scale, 16)
    cls_sig = h.cls_sigmoid_lut.apply_np(cls)
    return p, dfl_q, cls_sig


def test_full_quant_head_decode():
    cfg, graph, params, model = _setup(full_quant=True)
    x = RNG.uniform(0, 1, (1, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32)
    plan = device_plan(model)
    outs = int_forward(model, plan, quantize_input(jnp.asarray(x), 8))
    preds = np.asarray(decode_full_quant(model, plan, outs))
    assert preds.shape[1] == 84
    # classes are 16-bit sigmoid units
    assert preds[:, 4:].min() >= 0 and preds[:, 4:].max() <= 32767

    np_outs = {lvl: (np.asarray(outs[f"{lvl}_box"]).astype(np.int64),
                     np.asarray(outs[f"{lvl}_cls"]).astype(np.int64))
               for lvl in ("p3", "p4", "p5")}
    p, dfl_q, cls_sig = _decode_full_quant_np(model, np_outs)
    # classes must match the numpy mirror exactly
    np.testing.assert_array_equal(
        preds[:, 4:, :].astype(np.int64),
        cls_sig.astype(np.int64))
    # boxes exactly too: the device softmax floor equals the reference
    # float64 truncation over the whole reachable domain (proof test in
    # test_golden_decode), and dist2bbox stays in f32-exact integer range
    from alpha_yolo_quant_tpu.runtime.golden import (
        _np_dist2bbox, _np_make_anchors,
    )

    shapes = [(np_outs[l][0].shape[2], np_outs[l][0].shape[3])
              for l in ("p3", "p4", "p5")]
    anchors, strides = _np_make_anchors(shapes)
    anchors_q = np.round(anchors * model.head.anchor_scale)
    dbox = _np_dist2bbox(np.float64(dfl_q), anchors_q[None]) * strides
    np.testing.assert_array_equal(preds[:, :4, :].astype(np.float64), dbox)


def test_full_quant_residual_clip_at_third_residual():
    """The reference full-quant pipeline clips EXACTLY ONE residual sum:
    C2F_4_bottle_3_SUMM, the 3rd residual overall (C2F_2 has one residual,
    C2F_4 two) — stage_6_full_quant.py:322. Round-1 bug: the clip was
    applied at the 4th residual (C2F_6_bottle_1)."""
    cfg, graph, params, model = _setup(full_quant=True)
    assert len(model.clip_after_residual) == 1
    idx, bound = next(iter(model.clip_after_residual.items()))
    node = graph.nodes[idx]
    assert node.label == "C2F_4_bottle_3"
    assert bound == int(scale_for(1.0, 8)) == 127

    # drive activations past the bound and check the clip engages there —
    # and only there (C2F_6 residual sums may exceed the bound freely).
    # Shrinking the C2F_4 block-input tap makes both residual summands
    # saturate at +-127, so the sum crosses the bound at many pixels.
    x = RNG.uniform(0, 1, (1, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32)
    tamper = dict(model.max_a)
    tamper[model.convs["C2F_4_conv_0"].node.out_tap] *= 0.05
    tamper[model.convs["C2F_6_conv_0"].node.out_tap] *= 0.05
    model = build_quantized_model(graph, params, tamper, cfg)
    env = golden_forward(model, x)
    pre = env[f"{node.label}:rescale"] + env[node.base]
    assert np.abs(pre).max() > bound, "test did not engage the clip"
    np.testing.assert_array_equal(env[node.dst],
                                  np.clip(pre, -bound, bound))
    from alpha_yolo_quant_tpu.models.graph import ResidualAddNode
    later = [n for n in graph.nodes[idx + 1:]
             if isinstance(n, ResidualAddNode)]
    unclipped = max(int(np.abs(env[n.dst]).max()) for n in later)
    assert unclipped > bound, "expected an unclipped later residual sum"

    # the interpreter applies the identical clip (full-env parity)
    plan = device_plan(model)
    got = int_forward(model, plan, quantize_input(jnp.asarray(x), 8),
                      keep_env=True)["__env__"]
    np.testing.assert_array_equal(
        np.asarray(got[node.dst]).astype(np.int64), env[node.dst])


def test_end_to_end_pipelines_run():
    for full in (False, True):
        cfg, graph, params, model = _setup(full_quant=full)
        fn, _ = build_int_pipeline(model, dfl_w_float=params["dfl"]["w"])
        x = RNG.uniform(0, 1, (2, 3, cfg.image_size, cfg.image_size)).astype(
            np.float32)
        det, n_det = fn(jnp.asarray(x))
        assert det.shape == (2, 300, 6)


def test_k_ceiling_guarded():
    """K > 8 would silently wrap the int8 device paths — must raise."""
    with pytest.raises(ValueError, match="[Kk]"):
        QuantConfig(model="yolov8n", k=9)
    with pytest.raises(ValueError, match="int8"):
        quantize_input(jnp.zeros((1, 3, 4, 4), jnp.float32), 16)
    QuantConfig(model="yolov8n", k=8)  # ceiling itself is fine


def test_quantize_input_per_image_flag():
    x = jnp.asarray(RNG.uniform(0, 0.5, (2, 3, 8, 8)).astype(np.float32))
    pinned = np.asarray(quantize_input(x, 8))
    per_img = np.asarray(quantize_input(x, 8, per_image_amax=True))
    assert np.abs(per_img).max() == 127          # stretched to full range
    assert np.abs(pinned).max() < 127            # a=1 pinned


def test_quantize_input_uint8_ingest_parity():
    """uint8 pixels quantize bit-identically to the float-loader path
    (x = u/255 in f32) — exhaustively over all 256 pixel values, for
    every supported K and both output dtypes."""
    u = jnp.arange(256, dtype=jnp.uint8).reshape(1, 1, 16, 16)
    xf = jnp.asarray(np.arange(256, dtype=np.float32).reshape(
        1, 1, 16, 16) / np.float32(255.0))
    for k in (4, 6, 8):
        for dt in (jnp.int8, jnp.bfloat16):
            a = np.asarray(quantize_input(u, k, out_dtype=dt),
                           np.float64)
            b = np.asarray(quantize_input(xf, k, out_dtype=dt),
                           np.float64)
            assert (a == b).all(), (k, dt)


def test_sibling_merge_engine_bit_exact():
    """The merged-sibling auto path (head-stem conv pairs run as one
    conv) must stay bit-identical to the unmerged auto engine and the
    xla oracle engine."""
    from alpha_yolo_quant_tpu.runtime import interpreter as I

    cfg, graph, params, model = _setup(full_quant=True)
    plan = device_plan(model)
    x = RNG.uniform(0, 1, (2, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32)
    xq_i = quantize_input(jnp.asarray(x), 8)
    xq_b = quantize_input(jnp.asarray(x), 8, out_dtype=jnp.bfloat16)
    groups = I._sibling_merge_groups(model)
    assert groups, "head stem pairs should form merge groups"
    for members in groups.values():
        assert len(members) == 2
        assert members[0].src == members[1].src
    o_ref = int_forward(model, plan, xq_i, engine="xla")
    o_plain = int_forward(model, plan, xq_b, engine="auto")
    # per-pipeline opt-in (default off: merging loses e2e on the current
    # toolchain; exactness must hold anyway) — no module-global mutation
    o_merged = int_forward(model, plan, xq_b, engine="auto",
                           options=I.EngineOptions(merge_siblings=True))
    for role in o_ref:
        assert (np.asarray(o_ref[role])
                == np.asarray(o_merged[role])).all(), role
        assert (np.asarray(o_ref[role])
                == np.asarray(o_plain[role])).all(), role


def test_engine_options_coexist_per_pipeline():
    """Two pipelines with DIFFERENT EngineOptions must coexist in one
    process (no module-global mutation): one with the merged-sibling auto
    flavor, one without, both bit-identical detections; and the module
    globals stay at their defaults throughout."""
    from alpha_yolo_quant_tpu.runtime import interpreter as I

    cfg, graph, params, model = _setup(full_quant=True)
    fn_plain, _ = build_int_pipeline(model, engine="auto",
                                     options=I.EngineOptions())
    fn_merged, _ = build_int_pipeline(
        model, engine="auto",
        options=I.EngineOptions(merge_siblings=True))
    assert I.AUTO_MERGE_SIBLINGS is False
    x = RNG.uniform(0, 1, (2, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32)
    # interleave calls: options must be captured per closure, not read
    # from process state at call time
    det_a, n_a = fn_plain(jnp.asarray(x))
    det_b, n_b = fn_merged(jnp.asarray(x))
    det_a2, n_a2 = fn_plain(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(n_a), np.asarray(n_b))
    np.testing.assert_array_equal(np.asarray(det_a), np.asarray(det_b))
    np.testing.assert_array_equal(np.asarray(det_a), np.asarray(det_a2))
    assert I.AUTO_MERGE_SIBLINGS is False


def test_per_image_amax_input_quant():
    """EngineOptions(per_image_amax=True) reproduces the stage-8 input
    re-quantization quirk (reference stage_8_torch.py:510,
    utils/quant_matrix_torch.py:57-70 start=False): clip to the
    PER-IMAGE amax, scale by (2^(k-1)-1)/amax, round — vs the default
    a=1 pin. Checked against a direct numpy transcription of the
    reference loop."""
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 0.7, (3, 3, 16, 16)).astype(np.float32)
    x[1] *= 2.1  # exercise amax > 1 (clip actually binds)
    for k in (8, 6, 4):
        got = np.asarray(quantize_input(jnp.asarray(x), k,
                                        per_image_amax=True),
                         np.float64)
        qmax = 2 ** (k - 1) - 1
        want = np.empty_like(x, np.float64)
        for b in range(x.shape[0]):
            a = np.abs(x[b]).max()
            s = qmax / a
            want[b] = np.round(np.clip(x[b], -a, a).astype(np.float32)
                               * np.float32(s))
        np.testing.assert_array_equal(got, want, err_msg=f"k={k}")


def test_deferred_cls_sigmoid_equivalent():
    """The serving path defers the 16-bit sigmoid past NMS (monotone map);
    detections must match the eager path."""
    import dataclasses as dc

    from alpha_yolo_quant_tpu.postprocess.nms import (
        non_max_suppression, q_nms_params,
    )
    from alpha_yolo_quant_tpu.runtime.interpreter import (
        cls_int_conf_threshold,
    )

    cfg, graph, params, model = _setup(full_quant=True)
    plan = device_plan(model)
    x = RNG.uniform(0, 1, (2, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32)
    outs = int_forward(model, plan, quantize_input(jnp.asarray(x), 8))

    from alpha_yolo_quant_tpu.runtime.interpreter import decode_full_quant

    eager = decode_full_quant(model, plan, outs, sigmoid_cls=True)
    det_e, n_e = non_max_suppression(eager,
                                     q_nms_params(model.head.anchor_scale))

    lazy = decode_full_quant(model, plan, outs, sigmoid_cls=False)
    p = dc.replace(q_nms_params(model.head.anchor_scale),
                   conf_thres=cls_int_conf_threshold(model))
    det_l, n_l = non_max_suppression(
        lazy, p, score_map=plan["head"]["cls_sig_lut"].apply)

    np.testing.assert_array_equal(np.asarray(n_e), np.asarray(n_l))
    for b in range(2):
        n = int(n_e[b])
        a = np.asarray(det_e[b])[:n]
        c = np.asarray(det_l[b])[:n]
        # same detection set (ordering of exact score ties may differ)
        np.testing.assert_allclose(np.sort(a, axis=0), np.sort(c, axis=0),
                                   rtol=1e-6)


def test_reduce_cls_decode_equivalent():
    """decode_full_quant(reduce_cls=True) reduces the 80 class rows to
    (conf, argmax) inside decode; detections through NMS must be
    IDENTICAL to the (B,84,N)-plane path (same max values, same
    first-index argmax tie rule)."""
    import dataclasses as dc

    from alpha_yolo_quant_tpu.postprocess.nms import (
        non_max_suppression, q_nms_params,
    )
    from alpha_yolo_quant_tpu.runtime.interpreter import (
        cls_int_conf_threshold, decode_full_quant,
    )

    cfg, graph, params, model = _setup(full_quant=True)
    plan = device_plan(model)
    x = RNG.uniform(0, 1, (2, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32)
    outs = int_forward(model, plan, quantize_input(jnp.asarray(x), 8))
    p = dc.replace(q_nms_params(model.head.anchor_scale),
                   conf_thres=cls_int_conf_threshold(model))
    smap = plan["head"]["cls_sig_lut"].apply

    plane = decode_full_quant(model, plan, outs, sigmoid_cls=False)
    det_p, n_p = non_max_suppression(plane, p, score_map=smap)
    tup = decode_full_quant(model, plan, outs, sigmoid_cls=False,
                            reduce_cls=True)
    np.testing.assert_array_equal(np.asarray(plane[:, :4]),
                                  np.asarray(tup[0]))
    det_t, n_t = non_max_suppression(tup, p, score_map=smap)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_t))
    np.testing.assert_array_equal(np.asarray(det_p), np.asarray(det_t))


def test_conf_cid_packed_matches_max_argmax():
    """The packed-key class reduction equals separate max + argmax
    (first-index tie rule) over the full 16-bit score range, including
    negative scores and dense ties."""
    from alpha_yolo_quant_tpu.runtime.interpreter import _conf_cid_packed

    r = np.random.default_rng(3)
    x = r.integers(-(2 ** 15 - 1), 2 ** 15, (4, 80, 7, 9)).astype(np.int32)
    x[0, :, 0, 0] = 5           # all-tie plane
    x[1, 10:14, 1, 2] = 2 ** 15 - 1   # tied max mid-range
    x[2] = -(2 ** 15 - 1)       # all minimal
    conf, cid = _conf_cid_packed(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(conf), x.max(axis=1))
    np.testing.assert_array_equal(np.asarray(cid).astype(np.int64),
                                  x.argmax(axis=1))


def test_sparse_select_decode_parity():
    """The conf-first sparse serving path (decode_select_sparse: sort by
    class confidence FIRST, DFL-decode only the kept top-k anchors) must
    produce bit-identical detections to the dense decode+select path —
    same candidate set/order (identical packed key), same per-anchor box
    math on the surviving anchors."""
    cfg, graph, params, model = _setup(full_quant=True)
    x = jnp.asarray(RNG.uniform(
        0, 1, (3, 3, cfg.image_size, cfg.image_size)).astype(np.float32))
    fn_sparse, _ = build_int_pipeline(model, sparse_select=True)
    fn_dense, _ = build_int_pipeline(model, sparse_select=False)
    det_s, n_s = fn_sparse(x)
    det_d, n_d = fn_dense(x)
    np.testing.assert_array_equal(np.asarray(n_s), np.asarray(n_d))
    np.testing.assert_array_equal(np.asarray(det_s), np.asarray(det_d))
    assert int(np.asarray(n_s).sum()) > 0, "degenerate: no detections"


def test_pipeline_pad_batch_to_bit_exact():
    """pad_batch_to (the serving knob for lane-pathological mid-range
    batches, interpreter.build_int_pipeline) pads with zero images and
    slices back: the real rows must be bit-identical to the unpadded
    pipeline, and the output batch must equal the input batch."""
    cfg, graph, params, model = _setup(full_quant=True)
    x = jnp.asarray(RNG.uniform(
        0, 1, (3, 3, cfg.image_size, cfg.image_size)).astype(np.float32))
    fn, _ = build_int_pipeline(model)
    fn_pad, _ = build_int_pipeline(model, pad_batch_to=8)
    det, n = fn(x)
    det_p, n_p = fn_pad(x)
    assert det_p.shape[0] == 3 and n_p.shape[0] == 3
    np.testing.assert_array_equal(np.asarray(n), np.asarray(n_p))
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det_p))
    # batch >= pad_batch_to is a no-op path (same traced function)
    fn_noop, _ = build_int_pipeline(model, pad_batch_to=2)
    det_n, n_n = fn_noop(x)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det_n))
    np.testing.assert_array_equal(np.asarray(n), np.asarray(n_n))


def test_pipeline_custom_qnms_params_threshold_domain():
    """build_int_pipeline with caller-supplied q_nms_params (conf_thres in
    the POST-sigmoid 16-bit int domain, e.g. the documented 8192) must
    produce the SAME detections as the default pipeline, which derives its
    threshold internally — regression for the round-2 advisory where the
    custom threshold was silently reinterpreted in the pre-sigmoid domain."""
    from alpha_yolo_quant_tpu.postprocess.nms import q_nms_params

    cfg, graph, params, model = _setup(full_quant=True)
    x = jnp.asarray(RNG.uniform(
        0, 1, (2, 3, cfg.image_size, cfg.image_size)).astype(np.float32))
    fn_default, _ = build_int_pipeline(model)
    fn_custom, _ = build_int_pipeline(
        model, nms_params=q_nms_params(model.head.anchor_scale))
    det_d, n_d = fn_default(x)
    det_c, n_c = fn_custom(x)
    np.testing.assert_array_equal(np.asarray(n_d), np.asarray(n_c))
    np.testing.assert_array_equal(np.asarray(det_d), np.asarray(det_c))


def test_eval_nms_params_domains():
    """eval_nms_params maps a float confidence threshold onto the domain
    the model's NMS runs in (reference mAP protocol: coord at conf 1e-8,
    stage_8_torch.py:147; q_NMS serving cut 8192 = round(0.25 * 32767))."""
    from alpha_yolo_quant_tpu.runtime.interpreter import eval_nms_params

    cfg, graph, params, model = _setup(full_quant=True)
    p = eval_nms_params(model, 0.25)
    assert p.quantized and p.conf_thres == 8192.0
    p8 = eval_nms_params(model, 1e-8)
    assert p8.quantized and p8.conf_thres == 0.0

    cfgp, graphp, paramsp, modelp = _setup(full_quant=False)
    pf = eval_nms_params(modelp, 1e-8)
    assert not pf.quantized and pf.conf_thres == 1e-8


def test_eval_nms_params_threshold_reaches_nms():
    """The mAP threshold must actually change the candidate cut: at conf
    1e-8 every anchor with a nonzero class score is an NMS candidate,
    while an impossibly high threshold yields zero detections."""
    from alpha_yolo_quant_tpu.runtime.interpreter import eval_nms_params

    cfg, graph, params, model = _setup(full_quant=True)
    x = jnp.asarray(RNG.uniform(
        0, 1, (1, 3, cfg.image_size, cfg.image_size)).astype(np.float32))
    fn_lo, _ = build_int_pipeline(model,
                                  nms_params=eval_nms_params(model, 1e-8))
    fn_hi, _ = build_int_pipeline(model,
                                  nms_params=eval_nms_params(model, 0.9999))
    _, n_lo = fn_lo(x)
    _, n_hi = fn_hi(x)
    assert int(np.asarray(n_lo).sum()) > 0
    assert int(np.asarray(n_lo).sum()) >= int(np.asarray(n_hi).sum())


def test_head_requant_in_forward_equivalent():
    """int_forward(head_requant=True) + decode(pre_requantized=True) must
    be bit-identical to the requant-in-decode path (same requantize
    constants, applied one fusion boundary earlier)."""
    cfg, graph, params, model = _setup(full_quant=True)
    plan = device_plan(model)
    x = RNG.uniform(0, 1, (2, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32)
    xq = quantize_input(jnp.asarray(x), 8)
    outs_a = int_forward(model, plan, xq)
    ref = decode_full_quant(model, plan, outs_a, sigmoid_cls=False,
                            reduce_cls=True)
    outs_b = int_forward(model, plan, xq, head_requant=True)
    for level in ("p3", "p4", "p5"):
        assert outs_b[f"{level}_box"].dtype == jnp.int8
        assert outs_b[f"{level}_cls"].dtype == jnp.int16
    got = decode_full_quant(model, plan, outs_b, sigmoid_cls=False,
                            reduce_cls=True, pre_requantized=True)
    for a, b, what in zip(ref, got, ("boxes", "conf", "cls")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=what)
