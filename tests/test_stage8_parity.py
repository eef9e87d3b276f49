"""Detection-level parity vs the reference's DEPLOYED runtimes
(stage_7 / stage_8_torch / stage_8_torch_full_quant), executed for real
from the read-only mount on artifact trees we wrote (VERDICT r3 item #1).

What is provable, and how (measured in scripts/_r6_stage8_probe*.py,
logs scripts/r6_stage8*.log):

* stage_7's QUANT_WEIGHTS packing is EXACT vs export.pickles.
  packed_state_dict — 127/127 tensors bit-equal on both partial and
  full-quant trees (incl. the float-vs-quantized dfl.weight asymmetry).
* The stage-8 torch runtimes are NOT bit-faithful to the reference's own
  exported stage-6 semantics: their requantize twin computes
  rescale*acc in float32 (utils/rescale_coeff_torch.py:43), whose
  products exceed 2^24 on the silu requant-2 path, flipping ~1e-5..1e-2
  of elements by exactly +-1 LSB per layer (first flip at layer 35 of
  57 on the probe seed), which then amplifies through the net. The
  reference's hardware artifacts (per-pixel stage-6 txts, which we match
  byte-for-byte in test_tree_diff) define the exact-int semantics; the
  torch runtime is its f32-approximate mAP validator. Our interpreter
  implements the exact-int semantics.
* Two further reference-internal contradictions surfaced by this gate:
  - PAN-down concat flow: the 6b export and the deployed 8b runtime
    requantize OPPOSITE concat inputs at CONCAT_3X4 / CONCAT_SPPFx3
    (QuantConfig.stage8_concat_flow documents both; the 8b direction is
    the arithmetically consistent one).
  - q_NMS tie order: `scores.argsort(descending=True)` is torch's
    UNSTABLE sort and synthetic-weight scores tie heavily (22 unique of
    the top 1000), so the reference's own keep set is only defined up
    to tie permutation; ours is the deterministic stable refinement.
* Therefore parity is asserted in tiers:
  (a) EXACT parity on an f64 evaluation of the reference's own forward
      (_wrap_f64 — removes only its f32 round-off): the float variant's
      detections match ours (keep set + classes exact, boxes/conf to
      f32 sum-order tolerance), and the 8b variant's pre-NMS plane is
      BIT-IDENTICAL to our decode, with suppression parity proven on
      the reference's own nms_quant under a tie-free order.
  (b) DRIFT-BOUNDED stock parity: the unmodified stage-8 run must stay
      within the measured f32-drift envelope of our detections
      (count within 15%, top rows same class, conf within 5e-3) — the
      quirks are documented, not silently absorbed.

Set AYQ_SKIP_TREE_DIFF=1 to skip (same knob as the stage-6 tree gates).
"""

import os

import numpy as np
import pytest

import conftest  # noqa: F401
import reference_stage6 as rs6
import reference_stage8 as rs8

ref_exists = pytest.mark.skipif(not conftest.reference_available(),
                                reason="reference tree not mounted")
not_skipped = pytest.mark.skipif(
    os.environ.get("AYQ_SKIP_TREE_DIFF") == "1",
    reason="AYQ_SKIP_TREE_DIFF=1")


def _build(full: bool, stage8_flow: bool = False):
    from alpha_yolo_quant_tpu.config import QuantConfig
    from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
    from alpha_yolo_quant_tpu.models.params import init_params
    from alpha_yolo_quant_tpu.quantize.calibrate import (
        collect_stats, reduce_stats,
    )
    from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model

    cfg = QuantConfig(model="yolov8n", k=8, image_size=640,
                      full_quant=full, stage8_concat_flow=stage8_flow)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=3)
    img = rs6.golden_image()
    max_a = reduce_stats(collect_stats(graph, params, [img]), "max")
    model = build_quantized_model(graph, params, max_a, cfg)
    return cfg, params, img, model


def _wrap_f64(mod):
    """Evaluate the reference's OWN forward in float64: every value in
    this pipeline is an integer (or a scale) far below 2^53, so f64
    arithmetic is exact and the run becomes the reference's semantics
    with its f32 round-off removed -- every conv/requant/LUT/NMS line
    still executes from the mount. Implementation: model.double()
    (covers the convs, incl. the plain head accumulators whose f32
    partial sums exceed 2^24 -- measured cls-plane flips in
    scripts/_r6_stage8_probe*.py) + a quant_matrix wrap handing the
    f32-quantized input (identical rounding to the stock run; values
    <= 127 are exact in either dtype) to the f64 graph.

    The module-global helpers are re-wrapped to keep values f64 across
    their internal f32 casts (requantize ends in .type(torch.float32);
    sigmoid_quant/exponent_quant emit the LUT-value dtype): every such
    value is an integer <= 2^15, exact in f32, so re-doubling changes no
    bits — it only keeps the SURROUNDING arithmetic (sigma*acc products,
    rescale*acc products, the 8b softmax division) in f64."""
    import torch

    def to64(v):
        return v.double() if torch.is_tensor(v) else v

    mod.model.double()
    orig_qm = mod.quant_matrix

    def qm64(x, k, start=False):
        res, scales = orig_qm(x, k, start)
        return res.double(), scales

    mod.quant_matrix = qm64
    orig_req = mod.requantize

    def req64(arr, old, new, bits, device, bit_size_for_koeff=8):
        out, r, s = orig_req(arr.double(), to64(old), to64(new), bits,
                             device, bit_size_for_koeff)
        return out.double(), r, s

    mod.requantize = req64
    orig_sig = mod.sigmoid_quant

    def sig64(x, lookup, device):
        return orig_sig(x, lookup, device).double()

    mod.sigmoid_quant = sig64
    if hasattr(mod, "exponent"):          # the 8b head
        orig_exp = mod.exponent

        def exp64(x, scale_x):
            out, s = orig_exp(x.double(), to64(scale_x))
            return out.double(), s

        mod.exponent = exp64
        # 8b casts the softmax ints to f32 right before the dfl conv
        # (stage_8_torch_full_quant.py:1206); that conv's values are
        # < 2^21, f32-exact, so run just it in f32 to match the cast
        mod.model.dfl.float()


def _our_detections(model, params, img, full: bool):
    """Our pipeline under the stage-8 contract: per-image-amax input
    quant (EngineOptions.per_image_amax), reference eval NMS params
    (conf 1e-8 float / 8192 int16, no pre-topk truncation for the float
    path — stage_8_torch.py:147 coord has none), then the reference's
    identity-scale scale_boxes."""
    import jax.numpy as jnp

    from alpha_yolo_quant_tpu.postprocess.nms import NmsParams, scale_boxes
    from alpha_yolo_quant_tpu.runtime.interpreter import (
        EngineOptions, build_int_pipeline, eval_nms_params,
    )

    if full:
        import dataclasses

        # 8192 = round(.25 * 32767); trunc_boxes = the deployed torch
        # runtime's xyxy int truncation (see NmsParams.trunc_boxes)
        nmsp = dataclasses.replace(eval_nms_params(model, 0.25),
                                   trunc_boxes=True)
    else:
        nmsp = NmsParams(conf_thres=1e-8, pre_topk=None)
    fn, _ = build_int_pipeline(model, dfl_w_float=params["dfl"]["w"],
                               nms_params=nmsp,
                               options=EngineOptions(per_image_amax=True))
    det, n = fn(jnp.asarray(img))
    n = int(np.asarray(n)[0])
    rows = np.asarray(det)[0][:n].copy()
    rows[:, :4] = np.asarray(
        scale_boxes((640, 640), jnp.asarray(rows[:, :4]), (640, 640)))
    return rows


def _ref_detections(mod, img):
    import torch

    with torch.no_grad():
        boxes, classes = mod.model(torch.from_numpy(np.asarray(img).copy()))
    if boxes is None:
        return np.zeros((0, 6), np.float32)
    return np.c_[boxes.numpy(), classes.numpy()]


def _drift_envelope(stock: np.ndarray, ours: np.ndarray):
    """Drift-tier assertions: the unmodified f32 runtime stays within the
    measured envelope of our exact-int detections (the synthetic-weight
    worst case also carries heavy score ties, whose order the reference's
    unstable torch argsort leaves undefined — see the 8b test)."""
    n_s, n_o = stock.shape[0], ours.shape[0]
    assert abs(n_s - n_o) <= max(3, int(0.15 * max(n_s, n_o))), (n_s, n_o)
    m = min(5, n_s, n_o)
    assert (stock[:m, 5] == ours[:m, 5]).all(), "top-row classes drifted"
    assert np.abs(stock[:m, 4] - ours[:m, 4]).max() < 5e-3


@ref_exists
@not_skipped
@pytest.mark.parametrize("full", [False, True],
                         ids=["partial", "full_quant"])
def test_stage7_packed_dict_exact(tmp_path, full):
    """The REAL stage_7 (mtime-ordered pickle packing, stage_7.py:757-780)
    run on our artifact tree produces a QUANT_WEIGHTS state dict that is
    tensor-for-tensor identical to packed_state_dict — including the
    asymmetric dfl.weight (float dfl on partial trees via stage_6.py:618's
    dfl.pickle; QUANTIZED dfl_conv on 6b trees)."""
    import torch

    from alpha_yolo_quant_tpu.export.pickles import packed_state_dict

    cfg, params, img, model = _build(full)
    tmp = str(tmp_path)
    main = rs8.write_runtime_inputs(tmp, model, params, k=8, full=full)
    rs8.run_stage(tmp, "stage_7", k=8)
    ref_sd = torch.load(os.path.join(main, "results",
                                     "QUANT_WEIGHTS_8.pickle"),
                        map_location="cpu")
    ours = packed_state_dict(model, params)
    assert set(ref_sd) == set(ours)
    for key, v in ref_sd.items():
        np.testing.assert_array_equal(
            v.numpy(),
            np.asarray(ours[key], np.float32).reshape(v.shape),
            err_msg=key)


@ref_exists
@not_skipped
def test_stage8_float_runtime_detection_parity(tmp_path):
    """stage_8_torch (the deployed float-NMS mAP runtime) vs our
    interpreter with per_image_amax: exact-tail detections match ours
    (same keep set, classes, boxes/conf to f32 sum-order tolerance), and
    the stock f32 run stays within the drift envelope. The full deeplake
    validation loop (stage_8_torch.py:996-1026) runs for real against
    the shimmed one-image loader; torchvision.ops.nms is a shim to the
    documented contract (the real package is absent — see
    reference_stage8 module docstring)."""
    cfg, params, img, model = _build(False)
    tmp = str(tmp_path)
    rs8.write_runtime_inputs(tmp, model, params, k=8, full=False)
    rs8.run_stage(tmp, "stage_7", k=8)
    m8 = rs8.run_stage(tmp, "stage_8_torch", k=8, golden_img=img)

    # the import ran the real validation loop over the shim loader
    assert len(m8.det_mass) == 1
    assert os.path.exists(os.path.join(
        tmp, "8_nano", "results", "det_QUANT_8_channel.csv"))

    ours = _our_detections(model, params, img, full=False)
    stock = _ref_detections(m8, img)
    _drift_envelope(stock, ours)
    # det_mass holds the same stock detections (loop == direct call)
    np.testing.assert_allclose(m8.det_mass[0][1].numpy(), stock[:, :4])

    _wrap_f64(m8)
    exact = _ref_detections(m8, img)
    assert exact.shape[0] == ours.shape[0]
    np.testing.assert_array_equal(exact[:, 5], ours[:, 5])
    # float tail (divide-by-scale, softmax, DFL matmul, sigmoid) runs in
    # torch f32 vs XLA f32 with different summation orders: boxes/conf
    # agree to f32 round-off, the keep SET and order exactly
    np.testing.assert_allclose(exact[:, 4], ours[:, 4], rtol=2e-5)
    np.testing.assert_allclose(exact[:, :4], ours[:, :4], atol=2e-2)


@ref_exists
@not_skipped
def test_stage8b_full_quant_runtime_detection_parity(tmp_path):
    """stage_8_torch_full_quant (the deployed q_NMS runtime, golden-image
    path stage_8_torch_full_quant.py:1284-1294) vs our full-quant
    pipeline, in three exact tiers plus the drift envelope.

    The reference's q_NMS result is only defined up to score-tie order:
    `scores.argsort(descending=True)` (stage_8_torch_full_quant.py:260)
    is torch's UNSTABLE sort, and synthetic-weight class scores tie
    heavily (22 unique values in the top 1000 on this seed — measured,
    scripts/_r6_stage8_probe5.py; the f32-vs-f64 IoU walk itself keeps
    the identical set). Our pipeline implements the deterministic
    refinement (stable lowest-index-first ties). So the exact tiers are:

    (a) PLANE parity: the reference's dbox_cls pre-NMS tensor (captured
        at its coord_quant seam, f64-injected forward) is bit-identical
        to our decode_full_quant(sigmoid_cls=True) plane — covers the
        whole forward + quantized head decode end to end.
    (b) SUPPRESSION parity: the reference's own nms_quant executed on a
        tie-free candidate order (strictly-descending surrogate scores —
        scores feed nothing but its argsort) keeps exactly the rows our
        blocked-greedy _greedy_nms_mask keeps on the same boxes.
    (c) DESCALE parity: boxes/conf of our detections are exactly the
        kept ints divided by 412.1635 / 32767 (checked within (a)+(b) by
        construction, asserted on our output rows).
    """
    import torch

    import jax.numpy as jnp

    from alpha_yolo_quant_tpu.postprocess.nms import (
        _greedy_nms_mask, q_nms_params,
    )
    from alpha_yolo_quant_tpu.runtime.interpreter import (
        decode_full_quant, device_plan, int_forward, quantize_input,
    )

    # stage8_concat_flow: the deployed runtime's PAN-down concat
    # direction (see QuantConfig.stage8_concat_flow — the reference's 6b
    # export and 8b runtime contradict each other at those two seams;
    # weight/scale artifacts are identical under both flows)
    cfg, params, img, model = _build(True, stage8_flow=True)
    tmp = str(tmp_path)
    rs8.write_runtime_inputs(tmp, model, params, k=8, full=True)
    rs8.run_stage(tmp, "stage_7", k=8)
    m8 = rs8.run_stage(tmp, "stage_8_torch_full_quant", k=8,
                       golden_img=img)

    ours = _our_detections(model, params, img, full=True)
    stock = _ref_detections(m8, img)
    _drift_envelope(stock, ours)

    # ---- (a) plane parity (f64-injected reference forward) ----
    _wrap_f64(m8)
    cap = {}
    orig_cq = m8.coord_quant

    def cq_capture(prediction):
        cap["plane"] = prediction.detach().numpy().copy()
        return orig_cq(prediction)

    m8.coord_quant = cq_capture
    try:
        _ref_detections(m8, img)
    finally:
        m8.coord_quant = orig_cq
    ref_plane = cap["plane"][0]                      # (84, 8400)

    plan = device_plan(model)
    xq = quantize_input(jnp.asarray(img), 8, per_image_amax=True)
    outs = int_forward(model, plan, xq)
    our_plane = np.asarray(decode_full_quant(model, plan, outs))[0]
    np.testing.assert_array_equal(our_plane, ref_plane)

    # ---- (b) suppression parity on the reference's own nms_quant ----
    # candidates exactly as coord_quant builds them (conf > 8192, xyxy
    # truncated toward zero, class-offset by 7680), ordered by OUR
    # deterministic (conf desc, index asc) rule, top-1000
    pl = ref_plane.T.copy()                          # (8400, 84)
    conf = pl[:, 4:].max(1)
    cid = pl[:, 4:].argmax(1)
    m_ = conf > 8192
    xywh = pl[m_, :4]
    conf, cid = conf[m_], cid[m_]
    xyxy = np.trunc(np.c_[xywh[:, 0] - xywh[:, 2] / 2,
                          xywh[:, 1] - xywh[:, 3] / 2,
                          xywh[:, 0] + xywh[:, 2] / 2,
                          xywh[:, 1] + xywh[:, 3] / 2].astype(np.float32))
    boxes = xyxy + (cid * 7680.0)[:, None].astype(np.float32)
    order = np.lexsort((np.arange(len(conf)), -conf))[:1000]
    bo = boxes[order]
    surrogate = np.arange(len(bo), 0, -1, dtype=np.float32)
    keep_ref = m8.nms_quant(torch.from_numpy(bo),
                            torch.from_numpy(surrogate), 0.45)
    keep_ref = keep_ref.numpy().astype(np.int64)[:300]
    keep_ours = np.asarray(_greedy_nms_mask(
        jnp.asarray(bo), jnp.asarray(surrogate),
        jnp.ones(len(bo), bool), 0.45, 300, 412.0, True, presorted=True))
    np.testing.assert_array_equal(np.nonzero(keep_ours)[0],
                                  np.sort(keep_ref))

    # ---- (c) our detections are the kept ints descaled ----
    qp = q_nms_params(model.head.anchor_scale)
    assert np.allclose(ours[:, 4] * qp.score_scale,
                       np.round(ours[:, 4] * qp.score_scale))
    assert ours.shape[0] <= 300 and (ours[:, 4] > 0.25 - 1e-6).all()
