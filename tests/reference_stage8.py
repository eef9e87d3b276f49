"""Execute the reference's DEPLOYED runtimes from the read-only mount —
stage_7 (packed-state-dict build), stage_8_torch (float-NMS mAP runtime)
and stage_8_torch_full_quant (q_NMS runtime) — against artifact trees we
wrote, and expose their outputs for detection-level parity tests.

The chain mirrors production: our stage-6-equivalent artifacts (byte-
proven in tests/test_tree_diff.py) -> the REAL stage_7 packs
QUANT_WEIGHTS_{K}.pickle by the mtime order contract (stage_7.py:757-780)
-> the REAL stage_8 loads it and runs the golden image. Nothing is copied
from the reference; modules execute from the mount via reference_oracle.

Environment shims (this image has no torchvision/deeplake/map_boxes):
  * torchvision.ops.nms — implemented to the documented torchvision
    contract (greedy by descending score, suppress IoU strictly greater
    than the threshold, IoU with no +1 term). The shim is the only part
    of the stage-8 float path not executed from the mount; noted in the
    parity test docstring.
  * transforms.ToPILImage/Lambda and tuple-size Resize (identity when the
    tensor already has the target size — the golden image is 640x640).
  * deeplake.load(...).pytorch(...) — a one-batch loader yielding the
    golden image plus a dummy annotation, driving the REAL validation
    loop (stage_8_torch.py:996-1026) end to end.
  * map_boxes.mean_average_precision_for_boxes — returns (0.0, {}): the
    real package is not installed (recorded as environmental in
    STATUS.md); detection parity does not depend on it.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

import reference_oracle
import reference_stage6 as rs6


def _nms_keep(boxes: np.ndarray, scores: np.ndarray,
              iou_threshold: float) -> np.ndarray:
    """Greedy NMS to the torchvision.ops.nms contract: descending score,
    suppress IoU > threshold; returns kept indices in score order."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        inter = np.maximum(0.0, xx2 - xx1) * np.maximum(0.0, yy2 - yy1)
        iou = inter / (areas[i] + areas[rest] - inter)
        order = rest[iou <= iou_threshold]
    return np.asarray(keep, np.int64)


def install_torch_runtime_shims() -> None:
    """Extend reference_stage6's torchvision shim with what the stage-7/8
    scripts additionally touch."""
    rs6.install_torchvision_shim()
    import torch

    tv = sys.modules["torchvision"]
    if hasattr(tv, "ops"):
        return

    ops = types.ModuleType("torchvision.ops")

    def nms(boxes, scores, iou_threshold):
        keep = _nms_keep(boxes.detach().cpu().numpy().astype(np.float64),
                         scores.detach().cpu().numpy().astype(np.float64),
                         float(iou_threshold))
        return torch.from_numpy(keep)

    ops.nms = nms
    tv.ops = ops
    sys.modules["torchvision.ops"] = ops

    tr = sys.modules["torchvision.transforms"]
    trt = sys.modules["torchvision.transforms.transforms"]

    class ToPILImage:
        def __call__(self, x):   # not exercised: the shim loader yields
            return x             # ready tensors (transform dict unused)

    class Lambda:
        def __init__(self, f):
            self.f = f

        def __call__(self, x):
            return self.f(x)

    base_resize = trt.Resize

    class Resize(base_resize):  # type: ignore[misc,valid-type]
        """Adds the tuple-size tensor form stage_8 uses
        (transforms.Resize((640, 640)) on a (B,3,H,W) tensor): identity
        when the tensor already has the target size — the only case the
        golden-image flow produces."""

        def __init__(self, size):
            self.size_t = tuple(size) if isinstance(size, (tuple, list)) \
                else None
            if self.size_t is None:
                super().__init__(size)

        def __call__(self, img):
            if self.size_t is None:
                return super().__call__(img)
            if hasattr(img, "shape"):
                if tuple(img.shape[-2:]) == self.size_t:
                    return img
                raise NotImplementedError(
                    "shim Resize(tuple) only supports identity")
            if (img.size[1], img.size[0]) == self.size_t:
                return img
            raise NotImplementedError(
                "shim Resize(tuple) only supports identity")

    for m in (trt, tr):
        m.ToPILImage, m.Lambda, m.Resize = ToPILImage, Lambda, Resize


def install_deeplake_shim(image_chw_f32: np.ndarray) -> None:
    """A one-batch COCO-shaped loader feeding the golden image into the
    real stage_8 validation loop (stage_8_torch.py:984-1023)."""
    import torch

    img = torch.from_numpy(np.asarray(image_chw_f32, np.float32).copy())
    if img.dim() == 4:
        img = img[0]

    class _Dataset:
        def pytorch(self, num_workers=0, batch_size=1, transform=None,
                    shuffle=False):
            return [{
                "images": img.unsqueeze(0),
                # one dummy 'cat' annotation so map_from_torch_ann_np's
                # dataframe construction runs (values are irrelevant to
                # detection parity)
                "boxes": torch.tensor([[[1.0, 1.0, 10.0, 10.0]]]),
                "categories": torch.tensor([[15.0]]),
            }]

    dl = types.ModuleType("deeplake")
    dl.load = lambda uri: _Dataset()
    sys.modules["deeplake"] = dl


def install_map_boxes_shim() -> None:
    if "map_boxes" in sys.modules:
        return
    mb = types.ModuleType("map_boxes")
    mb.mean_average_precision_for_boxes = lambda ann, det, thr: (0.0, {})
    sys.modules["map_boxes"] = mb


def write_runtime_inputs(tmp: str, model, params, k: int = 8,
                         full: bool = False,
                         dir_suffix: str = "nano") -> str:
    """The minimal artifact set stage_7/stage_8 load: weights_pickle/*
    (+ the float dfl.pickle on partial trees / dfl_scale.pickle on full
    trees, mirroring what stage_6/6b write), bias_scales/*, max_a.txt,
    the directory skeleton, and the golden image at the cwd-relative
    path. Pickle mtimes are pinned ascending in the reference's stage-6
    write order — the explicit form of the mtime contract stage_7 sorts
    by (stage_7.py:757-763; stage_6 sleeps 1.5 s per layer to create it).
    """
    from alpha_yolo_quant_tpu.export.artifacts import make_dirs
    from alpha_yolo_quant_tpu.export.pickles import (
        dump_gz_pickle, save_layer_pickles,
    )
    from alpha_yolo_quant_tpu.utils.io import write_max_a

    main = os.path.join(tmp, f"{k}_{dir_suffix}")
    make_dirs(main)
    save_layer_pickles(model, main)
    order = []
    for node in model.graph.convs():
        order += [f"{node.name}_conv.pickle", f"{node.name}_bias.pickle"]
    if full:
        # 6b writes the quantized dfl pair (stage_6_full_quant.py:755)
        order += ["dfl_conv.pickle", "dfl_bias.pickle"]
        dump_gz_pickle(
            np.float64(model.head.dfl_acc_scale).reshape(1, 1, 1, 1),
            os.path.join(main, "bias_scales", "dfl_scale.pickle"))
    else:
        # stage_6 writes the float dfl last (stage_6.py:618)
        dump_gz_pickle(np.asarray(params["dfl"]["w"], np.float32),
                       os.path.join(main, "weights_pickle", "dfl.pickle"))
        order += ["dfl.pickle"]
    base = 1_600_000_000
    for i, fn in enumerate(order):
        path = os.path.join(main, "weights_pickle", fn)
        os.utime(path, (base + i, base + i))
    write_max_a(os.path.join(main, "results", "max_a.txt"), model.max_a)

    os.makedirs(os.path.join(tmp, "utils"), exist_ok=True)
    dst = os.path.join(tmp, "utils", "cats_2_640.jpg")
    if not os.path.lexists(dst):
        os.symlink(os.path.join(reference_oracle.REF, "utils",
                                "cats_2_640.jpg"), dst)
    return main


def _patch_stage0(model: str, k: int) -> None:
    s0 = reference_oracle.load("stage_0")
    s0.MODEL_NAME = {"yolov8n": "yolov8n.pt", "yolov8s": "yolov8s.pt"}[
        model]
    s0.K = k
    s0.QUANT_WEIGHTS = f"QUANT_WEIGHTS_{k}.pickle"
    s0.MAIN_DIR_NAME = f"{k}_" + ("nano" if model == "yolov8n"
                                  else "small")
    s0.W = 0.25 if model == "yolov8n" else 0.50
    s0.detect_1_channels = 80 if model == "yolov8n" else 128


def run_stage(tmp: str, leaf: str, model: str = "yolov8n", k: int = 8,
              golden_img: np.ndarray = None):
    """Execute a deployed-runtime reference stage with cwd=tmp. Returns
    the executed module (its pipeline runs at import time).

    leaf: 'stage_7' | 'stage_8_torch' | 'stage_8_torch_full_quant' |
    'stage_8_memory'.
    """
    install_torch_runtime_shims()
    if leaf in ("stage_8_torch", "stage_8_torch_full_quant"):
        # 8b imports deeplake/map_boxes at top level too (its validation
        # loop is commented out but the imports are not)
        assert golden_img is not None
        install_deeplake_shim(golden_img)
        install_map_boxes_shim()
    import matplotlib

    matplotlib.use("Agg")
    if leaf == "stage_8_memory":
        # writes ./results/memory.txt + per-op heatmaps into ./memory
        # relative to cwd (stage_8_memory.py:28, mem_ckecker.py:34-37);
        # mem_ckecker holds the SRAM state in module globals created at
        # import, so force a fresh execution of it too
        os.makedirs(os.path.join(tmp, "results"), exist_ok=True)
        os.makedirs(os.path.join(tmp, "memory"), exist_ok=True)
        sys.modules.pop(
            f"{reference_oracle._PKG}.quantisation.utils.mem_ckecker",
            None)
        # the per-op seaborn heatmap renders a 358400x8 quadmesh ~80
        # times (minutes of pure plotting); the trace bytes under test
        # never depend on it, so stub just the draw call
        import seaborn

        seaborn.heatmap = lambda *a, **kw: None
    _patch_stage0(model, k)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        return reference_oracle.load(leaf, fresh=True)
    finally:
        os.chdir(cwd)
