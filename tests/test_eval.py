"""mAP metric sanity, records, and the batched eval harness on a synthetic
COCO dataset."""

import json
import os

import numpy as np
import pytest

import conftest  # noqa: F401

from alpha_yolo_quant_tpu.eval.harness import evaluate
from alpha_yolo_quant_tpu.eval.metrics import average_precision, map50_95
from alpha_yolo_quant_tpu.eval.records import (
    COCO_NAMES, annotation_rows, detection_rows, to_metric_arrays,
)
from alpha_yolo_quant_tpu.data.coco import CocoValDataset
from alpha_yolo_quant_tpu.utils.run_log import read_run_results, \
    write_run_result

RNG = np.random.default_rng(5)


def test_perfect_detections_ap1():
    ann, det = [], []
    for img in range(5):
        for j in range(3):
            box = RNG.uniform(0, 0.7, 2)
            wh = RNG.uniform(0.05, 0.25, 2)
            row = [str(img), "cat", box[0], box[1], box[0] + wh[0],
                   box[1] + wh[1]]
            ann.append(row)
            det.append([str(img), "cat", 0.9, *row[2:]])
    m, per = map50_95(np.array(ann, object), np.array(det, object))
    assert m == pytest.approx(1.0)


def test_false_positives_lower_ap():
    ann = [["0", "dog", 0.1, 0.1, 0.3, 0.3]]
    det = [["0", "dog", 0.9, 0.1, 0.1, 0.3, 0.3],
           ["0", "dog", 0.95, 0.6, 0.6, 0.8, 0.8]]  # confident FP
    m, _ = average_precision(np.array(ann, object), np.array(det, object),
                             0.5)
    assert m == pytest.approx(0.5)


def test_iou_threshold_sweep_monotone():
    ann = [["0", "dog", 0.10, 0.10, 0.30, 0.30]]
    det = [["0", "dog", 0.9, 0.12, 0.12, 0.30, 0.30]]  # iou ~0.8
    m, per = map50_95(np.array(ann, object), np.array(det, object))
    vals = [per[k] for k in sorted(per)]
    assert vals[0] == 1.0 and vals[-1] == 0.0
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_classes_without_annotations_skipped():
    ann = [["0", "dog", 0.1, 0.1, 0.3, 0.3]]
    det = [["0", "dog", 0.9, 0.1, 0.1, 0.3, 0.3],
           ["0", "cat", 0.9, 0.1, 0.1, 0.3, 0.3]]
    m, aps = average_precision(np.array(ann, object), np.array(det, object),
                               0.5)
    assert "cat" not in aps and m == 1.0


def _write_synthetic_coco(tmp_path, n_images=5):
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        w, h = 320, 240
        Image.fromarray(
            (RNG.uniform(0, 255, (h, w, 3))).astype(np.uint8)).save(
            img_dir / f"{i:012d}.jpg")
        images.append({"id": i, "file_name": f"{i:012d}.jpg",
                       "height": h, "width": w})
        for _ in range(2):
            x, y = RNG.uniform(10, 150, 2)
            bw, bh = RNG.uniform(30, 80, 2)
            annotations.append({"id": aid, "image_id": i,
                                "category_id": 18,  # dog
                                "bbox": [float(x), float(y), float(bw),
                                         float(bh)], "iscrowd": 0})
            aid += 1
    cats = [{"id": cid, "name": COCO_NAMES[j]}
            for j, cid in enumerate(range(1, 81))]
    js = {"images": images, "annotations": annotations, "categories": cats}
    ann_path = tmp_path / "instances.json"
    ann_path.write_text(json.dumps(js))
    return str(img_dir), str(ann_path)


def test_harness_with_oracle_step(tmp_path):
    """A fake device step that returns the ground truth (mapped into the
    model frame) must score mAP == 1.0 through the whole harness."""
    img_dir, ann_path = _write_synthetic_coco(tmp_path)
    ds = CocoValDataset(img_dir, ann_path)
    gt = {s.image_id: s for s in ds.samples}
    order = [s.image_id for s in ds.samples]
    cursor = {"i": 0}

    def step(imgs):
        b = imgs.shape[0]
        det = np.zeros((b, 300, 6), np.float32)
        n = np.zeros((b,), np.int32)
        for j in range(b):
            if cursor["i"] >= len(order):
                continue
            s = gt[order[cursor["i"]]]
            cursor["i"] += 1
            h, w = s.orig_hw
            for bi, (x, y, bw, bh) in enumerate(s.boxes_xywh):
                det[j, bi] = [x / w * 640, y / h * 640,
                              (x + bw) / w * 640, (y + bh) / h * 640,
                              0.9, s.classes[bi]]
            n[j] = len(s.boxes_xywh)
        return det, n

    res = evaluate(step, ds, batch_size=2, image_size=640)
    assert res.n_images == len(ds)
    assert res.map50_95 == pytest.approx(1.0)


def test_run_log_roundtrip(tmp_path):
    os.makedirs(tmp_path / "results" / "runs_val")
    write_run_result(str(tmp_path), 0.371, 4)
    write_run_result(str(tmp_path), 0.362, 7, "int8")
    write_run_result(str(tmp_path), 0.365, 7, "int8 minmae")
    runs = read_run_results(str(tmp_path))
    assert [r["map"] for r in runs] == [0.362, 0.365]
    assert runs[1]["comment"] == "int8 minmae"


def test_debug_dump_roundtrip(tmp_path):
    from alpha_yolo_quant_tpu.utils.debug_dump import (
        dump_env, matrix_txt, result_txt,
    )

    m = np.arange(8).reshape(1, 2, 2, 2)
    p = result_txt(m, str(tmp_path / "r.txt"))
    assert "0  1" in open(p).read()
    p2 = matrix_txt(m, "M", str(tmp_path / "m.txt"))
    assert "M:" in open(p2).read()
    dump_env({"edge:a": m}, str(tmp_path / "env"))
    got = np.load(tmp_path / "env" / "edge_a.npy")
    np.testing.assert_array_equal(got, m)


def test_harness_prefetch_path(tmp_path):
    """The async prefetch pipeline yields identical batches/results."""
    img_dir, ann_path = _write_synthetic_coco(tmp_path)
    ds = CocoValDataset(img_dir, ann_path)

    def step(imgs):
        b = np.asarray(imgs).shape[0]
        return np.zeros((b, 300, 6), np.float32), np.zeros((b,), np.int32)

    r1 = evaluate(step, ds, batch_size=2, image_size=64, prefetch=False)
    r2 = evaluate(step, ds, batch_size=2, image_size=64, prefetch=True)
    assert r1.n_images == r2.n_images == len(ds)
    assert r1.map50_95 == r2.map50_95 == 0.0


def test_prefetch_process_pool(tmp_path):
    """The process-pool decode path yields identical batches to the
    synchronous reader."""
    from tests_synth import write_synthetic_coco

    from alpha_yolo_quant_tpu.data.coco import CocoValDataset, batches
    from alpha_yolo_quant_tpu.data.prefetch import prefetch_batches

    img_dir, ann = write_synthetic_coco(tmp_path, n_images=5)
    ds = CocoValDataset(img_dir, ann)
    want = list(batches(ds, 2, 64))
    got = list(prefetch_batches(ds, 2, 64, processes=True,
                                device_put=False, decode_workers=2))
    assert len(got) == len(want)
    for (wi, ws), (gi, gs) in zip(want, got):
        np.testing.assert_allclose(np.asarray(gi), wi, atol=1e-6)
        assert [s.image_id if s else None for s in ws] == \
            [s.image_id if s else None for s in gs]
