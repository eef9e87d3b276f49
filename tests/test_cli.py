"""CLI surface: the stage subcommands end-to-end at toy size."""

import json
import os

import numpy as np
import pytest

import conftest  # noqa: F401

from alpha_yolo_quant_tpu import cli

RNG = np.random.default_rng(9)


@pytest.fixture(scope="module")
def art(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "8_nano")
    cli.main(["prepare", "--out", out, "--image-size", "64"])
    assert os.path.exists(os.path.join(out, "results",
                                       "weights_batchnf.npz"))
    cli.main(["calibrate", "--out", out, "--weights",
              os.path.join(out, "results", "weights_batchnf.npz"),
              "--image-size", "64", "--batch-size", "2", "--limit", "4"])
    assert os.path.exists(os.path.join(out, "results", "max_a.txt"))
    return out


def test_quantize_and_memsim(art, tmp_path):
    w = os.path.join(art, "results", "weights_batchnf.npz")
    ma = os.path.join(art, "results", "max_a.txt")
    cli.main(["quantize", "--out", art, "--weights", w, "--max-a", ma,
              "--image-size", "64"])
    assert os.path.exists(os.path.join(art, "weights_pickle",
                                       "Conv_P1_conv.pickle"))
    assert os.path.exists(os.path.join(art, "results",
                                       "QUANT_WEIGHTS_8.pickle"))
    cli.main(["memsim", "--out", art, "--image-size", "64"])
    assert os.path.exists(os.path.join(art, "results", "final_memory.txt"))


def test_demo_command(art, tmp_path):
    from PIL import Image

    img = tmp_path / "img.jpg"
    Image.fromarray(RNG.integers(0, 255, (80, 96, 3),
                                 dtype=np.uint8)).save(img)
    w = os.path.join(art, "results", "weights_batchnf.npz")
    ma = os.path.join(art, "results", "max_a.txt")
    plot = str(tmp_path / "det.png")
    cli.main(["demo", "--out", art, "--weights", w, "--max-a", ma,
              "--image-size", "64", "--image", str(img), "--plot", plot])
    assert os.path.exists(plot)


def test_eval_int8_on_synthetic_coco(art, tmp_path):
    from tests_synth import write_synthetic_coco

    img_dir, ann = write_synthetic_coco(tmp_path, n_images=4)
    w = os.path.join(art, "results", "weights_batchnf.npz")
    ma = os.path.join(art, "results", "max_a.txt")
    cli.main(["eval-int8", "--out", art, "--weights", w, "--max-a", ma,
              "--image-size", "64", "--coco-images", img_dir,
              "--coco-ann", ann, "--batch-size", "2", "--limit", "4"])
    assert os.path.exists(os.path.join(art, "results", "runs_val",
                                       "results.txt"))
    # reporting contract: per-run CSV tables (reference det_QUANT_{K}_
    # channel.csv naming) + the cross-run mAP plot
    ann_csv = os.path.join(art, "results", "ann_QUANT_8_channel.csv")
    det_csv = os.path.join(art, "results", "det_QUANT_8_channel.csv")
    assert os.path.exists(ann_csv) and os.path.exists(det_csv)
    with open(det_csv) as f:
        assert f.readline().strip() == \
            "XMin,YMin,XMax,YMax,ImageID,LabelName,Conf"
    assert os.path.exists(os.path.join(art, "results", "runs_val",
                                       "runs.png"))


def test_eval_int8_dp_matches_single_device(art, tmp_path):
    """--dp shards each eval batch over the (virtual) device mesh via the
    shard_map serving step; the mAP must match the single-device run (the
    detection boxes agree to f32 LSB — tests/test_parallel.py)."""
    from tests_synth import write_synthetic_coco

    img_dir, ann = write_synthetic_coco(tmp_path, n_images=4)
    w = os.path.join(art, "results", "weights_batchnf.npz")
    ma = os.path.join(art, "results", "max_a.txt")
    argv = ["eval-int8", "--out", art, "--weights", w, "--max-a", ma,
            "--image-size", "64", "--coco-images", img_dir,
            "--coco-ann", ann, "--batch-size", "2", "--limit", "4"]

    def run(extra):
        ns = cli.build_parser().parse_args(argv + extra)
        return ns.fn(ns)

    res = run([])
    res_dp = run(["--dp", "2"])
    assert res_dp.n_images == res.n_images
    assert abs(res_dp.map50_95 - res.map50_95) < 1e-9


def test_calibrate_dp_matches_single_device(art, tmp_path):
    """calibrate --dp gathers per-image tap maxima from the mesh; the
    reduced max_a must match the single-device run to f32 tolerance
    (sharded and unsharded programs fuse differently at the LSB)."""
    from alpha_yolo_quant_tpu.utils.io import read_max_a

    w = os.path.join(art, "results", "weights_batchnf.npz")
    outs = []
    for extra in ([], ["--dp", "2"]):
        out = str(tmp_path / f"cal{'_dp' if extra else ''}")
        cli.main(["calibrate", "--out", out, "--weights", w,
                  "--image-size", "64", "--batch-size", "2",
                  "--limit", "4"] + extra)
        outs.append(read_max_a(os.path.join(out, "results", "max_a.txt")))
    a, b = outs
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(b[k], a[k], rtol=1e-6, err_msg=k)


def test_eval_float_on_synthetic_coco(art, tmp_path):
    from tests_synth import write_synthetic_coco

    img_dir, ann = write_synthetic_coco(tmp_path, n_images=4)
    w = os.path.join(art, "results", "weights_batchnf.npz")
    cli.main(["eval-float", "--out", art, "--weights", w,
              "--image-size", "64", "--coco-images", img_dir,
              "--coco-ann", ann, "--batch-size", "2", "--limit", "4"])
    assert os.path.exists(os.path.join(art, "results",
                                       "ORIG_MODEL_MAP.txt"))
    assert os.path.exists(os.path.join(art, "results", "ann_orig.csv"))
    assert os.path.exists(os.path.join(art, "results", "det_orig.csv"))


def test_serve_jsonl_over_image_list(art, tmp_path):
    """`ayq serve`: the BatchCoalescer-backed inference service emits one
    valid JSONL row per input image, in input order, with (n, 6)-shaped
    detections."""
    from tests_synth import write_synthetic_coco

    img_dir, _ = write_synthetic_coco(tmp_path, n_images=5)
    paths = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(paths) + "\n")
    out_path = str(tmp_path / "dets.jsonl")
    w = os.path.join(art, "results", "weights_batchnf.npz")
    ma = os.path.join(art, "results", "max_a.txt")
    cli.main(["serve", "--out", art, "--weights", w, "--max-a", ma,
              "--image-size", "64", "--input-list", str(lst),
              "--output", out_path, "--max-batch", "4",
              "--max-wait-ms", "50", "--decoders", "3"])
    rows = [json.loads(ln) for ln in open(out_path)]
    assert [r["path"] for r in rows] == paths   # input order preserved
    for r in rows:
        assert r["n"] == len(r["detections"])
        for d in r["detections"]:
            assert len(d) == 6


def test_serve_mid_stream_decode_failure(art, tmp_path):
    """A bad image path mid-list must not take the serve run down: the
    failed image gets an error JSONL row in place, every other image is
    served normally (same rows as a clean run), and the exit code is
    nonzero (VERDICT r4 #5's decode-failure clause)."""
    from tests_synth import write_synthetic_coco

    img_dir, _ = write_synthetic_coco(tmp_path, n_images=4)
    good = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    paths = good[:2] + [str(tmp_path / "missing.jpg")] + good[2:]
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(paths) + "\n")
    out_path = str(tmp_path / "dets.jsonl")
    w = os.path.join(art, "results", "weights_batchnf.npz")
    ma = os.path.join(art, "results", "max_a.txt")
    base = ["serve", "--out", art, "--weights", w, "--max-a", ma,
            "--image-size", "64", "--max-batch", "4",
            "--max-wait-ms", "50", "--decoders", "3"]
    rc = cli.main(base + ["--input-list", str(lst),
                          "--output", out_path])
    assert rc == 1
    rows = [json.loads(ln) for ln in open(out_path)]
    assert [r["path"] for r in rows] == paths
    assert "error" in rows[2] and "detections" not in rows[2]
    # the surviving images match a clean run byte-for-byte
    lst2 = tmp_path / "clean.txt"
    lst2.write_text("\n".join(good) + "\n")
    out2 = str(tmp_path / "clean.jsonl")
    assert cli.main(base + ["--input-list", str(lst2),
                            "--output", out2]) == 0
    clean = [json.loads(ln) for ln in open(out2)]
    served = [r for r in rows if "error" not in r]
    assert served == clean


def test_serve_from_artifacts_matches_weights_path(art, tmp_path):
    """`serve --from-artifacts` (the stage-8 production load: quantized
    pickles + bias_scales + max_a, no float weights) must emit
    byte-identical JSONL to the weights-path serve — loadq rebuilds a
    bit-identical plan."""
    from tests_synth import write_synthetic_coco

    w = os.path.join(art, "results", "weights_batchnf.npz")
    ma = os.path.join(art, "results", "max_a.txt")
    cli.main(["quantize", "--out", art, "--weights", w, "--max-a", ma,
              "--image-size", "64"])
    img_dir, _ = write_synthetic_coco(tmp_path, n_images=3)
    paths = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(paths) + "\n")
    out_w = str(tmp_path / "dets_w.jsonl")
    out_a = str(tmp_path / "dets_a.jsonl")
    base = ["--out", art, "--image-size", "64", "--input-list", str(lst),
            "--max-batch", "4", "--max-wait-ms", "50"]
    cli.main(["serve", *base, "--weights", w, "--max-a", ma,
              "--output", out_w])
    cli.main(["serve", *base, "--from-artifacts", "--output", out_a])
    assert open(out_w).read() == open(out_a).read()


def test_serve_from_artifacts_full_quant(art, tmp_path):
    """Full-quant trees write no weights_pickle/dfl.pickle (the head is
    quantized) — serve --from-artifacts --full-quant must still load and
    match the weights-path full-quant serve byte-for-byte (regression:
    dfl_weights_from_artifacts used to require the float pickle)."""
    import shutil

    from tests_synth import write_synthetic_coco

    w = os.path.join(art, "results", "weights_batchnf.npz")
    ma = os.path.join(art, "results", "max_a.txt")
    out = str(tmp_path / "8_nano_fq")
    cli.main(["quantize", "--out", out, "--weights", w, "--max-a", ma,
              "--image-size", "64", "--full-quant"])
    assert not os.path.exists(os.path.join(out, "weights_pickle",
                                           "dfl.pickle"))
    shutil.copy(ma, os.path.join(out, "results", "max_a.txt"))
    img_dir, _ = write_synthetic_coco(tmp_path, n_images=3)
    paths = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(paths) + "\n")
    out_w = str(tmp_path / "dets_w.jsonl")
    out_a = str(tmp_path / "dets_a.jsonl")
    base = ["--out", out, "--image-size", "64", "--full-quant",
            "--input-list", str(lst), "--max-batch", "4",
            "--max-wait-ms", "50"]
    cli.main(["serve", *base, "--weights", w, "--max-a", ma,
              "--output", out_w])
    cli.main(["serve", *base, "--from-artifacts", "--output", out_a])
    assert open(out_w).read() == open(out_a).read()


def test_accept_flow_end_to_end(tmp_path):
    """`ayq accept` (VERDICT r3 #8): the one-command acceptance — prepare
    -> fp32 gate -> calibrate -> int gates -> K sweep -> report — runs
    first-try on synthetic COCO at toy size. Random-init weights give a
    ~0 fp32 baseline, so the 0.5-drop budget passes (exit 0) and every
    per-K artifact dir materializes."""
    from tests_synth import write_synthetic_coco

    img_dir, ann = write_synthetic_coco(tmp_path, n_images=4)
    out = str(tmp_path / "8_nano")
    rc = cli.main(["accept", "--out", out, "--image-size", "64",
                   "--coco-images", img_dir, "--coco-ann", ann,
                   "--batch-size", "2", "--limit", "4",
                   "--k-sweep", "4"])
    assert rc == 0
    # gate artifacts: fp32 + int8 runs in --out, the K=4 sweep in 4_nano
    assert os.path.exists(os.path.join(out, "results", "runs_val",
                                       "results.txt"))
    assert os.path.exists(os.path.join(out, "results", "max_a.txt"))
    out4 = os.path.join(os.path.dirname(out), "4_nano")
    assert os.path.exists(os.path.join(out4, "results", "max_a.txt"))
    assert os.path.exists(os.path.join(out4, "results", "runs_val",
                                       "results.txt"))
    # gate 1 writes the reference's ORIG_MODEL_MAP.txt; gates 2/3 append
    # to runs_val/results.txt with their stage comments
    assert os.path.exists(os.path.join(out, "results",
                                       "ORIG_MODEL_MAP.txt"))
    with open(os.path.join(out, "results", "runs_val",
                           "results.txt")) as f:
        log = f.read()
    assert "int8 float NMS" in log
    assert "int8 full-quant q_NMS" in log


def test_prepare_from_synthetic_torch_checkpoint(tmp_path):
    """End-to-end validation of the real-checkpoint path WITHOUT real
    weights (this image has no yolov8n.pt): a synthetic torch-format
    OrderedDict with the ultralytics tensor ORDER (the remap is purely
    positional — reference stage_1.py:771-783) is saved with torch.save,
    loaded through `prepare --checkpoint`, and driven through
    calibrate -> quantize -> eval-int8. Every value must land on the right
    slot: the fused params are compared tensor-for-tensor against
    fuse_batchnorm() of the same raw values."""
    import collections

    import torch

    from alpha_yolo_quant_tpu.config import QuantConfig
    from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
    from alpha_yolo_quant_tpu.models.params import (
        fuse_batchnorm, init_raw_params, raw_param_slots,
    )
    from alpha_yolo_quant_tpu.utils.params_io import load_params

    cfg = QuantConfig(model="yolov8n", image_size=64)
    graph = build_yolov8_graph(cfg)
    raw = init_raw_params(graph, seed=5)
    slots = raw_param_slots(graph)
    # flatten in slot order under ultralytics-style opaque key names
    sd = collections.OrderedDict()
    i = 0
    for key, fields in slots:
        for f in fields:
            sd[f"model.model.{i}.whatever"] = torch.from_numpy(
                np.ascontiguousarray(raw[key][f]))
            i += 1
    assert len(sd) == 355          # the ultralytics yolov8n tensor count
    ckpt = tmp_path / "synthetic_yolov8n.pt"
    torch.save(sd, str(ckpt))

    out = str(tmp_path / "8_nano")
    cli.main(["prepare", "--out", out, "--image-size", "64",
              "--checkpoint", str(ckpt)])
    fused_path = os.path.join(out, "results", "weights_batchnf.npz")
    loaded = load_params(fused_path)
    want = fuse_batchnorm(graph, raw)
    assert set(loaded.keys()) == set(want.keys())
    for key in want:
        for f in want[key]:
            np.testing.assert_array_equal(loaded[key][f], want[key][f],
                                          err_msg=f"{key}.{f}")

    # the rest of the stage flow must run first-try on the loaded params
    cli.main(["calibrate", "--out", out, "--weights", fused_path,
              "--image-size", "64", "--batch-size", "2", "--limit", "4"])
    ma = os.path.join(out, "results", "max_a.txt")
    assert os.path.exists(ma)
    cli.main(["quantize", "--out", out, "--weights", fused_path,
              "--max-a", ma, "--image-size", "64"])
    assert os.path.exists(os.path.join(out, "results",
                                       "QUANT_WEIGHTS_8.pickle"))
    from tests_synth import write_synthetic_coco

    img_dir, ann = write_synthetic_coco(tmp_path, n_images=4)
    cli.main(["eval-int8", "--out", out, "--weights", fused_path,
              "--max-a", ma, "--image-size", "64", "--coco-images", img_dir,
              "--coco-ann", ann, "--batch-size", "2", "--limit", "4"])
    assert os.path.exists(os.path.join(out, "results", "runs_val",
                                       "results.txt"))
