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


def test_eval_float_on_synthetic_coco(art, tmp_path):
    from tests_synth import write_synthetic_coco

    img_dir, ann = write_synthetic_coco(tmp_path, n_images=4)
    w = os.path.join(art, "results", "weights_batchnf.npz")
    cli.main(["eval-float", "--out", art, "--weights", w,
              "--image-size", "64", "--coco-images", img_dir,
              "--coco-ann", ann, "--batch-size", "2", "--limit", "4"])
    assert os.path.exists(os.path.join(art, "results",
                                       "ORIG_MODEL_MAP.txt"))
