"""Execute the reference's FULL straight-line stage_6 / stage_6_full_quant
from the read-only mount and compare its complete artifact tree against
``export_all`` byte-for-byte — the strongest export-parity gate available
without real yolov8n weights.

The reference scripts run at import time against relative paths
(``{K}_nano/...``, ``utils/cats_2_640.jpg``), so we execute them with the
cwd set to a scratch dir that holds their inputs: a torch-format fused
state dict (reference ``weights_activ``, utils/pickle_read.py:25-34), a
``max_a.txt`` (utils/max_a.py:1-7), and the golden image symlinked at the
hard-coded relative path (stage_6.py:36). torchvision is absent in this
image, so a faithful shim of the two transforms stage_6 uses
(Resize(int) + ToTensor, stage_6.py:30-33) is installed in sys.modules.
Nothing is copied from the reference; modules execute from the mount via
tests/reference_oracle.
"""

from __future__ import annotations

import gzip
import os
import sys
import types

import numpy as np

import reference_oracle


def install_torchvision_shim() -> None:
    """Faithful minimal ``torchvision.transforms`` for stage_6's pipeline.

    Resize(int): torchvision functional.resize semantics — identity when
    the smaller edge already equals size (the golden image is 640x640),
    else scale the smaller edge to size with BILINEAR. ToTensor: HWC
    uint8 PIL -> CHW float32 / 255.
    """
    if "torchvision" in sys.modules:
        return
    import torch
    from PIL import Image

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class Resize:
        def __init__(self, size):
            self.size = int(size)

        def __call__(self, img):
            w, h = img.size
            s = self.size
            if (w <= h and w == s) or (h <= w and h == s):
                return img
            if w < h:
                return img.resize((s, int(s * h / w)), Image.BILINEAR)
            return img.resize((int(s * w / h), s), Image.BILINEAR)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, np.uint8)
            t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
            return t.to(torch.float32).div(255)

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    trt = types.ModuleType("torchvision.transforms.transforms")
    for m in (trt, tr):
        m.Compose, m.Resize, m.ToTensor = Compose, Resize, ToTensor
    tr.transforms = trt
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.transforms"] = trt


def golden_image() -> np.ndarray:
    """The exact float32 CHW image stage_6 computes (stage_6.py:30-39)."""
    from PIL import Image

    img = Image.open(os.path.join(reference_oracle.REF, "utils",
                                  "cats_2_640.jpg"))
    return (np.asarray(img, np.uint8).astype(np.float32) / 255.0
            ).transpose(2, 0, 1)[None]


def write_reference_inputs(tmp: str, graph, fused_params, max_a,
                           k: int = 8, dir_suffix: str = "nano") -> str:
    """Create the input files stage_6 loads: the fused torch state dict
    and max_a.txt under ``{tmp}/{k}_{dir_suffix}/results/`` plus the
    directory tree (stage_6 has its dirs() call commented out) and the
    golden-image relative path."""
    import torch
    from collections import OrderedDict

    from alpha_yolo_quant_tpu.export.artifacts import make_dirs
    from alpha_yolo_quant_tpu.utils.io import write_max_a

    main = os.path.join(tmp, f"{k}_{dir_suffix}")
    make_dirs(main)
    sd = OrderedDict()
    for node in graph.convs():
        p = fused_params[node.key]
        sd[f"{node.key}.weight"] = torch.from_numpy(
            np.asarray(p["w"], np.float32).copy())
        sd[f"{node.key}.bias"] = torch.from_numpy(
            np.asarray(p["b"], np.float32).copy())
    sd["dfl.weight"] = torch.from_numpy(
        np.asarray(fused_params["dfl"]["w"], np.float32).copy())
    torch.save(sd, os.path.join(main, "results", "weights_batchnf.pickle"))
    write_max_a(os.path.join(main, "results", "max_a.txt"), max_a)

    os.makedirs(os.path.join(tmp, "utils"), exist_ok=True)
    dst = os.path.join(tmp, "utils", "cats_2_640.jpg")
    if not os.path.lexists(dst):
        os.symlink(os.path.join(reference_oracle.REF, "utils",
                                "cats_2_640.jpg"), dst)
    return main


def run_stage6(tmp: str, full: bool = False, model: str = "yolov8n",
               k: int = 8):
    """Execute the reference stage with cwd=tmp. Returns the exception
    from the detection/plotting tail, or None — with synthetic weights
    the float NMS may keep nothing and the tail then dies AFTER the last
    artifact write (stage_6.py:637-649); artifact comparison is
    unaffected either way.

    time.sleep is patched out for the run: stage_6 sleeps 1.5 s after
    every layer purely to support stage_7's file-MTIME ordering hack
    (stage_6.py:115-116), which byte-comparison does not depend on.

    model: "yolov8n" | "yolov8s" — selects the reference's stage_0 model
    branch (stage_0.py:4,14-29) by patching the loaded stage_0 module
    before the stage script imports MAIN_DIR_NAME from it; the stage
    leaf is always freshly re-executed (its pipeline runs at import
    time).
    """
    install_torchvision_shim()
    import time

    import matplotlib

    matplotlib.use("Agg")
    leaf = "stage_6_full_quant" if full else "stage_6"
    s0 = reference_oracle.load("stage_0")
    s0.MODEL_NAME = {"yolov8n": "yolov8n.pt", "yolov8s": "yolov8s.pt"}[
        model]
    s0.K = k                                   # stage_0.py:7
    s0.QUANT_WEIGHTS = f"QUANT_WEIGHTS_{k}.pickle"
    s0.MAIN_DIR_NAME = f"{s0.K}_" + (
        "nano" if model == "yolov8n" else "small")
    s0.W = 0.25 if model == "yolov8n" else 0.50
    s0.detect_1_channels = 80 if model == "yolov8n" else 128
    cwd = os.getcwd()
    real_sleep = time.sleep
    os.chdir(tmp)
    time.sleep = lambda *_: None
    try:
        reference_oracle.load(leaf, fresh=True)
        return None
    except BaseException as e:  # SystemExit from requantize, tail errors
        return e
    finally:
        time.sleep = real_sleep
        os.chdir(cwd)


def _payload(path: str) -> bytes:
    """Raw bytes; gzip pickles compare by decompressed payload (the
    reference embeds wall-clock mtime + FNAME in the gzip header)."""
    if path.endswith(".pickle"):
        with gzip.open(path, "rb") as g:
            return g.read()
    with open(path, "rb") as f:
        return f.read()


# Inputs we wrote for the reference run, plus products of LATER reference
# stages our export_all emits eagerly.
_REF_ONLY = {"results/weights_batchnf.pickle"}
_OURS_EXTRA = {"results/QUANT_WEIGHTS_8.pickle",
               "results/QUANT_WEIGHTS_4.pickle",
               "results/QUANT_WEIGHTS_6.pickle"}


def list_tree(root: str):
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            out.append(os.path.relpath(os.path.join(dirpath, f), root))
    return sorted(out)


def compare_lut_tables(tmp: str, our_main: str):
    """The reference writes its LUT table files into cwd-relative
    ``utils/`` (utils/silu.py:46-49, utils/exponent.py:46-49); ours live
    at the artifact root. Compare every table the reference emitted."""
    problems = []
    utils_dir = os.path.join(tmp, "utils")
    tables = [f for f in os.listdir(utils_dir)
              if f.endswith("_bit.txt") and "table" in f]
    if not tables:
        problems.append("reference emitted no LUT tables")
    for f in sorted(tables):
        ours = os.path.join(our_main, f)
        if not os.path.exists(ours):
            problems.append(f"missing LUT table in ours: {f}")
        elif _payload(os.path.join(utils_dir, f)) != _payload(ours):
            problems.append(f"LUT table bytes differ: {f}")
    return problems


def compare_trees(ref_main: str, our_main: str):
    """Return a list of human-readable problems (empty = byte-identical).

    Checks BOTH directions: every reference artifact must exist in ours
    with identical bytes, and ours must not contain unexplained extras.
    """
    problems = []
    ref_files = [f for f in list_tree(ref_main) if f not in _REF_ONLY]
    our_files = set(list_tree(our_main))
    for rel in ref_files:
        if rel not in our_files:
            problems.append(f"missing from ours: {rel}")
            continue
        a = _payload(os.path.join(ref_main, rel))
        b = _payload(os.path.join(our_main, rel))
        if a != b:
            i = next((j for j in range(min(len(a), len(b)))
                      if a[j] != b[j]), min(len(a), len(b)))
            problems.append(
                f"bytes differ: {rel} (len {len(a)} vs {len(b)}, "
                f"first diff at {i}: {a[max(0, i-40):i+40]!r} vs "
                f"{b[max(0, i-40):i+40]!r})")
    known = set(ref_files) | _REF_ONLY | _OURS_EXTRA
    for rel in sorted(our_files - known):
        if rel.endswith("_bit.txt") and "table" in rel:
            continue  # LUT tables: compared by compare_lut_tables
        problems.append(f"unexplained extra in ours: {rel}")
    return problems
