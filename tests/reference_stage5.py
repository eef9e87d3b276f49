"""Execute the reference's stage_5 calibration reduction from the
read-only mount over synthetic per-image statistics, for byte-comparison
of max_a.txt against ``utils.io`` + ``quantize.calibrate`` (the stage-4/5
analog of tests/reference_stage6.py's tree gate).

stage_5 consumes ``{MAIN_DIR_NAME}/results/max_a_all.txt`` — stage_4's
tail writes it as ``f"{key}: {value}\\n"`` where value is a LIST OF TORCH
SCALAR TENSORS (stage_4.py:1007-1011; utils/save_a.py:22-26 accumulates
``abs(matr).max()`` 0-dim cuda tensors), so every entry is a torch repr
rounded to torch's default 4-decimal print precision, with a
``device='cuda:0'`` fragment that stage_5's parser drops
(stage_5.py:12-26). ``write_ref_max_a_all`` reproduces that writer —
three lines of f-string semantics, not imported code: the stage_4 module
itself runs a deeplake/COCO loop at import time and cannot execute here.

The shipped ``min_mae`` branch has a path bug: ``write_best_koeff``
appends to ``{MAIN}/best_koeff.txt`` (stage_5_common_func.py:46) while
``create_std_koef`` reads ``{MAIN}/results/best_koeff.txt``
(stage_5_common_func.py:66) — which stage_5.py:37 truncated — so
``n_update_std`` always dies with a KeyError on the first column other
than the hardcoded ``conv_p1``. ``run_stage5`` surfaces that exception;
``finish_min_mae_intent`` heals the bug (and the 10x chunk-rescan
duplication of stage_5.py:47-51, which re-searches the same <500 images
every pass) and runs the intended tail through the MOUNT's own
create_std_koef/n_update_std.
"""

from __future__ import annotations

import gzip
import os
import pickle
import sys

import numpy as np

import reference_oracle

_CSF = f"{reference_oracle._PKG}.quantisation.utils.stage_5_common_func"
_MAXA = f"{reference_oracle._PKG}.quantisation.utils.max_a"


def synth_records(seed: int = 0, n_images: int = 50,
                  taps=("start", "conv_p1", "conv_p2", "conv_0_c2f",
                        "conv_b_0_c2f", "sppf_conv_1", "x_up_0",
                        "x_result_5_up_0")):
    """Per-image maxima as f32 torch scalar tensors (the reference's
    actual element type). 'conv_p2' gets crafted multi-modal values
    whose top-count tie breaks differently under pandas first-appearance
    vs np.unique smallest-value semantics; 'conv_0_c2f' gets a tiny
    value exercising torch's scientific repr."""
    import torch

    rng = np.random.default_rng(seed)
    rec = {}
    for t in taps:
        vals = rng.uniform(0.01, 30.0, n_images).astype(np.float32)
        if t == "conv_p2":
            # first appearance 0.7 (larger) before 0.3: pandas mode
            # picks 0.7, smallest-value tie-breaks would pick 0.3
            pool = np.array([0.7, 0.3, 0.3, 0.7, 0.1], np.float32)
            vals = np.tile(pool, n_images // len(pool) + 1)[:n_images]
        if t == "conv_0_c2f":
            vals[0] = np.float32(1.234e-05)
        rec[t] = [torch.tensor(v) for v in vals]
    return rec


def write_ref_max_a_all(path: str, records, cuda: bool = True) -> None:
    """The stage_4 tail's writer semantics (stage_4.py:1007-1011):
    ``f"{key}: {value}\\n"`` over a dict of torch-scalar lists. With
    ``cuda`` each element repr carries the ``device='cuda:0'`` fragment
    exactly as a cuda tensor's would (list str() == '[' + ', '.join of
    element reprs + ']')."""
    with open(path, "w") as f:
        for key, tensors in records.items():
            if cuda:
                body = ", ".join(repr(t)[:-1] + ", device='cuda:0')"
                                 for t in tensors)
                f.write(f"{key}: [{body}]\n")
            else:
                f.write(f"{key}: {tensors}\n")


def write_batches(main: str, samples) -> None:
    """Per-image activation dumps in the reference's stage-4 format:
    ``{main}/batches/{tap}/b_{i}.pickle`` holding a gzip'd torch (1,C,H,W)
    f32 tensor (utils/save_weights.py:13-21; stage_5's load_from_file
    indexes [0] and .to(cpu))."""
    import torch

    for tap, arr in samples.items():
        d = os.path.join(main, "batches", tap)
        os.makedirs(d, exist_ok=True)
        arr = np.asarray(arr, np.float32)
        for i in range(arr.shape[0]):
            with gzip.open(os.path.join(d, f"b_{i}.pickle"), "wb",
                           compresslevel=3) as f:
                pickle.dump(torch.from_numpy(arr[i:i + 1].copy()), f,
                            protocol=4)


def _patch_stage0(mode: str, k: int, model: str):
    s0 = reference_oracle.load("stage_0")
    s0.MODEL_NAME = {"yolov8n": "yolov8n.pt", "yolov8s": "yolov8s.pt"}[
        model]
    s0.K = k
    s0.MAX_ACTIVATIONS_MODE = mode
    s0.MAIN_DIR_NAME = f"{k}_" + ("nano" if model == "yolov8n"
                                  else "small")
    return s0


def _fresh_common_func():
    """stage_5_common_func binds stage_0's values at ITS import time —
    re-execute it (and utils.max_a) after patching stage_0."""
    sys.modules.pop(_CSF, None)
    sys.modules.pop(_MAXA, None)
    reference_oracle.load("utils.max_a")
    return reference_oracle.load("utils.stage_5_common_func")


def run_stage5(tmp: str, mode: str, k: int = 8, model: str = "yolov8n"):
    """Execute the reference stage_5 leaf with cwd=tmp over the
    pre-written ``{MAIN}/results/max_a_all.txt`` (and, for min_mae,
    ``{MAIN}/batches/``). Returns the exception the leaf raised, or
    None. tqdm output goes wherever pytest routes stderr."""
    _patch_stage0(mode, k, model)
    _fresh_common_func()
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        reference_oracle.load("stage_5", fresh=True)
        return None
    except BaseException as e:
        return e
    finally:
        os.chdir(cwd)


def read_best_koeff(path: str):
    """{MAIN}/best_koeff.txt -> list of (layer, koef) in file order."""
    out = []
    with open(path) as f:
        for line in f:
            if line.strip():
                name, val = line.strip().split(": ")
                out.append((name, float(val)))
    return out


def finish_min_mae_intent(tmp: str, k: int, model: str,
                          df_records) -> str:
    """Complete the min_mae flow as intended: copy the search results to
    the path create_std_koef actually reads (deduplicated to one line
    per layer — the chunk loop's 10 passes are identical), then run the
    MOUNT's create_std_koef + n_update_std. Returns the final
    max_a.txt path. ``df_records`` is the parsed max_a_all dict
    ('start' first, like stage_5's DataFrame)."""
    import pandas as pd

    _patch_stage0("min_mae", k, model)
    csf = _fresh_common_func()
    main = os.path.join(tmp, f"{k}_" + ("nano" if model == "yolov8n"
                                        else "small"))
    seen = set()
    kept = []
    with open(os.path.join(main, "best_koeff.txt")) as f:
        for line in f:
            name = line.split(": ")[0]
            if line.strip() and name not in seen:
                seen.add(name)
                kept.append(line)
    with open(os.path.join(main, "results", "best_koeff.txt"), "w") as f:
        f.writelines(kept)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        csf.create_std_koef()
        csf.n_update_std(pd.DataFrame(df_records))
    finally:
        os.chdir(cwd)
    return os.path.join(main, "results", "max_a.txt")
