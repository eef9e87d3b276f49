"""Activation calibration: capture (stage-4 analog) and statistics
reduction (stage-5 analog).

Capture runs the jitted float forward with tap recording, BATCHED on the
accelerator — the reference loops COCO image-by-image on the host
(stage_4.py:975-1011); here a whole batch contributes per-image maxima in
one device step and only the (44,) stat vector returns to the host.

Reduction modes (reference utils/stage_5_common_func.py:11-26, stage_5.py):
  max | mode | median | std (mean+3*sample-std) | n=<i> (i-th largest
  unique; NOTE the reference never parses the integer and always uses its
  default n=1 — we do parse it) | min_mae (sigma-coefficient search
  minimizing |sum(x - dequant(quant(x)))|/N, reference stage_5.py:34-89).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import jax
import numpy as np

from alpha_yolo_quant_tpu.models.forward import forward_float
from alpha_yolo_quant_tpu.models.graph import Graph


def collect_stats(graph: Graph, params: Dict,
                  batches: Iterable[np.ndarray],
                  dp: Optional[int] = None) -> Dict[str, List[float]]:
    """Run calibration batches; returns tap -> list of per-image maxima.

    ``dp`` shards each batch over the first N local devices (shard_map;
    params replicate). Per-IMAGE maxima come back gathered, so every
    stage-5 reduction mode (mode/median/n=…) sees the same list as the
    single-device run — unlike the global-max all-reduce of
    parallel.mesh.sharded_forward_fn, which only serves ``max``."""

    def tap_fn(images):
        _, taps = forward_float(graph, params, images, collect_taps=True)
        return taps

    if dp:
        from alpha_yolo_quant_tpu.parallel.mesh import (
            data_parallel_step, make_mesh,
        )

        step = data_parallel_step(tap_fn, make_mesh(dp))
    else:
        step = jax.jit(tap_fn)

    records: Dict[str, List[float]] = {}
    for batch in batches:
        taps = jax.device_get(step(batch))
        for name, v in taps.items():
            records.setdefault(name, []).extend(np.asarray(v).tolist())
    return records


def collect_samples(graph: Graph, params: Dict, batches: Iterable[np.ndarray],
                    taps: List[str]) -> Dict[str, np.ndarray]:
    """Full pre-activation tensors for the given taps — the analog of the
    reference's gzip'd per-layer activation dumps used by the min_mae
    search (utils/save_weights.py:13-21)."""
    from alpha_yolo_quant_tpu.models.graph import (
        ConcatNode, ConvNode, MaxPoolNode, ResidualAddNode, SplitNode,
        UpsampleNode,
    )
    from alpha_yolo_quant_tpu.ops.nn import (
        conv2d_f32, maxpool2d, silu, upsample_nearest,
    )

    out: Dict[str, List[np.ndarray]] = {t: [] for t in taps}

    @jax.jit
    def walk(params, x):
        env = {graph.input_edge: x}
        captured = {}
        for node in graph.nodes:
            if isinstance(node, ConvNode):
                p = params[node.key]
                pre = conv2d_f32(env[node.src], p["w"], p["b"], node.stride,
                                 node.padding)
                if node.tap in out:
                    captured[node.tap] = pre
                env[node.dst] = silu(pre) if node.silu else pre
            elif isinstance(node, SplitNode):
                h = env[node.src].shape[1] // 2
                env[node.dst1] = env[node.src][:, :h]
                env[node.dst2] = env[node.src][:, h:]
            elif isinstance(node, ResidualAddNode):
                env[node.dst] = env[node.src] + env[node.base]
            elif isinstance(node, ConcatNode):
                env[node.dst] = jax.numpy.concatenate(
                    [env[e] for e in node.srcs], 1)
            elif isinstance(node, MaxPoolNode):
                env[node.dst] = maxpool2d(env[node.src], node.kernel,
                                          node.stride, node.padding)
            elif isinstance(node, UpsampleNode):
                env[node.dst] = upsample_nearest(env[node.src], node.factor)
        return captured

    for batch in batches:
        captured = jax.device_get(walk(params, batch))
        for t in taps:
            out[t].append(np.asarray(captured[t]))
    return {t: np.concatenate(v, 0) for t, v in out.items()}


def save_batches(out_dir: str, samples: Dict[str, np.ndarray]) -> None:
    """Persist per-image activation dumps in the reference's artifact
    format: {out}/batches/{tap}/b_{i}.pickle, gzip compresslevel=3,
    pickle protocol 4 (reference utils/save_weights.py:13-21 save_batch).
    Each file holds one image's (1, C, H, W) pre-activation tensor."""
    import gzip
    import os
    import pickle

    for tap, arr in samples.items():
        d = os.path.join(out_dir, "batches", tap)
        os.makedirs(d, exist_ok=True)
        for i in range(arr.shape[0]):
            with gzip.open(os.path.join(d, f"b_{i}.pickle"), "wb",
                           compresslevel=3) as f:
                pickle.dump(arr[i:i + 1], f, protocol=4)


def load_batches(out_dir: str, taps: List[str]
                 ) -> Optional[Dict[str, np.ndarray]]:
    """Reload activation dumps for a RESUMABLE min_mae reduction (the
    reference re-reads them in stage 5: utils/stage_5_common_func.py:41-42
    load_from_file). Returns None if any tap's dump directory is missing
    or empty."""
    import gzip
    import os
    import pickle
    import re

    out: Dict[str, np.ndarray] = {}
    for tap in taps:
        d = os.path.join(out_dir, "batches", tap)
        if not os.path.isdir(d):
            return None
        files = sorted((f for f in os.listdir(d)
                        if re.fullmatch(r"b_\d+\.pickle", f)),
                       key=lambda f: int(f[2:-7]))
        if not files:
            return None
        parts = []
        for f in files:
            with gzip.open(os.path.join(d, f), "rb") as fh:
                parts.append(np.asarray(pickle.load(fh)))
        out[tap] = np.concatenate(parts, 0)
    return out


def _sample_std(v: np.ndarray) -> float:
    return float(np.std(v, ddof=1)) if len(v) > 1 else 0.0


def reduce_stats(records: Dict[str, List[float]], mode: str = "max",
                 k: int = 8,
                 samples: Optional[Dict[str, np.ndarray]] = None,
                 ) -> Dict[str, float]:
    """Reduce per-image statistics to one calibration value per tap."""
    out: Dict[str, float] = {"start": 1.0}
    mode_l = mode.lower()
    for name, values in records.items():
        if name.startswith("_") or name == "start":
            continue
        v = np.asarray(values, np.float64)
        if mode_l == "max":
            out[name] = float(np.abs(v).max())
        elif mode_l == "mode":
            uniq, counts = np.unique(v, return_counts=True)
            out[name] = float(uniq[np.argmax(counts)])
        elif mode_l == "median":
            out[name] = float(np.median(v))
        elif mode_l == "std":
            out[name] = float(v.mean() + 3 * _sample_std(v))
        elif mode_l.startswith("n="):
            n = int(mode_l[2:]) if mode_l[2:].isdigit() else 1
            uniq = np.unique(v)
            out[name] = float(uniq[max(-n - 1, -len(uniq))])
        elif mode_l == "min_mae":
            if samples is None or name not in samples:
                raise ValueError(f"min_mae needs samples for {name}")
            out[name] = _min_mae_value(v, samples[name], k)
        else:
            raise ValueError(f"unknown calibration mode {mode}")
    return out


def _min_mae_value(per_image_max: np.ndarray, acts: np.ndarray,
                   k: int) -> float:
    """Sigma-coefficient sweep: a = mean + koef*std, koef in linspace(-2,4,50),
    minimizing |sum(x - dequant(quant(x, a)))| / N (reference
    stage_5.py:62-82 + utils/stage_5_common_func.py:55-61)."""
    qmax = 2 ** (k - 1) - 1
    mean, std = per_image_max.mean(), _sample_std(per_image_max)
    best_a, best_err = None, np.inf
    x = acts.astype(np.float64)
    for koef in np.linspace(-2, 4, 50):
        a = mean + koef * std
        if a <= 0:
            continue
        s = qmax / a
        q = np.round(np.clip(x, -a, a) * s)
        err = abs(float(np.sum(x - q / s))) / x.size
        if err <= best_err:
            best_err, best_a = err, a
    return float(best_a)
