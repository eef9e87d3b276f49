"""NumPy int64 golden runtime — the host oracle (stage-6 analog).

Executes the quantized graph with plain numpy int64 and the float64
requantization semantics of quantize/primitives.requantize_np. This is the
runtime the Verilog testbench artifacts are generated from, and the oracle
the jnp/Pallas runtimes are tested bit-exact against (the reference's
equivalent is quantisation/stage_6.py run on one golden image).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from alpha_yolo_quant_tpu.models.graph import (
    ConcatNode, ConvNode, MaxPoolNode, ResidualAddNode, SplitNode,
    UpsampleNode,
)
from alpha_yolo_quant_tpu.quantize.primitives import requantize_np, scale_for
from alpha_yolo_quant_tpu.quantize.transform import QuantizedModel


def conv2d_int64(x: np.ndarray, w: np.ndarray, stride: int,
                 padding: int) -> np.ndarray:
    """Integer conv via padded sliding windows (int64 exact)."""
    if padding:
        x = np.pad(x, ((0, 0), (0, 0), (padding, padding),
                       (padding, padding)))
    kh, kw = w.shape[2], w.shape[3]
    win = np.lib.stride_tricks.sliding_window_view(x, (kh, kw), axis=(2, 3))
    win = win[:, :, ::stride, ::stride]                    # (N,C,H',W',kh,kw)
    return np.einsum("nchwij,ocij->nohw", win.astype(np.int64),
                     w.astype(np.int64), optimize=True)


def maxpool_int64(x: np.ndarray, kernel: int, stride: int,
                  padding: int) -> np.ndarray:
    lo = np.iinfo(np.int64).min
    if padding:
        x = np.pad(x, ((0, 0), (0, 0), (padding, padding),
                       (padding, padding)), constant_values=lo)
    win = np.lib.stride_tricks.sliding_window_view(x, (kernel, kernel),
                                                   axis=(2, 3))
    return win[:, :, ::stride, ::stride].max(axis=(4, 5))


def quantize_input_np(x: np.ndarray, k: int) -> np.ndarray:
    """Input quantization contract: float32 multiply + half-even round
    (preprocessing happens in f32 on device; identical to
    runtime.interpreter.quantize_input)."""
    qmax = 2 ** (k - 1) - 1
    return np.int64(np.round(np.clip(x.astype(np.float32), -1, 1)
                             * np.float32(qmax)))


def golden_forward(model: QuantizedModel, x: np.ndarray,
                   quantize: bool = True) -> Dict[str, np.ndarray]:
    """Run the golden int64 pipeline; returns every edge plus
    '<name>:sigdom' / requant intermediates, head accumulators under role
    names — same env naming as runtime.interpreter.int_forward."""
    cfg = model.cfg
    k = cfg.k
    sig_scale = scale_for(cfg.sigmoid_lut_domain, k)
    env: Dict[str, np.ndarray] = {
        model.graph.input_edge:
            quantize_input_np(x, k) if quantize else np.int64(x)}

    for idx, node in enumerate(model.graph.nodes):
        if isinstance(node, ConvNode):
            c = model.convs[node.name]
            acc = conv2d_int64(env[node.src], c.w_q, node.stride,
                               node.padding)
            acc = acc + np.int64(c.b_q).reshape(1, -1, 1, 1)
            if node.silu:
                dom, _, _ = requantize_np(acc, c.acc_scale, sig_scale, k,
                                          cfg.koeff_bits)
                env[f"{node.name}:sigdom"] = dom
                sigma = model.sig_lut.apply_np(dom)
                prod = sigma * acc
                out, _, _ = requantize_np(
                    prod, scale_for(1.0, k) * c.acc_scale, c.out_scale, k,
                    cfg.koeff_bits)
                env[node.dst] = out
            else:
                env[node.dst] = acc
        elif isinstance(node, SplitNode):
            h = env[node.src].shape[1] // 2
            env[node.dst1] = env[node.src][:, :h]
            env[node.dst2] = env[node.src][:, h:]
        elif isinstance(node, ResidualAddNode):
            rq = model.requants[(idx, node.src)]
            req, _, _ = requantize_np(env[node.src], rq.old_scale,
                                      rq.new_scale, k, cfg.koeff_bits)
            env[f"{node.label}:rescale"] = req
            out = req + env[node.base]
            bound = model.clip_after_residual.get(idx)
            if bound is not None:
                out = np.clip(out, -bound, bound)
            env[node.dst] = out
        elif isinstance(node, ConcatNode):
            parts = []
            for e in node.srcs:
                t = env[e]
                if (idx, e) in model.requants:
                    rq = model.requants[(idx, e)]
                    t, _, _ = requantize_np(t, rq.old_scale, rq.new_scale,
                                            k, cfg.koeff_bits)
                    env[f"{node.label}:{e}:requant"] = t
                parts.append(t)
            env[node.dst] = np.concatenate(parts, axis=1)
        elif isinstance(node, MaxPoolNode):
            env[node.dst] = maxpool_int64(env[node.src], node.kernel,
                                          node.stride, node.padding)
        elif isinstance(node, UpsampleNode):
            env[node.dst] = np.repeat(
                np.repeat(env[node.src], node.factor, axis=2),
                node.factor, axis=3)

    for role, e in model.graph.outputs.items():
        env[role] = env[e]
    return env
