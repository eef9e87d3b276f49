"""Gather-free LUT application for TPU.

Per-element table gathers (jnp.take) are catastrophically slow on TPU
(~260ms for a layer-sized tensor on v5e — measured). But every LUT in this
pipeline was CONSTRUCTED as ``quantize(f(dequantize(i)))``, so the VPU can
recompute it arithmetically in a handful of elementwise ops.

Bit-exactness is preserved by *validation with corrections*: at build time
the arithmetic recomputation is evaluated (jitted, on the actual runtime
backend) over the whole index domain and compared against the bit-exact
integer table; any mismatching entries (float-boundary ties — typically
zero) become per-entry ``where(idx==i, v, val)`` fixups. If mismatches
exceed a threshold the apply falls back to the exact gather.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alpha_yolo_quant_tpu.quantize.luts import Lut

# Corrections are fused selects — cheap even in the hundreds. The 16-bit
# sigmoid table needs ~200 on TPU (Mosaic/XLA f32 transcendentals round
# differently from numpy's float32 math); the gather fallback costs ~80ms
# per batch and only exists as a safety net.
MAX_CORRECTIONS = 1024


def _sigmoid_core(lut: Lut):
    qmax_t = np.float32(2 ** (lut.bits - 1) - 1)
    scale = np.float32((2 ** (lut.bits - 1) - 1) / lut.max_val)

    def fn(x):
        d = x.astype(jnp.float32) / scale
        s = jax.nn.sigmoid(d)
        return jnp.clip(jnp.round(s * qmax_t), -qmax_t, qmax_t).astype(
            jnp.int32)

    return fn


@dataclasses.dataclass
class FastLut:
    """Validated arithmetic LUT. apply(x) is bit-identical to
    Lut.apply_np (including out-of-domain -> 0)."""

    lut: Lut
    core: Callable
    corrections: Tuple[Tuple[int, int], ...]
    use_gather: bool
    table: jnp.ndarray
    # Backend the corrections were validated on. Transcendental rounding
    # differs across backends, so a FastLut is only bit-exact on THIS
    # backend — build the device plan with the execution backend as the
    # JAX default (the normal flow), or call for_current_backend() after
    # switching backends.
    validated_backend: str = ""
    kind: str = "sigmoid"

    def for_current_backend(self) -> "FastLut":
        """Return a FastLut whose corrections are valid on the current
        default backend (re-validates if the backend changed)."""
        if jax.default_backend() == self.validated_backend:
            return self
        return build_fast_lut(self.lut, self.kind)

    def apply(self, x):
        lo, hi = self.lut.lo, self.lut.hi
        in_dom = (x >= lo) & (x <= hi)
        if self.use_gather:
            n = self.table.shape[0]
            val = jnp.take(self.table, jnp.clip(x - lo, 0, n - 1))
        else:
            val = self.core(x)
            for i, v in self.corrections:
                val = jnp.where(x == i, jnp.int32(v), val)
        return jnp.where(in_dom, val, 0)

    def apply_clipped(self, x):
        """apply() minus the domain mask, for inputs PROVABLY inside
        [lo, hi] — the SiLU epilogue's sigmoid domain is clipped to
        +-qmax, which device_plan asserts the table covers. Saves the
        two compares + and + select per element on the network's hottest
        elementwise path (the mask is ~dead weight on 1.78G elements per
        B=128 batch)."""
        if self.use_gather:
            n = self.table.shape[0]
            return jnp.take(self.table, jnp.clip(x - self.lut.lo, 0,
                                                 n - 1))
        val = self.core(x)
        for i, v in self.corrections:
            val = jnp.where(x == i, jnp.int32(v), val)
        return val


def build_fast_lut(lut: Lut, kind: str) -> FastLut:
    """kind: 'sigmoid' | 'exp'. Validates on the current default backend."""
    if kind == "sigmoid":
        core = _sigmoid_core(lut)
    elif kind == "exp":
        # note: dequantize in the reference exponent table uses the same
        # signed scale law as sigmoid (utils/exponent.py:8-13); only the
        # DOMAIN is unsigned-width.
        qmax_t = np.float32(2 ** (lut.bits - 1) - 1)
        scale = np.float32((2 ** (lut.bits - 1) - 1) / lut.max_val)

        def core(x):
            d = x.astype(jnp.float32) / scale
            e = jnp.exp(d)
            return jnp.clip(jnp.round(e * qmax_t), -qmax_t, qmax_t).astype(
                jnp.int32)
    else:
        raise ValueError(kind)

    idx = jnp.arange(lut.lo, lut.hi + 1, dtype=jnp.int32)
    got = np.asarray(jax.jit(core)(idx))
    want = lut.values
    bad = np.nonzero(got != want)[0]
    corrections: List[Tuple[int, int]] = [
        (int(i + lut.lo), int(want[i])) for i in bad]
    use_gather = len(corrections) > MAX_CORRECTIONS
    return FastLut(lut=lut, core=core,
                   corrections=tuple(corrections), use_gather=use_gather,
                   table=jnp.asarray(lut.values, jnp.int32),
                   validated_backend=jax.default_backend(), kind=kind)
