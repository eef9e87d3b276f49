"""Bit-exactness of the fused Pallas engine vs the XLA interpreter
(interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import (
    device_plan, int_forward, quantize_input,
)

RNG = np.random.default_rng(7)


def _setup(size=64, full=False):
    cfg = QuantConfig(model="yolov8n", k=8, image_size=size,
                      full_quant=full)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=2)
    calib = RNG.uniform(0, 1, (1, 3, size, size)).astype(np.float32)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
    model = build_quantized_model(graph, params, max_a, cfg)
    return cfg, model


ENGINES = ["pallas", "nhwc", "s8", "s8_nhwc", "fused", "auto", "packed"]


def _assert_outputs_equal(model, want, got, msg=""):
    for role in model.graph.outputs:
        np.testing.assert_array_equal(
            np.asarray(got[role]).astype(np.int64),
            np.asarray(want[role]).astype(np.int64), err_msg=f"{msg}{role}")


@pytest.mark.parametrize("engine", ENGINES)
@pytest.mark.parametrize("k", [8, 4])
def test_engine_bit_exact(engine, k):
    """Every engine is bit-identical to the XLA nibble-split interpreter,
    across bit widths (K=6 is swept in test_loadq)."""
    cfg = QuantConfig(model="yolov8n", k=k, image_size=64)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=2)
    calib = RNG.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max", k)
    model = build_quantized_model(graph, params, max_a, cfg)
    x = RNG.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    xq = quantize_input(jnp.asarray(x), k)
    needs_pallas = engine in ("pallas", "fused", "packed")
    want = int_forward(model, device_plan(model), xq, engine="xla")
    got = int_forward(model, device_plan(model, pallas=needs_pallas), xq,
                      engine=engine)
    _assert_outputs_equal(model, want, got, msg=f"{engine} k={k} ")


def test_engines_exact_with_saturated_concat_edges():
    """Chained-residual concat edges carrying |x| up to 3*qmax = 381 must
    stay exact through the s8-based engines (the 3-part int8 split; round-1
    two-part split wrapped silently for |x| in (254, 381])."""
    cfg, model = _setup()
    tamper = dict(model.max_a)
    graph = model.graph
    tamper[model.convs["C2F_4_conv_0"].node.out_tap] *= 0.05
    tamper[model.convs["C2F_6_conv_0"].node.out_tap] *= 0.05
    params = init_params(graph, seed=2)
    model = build_quantized_model(graph, params, tamper, cfg)
    wide_edges = [e for e, a in model.edge_amax_int.items() if a > 254]
    assert wide_edges, "plan must declare 381-wide edges"

    x = RNG.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    xq = quantize_input(jnp.asarray(x), 8)
    env = int_forward(model, device_plan(model), xq, keep_env=True)
    observed = max(int(np.abs(np.asarray(env["__env__"][e])).max())
                   for e in wide_edges)
    assert observed > 254, "test data must actually exceed the 2-part range"
    want = {r: env[r] for r in model.graph.outputs}
    for engine in ("s8", "auto", "fused", "s8_nhwc", "packed"):
        needs_pallas = engine in ("fused", "packed")
        got = int_forward(model, device_plan(model, pallas=needs_pallas),
                          xq, engine=engine)
        _assert_outputs_equal(model, want, got, msg=f"{engine} saturated ")


def test_hybrid_filtered_slab_plan_bit_exact():
    """build_slab_plan(allow=) hybrid engines: filtered convs bail to
    the XLA path with boundary unpacks and the mixed forward stays
    bit-identical to the XLA interpreter."""
    from alpha_yolo_quant_tpu.runtime.slabforward import build_slab_plan

    cfg, model = _setup()
    x = RNG.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    xq = quantize_input(jnp.asarray(x), 8)
    want = int_forward(model, device_plan(model), xq, engine="xla")
    full = build_slab_plan(model)
    for name, pred in (("h>=32", lambda n, c, h, w: h >= 32),
                       ("16..32", lambda n, c, h, w: 16 <= h <= 32)):
        plan = device_plan(model, pallas=True)
        sp = build_slab_plan(model, allow=pred)
        plan["slabplan"] = sp
        assert 0 < len(sp.nodes) < len(full.nodes), name
        got = int_forward(model, plan, xq, engine="packed")
        _assert_outputs_equal(model, want, got, msg=f"hybrid {name} ")


def test_pallas_sigma_corrections_small():
    from alpha_yolo_quant_tpu.quantize.luts import sigmoid_lut
    from alpha_yolo_quant_tpu.runtime.pallas_ops import (
        pallas_sigma_corrections,
    )

    lut = sigmoid_lut(7, 8)
    corr = pallas_sigma_corrections(lut)
    # arithmetic recomputation should agree almost everywhere
    assert len(corr) < 16
