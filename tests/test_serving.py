"""Request coalescing (VERDICT r3 #3): bitwise parity and batcher
semantics of alpha_yolo_quant_tpu.serving.

The bit-exactness claim rests on batch independence — the same proof
obligation as the pad_batch_to knob — so every parity assert here is
array_equal, not allclose.
"""

import threading
import time

import numpy as np
import pytest

import conftest  # noqa: F401

import jax

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, \
    reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline
from alpha_yolo_quant_tpu.serving import BatchCoalescer, coalesced_fn

RNG = np.random.default_rng(41)
SIZE = 64


def _pipeline():
    cfg = QuantConfig(model="yolov8n", image_size=SIZE, full_quant=True)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=0)
    calib = RNG.uniform(0, 1, (2, 3, SIZE, SIZE)).astype(np.float32)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
    model = build_quantized_model(graph, params, max_a, cfg)
    fn, _ = build_int_pipeline(model, dfl_w_float=params["dfl"]["w"])
    return fn


def _req(b):
    return RNG.uniform(0, 1, (b, 3, SIZE, SIZE)).astype(np.float32)


def test_coalesced_fn_bitwise_matches_per_request():
    fn = _pipeline()
    step = jax.jit(coalesced_fn(fn, n_requests=2))
    a, b = _req(2), _req(2)
    (det_a, n_a), (det_b, n_b) = step(a, b)
    # bitwise contract holds jit-vs-jit; an EAGER reference shows
    # last-ulp FMA-contraction diffs in the float box decode (same
    # artifact as parallel.mesh.spatial_parallel_fn's docstring)
    jfn = jax.jit(fn)
    want_a = jfn(a)
    want_b = jfn(b)
    np.testing.assert_array_equal(np.asarray(det_a),
                                  np.asarray(want_a[0]))
    np.testing.assert_array_equal(np.asarray(n_a), np.asarray(want_a[1]))
    np.testing.assert_array_equal(np.asarray(det_b),
                                  np.asarray(want_b[0]))
    np.testing.assert_array_equal(np.asarray(n_b), np.asarray(want_b[1]))


def test_coalesced_fn_uneven_requests():
    fn = _pipeline()
    step = jax.jit(coalesced_fn(fn, n_requests=3))
    jfn = jax.jit(fn)
    reqs = [_req(1), _req(3), _req(2)]
    parts = step(*reqs)
    for r, (det, n_det) in zip(reqs, parts):
        want = jfn(r)
        np.testing.assert_array_equal(np.asarray(det),
                                      np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(n_det),
                                      np.asarray(want[1]))


def test_coalescer_fills_and_flushes_bitwise():
    fn = _pipeline()
    with BatchCoalescer(fn, max_batch=8, max_wait_ms=10_000,
                        image_shape=(3, SIZE, SIZE)) as co:
        reqs = [_req(3), _req(5)]   # fills 8 exactly -> immediate flush
        futs = [co.submit(r) for r in reqs]
        jfn = jax.jit(fn)
        for r, f in zip(reqs, futs):
            det, n_det = f.result(timeout=300)
            want = jfn(r)
            np.testing.assert_array_equal(det, np.asarray(want[0]))
            np.testing.assert_array_equal(n_det, np.asarray(want[1]))


def test_coalescer_timeout_flushes_partial():
    fn = _pipeline()
    with BatchCoalescer(fn, max_batch=8, max_wait_ms=50,
                        image_shape=(3, SIZE, SIZE)) as co:
        r = _req(2)
        t0 = time.monotonic()
        det, n_det = co.submit(r).result(timeout=300)
        assert time.monotonic() - t0 >= 0.045  # waited for the timeout
        want = jax.jit(fn)(r)
        np.testing.assert_array_equal(det, np.asarray(want[0]))
        np.testing.assert_array_equal(n_det, np.asarray(want[1]))


def test_coalescer_concurrent_submitters():
    fn = _pipeline()
    want_cache = {}
    jfn = jax.jit(fn)
    reqs = [_req(b) for b in (1, 2, 3, 2, 4, 2, 1, 1)]
    for i, r in enumerate(reqs):
        w = jfn(r)
        want_cache[i] = (np.asarray(w[0]), np.asarray(w[1]))
    results = {}
    with BatchCoalescer(fn, max_batch=8, max_wait_ms=30,
                        image_shape=(3, SIZE, SIZE)) as co:
        def worker(i):
            results[i] = co.submit(reqs[i]).result(timeout=300)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        stats = co.snapshot()
    for i in range(len(reqs)):
        det, n_det = results[i]
        np.testing.assert_array_equal(det, want_cache[i][0])
        np.testing.assert_array_equal(n_det, want_cache[i][1])
    # observability: every request and image accounted for, latency
    # quantiles populated, mean fill in (0, 1]
    assert stats["requests"] == len(reqs)
    assert stats["images"] == sum(r.shape[0] for r in reqs)
    assert stats["flushes"] >= 2          # 16 images through max_batch 8
    assert 0 < stats["mean_fill"] <= 1.0
    assert stats["latency_ms_p50"] > 0
    assert stats["latency_ms_p99"] >= stats["latency_ms_p50"]


def test_pipeline_level_coalescing_bitwise():
    """build_int_pipeline(coalesce_requests=N): the faster serving seam —
    per-request quantize, bf16-level concat, one conv-stack pass —
    must equal the per-request jitted runs bitwise."""
    cfg = QuantConfig(model="yolov8n", image_size=SIZE, full_quant=True)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=0)
    calib = RNG.uniform(0, 1, (2, 3, SIZE, SIZE)).astype(np.float32)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
    model = build_quantized_model(graph, params, max_a, cfg)
    fn1, _ = build_int_pipeline(model, dfl_w_float=params["dfl"]["w"])
    fn2, _ = build_int_pipeline(model, dfl_w_float=params["dfl"]["w"],
                                coalesce_requests=2)
    a, b = _req(3), _req(2)
    (det_a, n_a), (det_b, n_b) = jax.jit(fn2)(a, b)
    jfn = jax.jit(fn1)
    want_a, want_b = jfn(a), jfn(b)
    np.testing.assert_array_equal(np.asarray(det_a),
                                  np.asarray(want_a[0]))
    np.testing.assert_array_equal(np.asarray(n_a), np.asarray(want_a[1]))
    np.testing.assert_array_equal(np.asarray(det_b),
                                  np.asarray(want_b[0]))
    np.testing.assert_array_equal(np.asarray(n_b), np.asarray(want_b[1]))


def test_coalescer_composes_with_dp_mesh():
    """Serving across a device mesh: BatchCoalescer's step can BE the
    shard_map data-parallel step — coalesced requests are padded to
    max_batch (divisible by the mesh), sharded over dp, and each
    request's rows come back bitwise equal to the local run."""
    from alpha_yolo_quant_tpu.parallel.mesh import (
        data_parallel_step, make_mesh,
    )

    fn = _pipeline()
    mesh = make_mesh(8)
    step = data_parallel_step(fn, mesh)   # already jitted; max_batch=8
    jfn = jax.jit(fn)
    with BatchCoalescer(step, max_batch=8, max_wait_ms=30,
                        image_shape=(3, SIZE, SIZE)) as co:
        reqs = [_req(3), _req(4), _req(1)]
        futs = [co.submit(r) for r in reqs]
        for r, f in zip(reqs, futs):
            det, n_det = f.result(timeout=300)
            want = jfn(r)
            np.testing.assert_array_equal(det, np.asarray(want[0]))
            np.testing.assert_array_equal(n_det, np.asarray(want[1]))


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_coalescer_worker_death_fails_futures():
    """A BaseException from the step (SystemExit & co.) must resolve the
    in-flight futures with that exception and close the coalescer —
    never strand a submitter in result() (regression: _execute used to
    catch only Exception, leaving the popped batch's futures pending)."""

    def bad(x):
        raise SystemExit("step died")

    co = BatchCoalescer(bad, max_batch=4, max_wait_ms=10,
                        image_shape=(3, 8, 8))
    fut = co.submit(np.zeros((1, 3, 8, 8), np.float32))
    try:
        fut.result(timeout=60)
        assert False, "expected the step's SystemExit"
    except SystemExit:
        pass
    # the worker is dead: new submits must be refused (racing with the
    # _run handler that flips _closed, so poll briefly)
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        try:
            co.submit(np.zeros((1, 3, 8, 8), np.float32))
            time.sleep(0.02)
        except RuntimeError:
            break
    else:
        assert False, "coalescer still accepting after worker death"


def test_coalescer_soak_storm():
    """Property/soak test (VERDICT r4 #5): ~30 s of randomized
    concurrent traffic — request sizes 1..max_batch, bursty submitters,
    timeout flushes — through the real int pipeline. Every response
    must be bitwise equal to the same request run alone (zero-padded)
    through an identically-compiled step; afterwards no future may be
    unresolved and the stats must account for every request/image."""
    fn = _pipeline()
    MB = 16
    jfn = jax.jit(fn)          # one compile: always called at (MB, ...)

    def ref(r):
        pad = np.zeros((MB - r.shape[0], 3, SIZE, SIZE), np.float32)
        det, n = jfn(np.concatenate([r, pad], 0))
        return (np.asarray(det)[: r.shape[0]],
                np.asarray(n)[: r.shape[0]])

    deadline = time.monotonic() + 30.0
    results = []               # (request, future)
    res_lock = threading.Lock()
    stop = threading.Event()

    def submitter(seed):
        rng = np.random.default_rng(seed)
        while time.monotonic() < deadline and not stop.is_set():
            burst = []
            for _ in range(int(rng.integers(1, 4))):    # bursts of 1-3
                r = rng.uniform(0, 1, (int(rng.integers(1, MB + 1)),
                                       3, SIZE, SIZE)).astype(np.float32)
                try:
                    burst.append((r, co.submit(r)))
                except RuntimeError:       # closed during shutdown race
                    return
            with res_lock:
                results.extend(burst)
            # back-pressure: wait for this burst before the next one
            # (bounds the in-flight queue to threads x burst)
            for _, f in burst:
                f.result(timeout=600)
            # idle gaps exercise the timeout-flush path
            time.sleep(float(rng.choice([0.0, 0.0, 0.0, 0.02, 0.06])))

    with BatchCoalescer(fn, max_batch=MB, max_wait_ms=8,
                        image_shape=(3, SIZE, SIZE)) as co:
        threads = [threading.Thread(target=submitter, args=(1000 + i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        stop.set()
        assert not any(t.is_alive() for t in threads)
        # no stranded futures: every single one must resolve
        for r, f in results:
            det, n_det = f.result(timeout=600)
            want_det, want_n = ref(r)
            np.testing.assert_array_equal(det, want_det)
            np.testing.assert_array_equal(n_det, want_n)
        stats = co.snapshot()
    assert stats["requests"] == len(results)
    assert stats["images"] == sum(r.shape[0] for r, _ in results)
    assert stats["flushes"] >= 2
    assert 0 < stats["mean_fill"] <= 1.0
    assert stats["latency_ms_p99"] >= stats["latency_ms_p50"] > 0
    assert len(results) >= 20      # the storm actually stormed


def test_coalescer_poisoned_flush_does_not_kill_worker():
    """A runtime Exception raised by the step for ONE flush (injected
    via a host callback on a poison pixel) must fail exactly that
    flush's futures and leave the worker serving later requests."""
    import jax.numpy as jnp

    def check(v):
        if np.any(v == np.float32(1234.5)):
            raise ValueError("poisoned batch")
        return v

    def step(x):
        x = jax.pure_callback(check,
                              jax.ShapeDtypeStruct(x.shape, x.dtype), x)
        return x.sum(axis=(1, 2, 3)), jnp.zeros((x.shape[0],), jnp.int32)

    good = np.ones((2, 3, 8, 8), np.float32)
    poison = np.full((1, 3, 8, 8), 1234.5, np.float32)
    with BatchCoalescer(step, max_batch=4, max_wait_ms=10,
                        image_shape=(3, 8, 8)) as co:
        f_poison = co.submit(poison)
        with pytest.raises(Exception, match="poisoned batch"):
            f_poison.result(timeout=120)
        # the worker survived: later traffic is served correctly
        f_good = co.submit(good)
        s, n = f_good.result(timeout=120)
        np.testing.assert_allclose(np.asarray(s),
                                   good.sum(axis=(1, 2, 3)))


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_coalescer_worker_death_under_concurrent_storm():
    """A BaseException (SystemExit) in the step while many submitters
    are in flight: EVERY future must resolve (result or exception) and
    the coalescer must refuse new work — no stranded submitter."""

    def bad(x):
        raise SystemExit("step died mid-storm")

    co = BatchCoalescer(bad, max_batch=8, max_wait_ms=20,
                        image_shape=(3, 8, 8))
    futs = []
    futs_lock = threading.Lock()

    def submitter(i):
        for _ in range(5):
            try:
                f = co.submit(np.zeros((1, 3, 8, 8), np.float32))
            except RuntimeError:
                return                       # already closed: fine
            with futs_lock:
                futs.append(f)
            time.sleep(0.005)

    threads = [threading.Thread(target=submitter, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not any(t.is_alive() for t in threads)
    assert futs, "storm submitted nothing before the death"
    for f in futs:
        with pytest.raises(BaseException):
            f.result(timeout=120)            # resolved, not stranded


def test_coalescer_rejects_bad_requests():
    fn = _pipeline()
    with BatchCoalescer(fn, max_batch=8, max_wait_ms=10,
                        image_shape=(3, SIZE, SIZE)) as co:
        try:
            co.submit(_req(9))
            assert False, "oversized request accepted"
        except ValueError:
            pass
        try:
            co.submit(np.zeros((2, 3, SIZE, SIZE // 2), np.float32))
            assert False, "wrong image shape accepted"
        except ValueError:
            pass
