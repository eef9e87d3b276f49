"""Byte-level parity of export writers vs the reference emitters."""

import gzip
import os
import pickle

import numpy as np
import pytest

import conftest
from reference_oracle import load as load_ref

from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.export import verilog
from alpha_yolo_quant_tpu.export.artifacts import export_all, make_dirs
from alpha_yolo_quant_tpu.export.pickles import (
    dump_gz_pickle, load_gz_pickle, load_scales, packed_state_dict,
    save_layer_pickles,
)
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import collect_stats, reduce_stats
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime.golden import golden_forward

RNG = np.random.default_rng(3)
ref_exists = pytest.mark.skipif(not conftest.reference_available(),
                                reason="no reference mount")


@ref_exists
def test_bit_converter_parity():
    ref = load_ref("utils.save_weights")
    nul = lambda *a, **k: None
    for k in (4, 6, 8, 16):
        qmax = 2 ** (k - 1) - 1
        vals = list(range(-qmax, qmax + 1, max(1, qmax // 8))) + [0, 1, -1]
        for v in vals:
            for element in ("weight", "activ"):
                assert verilog.bit_converter("f", k, v, element, warn=nul) \
                    == ref.bit_converter("f", k, v, element)
    for v in (-131071, -5000, -1, 0, 1, 5000, 131071):
        assert verilog.bit_converter("f", 8, v, "bias", warn=nul) \
            == ref.bit_converter("f", 8, v, "bias")
    for v in (0, 1, 127, 255):
        assert verilog.bit_converter("f", 8, v, "rescale", warn=nul) \
            == ref.bit_converter("f", 8, v, "rescale")


@ref_exists
def test_txt_writers_parity(tmp_path, monkeypatch):
    ref = load_ref("utils.save_weights")
    ref_dir = tmp_path / "ref"
    my_dir = tmp_path / "mine"
    for d in (ref_dir, my_dir):
        make_dirs(str(d))
    monkeypatch.chdir(tmp_path)

    conv = RNG.integers(-127, 128, (4, 3, 3, 3))
    bias = RNG.integers(-100000, 100000, (1, 4, 1, 1))
    ref.save_txt_weight(conv, bias, "LayerX", "Conv2D", 8, str(ref_dir))
    verilog.save_txt_weight(conv, bias, "LayerX", "Conv2D", 8, str(my_dir),
                            warn=lambda *a: None)
    fname = f"LayerX_type_Conv2D_bit_8_shape_{conv.shape}.txt"
    want = (ref_dir / "quant_weights_yolov8n" / fname).read_bytes()
    got = (my_dir / "quant_weights_yolov8n" / fname).read_bytes()
    assert got == want

    arr = RNG.integers(-127, 128, (1, 4, 5, 5))
    ref.save_txt_activations(arr, "ActX", str(ref_dir), type="act_conv", k=8)
    verilog.save_txt_activations(arr, "ActX", str(my_dir), "act_conv", 8,
                                 warn=lambda *a: None)
    fname = f"ActX_type_act_conv_bit_8_shape_{arr.shape}.txt"
    sub = "quant_activations/conv2d"
    # rescale/shift append, per-channel arrays
    rescale = np.int64(RNG.integers(1, 255, (1, 4, 1, 1)))
    shift = np.int64(RNG.integers(8, 20, (1, 4, 1, 1)))
    ref.save_txt_rescale_shift(arr, rescale, shift, "ActX", str(ref_dir),
                               "act_conv", 8)
    verilog.save_txt_rescale_shift(arr, rescale, shift, "ActX", str(my_dir),
                                   "act_conv", 8, warn=lambda *a: None)
    assert (my_dir / sub / fname).read_bytes() == \
        (ref_dir / sub / fname).read_bytes()

    # scalar rescale/shift (structural requant) goes through the
    # expand-dims fallback path
    arr2 = RNG.integers(-127, 128, (1, 2, 3, 3))
    ref.save_txt_activations(arr2, "ActY", str(ref_dir), type="act_silu",
                             k=8, silu=True)
    verilog.save_txt_activations(arr2, "ActY", str(my_dir), "act_silu", 8,
                                 silu=True, warn=lambda *a: None)
    ref.save_txt_rescale_shift(arr2, np.int64(97), np.int64(12), "ActY",
                               str(ref_dir), "act_silu", 8, silu=True)
    verilog.save_txt_rescale_shift(arr2, np.int64(97), np.int64(12), "ActY",
                                   str(my_dir), "act_silu", 8, silu=True,
                                   warn=lambda *a: None)
    fname2 = f"ActY_type_act_silu_bit_8_shape_{arr2.shape}.txt"
    sub2 = "quant_activations/silu"
    assert (my_dir / sub2 / fname2).read_bytes() == \
        (ref_dir / sub2 / fname2).read_bytes()


def test_gz_pickle_payload_bytes(tmp_path):
    """Payload equals a protocol-4 pickle of the same array (the reference's
    format: utils/save_weights.py:10), gzip mtime pinned for determinism."""
    arr = np.int64(RNG.integers(-127, 128, (4, 3, 3, 3)))
    p = tmp_path / "x.pickle"
    dump_gz_pickle(arr, str(p))
    with gzip.open(p, "rb") as g:
        payload = g.read()
    assert payload == pickle.dumps(arr, protocol=4)
    np.testing.assert_array_equal(load_gz_pickle(str(p)), arr)
    # byte-stable across runs
    p2 = tmp_path / "y.pickle"
    dump_gz_pickle(arr, str(p2))
    assert p.read_bytes() == p2.read_bytes()


def _tiny_model():
    cfg = QuantConfig(model="yolov8n", k=8, image_size=64)
    graph = build_yolov8_graph(cfg)
    params = init_params(graph, seed=9)
    calib = RNG.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
    model = build_quantized_model(graph, params, max_a, cfg)
    return cfg, graph, params, model


def test_export_all_and_roundtrip(tmp_path):
    cfg, graph, params, model = _tiny_model()
    x = RNG.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    env = golden_forward(model, x)
    out = str(tmp_path / cfg.main_dir_name)
    export_all(model, env, params, out, warn=lambda *a: None)

    # weight pickles round-trip
    w = load_gz_pickle(os.path.join(out, "weights_pickle",
                                    "Conv_P1_conv.pickle"))
    np.testing.assert_array_equal(w, model.convs["Conv_P1"].w_q)
    scales = load_scales(out)
    np.testing.assert_allclose(scales["Conv_P1"],
                               model.convs["Conv_P1"].acc_scale)

    # packed state dict has every conv + dfl
    sd = packed_state_dict(model, params)
    assert "conv0.0.weight" in sd and "dfl.weight" in sd
    assert len(sd) == 63 * 2 + 1
    np.testing.assert_array_equal(sd["conv0.0.weight"],
                                  np.float32(model.convs["Conv_P1"].w_q))

    # key artifact files exist
    for rel in ("sigmoid_table_8_bit.txt",
                "first_pixel/Conv_P1_fp.txt",
                "quant_activations/silu/C2F_2_bottle_1_SUMM_type_act_silu_"
                "bit_8_shape_(1, 16, 16, 16).txt"):
        assert os.path.exists(os.path.join(out, rel)), rel


@ref_exists
def test_lut_table_file_parity(tmp_path, monkeypatch):
    from alpha_yolo_quant_tpu.quantize.luts import sigmoid_lut

    monkeypatch.chdir(tmp_path)
    (tmp_path / "utils").mkdir()
    ref = load_ref("utils.silu")
    ref.create_sigmoid_lookup_table(7, 8)
    lut = sigmoid_lut(7, 8)
    verilog.save_lut_table(lut, "sigmoid", str(tmp_path / "mine.txt"))
    want = (tmp_path / "utils" / "sigmoid_table_8_bit.txt").read_bytes()
    got = (tmp_path / "mine.txt").read_bytes()
    assert got == want


def test_native_writer_byte_equal(tmp_path):
    """The C++ fastwriter must produce byte-identical files to the Python
    writers (which are themselves oracle-verified vs the reference)."""
    from alpha_yolo_quant_tpu.native import fastwriter

    if fastwriter() is None:
        pytest.skip("no native toolchain")
    make_dirs(str(tmp_path / "a"))
    make_dirs(str(tmp_path / "b"))
    conv = RNG.integers(-127, 128, (5, 4, 3, 3))
    bias = RNG.integers(-200000, 200000, (1, 5, 1, 1))
    nul = lambda *a: None
    verilog.save_txt_weight(conv, bias, "L", "Conv2D", 8, str(tmp_path / "a"),
                            warn=nul, use_native=True)
    verilog.save_txt_weight(conv, bias, "L", "Conv2D", 8, str(tmp_path / "b"),
                            warn=nul, use_native=False)
    fn = f"L_type_Conv2D_bit_8_shape_{conv.shape}.txt"
    assert (tmp_path / "a" / "quant_weights_yolov8n" / fn).read_bytes() == \
        (tmp_path / "b" / "quant_weights_yolov8n" / fn).read_bytes()

    arr = RNG.integers(-127, 128, (1, 3, 7, 9))
    verilog.save_txt_activations(arr, "A", str(tmp_path / "a"), "act_conv",
                                 8, warn=nul, use_native=True)
    verilog.save_txt_activations(arr, "A", str(tmp_path / "b"), "act_conv",
                                 8, warn=nul, use_native=False)
    fn = f"A_type_act_conv_bit_8_shape_{arr.shape}.txt"
    sub = "quant_activations/conv2d"
    assert (tmp_path / "a" / sub / fn).read_bytes() == \
        (tmp_path / "b" / sub / fn).read_bytes()

    # negative zero-edge + k=4 widths
    arr4 = np.array([[[[-7, 0, 7, -1]]]])
    verilog.save_txt_activations(arr4, "Z", str(tmp_path / "a"), "act_conv",
                                 4, warn=nul, use_native=True)
    verilog.save_txt_activations(arr4, "Z", str(tmp_path / "b"), "act_conv",
                                 4, warn=nul, use_native=False)
    fn = f"Z_type_act_conv_bit_4_shape_{arr4.shape}.txt"
    assert (tmp_path / "a" / sub / fn).read_bytes() == \
        (tmp_path / "b" / sub / fn).read_bytes()
