"""ONNX weight import for YOLOv4-tiny (models/onnx_import.py).

The reference's detection weights are ONNX blobs
(config/grid_vision_cfg.yaml:5, object_detection.cpp:41-58); the real
files are stripped from the snapshot, so the importer is validated by
round-trip: export our Flax model with the in-repo writer, re-import
into a DIFFERENT random init, compare bitwise. The wire-format reader is
additionally pinned by a hand-encoded protobuf fixture (spec bytes
written independently of the writer, so a consistent-but-wrong encoding
in writer+reader cannot cancel out).
"""

import struct

import jax
import numpy as np
import pytest

from grid_vision_tpu.models import onnx_import, yolov4_tiny


def test_wire_format_reader_against_hand_encoded_bytes():
    # TensorProto {dims: [2, 3], data_type: 1 (FLOAT), name: "t",
    #              raw_data: 6 floats} encoded by hand per the protobuf
    # spec: tag = (field << 3) | wire; varints LEB128.
    floats = np.arange(6, dtype="<f4")
    tensor = bytes([
        0x08, 0x02,            # field 1 (dims), varint 2
        0x08, 0x03,            # field 1 (dims), varint 3
        0x10, 0x01,            # field 2 (data_type), varint 1 = FLOAT
        0x42, 0x01, ord("t"),  # field 8 (name), len 1, "t"
        0x4A, 24,              # field 9 (raw_data), len 24
    ]) + floats.tobytes()
    name, arr = onnx_import._parse_tensor(tensor)
    assert name == "t" and arr.shape == (2, 3)
    np.testing.assert_array_equal(arr, floats.reshape(2, 3))

    # NodeProto {input: ["a", "w"], output: ["y"], name: "n",
    #            op_type: "Conv"}
    node = bytes([
        0x0A, 0x01, ord("a"),
        0x0A, 0x01, ord("w"),
        0x12, 0x01, ord("y"),
        0x1A, 0x01, ord("n"),
        0x22, 0x04]) + b"Conv"
    parsed = onnx_import._parse_node(node)
    assert parsed == {"inputs": ["a", "w"], "outputs": ["y"],
                      "name": "n", "op_type": "Conv"}

    # multi-byte varint: field 1, value 300 (0xAC 0x02)
    val, pos = onnx_import._read_varint(bytes([0xAC, 0x02]), 0)
    assert val == 300 and pos == 2


def test_roundtrip_bitwise(tmp_path):
    cfg = yolov4_tiny.YoloConfig()
    src = yolov4_tiny.init_params(jax.random.PRNGKey(0), cfg)
    dst = yolov4_tiny.init_params(jax.random.PRNGKey(1), cfg)

    path = str(tmp_path / "yolov4_fixture.onnx")
    onnx_import.export_yolov4_tiny(src, path)
    imported = onnx_import.import_yolov4_tiny(path, dst)

    src_leaves = jax.tree_util.tree_leaves_with_path(src)
    imp = dict(imported)
    for keypath, leaf in src_leaves:
        node = imp
        for k in keypath:
            node = node[k.key]
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(node),
            err_msg=jax.tree_util.keystr(keypath))

    # and the imported tree actually runs
    boxes, confs = yolov4_tiny.forward(
        imported, np.zeros((1, 416, 416, 3), np.float32), cfg)
    assert boxes.shape == (1, 2535, 4) and confs.shape == (1, 2535, 10)


def test_import_via_config_path(tmp_path):
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.models import weights

    cfg = GridVisionConfig()
    src = yolov4_tiny.init_params(jax.random.PRNGKey(2),
                                  yolov4_tiny.YoloConfig())
    path = str(tmp_path / "yolov4_3l_416_416.onnx")
    onnx_import.export_yolov4_tiny(src, path)

    cfg2 = GridVisionConfig(detection_weights_file=path)
    params = weights.load_all(cfg2, seed=0)
    np.testing.assert_array_equal(
        np.asarray(params["detector"]["params"]["head_13"]["bias"]),
        np.asarray(src["params"]["head_13"]["bias"]))


def test_shape_mismatch_raises(tmp_path):
    src = yolov4_tiny.init_params(jax.random.PRNGKey(0),
                                  yolov4_tiny.YoloConfig())
    path = str(tmp_path / "bad.onnx")
    onnx_import.export_yolov4_tiny(src, path)
    # import into a 5-class model: head shapes differ -> loud error
    small = yolov4_tiny.init_params(
        jax.random.PRNGKey(0), yolov4_tiny.YoloConfig(num_classes=5))
    with pytest.raises(ValueError, match="shape"):
        onnx_import.import_yolov4_tiny(path, small)


def test_pytorch_export_topology_roundtrip(tmp_path):
    """The pytorch-YOLOv4 lineage fixture (VERDICT r2 #7): darknet-
    indexed initializer names, initializers serialized in shuffled
    order, the 26-grid neck branch serialized before the 13-grid one
    (so serialized conv order is WRONG and only name-based mapping
    recovers darknet order), a 3-input Resize with a scales
    initializer, and a decode subgraph ending in boxes/confs."""
    cfg = yolov4_tiny.YoloConfig()
    src = yolov4_tiny.init_params(jax.random.PRNGKey(3), cfg)
    dst = yolov4_tiny.init_params(jax.random.PRNGKey(4), cfg)

    path = str(tmp_path / "yolov4_1_3_416_416_static.onnx")
    onnx_import.export_yolov4_tiny(src, path, style="pytorch")

    # the fixture really is adversarial: serialized conv order != darknet
    nodes, inits = onnx_import.load_graph(path)
    conv_ws = [n["inputs"][1] for n in nodes if n["op_type"] == "Conv"]
    idx = [onnx_import._darknet_layer_index(w) for w in conv_ws]
    assert idx != sorted(idx), "fixture should shuffle the neck branches"
    assert any(n["op_type"] in ("Sigmoid", "Exp") for n in nodes)

    imported = onnx_import.import_yolov4_tiny(path, dst)
    for keypath, leaf in jax.tree_util.tree_leaves_with_path(src):
        node = dict(imported)
        for k in keypath:
            node = node[k.key]
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(node),
            err_msg=jax.tree_util.keystr(keypath))


def test_unmatched_node_error_names_the_node(tmp_path):
    """A mis-shaped conv must fail naming the FIRST unmatched node and
    both shapes (actionable errors, not a generic zip mismatch)."""
    src = yolov4_tiny.init_params(jax.random.PRNGKey(0),
                                  yolov4_tiny.YoloConfig())
    path = str(tmp_path / "bad_pt.onnx")
    onnx_import.export_yolov4_tiny(src, path, style="pytorch")
    small = yolov4_tiny.init_params(
        jax.random.PRNGKey(0), yolov4_tiny.YoloConfig(num_classes=5))
    with pytest.raises(ValueError, match="first unmatched node"):
        onnx_import.import_yolov4_tiny(path, small)


def test_wrong_conv_count_lists_convs(tmp_path):
    src = yolov4_tiny.init_params(jax.random.PRNGKey(0),
                                  yolov4_tiny.YoloConfig())
    path = str(tmp_path / "truncated.onnx")
    onnx_import.export_yolov4_tiny(src, path)
    # truncate the model: re-serialize only the first 5 nodes
    nodes, inits = onnx_import.load_graph(path)
    keep = nodes[:5]
    body = b""
    for n in keep:
        body += onnx_import._len_field(1, onnx_import._node_bytes(
            n["op_type"], n["name"], n["inputs"], n["outputs"]))
    for name, arr in inits.items():
        body += onnx_import._len_field(
            5, onnx_import._tensor_bytes(name, arr))
    blob = (onnx_import._tag(1, 0) + onnx_import._write_varint(8)
            + onnx_import._len_field(7, body))
    bad = str(tmp_path / "short.onnx")
    with open(bad, "wb") as f:
        f.write(blob)
    with pytest.raises(ValueError, match="expected 21 Conv"):
        onnx_import.import_yolov4_tiny(
            bad, yolov4_tiny.init_params(jax.random.PRNGKey(1),
                                         yolov4_tiny.YoloConfig()))
