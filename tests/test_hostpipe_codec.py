"""Unit tests for the cross-process pipeline's typed-numpy TCP codec
(fdc_tpu.parallel.hostpipe; the two-process end-to-end scenario lives in
the slow lane, tests/test_multihost_twoprocess.py)."""

import socket
import threading

import numpy as np
import pytest

from fdc_tpu.parallel.hostpipe import (
    _dec_tree,
    _enc_tree,
    _recv_msg,
    _send_msg,
)


def _roundtrip(obj):
    bufs = []
    spec = _enc_tree(obj, bufs)
    out, pos = _dec_tree(spec, bufs, 0)
    assert pos == len(bufs)
    return out


def _assert_tree_equal(a, b):
    if isinstance(a, dict):
        assert isinstance(b, dict) and set(a) == set(b)
        for k in a:
            _assert_tree_equal(a[k], b[k])
    elif isinstance(a, (list, tuple)):
        assert type(a) is type(b) and len(a) == len(b)
        for x, y in zip(a, b):
            _assert_tree_equal(x, y)
    elif isinstance(a, np.ndarray):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(a, b)
    else:
        assert a == b and type(a) is type(b)


def test_codec_roundtrip_types():
    tree = {
        "i": 7,
        "f": 1.5,
        "b": True,
        "s": "hello",
        "none": None,
        "arr_f32": np.arange(12, dtype=np.float32).reshape(3, 4),
        "arr_c64": (np.arange(6) + 1j * np.arange(6)).astype(np.complex64),
        "arr_bool": np.array([True, False, True]),
        "arr_i32_empty": np.zeros((0, 5), np.int32),
        "nested": [
            (1, 2.0, None),
            {"inner": np.ones((2, 2), np.int64)},
        ],
        64: np.zeros((2,), np.float32),  # int dict keys (pa_ext buckets)
    }
    out = _roundtrip(tree)
    _assert_tree_equal(tree, out)
    # int keys survive as ints, not strings (JSON would stringify them)
    assert 64 in out and "64" not in out


def test_codec_rejects_unsupported_keys():
    with pytest.raises(TypeError):
        _roundtrip({(1, 2): 3})


def test_codec_tuple_vs_list_preserved():
    out = _roundtrip({"t": (1, 2), "l": [1, 2]})
    assert isinstance(out["t"], tuple) and isinstance(out["l"], list)


def test_socket_framing_roundtrip():
    lsock = socket.socket()
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    port = lsock.getsockname()[1]
    got = {}

    def server():
        s, _ = lsock.accept()
        got["msg"] = _recv_msg(s)
        _send_msg(s, "PLANS", 3, {"ok": np.arange(4, dtype=np.int32)})
        s.close()

    th = threading.Thread(target=server)
    th.start()
    c = socket.create_connection(("127.0.0.1", port))
    payload = {
        "seg_packed": [np.arange(21, dtype=np.int32).reshape(3, 7)],
        "pa_powers": None,
    }
    _send_msg(c, "PACKS", 2, payload)
    kind, b, back = _recv_msg(c)
    th.join(timeout=10)
    c.close()
    lsock.close()
    assert got["msg"][0] == "PACKS" and got["msg"][1] == 2
    _assert_tree_equal(got["msg"][2], payload)
    assert kind == "PLANS" and b == 3
    np.testing.assert_array_equal(back["ok"], np.arange(4))


def test_bad_magic_rejected():
    lsock = socket.socket()
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    port = lsock.getsockname()[1]
    err = {}

    def server():
        s, _ = lsock.accept()
        try:
            _recv_msg(s)
        except ConnectionError as e:
            err["e"] = e
        s.close()

    th = threading.Thread(target=server)
    th.start()
    c = socket.create_connection(("127.0.0.1", port))
    c.sendall(b"NOPE" + b"\0" * 16)
    c.close()
    th.join(timeout=10)
    lsock.close()
    assert "e" in err


def test_hostpipe_spectra_mode_guarded(tmp_path):
    """process_spectra raises a clear error on both hostpipe roles (the
    inherited vector-mode pipeline would duplicate the event stream)."""
    import jax

    from fdc_tpu.config import ChannelizerConfig
    from fdc_tpu.parallel.hostpipe import (
        HostPipelineOwner,
        HostPipelineWorker,
    )

    cfg = ChannelizerConfig(
        blocksize=256, relinvovl=4,
        activity_detection_segments=[(0.3, 0.42)], batch_blocks=8,
        max_slots=4,
    )
    owner = HostPipelineOwner(cfg, n_workers=1, port=0)
    try:
        with pytest.raises(RuntimeError, match="sample-mode"):
            owner.process_spectra(np.zeros((8, 256), np.complex64))
        deadline_port = owner.port

        def connect_worker():
            w = HostPipelineWorker(
                cfg, host_id=1, n_hosts=2, owner_port=deadline_port
            )
            with pytest.raises(RuntimeError, match="sample-mode"):
                w.process_spectra(np.zeros((8, 256), np.complex64))
            w.close()

        th = threading.Thread(target=connect_worker)
        th.start()
        owner.accept_workers()
        th.join(timeout=30)
    finally:
        owner.close()


def test_owner_surfaces_worker_death():
    """A worker that dies before shipping its batch's PACKS must surface
    as a ConnectionError on the owner (within the timeout), never a
    hang or a silent partial result."""
    import time

    from fdc_tpu.config import ChannelizerConfig
    from fdc_tpu.parallel.hostpipe import HostPipelineOwner, _send_msg

    cfg = ChannelizerConfig(
        blocksize=256, relinvovl=4,
        activity_detection_segments=[(0.3, 0.42)], batch_blocks=8,
        max_slots=4,
    )
    owner = HostPipelineOwner(cfg, n_workers=1, port=0, timeout=15.0)

    def fake_worker():
        s = socket.create_connection(("127.0.0.1", owner.port))
        _send_msg(s, "HELLO", 1, cfg.to_json())
        time.sleep(0.5)
        s.close()  # dies before sending any PACKS

    th = threading.Thread(target=fake_worker)
    th.start()
    try:
        owner.accept_workers()
        x = np.zeros(2 * owner.batch_samples, np.complex64)
        with pytest.raises(ConnectionError):
            owner.process(x)
    finally:
        owner.close()
        th.join(timeout=10)


def test_owner_rejects_config_mismatch():
    """A worker built from a different config must be refused at HELLO
    (batch assignment and geometry must agree across hosts)."""
    from fdc_tpu.config import ChannelizerConfig
    from fdc_tpu.parallel.hostpipe import HostPipelineOwner, _send_msg

    cfg = ChannelizerConfig(
        blocksize=256, relinvovl=4,
        activity_detection_segments=[(0.3, 0.42)], batch_blocks=8,
        max_slots=4,
    )
    other = cfg.replace(batch_blocks=16)
    owner = HostPipelineOwner(cfg, n_workers=1, port=0, timeout=15.0)

    def fake_worker():
        s = socket.create_connection(("127.0.0.1", owner.port))
        _send_msg(s, "HELLO", 1, other.to_json())

    th = threading.Thread(target=fake_worker)
    th.start()
    try:
        with pytest.raises(ValueError, match="fingerprint"):
            owner.accept_workers()
    finally:
        owner.close()
        th.join(timeout=10)
