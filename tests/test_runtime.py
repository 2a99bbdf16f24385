"""Native runtime: ring buffer, file source, stream driver end-to-end."""

import threading
import time

import numpy as np
import pytest

from fdc_tpu.config import ChannelizerConfig
from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
from fdc_tpu.runtime import native
from fdc_tpu.runtime.stream import StreamDriver

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_ring_roundtrip():
    ring = native.SampleRing(1024)
    assert ring.capacity == 1024
    x = (np.arange(100) + 1j * np.arange(100)).astype(np.complex64)
    assert ring.push(x) == 100
    assert len(ring) == 100
    y = ring.pop(100)
    np.testing.assert_array_equal(x, y)
    assert len(ring) == 0


def test_ring_wraparound():
    ring = native.SampleRing(128)
    rng = np.random.default_rng(0)
    ref = []
    got = []
    for i in range(50):
        x = (rng.standard_normal(37) + 1j * rng.standard_normal(37)).astype(
            np.complex64
        )
        pushed = ring.push(x)
        ref.append(x[:pushed])
        got.append(ring.pop(64))
    got.append(ring.pop(1024))
    np.testing.assert_array_equal(
        np.concatenate(ref), np.concatenate(got)
    )


def test_ring_capacity_limit():
    ring = native.SampleRing(64)
    x = np.zeros(100, np.complex64)
    assert ring.push(x) == 64  # non-blocking push truncates at capacity


def test_ring_blocking_pop_sees_producer():
    ring = native.SampleRing(4096)
    x = (np.arange(1000) + 0j).astype(np.complex64)

    def producer():
        time.sleep(0.05)
        ring.push(x)

    th = threading.Thread(target=producer)
    th.start()
    y = ring.pop(1000, blocking=True, timeout=5.0)
    th.join()
    assert len(y) == 1000
    np.testing.assert_array_equal(x, y)


def test_ring_blocking_pop_timeout_consumes_nothing():
    """A timeout with fewer than n samples buffered must not consume them —
    otherwise a producer slower than the pop timeout silently loses samples
    mid-stream (ADVICE r1 medium)."""
    ring = native.SampleRing(1024)
    x = np.arange(10).astype(np.complex64)
    ring.push(x)
    y = ring.pop(100, blocking=True, timeout=0.05)
    assert len(y) == 0  # timeout: nothing consumed
    assert len(ring) == 10  # buffered samples intact
    ring.push(np.arange(10, 100).astype(np.complex64))
    y = ring.pop(100, blocking=True, timeout=5.0)
    np.testing.assert_array_equal(y, np.arange(100).astype(np.complex64))


def test_ring_close_unblocks():
    ring = native.SampleRing(64)
    ring.push(np.ones(10, np.complex64))
    ring.close()
    y = ring.pop(50, blocking=True, timeout=5.0)
    assert len(y) == 10  # partial pop at end of stream


def test_file_source(tmp_path):
    path = tmp_path / "capture.c64"
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(10000) + 1j * rng.standard_normal(10000)).astype(
        np.complex64
    )
    x.tofile(path)

    ring = native.SampleRing(2048)
    src = native.FileSource(ring, str(path), chunk=500)
    got = []
    deadline = time.time() + 10.0
    while time.time() < deadline:
        y = ring.pop(1024, blocking=True, timeout=1.0)
        got.append(y)
        if src.done and len(ring) == 0 and len(y) == 0:
            break
    n_read = src.samples_read
    src.stop()
    # properties after stop() must return the terminal snapshot, not
    # dereference the freed C handle
    assert src.samples_read == n_read
    assert src.done is True
    assert src.error is False
    src.stop()  # idempotent
    y = np.concatenate(got)
    assert n_read == 10000
    np.testing.assert_array_equal(x, y)


def test_stream_driver_file_end_to_end(tmp_path):
    cfg = ChannelizerConfig(
        blocksize=256,
        relinvovl=4,
        throughput_channels=[(-0.2, 0.05)],
        freqmode="basebandfs",
        batch_blocks=4,
    )
    fdc = FrequencyDomainChannelizer(cfg)

    n = 6 * fdc.batch_samples + 100  # 100-sample tail: one flush block
    t = np.arange(n)
    x = np.exp(2j * np.pi * -0.2 * t).astype(np.complex64)
    path = tmp_path / "tone.c64"
    x.tofile(path)

    out_len = fdc.throughput.geometry[0].out_len

    drv = StreamDriver(fdc, ring_batches=2)
    results = drv.run_file(str(path), chunk=1000)
    # 6 whole batches + the zero-pad flush of the tail (1 real block)
    assert drv.stats.batches == 7
    assert drv.stats.blocks_processed == 25
    assert drv.stats.samples_in == n
    y = np.concatenate([r.throughput[0] for r in results])
    assert len(y) == 25 * out_len
    # steady-state amplitude of the extracted tone ~ 1 (whole batches)
    assert np.abs(y[200: 24 * out_len]).mean() == pytest.approx(
        1.0, abs=0.05
    )

    # flush=False: open-ended stream semantics, tail stays unprocessed
    fdc2 = FrequencyDomainChannelizer(cfg)
    drv2 = StreamDriver(fdc2, ring_batches=2)
    results2 = drv2.run_file(str(path), chunk=1000, flush=False)
    assert drv2.stats.batches == 6
    assert drv2.stats.blocks_processed == 24
    y2 = np.concatenate([r.throughput[0] for r in results2])
    np.testing.assert_array_equal(y2, y[: 24 * out_len])


def test_stream_driver_socket_end_to_end():
    """TCP socket source: a client streams a tone, the driver extracts
    the identical samples the direct process()+flush() path produces."""
    import socket

    cfg = ChannelizerConfig(
        blocksize=256,
        relinvovl=4,
        throughput_channels=[(-0.2, 0.05)],
        freqmode="basebandfs",
        batch_blocks=4,
    )
    fdc = FrequencyDomainChannelizer(cfg)
    n = 3 * fdc.batch_samples + 55  # ragged tail exercises the flush
    t = np.arange(n)
    x = np.exp(2j * np.pi * -0.2 * t).astype(np.complex64)

    def client(port):
        with socket.create_connection(("127.0.0.1", port)) as s:
            # send in odd-sized chunks so partial samples cross recv calls
            raw = x.tobytes()
            for off in range(0, len(raw), 777):
                s.sendall(raw[off: off + 777])

    drv = StreamDriver(fdc, ring_batches=2)
    results = drv.run_socket(
        on_listen=lambda p: threading.Thread(
            target=client, args=(p,), daemon=True
        ).start(),
    )
    assert drv.stats.samples_in == n
    assert drv.stats.blocks_processed == 13  # 12 whole + 1 flush block
    y = np.concatenate([r.throughput[0] for r in results])

    fdc2 = FrequencyDomainChannelizer(cfg)
    r2 = fdc2.process(x)
    rf = fdc2.flush()
    y2 = np.concatenate([r2.throughput[0], rf.throughput[0]])
    np.testing.assert_array_equal(y, y2)


def test_socket_source_stop_without_client():
    """Stopping a listening socket source that never got a connection
    must not hang or error."""
    ring = native.SampleRing(4096)
    src = native.SocketSource(ring, port=0)
    port = src.port
    assert port > 0
    time.sleep(0.05)
    src.stop()
    # post-stop property reads return the terminal snapshot (no NULL deref)
    assert src.port == port
    assert src.samples_read == 0
    assert isinstance(src.done, bool)
    assert src.error is False
    src.stop()  # idempotent


def test_stream_driver_missing_file_raises(tmp_path):
    """fopen failure sets error AND done (ring.cc filesource_main); the
    driver must surface IOError, not return an empty result (ADVICE r1)."""
    cfg = ChannelizerConfig(
        blocksize=256,
        relinvovl=4,
        throughput_channels=[(-0.2, 0.05)],
        freqmode="basebandfs",
        batch_blocks=4,
    )
    drv = StreamDriver(FrequencyDomainChannelizer(cfg), ring_batches=2)
    with pytest.raises(IOError):
        drv.run_file(str(tmp_path / "does_not_exist.c64"), timeout=0.5)


def test_stream_driver_python_fallback():
    cfg = ChannelizerConfig(
        blocksize=128,
        relinvovl=4,
        throughput_channels=[(0.1, 0.05)],
        freqmode="basebandfs",
        batch_blocks=2,
    )
    drv = StreamDriver(FrequencyDomainChannelizer(cfg), use_native=False)
    x = np.zeros(2 * drv.batch_samples, np.complex64)
    drv.push(x)
    assert drv.run_once() is not None
    assert drv.run_once() is not None
    assert drv.run_once(timeout=0.01) is None
    assert drv.stats.batches == 2


def test_stream_driver_with_sharded_channelizer(tmp_path):
    """Config-5 streaming shape: file -> native ring -> sharded step."""
    from fdc_tpu.parallel.mesh import make_mesh
    from fdc_tpu.parallel.sharded import ShardedChannelizer

    cfg = ChannelizerConfig(
        blocksize=256,
        relinvovl=4,
        throughput_channels=[(-0.2, 0.05)],
        activity_detection_segments=[(0.1, 0.4)],
        act_det_threshold=8.0,
        minchandist=0.02,
        freqmode="basebandfs",
        batch_blocks=8,
    )
    fdc = ShardedChannelizer(cfg, mesh=make_mesh(n_time=4, n_chan=2))
    n = 4 * fdc.batch_samples
    t = np.arange(n)
    rng = np.random.default_rng(8)
    x = (np.exp(2j * np.pi * -0.2 * t)
         + 0.02 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    m = np.zeros(n)
    m[10 * cfg.inplen: 20 * cfg.inplen] = 1.0
    x += (2.0 * m * np.exp(2j * np.pi * 0.25 * t)).astype(np.complex64)
    path = tmp_path / "pod.c64"
    x.astype(np.complex64).tofile(path)

    drv = StreamDriver(fdc, ring_batches=2)
    results = drv.run_file(str(path))
    assert drv.stats.batches == 4
    events = [e for r in results for e in r.events]
    assert any(e.finalized for e in events)
    y = np.concatenate([r.throughput[0] for r in results])
    assert np.abs(y[200:]).mean() == pytest.approx(1.0, abs=0.07)
