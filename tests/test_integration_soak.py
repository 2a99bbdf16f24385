"""Integration soak: file -> native ring -> channelizer -> events/waterfall,
with a mid-stream checkpoint/restore, all three modes live."""

import numpy as np
import pytest

from fdc_tpu.config import ChannelizerConfig
from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
from fdc_tpu.runtime import native
from fdc_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
from fdc_tpu.runtime.stream import StreamDriver
from fdc_tpu.utils.waterfall import Waterfall

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def build_cfg():
    return ChannelizerConfig(
        blocksize=512,
        relinvovl=4,
        throughput_channels=[(-0.3, 0.05)],
        activity_controlled_channels=[(0.15, 0.05)],
        activity_detection_segments=[(-0.2, 0.05)],
        act_contr_threshold=10.0,
        act_det_threshold=8.0,
        minchandist=0.02,
        freqmode="basebandfs",
        batch_blocks=8,
        debug=True,
    )


def synth(cfg, n_batches, seed=0):
    n = n_batches * cfg.batch_blocks * cfg.inplen
    t = np.arange(n)
    rng = np.random.default_rng(seed)
    x = (0.02 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    x += 0.8 * np.exp(2j * np.pi * -0.3 * t)  # throughput carrier
    # periodic bursts on the activity channel and in the detection segment
    period = 10 * cfg.inplen
    gate = ((t // period) % 3 == 0).astype(float)
    x += (2.0 * gate * np.exp(2j * np.pi * 0.15 * t)).astype(np.complex64)
    gate2 = ((t // period) % 4 == 1).astype(float)
    x += (2.0 * gate2 * np.exp(2j * np.pi * -0.1 * t)).astype(np.complex64)
    return x.astype(np.complex64)


def test_soak_stream_checkpoint_waterfall(tmp_path):
    cfg = build_cfg()
    n_batches = 20
    x = synth(cfg, n_batches)
    path = tmp_path / "capture.c64"
    x.tofile(path)

    # continuous run through the native stream driver
    fdc = FrequencyDomainChannelizer(cfg)
    drv = StreamDriver(fdc, ring_batches=4)
    wf = Waterfall(blocklen=cfg.blocksize, width=256, height=64,
                   blockdecimation=2)
    events, tp = [], []

    def on_result(res):
        events.extend(res.events)
        tp.append(res.throughput[0])
        wf.feed_power(np.abs(res.debug_spectrum) ** 2)
        wf.feed_events(res.events)

    drv.run_file(str(path), on_result=on_result, chunk=3000)
    assert drv.stats.batches == n_batches
    assert drv.stats.samples_in == len(x)
    assert len(events) >= 8, "periodic bursts must emit repeatedly"
    img = wf.render()
    assert img.shape == (64, 256, 3)
    assert img.max() > 0

    # same stream, interrupted + resumed mid-way: identical events
    half = n_batches // 2
    a = FrequencyDomainChannelizer(cfg)
    ra = a.process(x[: half * a.batch_samples])
    ck = str(tmp_path / "soak.ckpt")
    save_checkpoint(a, ck)
    b = FrequencyDomainChannelizer(cfg)
    load_checkpoint(b, ck)
    rb = b.process(x[half * a.batch_samples:])
    # the continuous run's driver flushed at end-of-stream (which also
    # finalizes still-open bursts); the resumed stream must flush too
    # for the event sets to be comparable
    resumed = ra.events + rb.events + b.flush().events
    assert len(resumed) == len(events)
    for p, q in zip(events, resumed):
        assert p.ID.split(".", 1)[1] == q.ID.split(".", 1)[1]
        assert p.blockstart == q.blockstart and p.blockend == q.blockend
        np.testing.assert_allclose(p.data, q.data, rtol=1e-5, atol=1e-7)

    # throughput stream continuity across the whole soak
    y = np.concatenate(tp)
    g = fdc.throughput.geometry[0]
    assert len(y) == n_batches * cfg.batch_blocks * g.out_len
    assert np.abs(y[500:]).mean() == pytest.approx(0.8, abs=0.08)
