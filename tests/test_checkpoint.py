"""Checkpoint/resume: a snapshot taken mid-stream (with open bursts) must
make the resumed run produce exactly the uninterrupted run's outputs."""

import numpy as np
import pytest

from fdc_tpu.config import ChannelizerConfig
from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
from fdc_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint


def config(**kw):
    base = dict(
        blocksize=256,
        relinvovl=4,
        throughput_channels=[(-0.25, 0.04)],
        activity_controlled_channels=[(0.3, 0.05)],
        activity_detection_segments=[(-0.47, -0.3)],
        act_contr_threshold=10.0,
        act_det_threshold=8.0,
        minchandist=0.02,
        freqmode="basebandfs",
        batch_blocks=4,
        max_slots=8,
        max_candidates=8,
    )
    base.update(kw)
    return ChannelizerConfig(**base)


def make_signal(n):
    """Bursts that STAY OPEN across the checkpoint cut (blocks 20-60ish)."""
    t = np.arange(n)
    rng = np.random.default_rng(11)
    x = (0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))).astype(
        np.complex64
    )
    x += 0.9 * np.exp(2j * np.pi * -0.25 * t)
    b = np.zeros(n)
    b[n // 4: 3 * n // 4] = 1.0
    x += (2.0 * b * np.exp(2j * np.pi * 0.3 * t)).astype(np.complex64)
    d = np.zeros(n)
    d[n // 3: 2 * n // 3] = 1.0
    x += (2.5 * d * np.exp(2j * np.pi * -0.4 * t)).astype(np.complex64)
    return x.astype(np.complex64)


def collect(fdc, chunks):
    events, tps = [], []
    for c in chunks:
        r = fdc.process(c)
        events.extend(r.events)
        tps.append(r.throughput[0])
    return events, np.concatenate(tps)


def test_checkpoint_resume_equals_uninterrupted(tmp_path):
    cfg = config()
    fdc_a = FrequencyDomainChannelizer(cfg)
    n = 16 * fdc_a.batch_samples
    x = make_signal(n)
    half = n // 2 + 37  # cut mid-batch so pending samples are non-trivial

    # uninterrupted reference run
    ev_ref, tp_ref = collect(fdc_a, [x])

    # run A: first half, checkpoint
    fdc_b = FrequencyDomainChannelizer(cfg)
    ev1, tp1 = collect(fdc_b, [x[:half]])
    ckpt = str(tmp_path / "state.ckpt")
    save_checkpoint(fdc_b, ckpt)

    # run B: fresh instance, restore, second half
    fdc_c = FrequencyDomainChannelizer(cfg)
    load_checkpoint(fdc_c, ckpt)
    ev2, tp2 = collect(fdc_c, [x[half:]])

    tp_resumed = np.concatenate([tp1, tp2])
    np.testing.assert_allclose(tp_ref, tp_resumed, rtol=2e-4, atol=2e-5)

    assert len(ev_ref) == len(ev1) + len(ev2)
    for a, b in zip(ev_ref, ev1 + ev2):
        assert a.ID.split(".", 1)[1] == b.ID.split(".", 1)[1]
        assert a.finalized == b.finalized
        assert a.blockstart == b.blockstart
        assert a.blockend == b.blockend
        np.testing.assert_allclose(a.data, b.data, rtol=2e-4, atol=2e-5)


def test_checkpoint_structure_mismatch(tmp_path):
    fdc = FrequencyDomainChannelizer(config())
    fdc.process(np.zeros(fdc.batch_samples, np.complex64))
    ckpt = str(tmp_path / "state.ckpt")
    save_checkpoint(fdc, ckpt)

    other = FrequencyDomainChannelizer(config(max_slots=16))
    with pytest.raises(ValueError):
        load_checkpoint(other, ckpt)


def test_checkpoint_before_first_step(tmp_path):
    fdc = FrequencyDomainChannelizer(config())
    ckpt = str(tmp_path / "fresh.ckpt")
    save_checkpoint(fdc, ckpt)
    fdc2 = FrequencyDomainChannelizer(config())
    load_checkpoint(fdc2, ckpt)
    assert fdc2._t0 == 0


def test_checkpoint_cross_topology(tmp_path):
    """A checkpoint from a single-device run resumes on a SHARDED
    channelizer (scale-up mid-stream) and vice versa — the carry is
    replicated, so the snapshot is topology-independent."""
    from fdc_tpu.parallel import ShardedChannelizer, make_mesh

    cfg = config()
    n = 16 * cfg.batch_blocks * cfg.inplen
    x = make_signal(n)
    half = n // 2 + 37

    ev_ref, tp_ref = collect(FrequencyDomainChannelizer(cfg), [x])

    # plain first half -> checkpoint -> SHARDED second half
    plain = FrequencyDomainChannelizer(cfg)
    ev1, tp1 = collect(plain, [x[:half]])
    ckpt = str(tmp_path / "cross.ckpt")
    save_checkpoint(plain, ckpt)
    sh = ShardedChannelizer(cfg, mesh=make_mesh(n_time=2, n_chan=2))
    load_checkpoint(sh, ckpt)
    ev2, tp2 = collect(sh, [x[half:]])

    np.testing.assert_allclose(
        tp_ref, np.concatenate([tp1, tp2]), rtol=2e-4, atol=2e-5
    )
    assert len(ev_ref) == len(ev1) + len(ev2)
    for a, b in zip(ev_ref, ev1 + ev2):
        assert a.ID.split(".", 1)[1] == b.ID.split(".", 1)[1]
        assert (a.finalized, a.blockstart, a.blockend) == (
            b.finalized, b.blockstart, b.blockend
        )
        np.testing.assert_allclose(a.data, b.data, rtol=2e-4, atol=2e-5)

    # and back: sharded checkpoint resumes on a plain channelizer
    ckpt2 = str(tmp_path / "back.ckpt")
    save_checkpoint(sh, ckpt2)
    tail = make_signal(2 * cfg.batch_blocks * cfg.inplen)
    sh2 = ShardedChannelizer(cfg, mesh=make_mesh(n_time=2, n_chan=2))
    load_checkpoint(sh2, ckpt2)
    ev_s, tp_s = collect(sh2, [tail])
    plain2 = FrequencyDomainChannelizer(cfg)
    load_checkpoint(plain2, ckpt2)
    ev_p, tp_p = collect(plain2, [tail])
    np.testing.assert_allclose(tp_s, tp_p, rtol=2e-4, atol=2e-5)
    assert len(ev_s) == len(ev_p)
