"""msgoutput=False: no events returned, but state / files / resume identical.

The reference gates PDU assembly and publication on the msgoutput flag
while file output and all burst-state updates proceed unchanged
(reference: lib/SegmentDetection_impl.cc:446-460,502-515,
lib/PowerActivationChannel_impl.cc:223-233). fdc_tpu mirrors that:
``process(...).events`` is empty, the FileSink writes the identical
files, and a checkpoint taken mid-capture under msgoutput=False resumes
into msgoutput=True with the exact event stream of an always-on run.
"""

import numpy as np
import pytest

from fdc_tpu.config import ChannelizerConfig
from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
from fdc_tpu.runtime import native


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
        batch_blocks=8,
        max_slots=8,
        max_candidates=8,
        pow_act_maxblocks=6,  # force partial emissions
        act_det_maxblocks=5,
    )
    base.update(kw)
    return ChannelizerConfig(**base)


def make_signal(n):
    t = np.arange(n)
    rng = np.random.default_rng(3)
    x = (0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))).astype(
        np.complex64
    )
    for lo, hi, f in (
        (n // 8, n // 3, 0.3),
        (n // 2, 3 * n // 4, 0.3),
        (n // 3, n // 2, -0.4),
    ):
        m = np.zeros(n)
        m[lo:hi] = 1.0
        x += (2.0 * m * np.exp(2j * np.pi * f * t)).astype(np.complex64)
    return x


NATIVE_MODES = [False] + ([True] if native.available() else [])


@pytest.mark.parametrize("use_native", NATIVE_MODES)
def test_msgoutput_off_returns_no_events_writes_same_files(
    tmp_path, use_native
):
    n = 8 * config().batch_blocks * config().inplen
    x = make_signal(n)

    on_dir = tmp_path / "on"
    off_dir = tmp_path / "off"
    on_dir.mkdir()
    off_dir.mkdir()

    cfg_on = config(native_emission=use_native, fileoutput=True,
                    msgoutput=True, outputpath=str(on_dir))
    cfg_off = config(native_emission=use_native, fileoutput=True,
                     msgoutput=False, outputpath=str(off_dir))

    ev_on = FrequencyDomainChannelizer(cfg_on).process(x).events
    ev_off = FrequencyDomainChannelizer(cfg_off).process(x).events

    assert len(ev_on) > 2, "scenario must emit bursts"
    assert ev_off == [], "msgoutput=False must suppress returned events"

    # identical file SET and identical CONTENTS (filenames carry a
    # wall-clock timestamp prefix; compare the stable suffix)
    def inventory(d):
        out = {}
        for f in sorted(d.iterdir()):
            key = f.name.split(".", 1)[1]  # strip timestamp
            out[key] = np.fromfile(f, np.complex64)
        return out

    inv_on = inventory(on_dir)
    inv_off = inventory(off_dir)
    assert set(inv_on) == set(inv_off) and inv_on
    for k in inv_on:
        np.testing.assert_allclose(
            inv_off[k], inv_on[k], rtol=1e-5, atol=1e-7
        )


@pytest.mark.parametrize("use_native", NATIVE_MODES)
def test_msgoutput_off_resume_behavior_identical(tmp_path, use_native):
    from fdc_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint

    cfg_on = config(native_emission=use_native, msgoutput=True)
    n = 8 * cfg_on.batch_blocks * cfg_on.inplen
    x = make_signal(n)
    half = n // 2 + 17

    ref = FrequencyDomainChannelizer(cfg_on)
    ref.process(x[:half])
    ev_ref_tail = ref.process(x[half:]).events
    assert ev_ref_tail, "second half must emit events"

    # first half under msgoutput=False -> checkpoint -> resume with
    # msgoutput=True: burst state (incl. buffered samples) must have
    # advanced identically, so the tail event stream matches exactly.
    a = FrequencyDomainChannelizer(config(native_emission=use_native,
                                          msgoutput=False))
    assert a.process(x[:half]).events == []
    ck = str(tmp_path / "s.ckpt")
    save_checkpoint(a, ck)
    b = FrequencyDomainChannelizer(cfg_on)
    load_checkpoint(b, ck)
    ev_tail = b.process(x[half:]).events

    assert len(ev_tail) == len(ev_ref_tail)
    for p, q in zip(ev_ref_tail, ev_tail):
        assert p.ID.split(".", 1)[1] == q.ID.split(".", 1)[1]
        assert p.blockstart == q.blockstart
        assert p.blockend == q.blockend
        assert p.part == q.part and p.finalized == q.finalized
        np.testing.assert_allclose(p.data, q.data, rtol=1e-5, atol=1e-7)
