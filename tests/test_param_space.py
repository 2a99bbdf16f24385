"""Parameter-space sweeps: relinvovl, blocksize, width caps, band edges.

The reference fixes relinvovl=4 in most configs but supports any power of
two >= 2 (python/FrequencyDomainChannelizer.py:139-141); these sweeps keep
the whole pipeline honest across the parameter space.
"""

import numpy as np
import pytest

from fdc_tpu.config import ChannelizerConfig
from fdc_tpu.models.channelizer import FrequencyDomainChannelizer


@pytest.mark.parametrize("relinvovl", [2, 4, 8])
@pytest.mark.parametrize("blocksize", [256, 1024])
def test_throughput_tone_across_overlap_factors(relinvovl, blocksize):
    f0 = 0.25 + 1.0 / blocksize  # off-center, exact bin
    cfg = ChannelizerConfig(
        blocksize=blocksize,
        relinvovl=relinvovl,
        throughput_channels=[(f0 - 0.5, 0.04)],
        freqmode="normalized",
        batch_blocks=4,
    )
    fdc = FrequencyDomainChannelizer(cfg)
    rng = np.random.default_rng(0)
    n = 4 * fdc.batch_samples
    t = np.arange(n)
    x = (np.exp(2j * np.pi * (f0 - 0.5) * t)
         + 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    y = fdc.process(x).throughput[0]
    amp = np.abs(y[len(y) // 4:]).mean()
    assert amp == pytest.approx(1.0, abs=0.07), (relinvovl, blocksize, amp)


@pytest.mark.parametrize("relinvovl", [2, 8])
def test_burst_paths_across_overlap_factors(relinvovl):
    cfg = ChannelizerConfig(
        blocksize=512,
        relinvovl=relinvovl,
        activity_controlled_channels=[(0.1, 0.05)],
        activity_detection_segments=[(-0.4, -0.2)],
        act_contr_threshold=10.0,
        act_det_threshold=8.0,
        minchandist=0.02,
        freqmode="basebandfs",
        batch_blocks=4,
    )
    fdc = FrequencyDomainChannelizer(cfg)
    inplen = cfg.inplen
    n = 40 * inplen
    t = np.arange(n)
    rng = np.random.default_rng(5)
    x = (0.02 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    for lo, hi, f in ((8, 20, 0.1), (22, 32, -0.3)):
        m = np.zeros(n)
        m[lo * inplen: hi * inplen] = 1.0
        x += (2.0 * m * np.exp(2j * np.pi * f * t)).astype(np.complex64)
    events = fdc.process(x).events
    pa = [e for e in events if "PowActChan" in e.ID and e.finalized]
    det = [e for e in events if "DETECTED" in e.ID and e.finalized
           and len(e.data) > 50]
    assert pa, "burst event missing"
    assert det, "detection event missing"
    # burst data amplitude ~2 in the core
    y = pa[0].data
    core = y[len(y) // 4: -len(y) // 4]
    assert np.abs(core).mean() == pytest.approx(2.0, rel=0.15)
    y = det[0].data
    core = y[len(y) // 4: -len(y) // 4]
    assert np.abs(core).mean() == pytest.approx(2.0, rel=0.2)


def test_band_edge_channels_clamped():
    """Channels at the band edges must clamp in-band, as in the reference
    (python/FrequencyDomainChannelizer.py:341-344)."""
    cfg = ChannelizerConfig(
        blocksize=512,
        relinvovl=4,
        throughput_channels=[(-0.49, 0.05), (0.49, 0.05)],
        freqmode="basebandfs",
        batch_blocks=2,
    )
    fdc = FrequencyDomainChannelizer(cfg)
    for g in fdc.throughput.geometry:
        assert 0 <= g.start
        assert g.start + g.width <= cfg.blocksize
    # runs without error
    fdc.process(np.zeros(2 * fdc.batch_samples, np.complex64))


def test_max_extract_width_full_blocksize():
    """w_cap == blocksize: a detected carrier spanning most of the segment
    still extracts (slices at start 0 with full width)."""
    cfg = ChannelizerConfig(
        blocksize=256,
        relinvovl=4,
        activity_detection_segments=[(-0.45, 0.45)],
        act_det_threshold=6.0,
        minchandist=0.05,
        freqmode="basebandfs",
        batch_blocks=4,
        max_slots=4,
        max_extract_width=0,  # => blocksize
    )
    fdc = FrequencyDomainChannelizer(cfg)
    rng = np.random.default_rng(6)
    n = 24 * cfg.inplen
    t = np.arange(n)
    x = (0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    wide = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    wide = np.convolve(wide, np.ones(3) / np.sqrt(3), mode="same")
    m = np.zeros(n)
    m[6 * cfg.inplen: 18 * cfg.inplen] = 1.0
    x += (2.0 * m * wide * np.exp(2j * np.pi * 0.0 * t)).astype(np.complex64)
    events = fdc.process(x).events
    assert any(e.finalized and len(e.data) for e in events)


def test_dropped_counter_on_slot_exhaustion():
    cfg = ChannelizerConfig(
        blocksize=512,
        relinvovl=4,
        activity_detection_segments=[(-0.45, 0.45)],
        act_det_threshold=6.0,
        minchandist=0.01,
        freqmode="basebandfs",
        batch_blocks=4,
        max_slots=2,  # far fewer than carriers
        max_candidates=8,
    )
    fdc = FrequencyDomainChannelizer(cfg)
    rng = np.random.default_rng(7)
    n = 8 * cfg.inplen
    t = np.arange(n)
    x = (0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    for f in (-0.4, -0.25, -0.1, 0.05, 0.2, 0.35):
        x += (2.0 * np.exp(2j * np.pi * f * t)).astype(np.complex64)
    fdc.process(x)
    dropped = int(np.asarray(fdc._carry["seg0"]["dropped"]))
    assert dropped > 0, "slot exhaustion must be counted, not silent"
