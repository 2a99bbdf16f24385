"""Polyphase rational resampler: tone fidelity, batching, common-rate."""

import numpy as np
import pytest

from fdc_tpu.utils.resample import (
    common_rate,
    design_kaiser_lowpass,
    rational_resample,
)


def tone(f, n):
    return np.exp(2j * np.pi * f * np.arange(n)).astype(np.complex64)


def snr_db(y, f):
    """SNR of y against a unit tone at normalized frequency f."""
    t = np.arange(len(y))
    ref = np.exp(2j * np.pi * f * t)
    a = np.vdot(ref, y) / len(y)
    resid = y - a * ref
    return -10 * np.log10(np.mean(np.abs(resid) ** 2) / np.abs(a) ** 2)


def test_filter_design():
    h = design_kaiser_lowpass(129, 0.25)
    assert h.sum() == pytest.approx(1.0, abs=1e-6)
    assert np.argmax(h) == 64  # symmetric
    with pytest.raises(ValueError):
        design_kaiser_lowpass(65, 0.7)


@pytest.mark.parametrize("up,down", [(2, 1), (1, 2), (3, 2), (4, 3), (2, 4)])
def test_tone_through_resampler(up, down):
    f0 = 0.05
    n = 4096
    y = np.asarray(rational_resample(tone(f0, n), up, down))
    assert abs(len(y) - n * up // down) <= up
    # frequency scales by down/up; edges trimmed (filter transient)
    core = y[200:-200]
    f_out = f0 * down / up
    s = snr_db(core, f_out)
    assert s > 40.0, s
    assert np.abs(core).mean() == pytest.approx(1.0, abs=0.02)


def test_identity():
    x = tone(0.1, 256)
    np.testing.assert_array_equal(np.asarray(rational_resample(x, 3, 3)), x)


def test_batched_matches_single():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((3, 1024))
         + 1j * rng.standard_normal((3, 1024))).astype(np.complex64)
    yb = np.asarray(rational_resample(x, 3, 4))
    for i in range(3):
        yi = np.asarray(rational_resample(x[i], 3, 4))
        np.testing.assert_allclose(yb[i], yi, rtol=1e-6, atol=1e-6)


def test_common_rate():
    # two channels at widths 64 and 128 -> both to the 128 rate
    a, b = tone(0.05, 1000), tone(0.02, 2000)
    out = common_rate([a, b], [64, 128], 128)
    assert abs(len(out[0]) - 2000) <= 2  # 64 -> 128: doubled
    assert len(out[1]) == 2000  # already at target rate (identity)
    s = snr_db(np.asarray(out[0])[200:-200], 0.025)
    assert s > 40.0, s
