"""Per-component lifecycle logging parity (LOGTOFILE mode).

The reference writes fixed-name per-component log files containing a
constructor banner plus one line per emission
(reference: lib/SegmentDetection_impl.cc:49-57,109-113,474-481,530-538;
lib/PowerActivationChannel_impl.cc:52-60,112-123,245-253). These tests pin
the file names and line formats against the emitted event stream.
"""

import numpy as np
import pytest

from fdc_tpu.config import ChannelizerConfig, VerboseMode
from fdc_tpu.models.channelizer import FrequencyDomainChannelizer


def _run_scenario(tmp_path, monkeypatch, **cfg_kw):
    monkeypatch.chdir(tmp_path)  # reference log files land in the CWD
    cfg = ChannelizerConfig(
        blocksize=1024,
        relinvovl=4,
        activity_controlled_channels=[(0.25, 0.05)],
        activity_detection_segments=[(-0.4, 0.1)],
        act_contr_threshold=10.0,
        act_det_threshold=8.0,
        minchandist=0.04,
        act_det_maxblocks=6,
        pow_act_maxblocks=5,
        freqmode="basebandfs",
        batch_blocks=8,
        verbose=VerboseMode.LOGTOFILE,
        **cfg_kw,
    )
    fdc = FrequencyDomainChannelizer(cfg)
    n_blocks = 32
    n = n_blocks * cfg.inplen
    t = np.arange(n)
    rng = np.random.default_rng(5)
    x = (2e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    for on, off, f in ((4, 14, 0.25), (18, 26, -0.35)):
        m = np.zeros(n)
        m[on * cfg.inplen: off * cfg.inplen] = 1.0
        x += (1.5 * m * np.exp(2j * np.pi * f * t)).astype(np.complex64)
    return fdc, fdc.process(x)


@pytest.mark.parametrize("native", [False, True])
def test_lifecycle_log_files(tmp_path, monkeypatch, native):
    fdc, res = _run_scenario(tmp_path, monkeypatch, native_emission=native)
    seg_events = [e for e in res.events if e.vectorstart is not None]
    pa_events = [e for e in res.events if e.vectorstart is None]
    assert seg_events and pa_events, "scenario must trigger both paths"

    # -- segment-detection log: fixed name, banner, one line per emission --
    seg_log = (tmp_path / "gr-FDC.ActDetChan.ID_0.log").read_text()
    g = fdc.segments[0].geometry
    assert f"decimation factor       {g.decimation}" in seg_log
    assert f"width                   {g.width}" in seg_log
    for ev in seg_events:
        if ev.finalized:
            line = (f"{ev.ID}.fin: start={ev.vectorstart}, "
                    f"stop={ev.vectorend}, blockstart={ev.blockstart}, "
                    f"blockend={ev.blockend}")
        else:
            line = (f"{ev.ID}.part: start={ev.vectorstart}, "
                    f"stop={ev.vectorend}, part={ev.part}, "
                    f"blockstart={ev.blockstart}, blockend={ev.blockend}")
        assert line in seg_log, line

    # -- power-activation log: per-channel file, banner, emission lines ----
    pa_log = (tmp_path / "gr-FDC.PowActChan.0.log").read_text()
    pg = fdc.power_bank.geometry[0]
    assert f"# extract_start: {pg.extract_start}" in pa_log
    assert f"# measure_stop: {pg.measure_stop}" in pa_log
    for ev in pa_events:
        bare = ev.ID.rsplit(".", 1)[0]
        suffix = ".fin" if ev.finalized else f".parted.{ev.part}"
        line = (f"{bare}{suffix}: start={pg.extract_start}, "
                f"stop={pg.extract_stop}, blockstart={ev.blockstart}, "
                f"blockend={ev.blockend}")
        assert line in pa_log, line


def test_vcm_shared_log_file(tmp_path, monkeypatch):
    """The vcm block logs all segments into ONE fixed file
    (reference: lib/activity_detection_channelizer_vcm_impl.cc:88-100,
    177-185)."""
    from fdc_tpu.models.activity_detection import ActivityDetectionChannelizer

    monkeypatch.chdir(tmp_path)
    adc = ActivityDetectionChannelizer(
        blocklen=512,
        segments=[[0.1, 0.4], [0.6, 0.9]],
        thresh_db=8.0,
        relinvovl=4,
        minchandist=0.04,
        verbose=VerboseMode.LOGTOFILE,
    )
    runner = adc.make_runner(maxblocks=256)

    n_blocks = 24
    rng = np.random.default_rng(9)
    spectra = (2e-3 * (
        rng.standard_normal((n_blocks, 512))
        + 1j * rng.standard_normal((n_blocks, 512))
    )).astype(np.complex64)
    spectra[6:16, 130:140] += 1.0  # carrier inside segment 0
    events = runner.process_spectra(spectra)
    assert events

    log = (tmp_path / "gr-FDC.ActDetChan.log").read_text()
    assert "# Segment 0: " in log
    assert "# Segment 1: " in log
    for ev in events:
        if ev.finalized:
            assert f"{ev.ID}.fin: start={ev.vectorstart}" in log
