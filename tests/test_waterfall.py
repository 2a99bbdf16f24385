"""Waterfall renderer: rescale, decimation, color binning, event overlays."""

import numpy as np
import pytest

from fdc_tpu.utils.events import ChannelEvent
from fdc_tpu.utils.waterfall import COLOR_SCHEMES, Waterfall


def make_event(blockstart, blockend, cfreq, bw, fin=True):
    return ChannelEvent(
        ID="t.DETECTED.0.0",
        finalized=fin,
        part=None,
        rel_cfreq=cfreq,
        rel_bw=bw,
        blockstart=blockstart,
        blockend=blockend,
    )


def test_rescale_mean_reduction():
    wf = Waterfall(blocklen=2048, width=1024, height=8)
    p = np.zeros(2048)
    p[0] = 2.0
    p[1] = 4.0
    row = wf._rescale(p)
    assert row.shape == (1024,)
    assert row[0] == pytest.approx(3.0)
    assert row[1] == 0.0


def test_rescale_kron_interpolation():
    wf = Waterfall(blocklen=256, width=1024, height=8)
    p = np.arange(256, dtype=np.float32)
    row = wf._rescale(p)
    assert row.shape == (1024,)
    assert np.all(row[:4] == 0.0)
    assert np.all(row[4:8] == 1.0)


def test_feed_and_decimate():
    wf = Waterfall(blocklen=64, width=64, height=4, blockdecimation=2)
    wf.feed_power(np.full((5, 64), 1.0))  # 5 blocks -> 2 rows, 1 pending
    assert wf._nrows == 2
    assert len(wf._pending) == 1
    # constant power 1.0 == 0 dB == the top digitize bin with (-100, 0)
    img = wf.render(overlay=False)
    assert img.shape == (4, 64, 3)
    np.testing.assert_array_equal(img[-1], np.broadcast_to(wf.cmap[-1], (64, 3)))
    # older (unfed) rows sit at the bottom dB bin
    np.testing.assert_array_equal(img[0], np.broadcast_to(wf.cmap[0], (64, 3)))


def test_event_overlay_rect():
    wf = Waterfall(blocklen=128, width=128, height=16)
    wf.feed_power(np.full((16, 128), 1e-5))
    wf.feed_events([make_event(4, 8, cfreq=0.5, bw=0.25)])
    img = wf.render()
    white = np.array([255, 255, 255], np.uint8)
    left = round((0.5 - 0.125) * 128)
    right = round((0.5 + 0.125) * 128)
    np.testing.assert_array_equal(img[4, left], white)
    np.testing.assert_array_equal(img[8, right], white)
    np.testing.assert_array_equal(img[6, left], white)  # vertical edge
    assert not np.array_equal(img[6, left + 2], white)  # interior untouched


def test_scrolling_drops_old_rects():
    wf = Waterfall(blocklen=32, width=32, height=4)
    wf.feed_events([make_event(0, 1, 0.5, 0.2)])
    assert len(wf._rects) == 1
    wf.feed_power(np.full((10, 32), 1.0))
    wf.feed_events([])  # triggers pruning
    assert len(wf._rects) == 0


@pytest.mark.parametrize("scheme", list(COLOR_SCHEMES) + [0, 1, 2, 3])
def test_colorschemes(scheme):
    wf = Waterfall(blocklen=8, width=8, height=2, colorscheme=scheme)
    assert wf.cmap.shape == (1024, 3)  # reference N=1024
    assert wf.cmap.dtype == np.uint8
    # every scheme starts black and ends at its brightest color
    assert int(wf.cmap[0].sum()) == 0
    assert int(wf.cmap[-1].sum()) > 500


def test_colorscheme_exact_reference_values():
    """Pin the four ramps + frame colors to the reference construction
    (python/WaterfallMsgTagging.py:276-312)."""
    from fdc_tpu.utils.waterfall import cr_colorscheme

    # 0 Black-Blue-Cyan-White: R==0 ramp into cyan then white
    cols, bins, frame = cr_colorscheme(0, -100.0, 0.0, loginput=False)
    np.testing.assert_array_equal(cols[511], [0, 0, 255])   # pure blue->cyan edge
    np.testing.assert_array_equal(cols[-1], [0, 255, 255])  # cyan at top
    np.testing.assert_array_equal(frame, [255, 255, 255])
    assert len(bins) == 1023
    assert bins[-1] == pytest.approx(1.0)  # 0 dB -> linear (loginput False)

    # 1 Black-Rainbow: violet knee at the quarter boundary, red at top
    cols, _, frame = cr_colorscheme(1, -100.0, 0.0, False)
    np.testing.assert_array_equal(cols[255], [75, 0, 130])
    np.testing.assert_array_equal(cols[-1], [255, 255, 0])
    np.testing.assert_array_equal(frame, [255, 255, 255])

    # 2 Black-Red-Yellow
    cols, _, _ = cr_colorscheme(2, -100.0, 0.0, False)
    np.testing.assert_array_equal(cols[511], [255, 0, 0])
    np.testing.assert_array_equal(cols[-1], [255, 255, 0])

    # 3 Black-White: gray ramp with the GREEN frame
    cols, bins, frame = cr_colorscheme(3, -100.0, 0.0, True)
    np.testing.assert_array_equal(cols[-1], [255, 255, 255])
    assert cols[500][0] == cols[500][1] == cols[500][2]
    np.testing.assert_array_equal(frame, [0, 255, 0])
    assert bins[-1] == pytest.approx(0.0)  # loginput True: edges stay in dB


def test_tagmode_draws_label_into_image():
    wf = Waterfall(blocklen=64, width=64, height=32, tagmode="id")
    wf.feed_power(np.full((32, 64), 1e-9))
    wf.feed_events([make_event(4, 12, cfreq=0.3, bw=0.2)])
    img = wf.render()
    base = wf.render(overlay=False)
    right = wf._rects[0].col_right
    # glyph pixels appear in the frame color right of the rectangle
    region = img[4:14, right + 1:]
    assert np.any(np.all(region == wf.frame, axis=-1))
    assert not np.array_equal(img, base)


def test_ansi_rendering():
    wf = Waterfall(blocklen=64, width=64, height=16)
    wf.feed_power(np.full((16, 64), 1.0))
    s = wf.to_ansi(rows=6, cols=10)
    lines = s.split("\n")
    assert len(lines) == 6
    assert lines[0].count("\x1b[48;2;") == 10
    assert lines[0].endswith("\x1b[0m")


def test_live_waterfall_follower(tmp_path):
    """Timer-paced follower: throttles to the interval, emits PNG + ANSI +
    callback frames (the reference's QTimer/min_redraw_time loop,
    python/WaterfallMsgTagging.py:69-83)."""
    import io

    from fdc_tpu.utils.waterfall import LiveWaterfall

    wf = Waterfall(blocklen=32, width=32, height=8)
    stream = io.StringIO()
    frames = []
    png = tmp_path / "live.png"
    live = LiveWaterfall(wf, interval=0.2, png_path=str(png),
                         stream=stream, on_frame=frames.append,
                         ansi_rows=4, ansi_cols=8)
    p = np.full((1, 32), 1.0)
    assert live.update(p, now=10.0)        # first call draws
    assert not live.update(p, now=10.1)    # throttled
    assert live.update(p, now=10.25)       # interval elapsed
    assert live.update(p, force=True, now=10.26)
    assert live.frames == 3
    assert len(frames) == 3
    assert frames[0].shape == (8, 32, 3)
    assert "\x1b[48;2;" in stream.getvalue()
    if png.exists():
        assert png.stat().st_size > 0


def test_png_export(tmp_path):
    wf = Waterfall(blocklen=32, width=32, height=4)
    wf.feed_power(np.random.default_rng(0).random((4, 32)))
    ok = wf.save_png(str(tmp_path / "wf.png"))
    if ok:
        assert (tmp_path / "wf.png").stat().st_size > 0


def test_tagmode_labels():
    wf = Waterfall(blocklen=64, width=64, height=16, tagmode="part")
    wf.feed_power(np.full((16, 64), 1e-5))
    wf.feed_events([make_event(4, 8, 0.5, 0.25, fin=False)])
    wf.feed_events([make_event(10, 12, 0.3, 0.1, fin=True)])
    labels = wf.labels()
    assert len(labels) == 2
    assert any("part" in text for _, _, text in labels)
    assert any(text.endswith("fin") for _, _, text in labels)
    with pytest.raises(ValueError):
        Waterfall(blocklen=64, tagmode="bogus")
    assert Waterfall(blocklen=64, tagmode="none").labels() == []


def test_feed_power_batched_equals_per_row():
    """The vectorized feed path must render identically to feeding the
    same blocks one at a time (including pending-window carry-over)."""
    from fdc_tpu.utils.waterfall import Waterfall as WF

    rng = np.random.default_rng(3)
    blocks = rng.random((23, 64)).astype(np.float32)
    a = WF(blocklen=64, width=32, height=6, blockdecimation=3)
    b = WF(blocklen=64, width=32, height=6, blockdecimation=3)
    a.feed_power(blocks)
    for row in blocks:
        b.feed_power(row)
    assert a._nrows == b._nrows
    assert len(a._pending) == len(b._pending)
    np.testing.assert_allclose(a._rows, b._rows, rtol=1e-6)
    # split feeds mid-decimation-window too
    c = WF(blocklen=64, width=32, height=6, blockdecimation=3)
    c.feed_power(blocks[:7])
    c.feed_power(blocks[7:8])
    c.feed_power(blocks[8:])
    np.testing.assert_allclose(a._rows, c._rows, rtol=1e-6)
    assert c._block_index == a._block_index == 23


def test_feed_rows_predecimated():
    """feed_rows appends image rows directly; event rects keep mapping
    through blockdecimation."""
    wf = Waterfall(blocklen=128, width=64, height=8, blockdecimation=4)
    rows = np.random.default_rng(0).random((3, 128)).astype(np.float32)
    wf.feed_rows(rows)  # rescaled 128 -> 64
    assert wf._nrows == 3
    assert wf._block_index == 12
    np.testing.assert_allclose(
        wf._rows[-1], wf._rescale(rows[-1]), rtol=1e-6
    )
    # more rows than height: keeps the newest
    tall = np.arange(20, dtype=np.float32)[:, None] * np.ones(
        (20, 64), np.float32
    )
    wf2 = Waterfall(blocklen=64, width=64, height=8)
    wf2.feed_rows(tall)
    assert wf2._nrows == 20
    np.testing.assert_array_equal(wf2._rows[:, 0], np.arange(12, 20))


def test_decimating_power_history_exact_means():
    """Full windows are exact means over dec blocks; the tail row is the
    exact mean of its own count; doubling preserves both."""
    from fdc_tpu.utils.waterfall import DecimatingPowerHistory

    rng = np.random.default_rng(7)
    blocks = rng.random((41, 16)).astype(np.float32)
    h = DecimatingPowerHistory(max_rows=4)  # forces several doublings
    # ragged feed pattern
    for sl in (blocks[:1], blocks[1:6], blocks[6:30], blocks[30:]):
        h.add(sl)
    assert h.n_blocks == 41
    d = h.dec
    rows = h.rows()
    n_full = 41 // d
    expect_full = blocks[: n_full * d].reshape(n_full, d, 16).mean(axis=1)
    np.testing.assert_allclose(rows[:n_full], expect_full, rtol=1e-6)
    if 41 % d:
        np.testing.assert_allclose(
            rows[-1], blocks[n_full * d:].mean(axis=0), rtol=1e-6
        )
        assert len(rows) == n_full + 1
    assert len(h._sums) <= 2 * h.max_rows


def test_decimating_power_history_no_doubling():
    from fdc_tpu.utils.waterfall import DecimatingPowerHistory

    h = DecimatingPowerHistory(max_rows=64)
    blocks = np.ones((10, 8), np.float32)
    h.add(blocks)
    assert h.dec == 1
    assert h.rows().shape == (10, 8)
    np.testing.assert_allclose(h.rows(), blocks)


def test_runtime_style_setters_preserve_rows():
    """Live set_minvaldb/set_maxvaldb/set_colorscheme restyle WITHOUT
    dropping accumulated rows (reference callbacks:
    python/WaterfallMsgTagging.py:263-274)."""
    wf = Waterfall(blocklen=32, width=32, height=8, db_range=(-100.0, 0.0))
    rng = np.random.default_rng(7)
    power = rng.uniform(1e-8, 1.0, size=(8, 32)).astype(np.float32)
    wf.feed_power(power)
    rows_before = wf._rows.copy()
    img0 = wf.render(overlay=False)

    # narrowing the dB window changes the binning of the SAME raw rows
    wf.set_minvaldb(-40.0)
    assert wf.db_lo == -40.0
    np.testing.assert_array_equal(wf._rows, rows_before)
    img1 = wf.render(overlay=False)
    assert img1.shape == img0.shape
    assert not np.array_equal(img0, img1)

    wf.set_maxvaldb(-10.0)
    assert wf.db_hi == -10.0
    np.testing.assert_array_equal(wf._rows, rows_before)
    img2 = wf.render(overlay=False)
    assert not np.array_equal(img1, img2)

    # identical style via a fresh instance fed the same rows == restyled
    ref = Waterfall(blocklen=32, width=32, height=8, db_range=(-40.0, -10.0))
    ref.feed_power(power)
    np.testing.assert_array_equal(img2, ref.render(overlay=False))

    # colorscheme swap (name or index), rows still intact
    wf.set_colorscheme("black-red-yellow")
    np.testing.assert_array_equal(wf._rows, rows_before)
    img3 = wf.render(overlay=False)
    assert not np.array_equal(img2, img3)
    # name and index must resolve to the same LUT
    ref2 = Waterfall(blocklen=32, width=32, height=8,
                     db_range=(-40.0, -10.0), colorscheme=2)
    np.testing.assert_array_equal(wf.cmap, ref2.cmap)

    # bad scheme fails eagerly and leaves the style untouched
    import pytest as _pytest
    with _pytest.raises((KeyError, ValueError, IndexError)):
        wf.set_colorscheme("no_such_scheme")
    np.testing.assert_array_equal(wf.render(overlay=False), img3)
