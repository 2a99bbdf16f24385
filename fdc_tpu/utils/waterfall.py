"""Waterfall rendering with detection-message overlays.

Headless rebuild of WaterfallMsgTagging (reference:
python/WaterfallMsgTagging.py): consumes per-block power spectra and
ChannelEvents, renders a scrolling waterfall image with rectangles framing
each emitted channel burst. The reference is a PyQt4 widget updated from a
QTimer; here the renderer is a pure host-side accumulator that yields RGB
arrays (and optional PNG files via matplotlib if available) — the
observability parity without a Qt dependency.

Pipeline per the reference:
- each power-spectrum block is rescaled to a fixed pixel width by
  mean-reduction (blocklen > width) or Kronecker interpolation
  (reference: python/WaterfallMsgTagging.py:247-256),
- rows are time-decimated by ``blockdecimation`` via mean
  (reference: python/WaterfallMsgTagging.py:153-170),
- power is mapped to color through a dB-binned colorscheme
  (reference: python/WaterfallMsgTagging.py:276-312),
- events are mapped from (blockstart, blockend, rel_cfreq, rel_bw) metadata
  to pixel rectangles (reference: python/WaterfallMsgTagging.py:85-110).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np

from fdc_tpu.utils.events import ChannelEvent

__all__ = ["Waterfall", "COLOR_SCHEMES"]

COLOR_SCHEMES = ("red", "green", "blue", "rainbow")


def _colormap(scheme: str, n_bins: int) -> np.ndarray:
    """[n_bins, 3] uint8 colors, dark -> bright (reference colorschemes,
    python/WaterfallMsgTagging.py:276-312)."""
    t = np.linspace(0.0, 1.0, n_bins)
    if scheme == "red":
        rgb = np.stack([t, t * 0.25, t * 0.25], axis=1)
    elif scheme == "green":
        rgb = np.stack([t * 0.25, t, t * 0.25], axis=1)
    elif scheme == "blue":
        rgb = np.stack([t * 0.25, t * 0.25, t], axis=1)
    elif scheme == "rainbow":
        # blue -> cyan -> green -> yellow -> red
        r = np.clip(2.0 * t - 1.0, 0.0, 1.0)
        g = 1.0 - np.abs(2.0 * t - 1.0) * 0.8
        b = np.clip(1.0 - 2.0 * t, 0.0, 1.0)
        rgb = np.stack([r, g, b], axis=1)
    else:
        raise ValueError(f"unknown colorscheme {scheme!r}")
    return (rgb * 255.0).astype(np.uint8)


@dataclass
class _Rect:
    row_start: int  # global decimated-row index
    row_end: int
    col_left: int
    col_right: int
    finalized: bool
    ID: str


class Waterfall:
    """Scrolling waterfall accumulator with event overlays.

    Args:
      blocklen: FFT size of incoming power spectra.
      width: image width in pixels (reference fixed 1024).
      height: rows kept in the scrolling image.
      blockdecimation: time decimation (mean over this many blocks per row).
      db_range: (min_dB, max_dB) color binning range relative to full scale.
      colorscheme: one of COLOR_SCHEMES.
    """

    TAGMODES = ("none", "id", "part")

    def __init__(
        self,
        blocklen: int,
        width: int = 1024,
        height: int = 512,
        blockdecimation: int = 1,
        db_range=(-100.0, 0.0),
        colorscheme: str = "rainbow",
        n_bins: int = 256,
        tagmode: str = "none",
    ):
        if blockdecimation < 1:
            raise ValueError("blockdecimation must be >= 1")
        if tagmode not in self.TAGMODES:
            raise ValueError(f"tagmode must be one of {self.TAGMODES}")
        # the reference declares this enum but never renders it
        # (grc/FDC_WaterfallMsgTagging.xml:96-116); here it feeds labels()
        self.tagmode = tagmode
        self.blocklen = blocklen
        self.width = width
        self.height = height
        self.blockdecimation = blockdecimation
        self.db_lo, self.db_hi = float(db_range[0]), float(db_range[1])
        self.cmap = _colormap(colorscheme, n_bins)
        self.n_bins = n_bins

        # dB rows, initialized at the color floor (empty history renders dark)
        self._rows = np.full((height, width), self.db_lo, np.float32)
        self._pending: List[np.ndarray] = []  # undecimated px rows
        self._nrows = 0  # total decimated rows produced (global row index)
        self._rects: List[_Rect] = []
        self._block_index = 0  # global block index of next spectrum

    # -- feeding ---------------------------------------------------------------

    def _rescale(self, p: np.ndarray) -> np.ndarray:
        """blocklen -> width via mean-reduction or Kron interpolation
        (reference: python/WaterfallMsgTagging.py:247-256)."""
        n, w = self.blocklen, self.width
        if n == w:
            return p.astype(np.float32)
        if n > w:
            if n % w:
                # pad to a multiple, averaging what exists
                pad = (-n) % w
                p = np.concatenate([p, np.repeat(p[-1:], pad)])
            return p.reshape(w, -1).mean(axis=1).astype(np.float32)
        reps = int(np.ceil(w / n))
        return np.kron(p, np.ones(reps, np.float32))[:w]

    def feed_power(self, power_blocks: np.ndarray):
        """Append [B, blocklen] linear power spectra (one row per block)."""
        power_blocks = np.atleast_2d(np.asarray(power_blocks))
        for p in power_blocks:
            self._pending.append(self._rescale(p))
            self._block_index += 1
            if len(self._pending) >= self.blockdecimation:
                row = np.mean(self._pending[: self.blockdecimation], axis=0)
                self._pending = self._pending[self.blockdecimation:]
                db = 10.0 * np.log10(np.maximum(row, 1e-30))
                self._rows = np.roll(self._rows, -1, axis=0)
                self._rows[-1] = db
                self._nrows += 1

    def feed_events(self, events: Sequence[ChannelEvent]):
        """Register detection events as overlay rectangles
        (reference: python/WaterfallMsgTagging.py:85-110)."""
        for e in events:
            left = int(round((e.rel_cfreq - e.rel_bw / 2.0) * self.width))
            right = int(round((e.rel_cfreq + e.rel_bw / 2.0) * self.width))
            label = ""
            if self.tagmode == "id":
                label = e.ID
            elif self.tagmode == "part":
                label = (
                    f"{e.ID} fin" if e.finalized else f"{e.ID} part {e.part}"
                )
            self._rects.append(
                _Rect(
                    row_start=e.blockstart // self.blockdecimation,
                    row_end=e.blockend // self.blockdecimation,
                    col_left=np.clip(left, 0, self.width - 1),
                    col_right=np.clip(right, 0, self.width - 1),
                    finalized=e.finalized,
                    ID=label or e.ID,
                )
            )
        # drop rects scrolled fully out of view
        lo = self._nrows - self.height
        self._rects = [r for r in self._rects if r.row_end >= lo]

    def labels(self):
        """Visible (row, col, text) anchors for the current tagmode — the
        hook a GUI embedder uses to draw event labels next to the overlay
        rectangles. Empty when tagmode='none'."""
        if self.tagmode == "none":
            return []
        base = self._nrows - self.height
        out = []
        for r in self._rects:
            top = r.row_start - base
            if 0 <= top < self.height:
                out.append((int(top), int(r.col_left), r.ID))
        return out

    # -- rendering -------------------------------------------------------------

    def render(self, overlay: bool = True) -> np.ndarray:
        """[height, width, 3] uint8 image, newest row at the bottom."""
        span = self.db_hi - self.db_lo
        idx = (self._rows - self.db_lo) / span * (self.n_bins - 1)
        idx = np.clip(idx.astype(np.int32), 0, self.n_bins - 1)
        img = self.cmap[idx]
        if overlay:
            img = img.copy()
            white = np.array([255, 255, 255], np.uint8)
            base = self._nrows - self.height  # global row of img row 0
            for r in self._rects:
                top = r.row_start - base
                bot = r.row_end - base
                if bot < 0 or top >= self.height:
                    continue
                t = int(np.clip(top, 0, self.height - 1))
                b = int(np.clip(bot, 0, self.height - 1))
                img[t, r.col_left: r.col_right + 1] = white
                img[b, r.col_left: r.col_right + 1] = white
                img[t: b + 1, r.col_left] = white
                img[t: b + 1, r.col_right] = white
        return img

    def save_png(self, path: str, overlay: bool = True) -> bool:
        """Write the current image as PNG (matplotlib backend; returns False
        if matplotlib is unavailable — rendering stays accessible via
        ``render``)."""
        img = self.render(overlay)
        try:
            import matplotlib

            matplotlib.use("Agg", force=True)
            import matplotlib.pyplot as plt

            plt.imsave(path, img)
            return True
        except Exception:
            return False
