"""Compute primitives: windows, framing, FFTs, extraction, detection."""

from fdc_tpu.ops.windows import (
    window_bank,
    flank_window_bank,
    sine_flank_window_bank,
    base_window,
)
from fdc_tpu.ops.framing import frame_blocks
from fdc_tpu.ops.fft import forward_spectrum, subband_ifft, comb_subband_ifft

__all__ = [
    "window_bank",
    "flank_window_bank",
    "sine_flank_window_bank",
    "base_window",
    "frame_blocks",
    "forward_spectrum",
    "subband_ifft",
    "comb_subband_ifft",
]
