"""Channelization modes as functional models over batched FFT blocks."""

from fdc_tpu.models.throughput import ThroughputChannelizer

__all__ = [
    "ThroughputChannelizer",
]
