"""Channelization modes as functional models over batched FFT blocks."""

from fdc_tpu.models.throughput import ThroughputChannelizer
from fdc_tpu.models.power_activation import PowerActivationBank
from fdc_tpu.models.segment_detection import SegmentDetector
from fdc_tpu.models.activity_detection import ActivityDetectionChannelizer

__all__ = [
    "ThroughputChannelizer",
    "PowerActivationBank",
    "SegmentDetector",
    "ActivityDetectionChannelizer",
]
