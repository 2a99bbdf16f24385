"""Verify flow 1: single-carrier extraction on the real TPU chip."""
import numpy as np
import jax

from fdc_tpu.config import ChannelizerConfig
from fdc_tpu.models.channelizer import FrequencyDomainChannelizer

print("devices:", jax.devices())

f0 = -0.2001953125  # exact bin for blocksize 4096
cfg = ChannelizerConfig(
    blocksize=4096,
    relinvovl=4,
    throughput_channels=[(f0, 0.02)],
    freqmode="basebandfs",
    batch_blocks=8,
)
fdc = FrequencyDomainChannelizer(cfg)

rng = np.random.default_rng(3)
n = 2 * fdc.batch_samples
t = np.arange(n)
x = (np.exp(2j * np.pi * f0 * t)
     + 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
     ).astype(np.complex64)

r1 = fdc.process(x[: n // 2])
r2 = fdc.process(x[n // 2:])
y = np.concatenate([r1.throughput[0], r2.throughput[0]])

g = fdc.throughput.geometry[0]
dec = cfg.blocksize // g.width
td = np.arange(len(y), dtype=np.float64) * dec
# channel center bin offset: tone appears at (f0*blocksize - center)/width... fit directly
# expected decimated tone: exp(2j pi f0 t) at original rate, output = subband at full scale
ref_full = np.exp(2j * np.pi * f0 * td)
# the extraction re-centers the subband; fit a single complex gain + freq offset
# by measuring instantaneous frequency of y
ph = np.unwrap(np.angle(y[200:]))
f_est = np.polyfit(np.arange(len(ph)), ph, 1)[0] / (2 * np.pi)
amp = np.abs(y[200:]).mean()
# SNR: project onto best-fit tone
tone = np.exp(1j * (np.polyval(np.polyfit(np.arange(len(ph)), ph, 1), np.arange(len(ph)))))
resid = y[200:] / amp - tone
snr_db = -10 * np.log10(np.mean(np.abs(resid) ** 2) + 1e-30)
print(f"width={g.width} dec={dec} amp={amp:.4f} f_est={f_est:.6f} snr={snr_db:.1f} dB")
assert abs(amp - 1.0) < 0.05, amp
assert snr_db > 25.0, snr_db
print("TPU single-carrier extraction OK")
