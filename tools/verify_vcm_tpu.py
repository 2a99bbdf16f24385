#!/usr/bin/env python
"""vcm runner on the real chip vs the golden replay (zero_floor, 1/dec,
blockcount-from-1, inline partials all exercised on TPU hardware)."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from fdc_tpu.models.activity_detection import ActivityDetectionChannelizer
from golden import golden_activity_detection_vcm

print("devices:", jax.devices())
blocklen, r = 512, 4
segments = [[0.05, 0.45], [0.55, 0.95]]
rng = np.random.default_rng(2)
nb = 40
spectra = (0.005 * (rng.standard_normal((nb, blocklen))
                    + 1j * rng.standard_normal((nb, blocklen)))
           ).astype(np.complex64)
spectra[6:16, 120:130] += 1.0    # carrier in segment 0
spectra[10:24, 390:404] += 0.9   # carrier in segment 1
# an exactly-zero region to exercise the FLT_MIN zero-ratio path on TPU
spectra[28:34, 60:200] = 0.0
spectra[30:33, 140:150] = 2.0    # carrier inside the zero region

adc = ActivityDetectionChannelizer(
    blocklen=blocklen, segments=segments, thresh_db=8.0, relinvovl=r,
    minchandist=0.04, channel_deactivation_delay=1,
    window_flank_puffer=0.2, max_slots=8,
)
runner = adc.make_runner(maxblocks=5)
events = []
for lo in range(0, nb, 8):
    events.extend(runner.process_spectra(spectra[lo:lo+8]))

ref = golden_activity_detection_vcm(
    spectra.astype(np.complex128), blocklen, r, segments, 8.0, 0.04,
    0.2, 5, 1)
print(f"events: {len(events)} vs golden {len(ref)}")
assert len(events) == len(ref), (len(events), len(ref))
for sid in range(2):
    ours = [e for e in events if f".DETECTED.{sid}." in e.ID]
    gold = [g for g in ref if g["seg_id"] == sid]
    assert len(ours) == len(gold)
    for ev, g in zip(ours, gold):
        assert ev.finalized == g["finalized"]
        assert ev.blockstart == g["blockstart"], (ev.blockstart, g["blockstart"])
        assert ev.blockend == g["blockend"]
        assert ev.vectorstart == g["vectorstart"]
        assert ev.data.shape == g["data"].shape
        np.testing.assert_allclose(ev.data, g["data"], atol=2e-3)
print("vcm-on-TPU golden parity OK (incl. exact-zero region)")
