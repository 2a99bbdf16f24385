"""On-chip verification of segment splitting (config.segment_splits):
event parity of a split detection segment vs the unsplit segment on the
REAL TPU (the Pallas lifecycle kernel path + cut reconciliation), with
one carrier exactly on a cut rising mid-batch (the double-spawn race)
and one steady mid-core carrier.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_split_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    print("devices:", jax.devices(), file=sys.stderr)

    from fdc_tpu.config import ChannelizerConfig
    from fdc_tpu.models.channelizer import FrequencyDomainChannelizer

    def mk(splits=()):
        return ChannelizerConfig(
            blocksize=512, relinvovl=4,
            activity_detection_segments=[(0.1, 0.9)],
            act_det_threshold=8.0, minchandist=0.03,
            act_det_deactivation_delay=1, minchanflankpuffer=0.1,
            batch_blocks=8, max_slots=8, segment_splits=splits,
        )

    def events(cfg, x):
        fdc = FrequencyDomainChannelizer(cfg)
        res = fdc.process(x)
        ev = list(res.events)
        ev.extend(fdc.flush(finalize=True).events)
        return ev

    def sig(evs):
        return sorted(
            (e.blockstart, e.blockend, round(e.rel_cfreq, 6),
             round(e.rel_bw, 6), bool(e.finalized),
             round(float(np.abs(e.data).sum()), 1))
            for e in evs if e.finalized
        )

    cfg_u, cfg_s = mk(), mk(splits=[(0, 4, 2)])
    parts = FrequencyDomainChannelizer(cfg_s).segments
    cut = parts[0].core_bins[1]
    lo2, hi2 = parts[2].core_bins
    rng = np.random.default_rng(3)
    n = 40 * cfg_u.inplen
    t = np.arange(n)
    x = 0.004 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    m = np.zeros(n)
    m[11 * cfg_u.inplen: 20 * cfg_u.inplen] = 1.0  # mid-batch rise AT the cut
    x = x + 2.0 * m * np.exp(
        2j * np.pi * (cut / cfg_u.blocksize - 0.5) * t
    )
    m2 = np.zeros(n)
    m2[6 * cfg_u.inplen: 30 * cfg_u.inplen] = 1.0
    x = x + 2.0 * m2 * np.exp(
        2j * np.pi * (((lo2 + hi2) // 2) / cfg_u.blocksize - 0.5) * t
    )
    x = x.astype(np.complex64)

    su, ss = sig(events(cfg_u, x)), sig(events(cfg_s, x))
    print("unsplit:", su)
    print("split:  ", ss)
    assert su == ss and len(su) >= 2, (su, ss)
    print("TPU split-segment parity OK")


if __name__ == "__main__":
    main()
