"""Seeded config fuzzing: random valid configurations must construct and
process a batch without shape errors, and respect basic output invariants."""

import numpy as np
import pytest

from fdc_tpu.config import ChannelizerConfig
from fdc_tpu.models.channelizer import FrequencyDomainChannelizer


def random_config(rng):
    blocksize = int(2 ** rng.integers(7, 12))
    relinvovl = int(2 ** rng.integers(1, 4))
    n_tp = int(rng.integers(0, 4))
    n_pa = int(rng.integers(0, 3))
    n_seg = int(rng.integers(0, 3))

    def rand_chan():
        bw = float(rng.uniform(0.01, 0.08))
        f = float(rng.uniform(-0.5 + bw, 0.5 - bw))
        return (f, bw)

    segs = []
    for _ in range(n_seg):
        a = float(rng.uniform(-0.45, 0.25))
        b = a + float(rng.uniform(0.08, 0.2))
        segs.append((a, min(b, 0.45)))

    minchandist = float(rng.uniform(0.005, 0.05))

    # sometimes partition a random segment (round-5 segment_splits);
    # only when the solved geometry has enough cells for the draw
    splits = []
    if segs and rng.random() < 0.4:
        from fdc_tpu.config import FreqConverter, FreqMode, solve_segment

        idx = int(rng.integers(0, len(segs)))
        n_parts = int(rng.integers(2, 4))
        conv = FreqConverter(FreqMode.basebandfs, 1.0, 0.0)
        g = solve_segment(
            blocksize,
            conv.to_fdc_freq(segs[idx][0]),
            conv.to_fdc_freq(segs[idx][1]),
            conv.to_fdc_bw(minchandist),
        )
        if g.n_cells >= n_parts:
            splits = [(idx, n_parts, int(rng.integers(0, 4)))]

    return ChannelizerConfig(
        blocksize=blocksize,
        relinvovl=relinvovl,
        throughput_channels=[rand_chan() for _ in range(n_tp)],
        activity_controlled_channels=[rand_chan() for _ in range(n_pa)],
        activity_detection_segments=segs,
        act_contr_threshold=float(rng.uniform(3.0, 15.0)),
        act_det_threshold=float(rng.uniform(3.0, 12.0)),
        minchandist=minchandist,
        minchanflankpuffer=float(rng.uniform(0.0, 0.4)),
        freqmode="basebandfs",
        batch_blocks=int(rng.choice([2, 4, 8])),
        max_slots=int(rng.choice([4, 8, 16])),
        max_candidates=int(rng.choice([4, 8])),
        pow_act_maxblocks=int(rng.choice([0, 4, 64])),
        act_det_maxblocks=int(rng.choice([4, 64, 256])),
        segment_splits=splits,
        # randomized output-compaction knobs: full table, a wide-only
        # budget, or two-tier narrow+wide extraction
        **rand_compaction(rng, blocksize),
    )


def rand_compaction(rng, blocksize):
    mode = int(rng.integers(0, 3))
    if mode == 0:
        return {}
    w_cap = min(256, blocksize)
    if mode == 1:
        return dict(max_extract_width=w_cap,
                    extract_budget=int(rng.choice([4, 8])))
    return dict(
        max_extract_width=w_cap,
        extract_budget=int(rng.choice([2, 4])),
        extract_width_split=w_cap // int(rng.choice([2, 4])),
        extract_budget_narrow=int(rng.choice([4, 8])),
    )


@pytest.mark.parametrize("seed", range(20))
def test_random_config_processes(seed):
    rng = np.random.default_rng(seed)
    cfg = random_config(rng)
    if not (cfg.throughput_channels or cfg.activity_controlled_channels
            or cfg.activity_detection_segments):
        cfg = cfg.replace(throughput_channels=[(0.1, 0.05)])
    fdc = FrequencyDomainChannelizer(cfg)

    n = 2 * fdc.batch_samples + int(rng.integers(0, 100))
    t = np.arange(n)
    x = (0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    for f, _ in (list(cfg.throughput_channels)
                 + list(cfg.activity_controlled_channels))[:3]:
        x += np.exp(2j * np.pi * f * t).astype(np.complex64)

    res = fdc.process(x)
    assert res.blocks_processed == 2 * cfg.batch_blocks
    assert len(res.throughput) == len(cfg.throughput_channels)
    for i, y in enumerate(res.throughput):
        g = fdc.throughput.geometry[i]
        assert len(y) == 2 * cfg.batch_blocks * g.out_len
        assert np.all(np.isfinite(y.view(np.float32)))
    for e in res.events:
        assert e.blockend >= e.blockstart
        assert 0.0 <= e.rel_cfreq <= 1.0
        assert np.all(np.isfinite(e.data.view(np.float32)))
    # second call continues the stream without error
    res2 = fdc.process(x[: fdc.batch_samples])
    assert res2.blocks_processed == cfg.batch_blocks


@pytest.mark.parametrize("seed", range(200, 204))
def test_random_config_flush_chunking_invariance(seed):
    """flush() makes finite-capture processing chunking-invariant: any
    split of the same ragged capture yields identical streams and the
    same trimmed block count."""
    rng = np.random.default_rng(seed)
    cfg = random_config(rng)
    if not cfg.throughput_channels:
        cfg = cfg.replace(throughput_channels=[(0.1, 0.05)])
    n = int(1.5 * cfg.batch_blocks * cfg.inplen
            + rng.integers(1, cfg.inplen))
    t = np.arange(n)
    x = (0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    x += np.exp(2j * np.pi * cfg.throughput_channels[0][0] * t
                ).astype(np.complex64)

    def run_chunked(chunks):
        fdc = FrequencyDomainChannelizer(cfg)
        parts = [[] for _ in cfg.throughput_channels]
        blocks = 0
        off = 0
        for c in chunks:
            r = fdc.process(x[off: off + c])
            off += c
            blocks += r.blocks_processed
            for i, s in enumerate(r.throughput):
                parts[i].append(s)
        rf = fdc.flush()
        blocks += rf.blocks_processed
        for i, s in enumerate(rf.throughput):
            parts[i].append(s)
        return blocks, [np.concatenate(p) for p in parts]

    b1, y1 = run_chunked([n])
    cut = int(rng.integers(1, n - 1))
    b2, y2 = run_chunked([cut, n - cut])
    assert b1 == b2 == -(-n // cfg.inplen)
    for a, b in zip(y1, y2):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("seed", range(100, 105))
def test_random_config_sharded_equivalence(seed):
    """Random configs: sharded step must reproduce single-device events and
    streams exactly (the most failure-prone composition in the framework)."""
    from fdc_tpu.parallel.mesh import make_mesh
    from fdc_tpu.parallel.sharded import ShardedChannelizer

    rng = np.random.default_rng(seed)
    cfg = random_config(rng).replace(batch_blocks=8)
    if not (cfg.throughput_channels or cfg.activity_controlled_channels
            or cfg.activity_detection_segments):
        cfg = cfg.replace(activity_detection_segments=[(-0.3, -0.1)])

    n = 3 * cfg.batch_blocks * cfg.inplen
    t = np.arange(n)
    x = (0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    # drive bursts across every configured band
    for f, _ in (list(cfg.throughput_channels)
                 + list(cfg.activity_controlled_channels)):
        on = int(rng.integers(0, 12)) * cfg.inplen
        off = on + int(rng.integers(4, 12)) * cfg.inplen
        m = np.zeros(n)
        m[on:off] = 1.0
        x += (2.0 * m * np.exp(2j * np.pi * f * t)).astype(np.complex64)
    for a, b in cfg.activity_detection_segments:
        f = (a + b) / 2.0
        on = int(rng.integers(0, 12)) * cfg.inplen
        off = on + int(rng.integers(4, 12)) * cfg.inplen
        m = np.zeros(n)
        m[on:off] = 1.0
        x += (2.0 * m * np.exp(2j * np.pi * f * t)).astype(np.complex64)

    ref = FrequencyDomainChannelizer(cfg)
    sh = ShardedChannelizer(cfg, mesh=make_mesh(n_time=2, n_chan=2))
    ra = ref.process(x)
    rb = sh.process(x)
    assert len(ra.events) == len(rb.events)
    for a, b in zip(ra.events, rb.events):
        assert a.ID.split(".", 1)[1] == b.ID.split(".", 1)[1]
        assert a.blockstart == b.blockstart and a.blockend == b.blockend
        np.testing.assert_allclose(a.data, b.data, rtol=3e-4, atol=3e-5)
    for ya, yb in zip(ra.throughput, rb.throughput):
        np.testing.assert_allclose(ya, yb, rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("seed", range(10))
def test_random_config_pipeline_equivalence(seed):
    """Random configs: the MPMD batch pipeline must reproduce the plain
    channelizer exactly — random segment counts, compaction modes, and
    burst placements exercise the stage split (flag-independent
    extraction / scans+plans / slot extraction) across worker devices."""
    import jax

    from fdc_tpu.parallel.pipeline import PipelineChannelizer

    rng = np.random.default_rng(1000 + seed)
    cfg = random_config(rng).replace(batch_blocks=8)
    if not (cfg.throughput_channels or cfg.activity_controlled_channels
            or cfg.activity_detection_segments):
        cfg = cfg.replace(activity_detection_segments=[(-0.3, -0.1)])

    n = 3 * cfg.batch_blocks * cfg.inplen
    t = np.arange(n)
    x = (0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    for f, _ in (list(cfg.throughput_channels)
                 + list(cfg.activity_controlled_channels)):
        on = int(rng.integers(0, 12)) * cfg.inplen
        off = on + int(rng.integers(4, 12)) * cfg.inplen
        m = np.zeros(n)
        m[on:off] = 1.0
        x += (2.0 * m * np.exp(2j * np.pi * f * t)).astype(np.complex64)
    for a, b in cfg.activity_detection_segments:
        f = (a + b) / 2.0
        on = int(rng.integers(0, 12)) * cfg.inplen
        off = on + int(rng.integers(4, 12)) * cfg.inplen
        m = np.zeros(n)
        m[on:off] = 1.0
        x += (2.0 * m * np.exp(2j * np.pi * f * t)).astype(np.complex64)

    ref = FrequencyDomainChannelizer(cfg)
    nd = int(rng.choice([2, 3, 4]))
    pipe = PipelineChannelizer(
        cfg, devices=jax.devices()[:nd],
        dedicated_owner=bool(rng.integers(0, 2)) and nd > 1,
    )
    ra = ref.process(x)
    ra.events.extend(ref.flush().events)
    rb = pipe.process(x)
    rb.events.extend(pipe.flush().events)
    assert len(ra.events) == len(rb.events)
    for a, b in zip(ra.events, rb.events):
        assert a.ID.split(".", 1)[1] == b.ID.split(".", 1)[1]
        assert a.blockstart == b.blockstart and a.blockend == b.blockend
        np.testing.assert_allclose(a.data, b.data, rtol=3e-4, atol=3e-5)
    for ya, yb in zip(ra.throughput, rb.throughput):
        np.testing.assert_allclose(ya, yb, rtol=3e-4, atol=3e-5)
