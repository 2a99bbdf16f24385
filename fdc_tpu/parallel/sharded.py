"""Multi-device channelizer: the full step as one shard_map over (time, chan).

Distribution design (BASELINE.json north star; no reference analog — the
reference is single-process, reference: SURVEY.md §2.4):

- **time axis**: the batch of B FFT blocks is split into T consecutive runs.
  Each shard frames/FFTs/extracts its own blocks. The two pieces of
  cross-block state — the overlap-save sample history and the previous
  block's spectrum (burst reach-back row) — are handed to the right
  neighbor with one :func:`jax.lax.ppermute` each, the ring-style boundary
  exchange of the reference's ``hist`` members
  (reference: lib/overlap_save_impl.cc:70-78, lib/SegmentDetection_impl.cc:585-590).

- **chan axis**: throughput/burst channel rows and detection slots are
  sharded; each rank extracts only its rows (the model-parallel analog of
  the reference's per-channel std::threads,
  reference: lib/SegmentDetection_impl.cc:367-397).

- **detection state machines stay replicated**: the per-block decimated
  power matrices are tiny ([B, n_cells] / [B, C]), so they are all-gathered
  over the time axis and every device runs the identical lax.scan. This
  keeps burst/channel lifecycle semantics EXACTLY equal to the single-chip
  path — a burst spanning two time shards is one channel, not two — while
  the heavy windowed-IFFT extraction runs fully sharded.

The public class :class:`ShardedChannelizer` is a drop-in
FrequencyDomainChannelizer whose jitted step is the shard_map; outputs and
host emission behavior are bit-identical (same dtype path) to the
single-device model.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from fdc_tpu.config import ChannelizerConfig
from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
from fdc_tpu.models.segment_detection import scan_slots_multi
from fdc_tpu.models.power_activation import _FLOAT_MIN as _PA_FLOAT_MIN
from fdc_tpu.ops.extract import (
    apply_phase_pairs,
    extract_bucket,
    extract_bucket_measured,
    extract_bucket_phased,
)
from fdc_tpu.ops.fft import forward_spectrum
from fdc_tpu.ops.framing import frame_blocks
from fdc_tpu.parallel.mesh import CHAN_AXIS, TIME_AXIS
from fdc_tpu.utils.cplx import c2f, f2c

__all__ = ["ShardedChannelizer"]


def _pad_rows(a: np.ndarray, multiple: int) -> np.ndarray:
    """Zero-pad axis 0 to a multiple (padded channel rows extract zeros)."""
    c = a.shape[0]
    pad = (-c) % multiple
    if pad == 0:
        return a
    return np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])


def _from_last_time_shard(x, tidx, n_time):
    """Replicate the last time shard's value to all shards (tiny payloads:
    the ovllen-sample history tail and one spectrum row)."""
    if n_time == 1:
        return x  # degenerate axis: skip the dead psum
    sel = (tidx == n_time - 1).astype(x.dtype)
    return jax.lax.psum(x * sel, TIME_AXIS)


def _gather_time(x, n_time):
    """all_gather over the time axis (replicated detection statistics);
    identity when the axis is degenerate."""
    if n_time == 1:
        return x
    return jax.lax.all_gather(x, TIME_AXIS, axis=0, tiled=True)


def _shift_right(x, n_time):
    """Neighbor handoff: shard t receives shard t-1's value (shard 0: zeros)."""
    if n_time == 1:
        return jnp.zeros_like(x)
    perm = [(i, i + 1) for i in range(n_time - 1)]
    return jax.lax.ppermute(x, TIME_AXIS, perm)


def _bcast_chan(tree, n_chan):
    """Replicate a pytree whose values are zero on all but one chan rank
    (one psum per leaf; bool leaves round-trip through int32)."""
    if n_chan == 1:
        return tree

    def one(x):
        if x.dtype == jnp.bool_:
            return jax.lax.psum(
                x.astype(jnp.int32), CHAN_AXIS
            ).astype(jnp.bool_)
        return jax.lax.psum(x, CHAN_AXIS)

    return jax.tree.map(one, tree)


class ShardedChannelizer(FrequencyDomainChannelizer):
    """FrequencyDomainChannelizer running one shard_map step over a mesh.

    Usage::

        mesh = make_mesh(n_time=4, n_chan=2)
        fdc = ShardedChannelizer(config, mesh=mesh)
        result = fdc.process(samples)   # same API/results as single-device

    Requirements: ``config.batch_blocks % n_time == 0``. Channel rows and
    detection slots are zero-padded to multiples of n_chan internally.
    """

    def __init__(self, config: Optional[ChannelizerConfig] = None,
                 mesh: Mesh = None, **kwargs):
        if mesh is None:
            raise ValueError("ShardedChannelizer requires a mesh")
        if set(mesh.axis_names) != {TIME_AXIS, CHAN_AXIS}:
            raise ValueError(
                f"mesh must have axes ({TIME_AXIS!r}, {CHAN_AXIS!r}), "
                f"got {mesh.axis_names}"
            )
        self.mesh = mesh
        self.n_time = mesh.shape[TIME_AXIS]
        self.n_chan = mesh.shape[CHAN_AXIS]

        if config is None:
            config = ChannelizerConfig(**kwargs)
            kwargs = {}
        if kwargs:
            config = config.replace(**kwargs)
        if config.batch_blocks % self.n_time:
            raise ValueError(
                f"batch_blocks={config.batch_blocks} must be divisible by "
                f"the time axis size {self.n_time}"
            )
        # round the slot table up so detection slots shard evenly
        if config.max_slots % self.n_chan:
            config = config.replace(
                max_slots=config.max_slots
                + (-config.max_slots) % self.n_chan
            )
        # ... and the extraction budgets (each chan rank extracts its slice
        # of the replicated compaction plan)
        if config.extract_budget and config.extract_budget % self.n_chan:
            config = config.replace(
                extract_budget=config.extract_budget
                + (-config.extract_budget) % self.n_chan
            )
        if (config.extract_budget_narrow
                and config.extract_budget_narrow % self.n_chan):
            config = config.replace(
                extract_budget_narrow=config.extract_budget_narrow
                + (-config.extract_budget_narrow) % self.n_chan
            )
        super().__init__(config)

        self.b_local = config.batch_blocks // self.n_time
        self._build_sharded_tables()
        self._jit_step = jax.jit(self._device_step)
        self._jit_step_spectra = jax.jit(self._device_step_spectra)

    # -- channel-sharded constant tables --------------------------------------

    def _split_rows(self, a: np.ndarray):
        """Zero-pad to a multiple of n_chan and split into one STATIC
        numpy table per chan rank (padded rows extract zeros)."""
        a = _pad_rows(a, self.n_chan)
        c_loc = a.shape[0] // self.n_chan
        return [a[r * c_loc: (r + 1) * c_loc] for r in range(self.n_chan)]

    def _build_sharded_tables(self):
        # Per-rank tables are STATIC (numpy) so the fused Pallas
        # extraction engages on the chan axis too (VERDICT r2 item 3):
        # shard_map traces ONE program for all ranks, so rank-varying
        # constants are selected with a lax.switch over axis_index — each
        # branch closes over its rank's concrete arrays (see _rank_call).
        # The earlier design passed traced per-rank views through the
        # shard_map in_specs, which forced the slow XLA extraction path
        # exactly on the axis meant for extraction-heavy configs.
        fused_widths = set(self._fused_widths)
        self._tp_unfused = []  # (bucket, [starts_r], [wins_r])
        if self.throughput:
            for b in self.throughput.buckets:
                if b.width in fused_widths:
                    continue
                self._tp_unfused.append(
                    (b, self._split_rows(b.starts),
                     self._split_rows(b.windows))
                )
        self._pa_unfused = []
        if self.power_bank:
            for b in self.power_bank.buckets:
                if b.width in fused_widths:
                    continue
                self._pa_unfused.append(
                    (b, self._split_rows(b.starts),
                     self._split_rows(b.windows))
                )
        # The detection power measures can ride the FIRST unfused tp
        # bucket's fused extraction kernel on every chan rank — but only
        # when EVERY rank's branch engages: lax.switch branches must agree
        # on whether a powers leaf exists, and the engagement gate depends
        # on each rank's (static) window table. Evaluated here at build
        # time from shapes alone (measured_folded_matrix); if any rank
        # falls back, all ranks take the XLA measure path so the
        # replicated detection automata see bit-identical powers.
        self._meas_all_ranks = False
        if self._tp_unfused and self._measure_masks is not None:
            from fdc_tpu.ops.extract import measured_folded_matrix

            bucket, starts_r, wins_r = self._tp_unfused[0]
            self._meas_all_ranks = self.config.use_mxu_fft and all(
                measured_folded_matrix(
                    self.config.blocksize, s, w, bucket.width,
                    bucket.width - bucket.out_len, float(bucket.width),
                    self._measure_masks.shape[1],
                )
                is not None
                for s, w in zip(starts_r, wins_r)
            )

        # fused widths: shared tp+pa row family (same trim for equal width);
        # phase_sel = tp start bins for tp rows, 0 for pa rows (rot^0 == 1,
        # the burst emitter applies its phases host-side)
        self._sh_fused = []
        for w, (starts, wins, n_tp, tb, pb) in sorted(
            self._fused_widths.items()
        ):
            psel = np.concatenate(
                [tb.starts, np.zeros(len(pb.channel_ids), np.int32)]
            ).astype(np.int32)
            self._sh_fused.append(
                (
                    w, tb, pb, n_tp, len(pb.channel_ids),
                    self._split_rows(starts), self._split_rows(wins),
                    self._split_rows(psel),
                )
            )

    def _rank_call(self, cidx, per_rank_fns, *operands):
        """Dispatch to this chan rank's closure: a lax.switch over the
        axis index (single direct call on a degenerate axis). Each branch
        captures its rank's static numpy tables, so trace-time gates
        (fused Pallas kernels, window folding) see concrete arrays."""
        if self.n_chan == 1:
            return per_rank_fns[0](*operands)
        return jax.lax.switch(cidx, per_rank_fns, *operands)

    # -- device step -----------------------------------------------------------

    def _local_step(self, carry, xf, t0):
        """Per-shard body (runs under shard_map). Sees the local time run of
        samples and its chan-rank's channel rows; returns local outputs plus
        the replicated new carry."""
        cfg = self.config
        n_time = self.n_time
        tidx = jax.lax.axis_index(TIME_AXIS)

        x = f2c(xf)  # [b_local * inplen]
        tail = x[-cfg.ovllen:]
        recv = _shift_right(tail, n_time)
        hist_local = jnp.where(tidx == 0, carry["hist"], recv)
        blocks, _ = frame_blocks(x, hist_local, cfg.blocksize)
        spec = forward_spectrum(blocks, use_mxu=cfg.use_mxu_fft)  # [b_local, N]
        new_hist = _from_last_time_shard(tail, tidx, n_time)
        return self._local_tail(carry, spec, new_hist, t0)

    def _local_step_spectra(self, carry, specf, t0):
        """Pre-FFT'd per-shard body: the local [b_local, N] spectrum-row run
        skips framing/FFT entirely (the vector-input mode has no sample
        history, reference: python/FrequencyDomainChannelizer.py:201-216);
        the prev-spec burst-reach-back handoff still rides its ppermute."""
        spec = f2c(specf)  # [b_local, N]
        return self._local_tail(carry, spec, carry["hist"], t0)

    def _local_tail(self, carry, spec, new_hist, t0):
        """Shared post-FFT shard body: prev-spec handoff, extraction,
        replicated detection scans."""
        cfg = self.config
        n_time = self.n_time
        tidx = jax.lax.axis_index(TIME_AXIS)
        cidx = jax.lax.axis_index(CHAN_AXIS)
        b_local = self.b_local

        last_spec = spec[-1]
        recv_spec = _shift_right(last_spec, n_time)
        prev_local = jnp.where(tidx == 0, carry["prev_spec"], recv_spec)
        spec_ext = jnp.concatenate([prev_local[None], spec])  # [b_local+1, N]

        new_carry = dict(carry)
        new_carry["hist"] = new_hist
        new_carry["prev_spec"] = _from_last_time_shard(last_spec, tidx, n_time)

        # global block indices of this shard's rows
        t_local0 = t0 + tidx * b_local
        t = t_local0 + jnp.arange(b_local, dtype=jnp.int32)

        out = {}
        powers_fused = None
        if self._tp_unfused:
            # phase folding is shard-safe when every shard's first global
            # block index stays ≡ 0 (mod R): t0 is a whole number of
            # batches and t_local0 = t0 + tidx*b_local, so b_local % R == 0
            # suffices (same contract as the unsharded step)
            fold_phase = b_local % cfg.relinvovl == 0
            mats = []
            for bi, (bucket, starts_r, wins_r) in enumerate(
                self._tp_unfused
            ):
                l = bucket.width
                # detection power measures ride the first shared-kernel
                # bucket's VMEM tiles (same as the plain step). Multi-chan
                # requires every rank's branch to engage the fused kernel
                # (checked at build time, _meas_all_ranks) so the
                # lax.switch branches agree on the powers leaf AND every
                # rank computes powers through the identical kernel — a
                # rank-dependent path would let the replicated detection
                # automata diverge at the ~1e-7 accumulation difference.
                want_meas = (
                    fold_phase and bi == 0
                    and self._measure_masks is not None
                    and (self.n_chan == 1 or self._meas_all_ranks)
                )

                def tp_branch(s_np, w_np):
                    def br(sp, tt):
                        if want_meas:
                            return extract_bucket_measured(
                                sp, s_np, w_np, cfg.relinvovl,
                                self._measure_masks, gain=float(l),
                                use_mxu=cfg.use_mxu_fft,
                                keep_from=l - bucket.out_len,
                            )
                        if fold_phase:
                            return extract_bucket_phased(
                                sp, s_np, w_np, cfg.relinvovl,
                                gain=float(l), use_mxu=cfg.use_mxu_fft,
                                keep_from=l - bucket.out_len,
                            ), None
                        y = extract_bucket(
                            sp, s_np, w_np, gain=float(l),
                            use_mxu=cfg.use_mxu_fft,
                            keep_from=l - bucket.out_len, pairs=True,
                        )
                        phase_idx = (
                            tt[None, :]
                            * jnp.asarray(s_np, jnp.int32)[:, None]
                        ) % cfg.relinvovl
                        return apply_phase_pairs(
                            y, phase_idx, cfg.relinvovl
                        ), None

                    return br

                y, p = self._rank_call(
                    cidx,
                    [tp_branch(s, w) for s, w in zip(starts_r, wins_r)],
                    spec, t,
                )
                if p is not None:
                    powers_fused = p  # [b_local, Cm]
                # [C_loc, b_local, out_len, 2]
                c_loc = y.shape[0]
                mats.append(y.reshape(c_loc, b_local * bucket.out_len, 2))
            out["throughput_mats"] = mats

        if self._sh_fused:
            # shared tp+burst extraction: rows 0..b_local are blocks
            # t_local0-1 .. (row 0 = burst history row, discarded by tp)
            t_rows = t_local0 - 1 + jnp.arange(b_local + 1, dtype=jnp.int32)
            fused_out = []
            for w, tb, pb, n_tp, n_pa, starts_r, wins_r, psel_r in \
                    self._sh_fused:

                def sh_branch(s_np, w_np, p_np, w=w, tb=tb):
                    def br(spx, tr):
                        y = extract_bucket(
                            spx, s_np, w_np, use_mxu=cfg.use_mxu_fft,
                            keep_from=w - tb.out_len, pairs=True,
                        )
                        phase_idx = (
                            tr[None, :]
                            * jnp.asarray(p_np, jnp.int32)[:, None]
                        ) % cfg.relinvovl
                        return apply_phase_pairs(
                            y, phase_idx, cfg.relinvovl
                        )

                    return br

                y = self._rank_call(
                    cidx,
                    [
                        sh_branch(s, wm, p)
                        for s, wm, p in zip(starts_r, wins_r, psel_r)
                    ],
                    spec_ext, t_rows,
                )
                fused_out.append(y[:, None])  # [C_loc, 1, b+1, L, 2]
            out["fused"] = fused_out

        sq_local = (
            jnp.abs(spec) ** 2
            if (self.power_bank or self.segments) and powers_fused is None
            else None
        )
        if self.power_bank:
            pa = self.power_bank
            if powers_fused is not None:
                lo, hi = self._measure_cols["powact"]
                powers_local = jnp.maximum(
                    powers_fused[:, lo:hi], _PA_FLOAT_MIN
                )
            else:
                powers_local = pa.measure(spec, sq_local)  # [b_local, C]
            powers = _gather_time(powers_local, n_time)  # [B, C]
            ext = {}
            for bucket, starts_r, wins_r in self._pa_unfused:

                def pa_branch(s_np, w_np, bucket=bucket):
                    def br(spx):
                        return extract_bucket(
                            spx, s_np, w_np, use_mxu=cfg.use_mxu_fft,
                            keep_from=bucket.width - bucket.out_len,
                            pairs=True,
                        )

                    return br

                ext[bucket.width] = self._rank_call(
                    cidx,
                    [pa_branch(s, w) for s, w in zip(starts_r, wins_r)],
                    spec_ext,
                )
            pa_extract = {w: v[:, None] for w, v in ext.items()}

        # Segments are independent automata (the reference runs one
        # std::thread per segment, reference:
        # lib/activity_detection_channelizer_vcm_impl.cc:293-304). With a
        # multi-segment config on a multi-rank chan axis, running EVERY
        # segment's lifecycle scan on EVERY rank is pure replication — so
        # each segment's scan is OWNED by chan rank (i % n_chan): the
        # owner runs the scan inside a lax.cond, everyone else produces
        # zeros, and one psum per leaf broadcasts the (tiny) flags +
        # slot-table state. Per-rank scan work drops to
        # ceil(segments/n_chan), directly shrinking the replicated-logic
        # Amdahl term of the scaling model (PERFORMANCE.md). Gated on
        # >= 2 segments: with one segment the cond+psum buys nothing.
        shard_scans = self.n_chan > 1 and len(self.segments) >= 2
        # Candidate detection is per-block independent and slot-table-free
        # (SegmentDetector._packed_candidates), so each time shard detects
        # on ITS OWN local powers and only the tiny [B, 7K] candidate rows
        # are all-gathered — the scans' replicated work shrinks to the
        # lifecycle kernel itself, directly cutting the Amdahl L term of
        # the scaling model (PERFORMANCE.md).
        pa_state = pa_flags = None  # set by the fused scan or separately
        seg_pl, seg_pk = [], []  # per-segment local powers / gathered cands
        for i, sd in enumerate(self.segments):
            if powers_fused is not None:
                lo, hi = self._measure_cols[f"seg{i}"]
                power_local = powers_fused[:, lo:hi]
                if sd.vcm:
                    power_local = power_local * jnp.float32(
                        1.0 / sd.geometry.decimation
                    )
            else:
                power_local = sd.measure(spec, sq_local)  # [b_local, nc]
            seg_pl.append(power_local)
            packed_local, _ = sd._packed_candidates(power_local)
            seg_pk.append(_gather_time(packed_local, n_time))  # [B, 7K]
        # split-segment cut reconciliation (lagged-neighbor contract, same
        # as the plain step's _scan_detections): runs replicated on the
        # replicated entry states/packs, so every rank computes identical
        # kills/suppressions
        seg_killed = self._reconcile_splits(
            carry, seg_pk,
            {i: carry[f"seg{i}"] for i in self._split_neighbors},
        )
        if shard_scans:
            # group segments by owner rank: each owner runs ITS segments'
            # scans FUSED in one kernel (scan_slots_multi) inside one
            # lax.cond; one psum per leaf broadcasts the tiny flags/state
            seg_scans = [None] * len(self.segments)
            groups = {}
            for i in range(len(self.segments)):
                groups.setdefault(i % self.n_chan, []).append(i)
            for owner, idxs in sorted(groups.items()):
                sds_g = [self.segments[j] for j in idxs]
                pks = tuple(seg_pk[j] for j in idxs)
                sts = tuple(carry[f"seg{j}"] for j in idxs)

                def run_group(pks, sts, sds_g=sds_g):
                    return tuple(scan_slots_multi(
                        sds_g, [None] * len(sds_g), sts, packed_list=pks
                    ))

                def skip_group(pks, sts, sds_g=sds_g):
                    outs = []
                    for sd_j, pk, st in zip(sds_g, pks, sts):
                        nb_g = pk.shape[0]
                        zf = jnp.zeros((nb_g, sd_j.max_slots), jnp.bool_)
                        outs.append((
                            jax.tree.map(jnp.zeros_like, st),
                            (zf, zf, zf,
                             jnp.zeros((nb_g, sd_j.max_slots), jnp.int32)),
                        ))
                    return tuple(outs)

                grp = _bcast_chan(
                    jax.lax.cond(
                        cidx == owner, run_group, skip_group, pks, sts
                    ),
                    self.n_chan,
                )
                for j, res in zip(idxs, grp):
                    seg_scans[j] = res
        elif self.power_bank and self.segments:
            # unsharded scans + a power bank: the powact automaton rides
            # the same fused kernel invocation (scan_slots_multi powact=,
            # ablate28: the scan stage is launch/glue dominated)
            seg_scans, (pa_state, pa_flags) = scan_slots_multi(
                self.segments, [None] * len(self.segments),
                [carry[f"seg{i}"] for i in range(len(self.segments))],
                packed_list=seg_pk,
                powact=(self.power_bank, powers, carry["powact"]),
            )
        else:
            seg_scans = scan_slots_multi(
                self.segments, [None] * len(self.segments),
                [carry[f"seg{i}"] for i in range(len(self.segments))],
                packed_list=seg_pk,
            )
        if self.power_bank:
            if pa_state is None:
                pa_state, pa_flags = self.power_bank.scan_flags(
                    powers, carry["powact"]
                )
            new_carry["powact"] = pa_state
            rise, fall, processed, phase_used = pa_flags
            out["powact"] = {
                "rise": rise,
                "fall": fall,
                "processed": processed,
                "phase_used": phase_used,
                # keep a leading per-shard axis so time shards concatenate
                "extract": pa_extract,
            }
        for i, sd in enumerate(self.segments):
            power_local = seg_pl[i]
            seg_state, (got, processed, emit_now, phase_used) = seg_scans[i]
            new_carry[f"seg{i}"] = seg_state
            so = {
                "activated": got.T,  # [S, B] replicated
                "processed": processed.T,
                "emit": emit_now.T,
                "phase_used": phase_used.T,
                "slot_meta": {
                    "ext_start": seg_state["ext_start"],
                    "wlog2": seg_state["wlog2"],
                    "order": seg_state["order"],
                },
                "power": power_local,
            }
            if i in seg_killed:
                so["killed"] = seg_killed[i]

            # compaction plans are replicated (computed from the replicated
            # flags); each chan rank extracts its slice of them
            def my_slice(ids, e_total):
                if self.n_chan == 1:
                    return ids  # degenerate axis: the full plan is local
                e_local = e_total // self.n_chan
                return jax.lax.dynamic_slice_in_dim(
                    ids, cidx * e_local, e_local
                )

            if sd.extract_width_split:
                ids_n, ids_w, overflow = sd.extract_plan_split(
                    got, processed, seg_state["wlog2"]
                )
                y = sd.extract_slots(
                    spec_ext, seg_state, my_slice(ids_w, sd.extract_budget),
                    pairs=True,
                )
                yn = sd.extract_slots(
                    spec_ext, seg_state,
                    my_slice(ids_n, sd.extract_budget_narrow),
                    width=sd.extract_width_split, pairs=True,
                )
                so["extract"] = y[:, None]
                so["slot_ids"] = ids_w
                so["extract_narrow"] = yn[:, None]
                so["slot_ids_narrow"] = ids_n
                so["ext_overflow"] = overflow
            else:
                slot_ids, overflow = sd.extract_plan(got, processed)
                y = sd.extract_slots(
                    spec_ext, seg_state,
                    my_slice(slot_ids, sd.extract_budget), pairs=True,
                )  # [e_local, b_local+1, w_cap, 2]
                so["extract"] = y[:, None]
                so["slot_ids"] = slot_ids
                so["ext_overflow"] = overflow
            out[f"seg{i}"] = so

        if cfg.debug:
            out["debug_spectrum"] = c2f(spec)
        return new_carry, out

    def _specs(self, spectra: bool = False):
        """(in_specs, out_specs) pytrees matching _local_step (or, with
        ``spectra``, _local_step_spectra — the input is [B, N, 2] spectrum
        rows time-sharded instead of [B*inplen, 2] samples)."""
        cfg = self.config
        carry_spec = jax.tree.map(lambda _: P(), self._carry_structure())
        in_spec = (
            P(TIME_AXIS, None, None) if spectra else P(TIME_AXIS, None)
        )
        # channel tables are NOT shard_map operands: each chan rank's
        # tables are static numpy constants baked into its lax.switch
        # branch (_rank_call), so the fused Pallas extraction engages
        in_specs = (carry_spec, in_spec, P())

        out = {}
        if self._tp_unfused:
            out["throughput_mats"] = [
                P(CHAN_AXIS, TIME_AXIS, None) for _ in self._tp_unfused
            ]
        if self._sh_fused:
            out["fused"] = [
                P(CHAN_AXIS, TIME_AXIS, None, None, None)
                for _ in self._sh_fused
            ]
        if self.power_bank:
            out["powact"] = {
                "rise": P(),
                "fall": P(),
                "processed": P(),
                "phase_used": P(),
                "extract": {
                    bucket.width: P(CHAN_AXIS, TIME_AXIS, None, None, None)
                    for (bucket, _, _) in self._pa_unfused
                },
            }
        for i, sd in enumerate(self.segments):
            spec = {
                "activated": P(),
                "processed": P(),
                "emit": P(),
                "phase_used": P(),
                "extract": P(CHAN_AXIS, TIME_AXIS, None, None, None),
                "slot_ids": P(),
                "ext_overflow": P(),
                "slot_meta": {
                    "ext_start": P(), "wlog2": P(), "order": P(),
                },
                "power": P(TIME_AXIS, None),
            }
            if sd.extract_width_split:
                spec["extract_narrow"] = P(
                    CHAN_AXIS, TIME_AXIS, None, None, None
                )
                spec["slot_ids_narrow"] = P()
            if i in self._split_neighbors:
                spec["killed"] = P()  # replicated kill mask (see above)
            out[f"seg{i}"] = spec
        if cfg.debug:
            out["debug_spectrum"] = P(TIME_AXIS, None, None)
        return in_specs, (carry_spec, out)

    def _carry_structure(self):
        if self._carry is not None:
            return self._carry
        return self._device_init()

    def _device_step(self, carry, xf, t0):
        """Global jitted step: shard_map body + canonicalization to the
        single-device output layout, so the host emission layer is shared."""
        return self._run_sharded(self._local_step, carry, xf, t0,
                                 spectra=False)

    def _device_step_spectra(self, carry, specf, t0):
        """Pre-FFT'd global step (reference vector-input mode), sharded:
        spectrum rows split over the time axis, everything downstream of
        the FFT identical to _device_step."""
        return self._run_sharded(self._local_step_spectra, carry, specf,
                                 t0, spectra=True)

    def _run_sharded(self, body, carry, arr, t0, spectra: bool):
        cfg = self.config
        in_specs, out_specs = self._specs(spectra=spectra)
        fn = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )
        new_carry, raw = fn(carry, arr, t0)

        nb = cfg.batch_blocks

        def merge_rows(ext):
            """[C, T, b_local+1, L, 2] -> [C, B+1, L, 2] canonical rows
            (row 0 = batch history, row b+1 = block b)."""
            c, t_sh, blp1, ln, two = ext.shape
            body = ext[:, :, 1:].reshape(c, nb, ln, two)
            hist0 = ext[:, 0, :1]
            return jnp.concatenate([hist0, body], axis=1)

        # split the fused row families back into tp stream mats + pa rows
        fused_tp_mats = {}
        fused_pa_ext = {}
        for (w, tb, pb, n_tp, n_pa, *_), g in zip(
            self._sh_fused, raw.get("fused", [])
        ):
            merged = merge_rows(g)  # [C_pad, B+1, L, 2]
            fused_tp_mats[w] = merged[:n_tp, 1:].reshape(
                n_tp, nb * tb.out_len, 2
            )
            fused_pa_ext[w] = merged[n_tp: n_tp + n_pa]

        out = {}
        if self.throughput:
            # canonical layout: one [C_l, B*out_len, 2] matrix per bucket
            # (padded rows dropped); the host splits per channel
            unfused_iter = iter(raw.get("throughput_mats", []))
            mats = []
            for bucket in self.throughput.buckets:
                if bucket.width in fused_tp_mats:
                    mats.append(fused_tp_mats[bucket.width])
                else:
                    mats.append(
                        next(unfused_iter)[: len(bucket.channel_ids)]
                    )
            out["throughput_buckets"] = mats

        if self.power_bank:
            po = dict(raw["powact"])
            ext = {}
            for bucket, _, _ in self._pa_unfused:
                ext[bucket.width] = merge_rows(
                    po["extract"][bucket.width]
                )[: len(bucket.channel_ids)]
            ext.update(fused_pa_ext)
            po["extract"] = ext
            out["powact"] = po
        for i in range(len(self.segments)):
            so = dict(raw[f"seg{i}"])
            so["extract"] = merge_rows(so["extract"])
            if "extract_narrow" in so:
                so["extract_narrow"] = merge_rows(so["extract_narrow"])
            out[f"seg{i}"] = so
        if cfg.debug:
            out["debug_spectrum"] = raw["debug_spectrum"]
        return new_carry, out
