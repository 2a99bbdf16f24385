"""Pipeline-parallel channelizer: batches farm over devices, scans run ahead.

The SPMD sharded step (parallel/sharded.py) pays the sequential detection
logic L as an Amdahl replication tax — every rank re-runs the scans on
all-gathered powers, so eff(T) = (E+L)/(E+T·L) no matter how the batch is
split. But the scan chain's TRUE dependencies are tiny: it needs only the
[B, n_cells]-scale power matrices and its own carry — never the heavy
extraction outputs — and the overlap-save framing history is a function
of the RAW INPUT (the host already holds it), not of device compute. So
the step decomposes into an asynchronous MPMD pipeline instead:

- **stage A (worker w, batch b)**: framing + FFT over B+1 blocks (the
  leading block RECOMPUTES the previous batch's last spectrum row from
  the host-fed sample tail — bit-identical to the carried ``prev_spec``
  row, and it removes the only cross-batch device dependency), all
  flag-independent extraction (throughput + burst channels), and the
  detection power measures. Embarrassingly parallel over batches.
- **stage B (scan owner, in batch order)**: burst hysteresis + slot
  lifecycle scans + extraction plans on the tiny powers. The only serial
  stage; its inputs/outputs are KB-scale.
- **stage C (worker w)**: detection-slot extraction on the worker-resident
  spectrum, given the owner's slot tables and plans.

Throughput model: the scan chain advances at 1/L independent of
extraction, so system throughput is min(W/E_step, 1/L) — ~100% scaling
until W ≈ E/L (≈ 10 for the flagship's E ≈ 0.53 ms, L ≈ 0.05 ms),
where the SPMD step's replicated-L law has already decayed to ~65%.
JAX's async dispatch provides the overlap: the host enqueues A/B/C for
each batch and the runtime executes A(b+1) on worker w+1 concurrently
with B(b) on the owner; per-device queues serialize reuse naturally.

No reference analog (the reference is single-process; its per-block
work loop interleaves detection and extraction on one thread,
reference: lib/SegmentDetection_impl.cc:125-176). Results are
bit-compatible with FrequencyDomainChannelizer: stage A recomputes
identical spectra, stage B runs the identical scan ops on identical
powers, stage C the identical slot extraction — pinned by
tests/test_pipeline.py (event metadata exactly equal, streams equal
within the same tolerance as the sharded contract).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fdc_tpu.config import ChannelizerConfig
from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
from fdc_tpu.ops.fft import forward_spectrum
from fdc_tpu.ops.framing import frame_blocks
from fdc_tpu.utils.cplx import c2f, c2f_host, f2c, f2c_host

__all__ = ["PipelineChannelizer"]


class PipelineChannelizer(FrequencyDomainChannelizer):
    """FrequencyDomainChannelizer whose batches pipeline over devices.

    Usage::

        fdc = PipelineChannelizer(config, devices=jax.devices())
        result = fdc.process(samples)   # same API/results as single-device

    ``devices[0]`` owns the sequential detection state (scan chain); all
    devices (including the owner) serve as extraction workers in
    round-robin batch order, or only ``devices[1:]`` with
    ``dedicated_owner=True`` (the high-device-count regime — see the
    efficiency note on ``__init__``). With one device this degenerates
    to the plain step's work split across three dispatches (same
    results, pointless — use the base class).

    ``process_spectra`` (the pre-FFT'd vector mode) pipelines the same
    way: there is no framing tail to recompute the reach-back row from,
    but none is needed — the HOST holds the input spectra, so each
    batch ships with the previous batch's last spectrum row prepended
    (exact, not recomputed) and stage A skips straight to extraction.
    """

    def __init__(self, config: Optional[ChannelizerConfig] = None,
                 devices: Optional[List] = None, window: int = 0,
                 dedicated_owner: bool = False, **kwargs):
        self.devices = list(devices) if devices else list(jax.devices())
        if not self.devices:
            raise ValueError("PipelineChannelizer requires >= 1 device")
        self.owner = self.devices[0]
        # With a dedicated owner the scan device does NO extraction — the
        # owner otherwise pays B + (A+C)/W per batch and the pipeline
        # efficiency decays as (A+B+C)/(A+C+W·B); dedicating it costs one
        # device of extraction capacity but removes the scan from every
        # worker's critical path: eff(W) = (W-1)/W · (A+B+C)/(A+C) until
        # the scan rate 1/B caps throughput (see PERFORMANCE.md
        # "Pipeline scaling model").
        self.workers = (
            self.devices[1:]
            if dedicated_owner and len(self.devices) > 1
            else self.devices
        )
        # bound on dispatched-but-unconsumed batches (device memory holds
        # one spec_ext + extraction set per in-flight batch per worker)
        self.window = int(window) or 2 * len(self.workers)
        super().__init__(config, **kwargs)

        cfg = self.config
        n = cfg.blocksize

        def pipe_front(histf, xf_extf, t0, ov_rowf, ov_flag):
            x = f2c(xf_extf)
            blocks, _ = frame_blocks(x, f2c(histf), n)
            spec_ext = forward_spectrum(
                blocks, use_mxu=cfg.use_mxu_fft
            )  # [B+1, N]; row 0 == previous batch's last row, recomputed
            # resuming from a checkpoint WITHOUT a pipeline tail (one
            # written by the plain/sharded paths): the reach-back row
            # cannot be recomputed, so the first post-resume batch
            # substitutes the checkpoint's carried prev_spec (exact)
            spec_ext = spec_ext.at[0].set(
                jnp.where(ov_flag, f2c(ov_rowf), spec_ext[0])
            )
            spec = spec_ext[1:]
            out, pa_powers, pa_ext, seg_powers, seg_packed = (
                self._extract_static(spec, spec_ext, t0)
            )
            dbg = c2f(spec) if cfg.debug else 0
            return (out, pa_powers, pa_ext, seg_powers, seg_packed,
                    spec_ext, dbg)

        def pipe_front_spec(spec_extf, t0):
            # vector-mode stage A: the host prepends the previous batch's
            # last spectrum row (it owns the input spectra), so there is
            # no framing/FFT and no recomputation — row 0 is exact
            spec_ext = f2c(spec_extf)  # [B+1, N]
            spec = spec_ext[1:]
            out, pa_powers, pa_ext, seg_powers, seg_packed = (
                self._extract_static(spec, spec_ext, t0)
            )
            dbg = c2f(spec) if cfg.debug else 0
            return (out, pa_powers, pa_ext, seg_powers, seg_packed,
                    spec_ext, dbg)

        def pipe_scan(carry, pa_powers, seg_packed):
            carry = dict(carry)
            scans = self._scan_detections(carry, pa_powers, seg_packed)
            return carry, scans

        def pipe_slots(spec_ext, seg_states, plans):
            return self._extract_slots_all(spec_ext, seg_states, plans)

        self._jit_front = jax.jit(pipe_front)
        self._jit_front_spec = jax.jit(pipe_front_spec)
        self._jit_scan = jax.jit(pipe_scan)
        self._jit_slots = jax.jit(pipe_slots)

        # host rolling tail: the (inplen + ovllen) samples preceding the
        # next batch — ovllen of framing history for the RECOMPUTED
        # leading block plus that block's inplen samples. Note
        # inplen + ovllen == blocksize, so the tail IS the last block.
        self._tail = np.zeros(cfg.inplen + cfg.ovllen, np.complex64)
        # one-shot reach-back-row override for resume-from-plain
        # checkpoints (see pipe_front)
        self._ov_row = np.zeros((cfg.blocksize, 2), np.float32)
        self._ov_flag = False
        # vector-mode rolling state: the previous batch's last spectrum
        # row (float pairs), prepended to the next batch as the exact
        # reach-back row (carry['prev_spec'] is never advanced by the
        # pipelined vector step — see _host_extra_state)
        self._prev_specf = np.zeros((cfg.blocksize, 2), np.float32)

    def reset(self):
        super().reset()
        cfg = self.config
        self._tail = np.zeros(cfg.inplen + cfg.ovllen, np.complex64)
        self._ov_row = np.zeros((cfg.blocksize, 2), np.float32)
        self._ov_flag = False
        self._prev_specf = np.zeros((cfg.blocksize, 2), np.float32)

    # -- checkpoint integration ---------------------------------------------

    def _host_extra_state(self) -> dict:
        """Checkpoint hook: the pipeline's real framing state is host-side
        (the sample tail, or in vector mode the previous spectrum row);
        carry['hist'] / carry['prev_spec'] are never advanced by the
        pipelined steps. Sync them INTO the carry so a plain or sharded
        channelizer can resume this checkpoint bit-identically, and save
        the host state so a pipeline can."""
        cfg = self.config
        if self._carry is not None:
            if self._spectra_mode:
                # vector mode: the sample tail is meaningless (all zeros)
                # — syncing from it would overwrite prev_spec with the
                # spectrum of silence; the real reach-back row is the
                # host-held _prev_specf
                rowf = jnp.asarray(self._prev_specf)

                @jax.jit
                def sync_spec(carry, rf):
                    carry = dict(carry)
                    carry["prev_spec"] = f2c(rf)
                    return carry

                self._carry = sync_spec(self._carry, rowf)
            else:
                tailf = jnp.asarray(c2f_host(self._tail))

                @jax.jit
                def sync(carry, tf):
                    t = f2c(tf)
                    carry = dict(carry)
                    carry["hist"] = t[-cfg.ovllen:]
                    # the tail is exactly the last processed block (see
                    # __init__ note), so its spectrum IS prev_spec
                    carry["prev_spec"] = forward_spectrum(
                        t[None], use_mxu=cfg.use_mxu_fft
                    )[0]
                    return carry

                self._carry = sync(self._carry, tailf)
        return {
            "pipeline_tail": self._tail.copy(),
            "pipeline_prev_specf": self._prev_specf.copy(),
        }

    def _restore_host_extra_state(self, extra: dict):
        cfg = self.config
        tail = extra.get("pipeline_tail")
        row = extra.get("pipeline_prev_specf")
        if tail is not None:
            self._tail = np.asarray(tail, np.complex64)
            self._prev_specf = (
                np.asarray(row, np.float32)
                if row is not None
                # pre-row pipeline checkpoint: the saving side synced the
                # carry, so the carried prev_spec is the exact row
                else self._pack_host_row()["prev_spec"]
            )
            self._ov_flag = False
            return
        # plain/sharded checkpoint: reconstruct what is reconstructible —
        # the tail's hist section comes from the carried hist (it frames
        # the first real block); the prev-block samples are unknown, so
        # the recomputed reach-back row would be wrong — override it with
        # the carried prev_spec for the first post-resume batch (exact).
        # In vector mode the carried prev_spec IS the reach-back row.
        host = self._pack_host_row()
        self._tail = np.concatenate(
            [np.zeros(cfg.inplen, np.complex64), host["hist"]]
        )
        self._ov_row = host["prev_spec"]
        self._ov_flag = True
        self._prev_specf = host["prev_spec"]

    def _pack_host_row(self):
        """Fetch carry hist (complex64) + prev_spec ([N, 2] float32) to
        the host, crossing the device boundary as float pairs."""

        @jax.jit
        def pack(carry):
            return {
                "hist": c2f(carry["hist"]),
                "prev_spec": c2f(carry["prev_spec"]),
            }

        out = pack(self._carry)
        return {
            "hist": f2c_host(np.asarray(out["hist"])),
            "prev_spec": np.asarray(out["prev_spec"]),
        }

    # -- pipelined streaming ----------------------------------------------------

    def _pipe_scan_extract(self, dev, pa_powers, seg_packed, spec_ext):
        """Stages B and C for one batch: the owner's sequential scans on
        the tiny powers/candidate rows, then slot extraction back on the
        batch's worker under the owner's tables/plans."""
        # stage B on the owner, in batch order (the serial chain)
        pa_o = (
            jax.device_put(pa_powers, self.owner)
            if self.power_bank else None
        )
        # only the tiny pre-packed candidate rows travel to the owner
        # (candidate detection already ran on the worker, stage A)
        segk_o = [jax.device_put(p, self.owner) for p in seg_packed]
        self._carry, scans = self._jit_scan(self._carry, pa_o, segk_o)
        # stage C back on the worker
        states_w = jax.device_put([st for st, _ in scans["segs"]], dev)
        plans_w = jax.device_put(
            [
                {
                    k: so[k]
                    for k in ("slot_ids", "slot_ids_narrow")
                    if k in so
                }
                for _, so in scans["segs"]
            ],
            dev,
        )
        extracts = self._jit_slots(spec_ext, states_w, plans_w)
        return scans, extracts

    def _consume_pipeline_batch(self, batch_parts, result, dbg):
        """Reassemble one in-flight batch's stage outputs into the plain
        step's `out` dict and fold it into the result (deferred, so the
        host never blocks the pipeline on device completion)."""
        cfg = self.config
        (out_static, pa_ext, seg_powers, dbgb, scans, extracts,
         t0_b) = batch_parts
        out = dict(out_static)
        if self.power_bank:
            rise, fall, processed, phase_used = scans["powact"]
            out["powact"] = {
                "rise": rise,
                "fall": fall,
                "processed": processed,
                "phase_used": phase_used,
                "extract": pa_ext,
            }
        for i, ((_, so), eo, power) in enumerate(
            zip(scans["segs"], extracts, seg_powers)
        ):
            so = dict(so)
            so.update(eo)
            so["power"] = power
            out[f"seg{i}"] = so
        if cfg.debug:
            out["debug_spectrum"] = dbgb
        self._consume_outputs(out, result, dbg, t0=t0_b)
        result.blocks_processed += cfg.batch_blocks

    def process(self, samples: np.ndarray):
        cfg = self.config
        if self._spectra_mode:
            # same contract as the base class: one entry point per
            # stream. For the pipeline this is load-bearing — the host
            # framing state (_tail vs _prev_specf) is per-mode, and a
            # mixed-mode checkpoint would sync the wrong one into the
            # carry and silently corrupt resume.
            raise RuntimeError(
                "process() called on a stream already driven by "
                "process_spectra(); use one entry point per stream "
                "(reset() starts a new one)"
            )
        self._samples_mode = True
        if self._carry is None:
            self._carry = jax.device_put(self._jit_init(), self.owner)

        x = np.concatenate(
            [self._pending, np.asarray(samples, np.complex64)]
        )
        bs = self.batch_samples
        n_batches = len(x) // bs
        self._pending = x[n_batches * bs:]

        result = self._new_result()
        dbg = []
        inflight = []

        for b in range(n_batches):
            chunk = x[b * bs: (b + 1) * bs]
            dev = self.workers[b % len(self.workers)]

            # host-fed framing tail: one extra leading block so stage A
            # recomputes the previous batch's last spectrum row itself.
            # Inputs go host -> worker DIRECTLY (committing via
            # jnp.asarray first would land them on the default device —
            # the scan owner — and pay a second device-to-device hop on
            # exactly the device the pipeline must keep unblocked).
            x_ext = np.concatenate([self._tail[cfg.ovllen:], chunk])
            histf = jax.device_put(c2f_host(self._tail[: cfg.ovllen]), dev)
            xf = jax.device_put(c2f_host(x_ext), dev)
            glue = np.concatenate([self._tail, chunk])
            self._tail = glue[-(cfg.inplen + cfg.ovllen):]

            # stage A on the batch's worker (async dispatch)
            ov_row = jax.device_put(self._ov_row, dev)
            ov_flag = jnp.bool_(self._ov_flag)
            self._ov_flag = False  # consumed by the first post-resume batch
            (out_static, pa_powers, pa_ext, seg_powers, seg_packed,
             spec_ext, dbgb) = self._jit_front(
                histf, xf, jnp.int32(self._t0), ov_row, ov_flag
            )
            scans, extracts = self._pipe_scan_extract(
                dev, pa_powers, seg_packed, spec_ext
            )

            inflight.append(
                (out_static, pa_ext, seg_powers, dbgb, scans, extracts,
                 self._t0)
            )
            self._t0 += cfg.batch_blocks
            if len(inflight) >= self.window:
                self._consume_pipeline_batch(inflight.pop(0), result, dbg)

        while inflight:
            self._consume_pipeline_batch(inflight.pop(0), result, dbg)
        if dbg:
            result.debug_spectrum = np.concatenate(dbg)
        return result

    def process_spectra(self, spectra: np.ndarray):
        """Pipelined pre-FFT'd vector mode: same batch farm-out as
        ``process``, minus framing/FFT. The host owns the input spectra,
        so each batch ships to its worker with the previous batch's last
        spectrum row prepended — the reach-back row is exact by
        construction (no recompute, no carried-row override needed)."""
        cfg = self.config
        if self._samples_mode:
            raise RuntimeError(
                "process_spectra() called on a stream already driven by "
                "process(); use one entry point per stream (reset() "
                "starts a new one)"
            )
        if self._carry is None:
            self._carry = jax.device_put(self._jit_init(), self.owner)
        self._spectra_mode = True
        spectra = np.ascontiguousarray(spectra, np.complex64)
        if spectra.ndim != 2 or spectra.shape[1] != cfg.blocksize:
            raise ValueError(
                f"spectra must be [B, {cfg.blocksize}], got {spectra.shape}"
            )
        if len(self._pending_spec):
            spectra = np.concatenate([self._pending_spec, spectra])
        bb = cfg.batch_blocks
        n_batches = spectra.shape[0] // bb
        self._pending_spec = spectra[n_batches * bb:]

        result = self._new_result()
        dbg = []
        inflight = []

        for b in range(n_batches):
            chunk = spectra[b * bb: (b + 1) * bb]
            dev = self.workers[b % len(self.workers)]
            spec_extf = np.concatenate(
                [self._prev_specf[None], c2f_host(chunk)]
            )  # [B+1, N, 2]
            # .copy(): a bare view would keep the whole [B+1, N, 2] batch
            # array alive between calls just to retain one row
            self._prev_specf = spec_extf[-1].copy()
            sf = jax.device_put(spec_extf, dev)

            (out_static, pa_powers, pa_ext, seg_powers, seg_packed,
             spec_ext, dbgb) = self._jit_front_spec(sf, jnp.int32(self._t0))
            scans, extracts = self._pipe_scan_extract(
                dev, pa_powers, seg_packed, spec_ext
            )

            inflight.append(
                (out_static, pa_ext, seg_powers, dbgb, scans, extracts,
                 self._t0)
            )
            self._t0 += bb
            if len(inflight) >= self.window:
                self._consume_pipeline_batch(inflight.pop(0), result, dbg)

        while inflight:
            self._consume_pipeline_batch(inflight.pop(0), result, dbg)
        if dbg:
            result.debug_spectrum = np.concatenate(dbg)
        return result
