"""Pallas TPU kernels for the sequential detection state machines.

The detection slot lifecycle (match candidates -> refresh/age -> solve new
channel geometry -> allocate slots -> retire) is inherently sequential over
blocks but operates on tiny vectors ([S] slots, [K] candidates). As a
`lax.scan` it costs ~8.6 us/block on TPU — per-op overhead, not compute.
This kernel runs the whole batch's lifecycle in ONE kernel invocation with
all state resident in VMEM/registers, identical semantics to
``SegmentDetector.scan_slots``'s scan body (reference behavior:
lib/SegmentDetection_impl.cc:195-344).

Layout notes (TPU): slot state lives as [1, S] ROWS (lane dimension) and
candidates as [K, 1] columns; their broadcasts form the [K, S] match matrix
directly, and per-block flags are written as direct [1, S] row stores into
the [B, S] outputs. This orientation exists because Mosaic only allows
dynamic indices on the SUBLANE dim: with [S, 1] column state (the first
design), every flag write needed an [S, S] identity-matmul transpose — four
MXU round-trips per block on the kernel's serial chain. Rotated, only the
candidate vectors need a transpose, and all seven (bins, validity, and the
pre-computed geometry) are packed into ONE [1, 7K] row so it costs a single
[7K, 7K] matmul per block. All "gather by index" steps are masked sums
(each assignment matrix row/column has at most one hit), so the kernel
needs no gathers or sorts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["slot_lifecycle", "powact_flags"]

_BIG = np.int32(2**30)  # plain scalar: jnp constants can't be kernel-captured


def _lifecycle_kernel(
    # inputs
    cand_ref,
    active_ref, tomb_ref, det_start_ref, det_stop_ref, ext_start_ref,
    wlog2_ref, phase_ref, phase_inc_ref, inactive_ref, order_ref,
    counters_ref,
    # outputs
    o_active, o_tomb, o_det_start, o_det_stop, o_ext_start,
    o_wlog2, o_phase, o_phase_inc, o_inactive, o_order, o_counters,
    f_got, f_processed, f_emit, f_phase_used,
    *,
    n_blocks: int,
    n_cand: int,
    r: int,
    delay: int,
):
    s_dim = active_ref.shape[1]  # state is [1, S] rows

    # Mosaic cannot legalize scf.for with vector loop-carries: all vector
    # state lives in the output refs (initialized below, mutated per block);
    # only the two scalar counters ride the fori_loop carry.
    o_active[:] = active_ref[:]
    o_tomb[:] = tomb_ref[:]
    o_det_start[:] = det_start_ref[:]
    o_det_stop[:] = det_stop_ref[:]
    o_ext_start[:] = ext_start_ref[:]
    o_wlog2[:] = wlog2_ref[:]
    o_phase[:] = phase_ref[:]
    o_phase_inc[:] = phase_inc_ref[:]
    o_inactive[:] = inactive_ref[:]
    o_order[:] = order_ref[:]

    k_dim = n_cand
    kp = cand_ref.shape[1]  # 7 * K: all candidate vectors packed in one row
    # candidate row -> columns: ONE [7K, 7K] transpose-by-matmul per block
    # (Mosaic only allows dynamic indices on the sublane dim, so the
    # per-block candidate load is a [1, 7K] row; the match matrix needs
    # [K, 1] columns — static sublane slices of the transposed pack).
    # Values are small ints — exact in f32.
    eye_p = (
        jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 1)
    ).astype(jnp.float32)
    # prefix sums as triangular matmuls (Mosaic has no cumsum primitive)
    tri_k = (
        jax.lax.broadcasted_iota(jnp.int32, (k_dim, k_dim), 1)
        <= jax.lax.broadcasted_iota(jnp.int32, (k_dim, k_dim), 0)
    ).astype(jnp.float32)  # tri_k[a, b] = b <= a
    tri_s = (
        jax.lax.broadcasted_iota(jnp.int32, (s_dim, s_dim), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (s_dim, s_dim), 1)
    ).astype(jnp.float32)  # tri_s[a, b] = a <= b

    def body(i, carry):
        alloc_counter, dropped = carry
        active = o_active[:] != 0  # all state: [1, S] rows
        tomb = o_tomb[:] != 0
        det_start = o_det_start[:]
        det_stop = o_det_stop[:]
        ext_start = o_ext_start[:]
        wlog2 = o_wlog2[:]
        phase = o_phase[:]
        phase_inc = o_phase_inc[:]
        inactive = o_inactive[:]
        order = o_order[:]

        pack = jax.lax.dot_general(
            eye_p, cand_ref[pl.ds(i, 1), :].astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [7K, 1]
        k = k_dim
        cs = pack[0 * k:1 * k, :]          # [K, 1] int32 (bin coords)
        ce = pack[1 * k:2 * k, :]
        c_v = pack[2 * k:3 * k, :] != 0    # [K, 1] bool
        wl2 = pack[3 * k:4 * k, :]         # precomputed geometry
        es = pack[4 * k:5 * k, :]          # (candidate_geometry, batched
        es_mod_r = pack[5 * k:6 * k, :]    #  outside the kernel)
        too_big = pack[6 * k:7 * k, :] != 0

        live = active & ~tomb  # [1, S]

        # -- matching (reference: lib/SegmentDetection_impl.cc:246-288) -----
        m = live & c_v & (cs < det_stop) & (ce >= det_start)  # [K, S]
        order_m = jnp.where(m, order, _BIG)  # [K, S]
        min_order = jnp.min(order_m, axis=1, keepdims=True)  # [K, 1]
        consumed = jnp.any(m, axis=1, keepdims=True)  # [K, 1]
        refreshed = jnp.any(
            m & (order == min_order), axis=0, keepdims=True
        )  # [1, S]
        inactive = jnp.where(
            live, jnp.where(refreshed, 0, inactive + 1), inactive
        )

        # new-channel geometry arrives precomputed (it is slot-table
        # independent; computing it here would sit on the serial chain)
        new_mask = c_v & ~consumed
        new_ok = new_mask & ~too_big

        # -- allocation: free slots in index order x accepted candidates in
        # strength order; masked sums instead of gathers ---------------------
        free = ~active & ~tomb  # [1, S]
        new_ok_i = new_ok.astype(jnp.int32)
        rank = jax.lax.dot_general(
            tri_k, new_ok.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32) - 1  # [K, 1]: accepted candidates before each
        free_rank = jnp.dot(
            free.astype(jnp.float32), tri_s,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32) - 1  # [1, S]: free slots at or before each
        assign = free & new_ok & (free_rank == rank)  # [K, S]
        got = jnp.any(assign, axis=0, keepdims=True)  # [1, S]
        a_i = assign.astype(jnp.int32)

        def pick(arr_k, current):
            # at most one hit per column -> masked sum == gathered value
            v = jnp.sum(a_i * arr_k, axis=0, keepdims=True)
            return jnp.where(got, v, current)

        n_free = jnp.sum(free.astype(jnp.int32))
        n_new = jnp.sum(new_ok_i)
        n_alloc = jnp.minimum(n_new, n_free)
        dropped = (
            dropped
            + (n_new - n_alloc)
            + jnp.sum((new_mask & too_big).astype(jnp.int32))
        )

        active = active | got
        det_start = pick(cs, det_start)
        det_stop = pick(ce, det_stop)
        ext_start = pick(es, ext_start)
        wlog2 = pick(wl2, wlog2)
        phase_inc = pick(es_mod_r, phase_inc)
        inactive = jnp.where(got, 0, inactive)
        order = jnp.where(
            got, alloc_counter + jnp.sum(a_i * rank, axis=0, keepdims=True),
            order,
        )
        alloc_counter = alloc_counter + n_alloc

        # -- processing / retiring flags ------------------------------------
        live = active & ~tomb
        emit_now = live & ~got & (inactive > delay)
        tomb = tomb | emit_now
        processed = live & ~emit_now
        phase_used = jnp.where(got, phase_inc, phase)
        phase = jnp.where(
            got,
            (2 * phase_inc) % r,
            jnp.where(processed, (phase + phase_inc) % r, phase),
        )

        # direct [1, S] row stores into the [B, S] flag outputs
        row = pl.ds(i, 1)
        f_got[row, :] = got.astype(jnp.int32)
        f_processed[row, :] = processed.astype(jnp.int32)
        f_emit[row, :] = emit_now.astype(jnp.int32)
        f_phase_used[row, :] = phase_used

        o_active[:] = active.astype(jnp.int32)
        o_tomb[:] = tomb.astype(jnp.int32)
        o_det_start[:] = det_start
        o_det_stop[:] = det_stop
        o_ext_start[:] = ext_start
        o_wlog2[:] = wlog2
        o_phase[:] = phase
        o_phase_inc[:] = phase_inc
        o_inactive[:] = inactive
        o_order[:] = order
        return alloc_counter, dropped

    alloc_counter, dropped = jax.lax.fori_loop(
        0, n_blocks, body, (counters_ref[0], counters_ref[1])
    )
    o_counters[0] = alloc_counter
    o_counters[1] = dropped


@functools.partial(
    jax.jit,
    static_argnames=("n_cand", "r", "delay", "interpret"),
)
def slot_lifecycle(
    cand_packed, state,
    *, n_cand, r, delay, interpret=False,
):
    """Run the slot lifecycle over a batch of candidate sets.

    NOTE: candidates arrive PRE-ACCEPTED (detect_candidates) with their
    new-channel geometry PRE-COMPUTED (candidate_geometry) — both are
    slot-table independent, so they batch over [B, K] outside the kernel
    instead of sitting on its serial per-block chain. (Running the greedy
    overlap rejection inside the kernel was tried and measured SLOWER,
    +0.5 ms/step at B=512, K=8: outside, the K-step accept scan is
    vectorized over all B blocks — serial length K, not B*K.)

    Args:
      cand_packed: [B, 7K] int32 — per block the concatenation of
        (cand_start_bin, cand_end_bin, valid, wlog2, ext_start,
        ext_start % r, too_big), each [K], in that order.
      state: SegmentDetector slot-table dict (see init_state).
      n_cand: K (static), r/delay: static config.
      interpret: run in interpreter mode (CPU testing).

    Returns (new_state, (got, processed, emit, phase_used)), flags [B, S]
    (scan-order layout, same as the lax.scan path).
    """
    nb = cand_packed.shape[0]
    s = state["active"].shape[0]

    row = lambda a, dt: a.astype(dt).reshape(1, s)
    ins = (
        cand_packed.astype(jnp.int32),
        row(state["active"], jnp.int32), row(state["tomb"], jnp.int32),
        row(state["det_start"], jnp.int32), row(state["det_stop"], jnp.int32),
        row(state["ext_start"], jnp.int32), row(state["wlog2"], jnp.int32),
        row(state["phase"], jnp.int32), row(state["phase_inc"], jnp.int32),
        row(state["inactive"], jnp.int32), row(state["order"], jnp.int32),
        jnp.stack(
            [state["alloc_counter"], state["dropped"]]
        ).astype(jnp.int32),
    )

    sc = jax.ShapeDtypeStruct((1, s), jnp.int32)
    fl = jax.ShapeDtypeStruct((nb, s), jnp.int32)
    out_shape = tuple([sc] * 10) + (
        jax.ShapeDtypeStruct((2,), jnp.int32),
        fl, fl, fl, fl,
    )
    kernel = functools.partial(
        _lifecycle_kernel,
        n_blocks=nb, n_cand=n_cand, r=r, delay=delay,
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vm] * 11 + [sm],
        out_specs=tuple([vm] * 10) + (sm, vm, vm, vm, vm),
        interpret=interpret,
    )(*ins)

    (o_active, o_tomb, o_det_start, o_det_stop, o_ext_start, o_wlog2,
     o_phase, o_phase_inc, o_inactive, o_order, o_counters,
     f_got, f_processed, f_emit, f_phase_used) = outs

    flat = lambda a: a.reshape(s)
    new_state = {
        "active": flat(o_active) != 0,
        "tomb": flat(o_tomb) != 0,
        "det_start": flat(o_det_start),
        "det_stop": flat(o_det_stop),
        "ext_start": flat(o_ext_start),
        "wlog2": flat(o_wlog2),
        "phase": flat(o_phase),
        "phase_inc": flat(o_phase_inc),
        "inactive": flat(o_inactive),
        "order": flat(o_order),
        "alloc_counter": o_counters[0],
        "dropped": o_counters[1],
    }
    flags = (
        f_got != 0,        # [B, S], scan-order layout
        f_processed != 0,
        f_emit != 0,
        f_phase_used,
    )
    return new_state, flags


# ---------------------------------------------------------------------------
# Power-activation hysteresis automaton
# ---------------------------------------------------------------------------


def _powact_kernel(
    powers_ref, active_ref, lastpower_ref, phase_ref, delta_ref,
    o_active, o_lastpower, o_phase,
    f_rise, f_fall, f_processed, f_phase_used,
    *, n_blocks: int, r: int, thresh: float,
):
    delta = delta_ref[:]  # [1, C]

    # vector state lives in the output refs (scf.for cannot carry vectors)
    o_active[:] = active_ref[:]
    o_lastpower[:] = lastpower_ref[:]
    o_phase[:] = phase_ref[:]

    def body(i, _):
        active = o_active[:] != 0
        lastpower = o_lastpower[:]
        phase = o_phase[:]
        pwr = powers_ref[pl.ds(i, 1), :]  # [1, C]
        # reference: lib/PowerActivationChannel_impl.cc:286-306
        rise = ~active & (pwr / lastpower >= thresh)
        fall = active & (lastpower / pwr >= thresh)
        processed = rise | active
        phase_used = jnp.where(rise, delta, phase)
        phase = jnp.where(
            rise,
            (2 * delta) % r,
            jnp.where(processed, (phase + delta) % r, phase),
        )
        active = (active | rise) & ~fall

        row = pl.ds(i, 1)
        f_rise[row, :] = rise.astype(jnp.int32)
        f_fall[row, :] = fall.astype(jnp.int32)
        f_processed[row, :] = processed.astype(jnp.int32)
        f_phase_used[row, :] = phase_used

        o_active[:] = active.astype(jnp.int32)
        o_lastpower[:] = pwr
        o_phase[:] = phase
        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)


@functools.partial(
    jax.jit, static_argnames=("r", "thresh", "interpret")
)
def powact_flags(powers, state, delta, *, r, thresh, interpret=False):
    """Run the burst hysteresis automaton over [B, C] powers in one kernel.

    Same semantics as PowerActivationBank.scan_flags's lax.scan. Returns
    (new_state, (rise, fall, processed, phase_used)) with flags [C, B].
    """
    nb, c = powers.shape
    row = lambda a, dt: a.astype(dt).reshape(1, c)
    ins = (
        powers.astype(jnp.float32),
        row(state["active"], jnp.int32),
        row(state["lastpower"], jnp.float32),
        row(state["phase"], jnp.int32),
        delta.astype(jnp.int32).reshape(1, c),
    )
    rc = lambda dt: jax.ShapeDtypeStruct((1, c), dt)
    fl = lambda dt: jax.ShapeDtypeStruct((nb, c), dt)
    kernel = functools.partial(
        _powact_kernel, n_blocks=nb, r=r, thresh=thresh
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            rc(jnp.int32), rc(jnp.float32), rc(jnp.int32),
            fl(jnp.int32), fl(jnp.int32), fl(jnp.int32), fl(jnp.int32),
        ),
        in_specs=[vm] * 5,
        out_specs=tuple([vm] * 7),
        interpret=interpret,
    )(*ins)
    o_active, o_lastpower, o_phase, f_rise, f_fall, f_proc, f_pu = outs
    new_state = {
        "active": o_active.reshape(c) != 0,
        "lastpower": o_lastpower.reshape(c),
        "phase": o_phase.reshape(c),
    }
    flags = (
        (f_rise != 0).T,  # [C, B]
        (f_fall != 0).T,
        (f_proc != 0).T,
        f_pu.T,
    )
    return new_state, flags
