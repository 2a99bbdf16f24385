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
    cand_ref, work_ref, chunk_work_ref, state_ref, counters_ref,
    # outputs
    o_state, o_counters, f_got, f_proc, f_emit, f_pu,
    *,
    n_blocks: int,
    n_cand: int,
    r: int,
    delay: int,
    chunk: int,
):
    s_dim = state_ref.shape[1]  # state is a [10, S] row pack

    # Mosaic cannot legalize scf.for with vector loop-carries: the vector
    # state lives in the output ref (initialized below, mutated per block);
    # the scalar counters live in the SMEM output ref (so both pl.when
    # branches below can update them). All 10 state vectors share ONE
    # [10, S] ref so each block does a single VMEM read and a single write
    # instead of 10 of each (static sublane slices are free). The four
    # per-block flags are FOUR [B, S] outputs, not one packed [B, 4S] row:
    # a dynamic-sublane store at a non-zero lane offset (the packed form's
    # 3*S.. slice) fails to lower at some S ("dynamic store with unaligned
    # indices", observed at S=128), while offset-0 dynamic row stores
    # always lower — and the packed form stored four separate slices
    # anyway, so the split costs nothing.
    o_state[:] = state_ref[:]
    o_counters[0] = counters_ref[0]
    o_counters[1] = counters_ref[1]
    o_counters[2] = counters_ref[2]  # n_live: live (non-tomb active) slots

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

    def body(i, _):
        # Idle fast path: a block with no valid candidates and no live
        # slots cannot change any state — its whole lifecycle is "store
        # four trivial flag rows". In steady state (sparse carriers, the
        # common case) this removes nearly the entire per-block serial
        # chain, the same way the reference's per-block loop does no
        # channel work when nothing is detected or active
        # (reference: lib/SegmentDetection_impl.cc:163-176,346-365).
        has_cand = work_ref[i] != 0
        live_in = o_counters[2] > 0
        row = pl.ds(i, 1)

        @pl.when(jnp.logical_not(has_cand | live_in))
        def _idle():
            z = jnp.zeros((1, s_dim), jnp.int32)
            f_got[row, :] = z
            f_proc[row, :] = z
            f_emit[row, :] = z
            f_pu[row, :] = o_state[6:7, :]  # phase

        @pl.when(jnp.logical_not(has_cand) & live_in)
        def _age_only():
            # live slots but no candidates this block: the full body
            # degenerates to aging + retiring (no match matrix, no
            # candidate unpack matmul, no allocation ranking) — exactly
            # _lifecycle_block with every candidate invalid. This is the
            # common busy case on sparse streams: one live carrier makes
            # every block "busy" for its whole dwell.
            st = o_state[:]
            active = st[0:1, :] != 0
            tomb = st[1:2, :] != 0
            phase = st[6:7, :]
            phase_inc = st[7:8, :]
            inactive = st[8:9, :]
            live = active & ~tomb
            inactive = jnp.where(live, inactive + 1, inactive)
            emit_now = live & (inactive > delay)
            tomb = tomb | emit_now
            processed = live & ~emit_now
            f_got[row, :] = jnp.zeros((1, s_dim), jnp.int32)
            f_proc[row, :] = processed.astype(jnp.int32)
            f_emit[row, :] = emit_now.astype(jnp.int32)
            f_pu[row, :] = phase
            phase = jnp.where(processed, (phase + phase_inc) % r, phase)
            o_state[1:2, :] = tomb.astype(jnp.int32)
            o_state[6:7, :] = phase
            o_state[8:9, :] = inactive
            o_counters[2] = jnp.sum(processed.astype(jnp.int32))

        @pl.when(has_cand)
        def _full():
            _lifecycle_block(i)
        return 0

    def chunk_body(c, _):
        # Chunked idle fast path: a chunk of blocks with no valid
        # candidates anywhere and no live slots entering it is one
        # multi-row store instead of `chunk` serial iterations — the
        # serial chain of a sparse batch shrinks from n_blocks to
        # n_chunks (+ chunk per busy chunk). Chunk-idleness is sound
        # because live slots can only appear via an allocation, which
        # needs a candidate: no work in the chunk + no live slots at its
        # start ⇒ every block in it is idle.
        has_work = chunk_work_ref[c] != 0
        live_in = o_counters[2] > 0
        rows = pl.ds(c * chunk, chunk)

        @pl.when(jnp.logical_not(has_work | live_in))
        def _idle():
            z = jnp.zeros((chunk, s_dim), jnp.int32)
            f_got[rows, :] = z
            f_proc[rows, :] = z
            f_emit[rows, :] = z
            f_pu[rows, :] = jnp.broadcast_to(
                o_state[6:7, :], (chunk, s_dim)
            )

        @pl.when(jnp.logical_not(has_work) & live_in)
        def _age_chunk():
            # Candidate-free chunk with live slots: aging is CLOSED FORM.
            # A live slot entering with age a0 retires at in-chunk block
            # j* = max(delay - a0, 0) (aged first, then emit when
            # age > delay), processes blocks j < j*, and advances its
            # phase once per processed block — all per-block flags and
            # the end-of-chunk state are computable vectorized, so a
            # carrier's dwell costs one serial iteration per chunk
            # instead of one per block.
            st = o_state[:]
            active = st[0:1, :] != 0
            tomb = st[1:2, :] != 0
            phase0 = st[6:7, :]
            phase_inc = st[7:8, :]
            a0 = st[8:9, :]
            live0 = active & ~tomb  # [1, S]
            jstar = jnp.maximum(delay - a0, 0)  # [1, S]

            j = jax.lax.broadcasted_iota(jnp.int32, (chunk, s_dim), 0)
            processed = live0 & (j < jstar)  # [chunk, S]
            emit = live0 & (j == jstar)
            phase_used = jnp.where(
                live0,
                (phase0 + jnp.minimum(j, jstar) * phase_inc) % r,
                phase0,
            )
            f_got[rows, :] = jnp.zeros((chunk, s_dim), jnp.int32)
            f_proc[rows, :] = processed.astype(jnp.int32)
            f_emit[rows, :] = emit.astype(jnp.int32)
            f_pu[rows, :] = phase_used

            retires = live0 & (jstar < chunk)
            n_steps = jnp.minimum(jstar, chunk)  # processed blocks
            o_state[1:2, :] = (tomb | retires).astype(jnp.int32)
            o_state[6:7, :] = jnp.where(
                live0, (phase0 + n_steps * phase_inc) % r, phase0
            )
            o_state[8:9, :] = jnp.where(
                live0, a0 + jnp.minimum(jstar + 1, chunk), a0
            )
            o_counters[2] = jnp.sum(
                (live0 & (jstar >= chunk)).astype(jnp.int32)
            )

        @pl.when(has_work)
        def _scan_chunk():
            jax.lax.fori_loop(c * chunk, (c + 1) * chunk, body, 0)
        return 0

    def _lifecycle_block(i):
        alloc_counter = o_counters[0]
        dropped = o_counters[1]
        st = o_state[:]  # [10, S], one read per block
        active = st[0:1, :] != 0
        tomb = st[1:2, :] != 0
        det_start = st[2:3, :]
        det_stop = st[3:4, :]
        ext_start = st[4:5, :]
        wlog2 = st[5:6, :]
        phase = st[6:7, :]
        phase_inc = st[7:8, :]
        inactive = st[8:9, :]
        order = st[9:10, :]

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

        # offset-0 dynamic row stores (see the output-splitting note above);
        # the read side still benefits from the single packed [10, S] load
        row = pl.ds(i, 1)
        f_got[row, :] = got.astype(jnp.int32)
        f_proc[row, :] = processed.astype(jnp.int32)
        f_emit[row, :] = emit_now.astype(jnp.int32)
        f_pu[row, :] = phase_used

        o_state[0:1, :] = active.astype(jnp.int32)
        o_state[1:2, :] = tomb.astype(jnp.int32)
        o_state[2:3, :] = det_start
        o_state[3:4, :] = det_stop
        o_state[4:5, :] = ext_start
        o_state[5:6, :] = wlog2
        o_state[6:7, :] = phase
        o_state[7:8, :] = phase_inc
        o_state[8:9, :] = inactive
        o_state[9:10, :] = order
        o_counters[0] = alloc_counter
        o_counters[1] = dropped
        # live slots after this block == processed (live & ~emit_now,
        # which includes freshly-allocated ones)
        o_counters[2] = jnp.sum(processed.astype(jnp.int32))

    if chunk > 1:
        jax.lax.fori_loop(0, n_blocks // chunk, chunk_body, 0)
    else:
        jax.lax.fori_loop(0, n_blocks, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n_cand", "r", "delay", "chunk", "interpret"),
)
def slot_lifecycle(
    cand_packed, state,
    *, n_cand, r, delay, chunk=32, interpret=False,
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

    # per-block "any valid candidate" + incoming live-slot count feed the
    # kernel's idle fast path (both computed batched/off-chain here)
    cand_packed = cand_packed.astype(jnp.int32)
    has_work = jnp.any(
        cand_packed[:, 2 * n_cand:3 * n_cand] != 0, axis=1
    ).astype(jnp.int32)  # [B]
    if nb % chunk != 0:
        chunk = 1  # odd batch sizes fall back to the per-block loop
    if chunk > 1:
        chunk_work = jnp.max(has_work.reshape(-1, chunk), axis=1)
    else:
        chunk_work = has_work  # unused by the kernel, keeps the arity
    n_live0 = jnp.sum(
        (state["active"] & ~state["tomb"]).astype(jnp.int32)
    )

    state_rows = jnp.stack(
        [
            state["active"].astype(jnp.int32),
            state["tomb"].astype(jnp.int32),
            state["det_start"].astype(jnp.int32),
            state["det_stop"].astype(jnp.int32),
            state["ext_start"].astype(jnp.int32),
            state["wlog2"].astype(jnp.int32),
            state["phase"].astype(jnp.int32),
            state["phase_inc"].astype(jnp.int32),
            state["inactive"].astype(jnp.int32),
            state["order"].astype(jnp.int32),
        ]
    )  # [10, S]
    ins = (
        cand_packed,
        has_work,
        chunk_work,
        state_rows,
        jnp.stack(
            [
                jnp.asarray(state["alloc_counter"], jnp.int32),
                jnp.asarray(state["dropped"], jnp.int32),
                n_live0,
            ]
        ),
    )

    out_shape = (
        jax.ShapeDtypeStruct((10, s), jnp.int32),
        jax.ShapeDtypeStruct((3,), jnp.int32),
        jax.ShapeDtypeStruct((nb, s), jnp.int32),
        jax.ShapeDtypeStruct((nb, s), jnp.int32),
        jax.ShapeDtypeStruct((nb, s), jnp.int32),
        jax.ShapeDtypeStruct((nb, s), jnp.int32),
    )
    kernel = functools.partial(
        _lifecycle_kernel,
        n_blocks=nb, n_cand=n_cand, r=r, delay=delay, chunk=chunk,
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    o_state, o_counters, f_got, f_proc, f_emit, f_pu = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vm, sm, sm, vm, sm],
        out_specs=(vm, sm, vm, vm, vm, vm),
        interpret=interpret,
    )(*ins)

    new_state = {
        "active": o_state[0] != 0,
        "tomb": o_state[1] != 0,
        "det_start": o_state[2],
        "det_stop": o_state[3],
        "ext_start": o_state[4],
        "wlog2": o_state[5],
        "phase": o_state[6],
        "phase_inc": o_state[7],
        "inactive": o_state[8],
        "order": o_state[9],
        "alloc_counter": o_counters[0],
        "dropped": o_counters[1],
    }
    flags = (
        f_got != 0,   # [B, S], scan-order layout
        f_proc != 0,
        f_emit != 0,
        f_pu,
    )
    return new_state, flags


# ---------------------------------------------------------------------------
# Power-activation hysteresis automaton
# ---------------------------------------------------------------------------


def _powact_kernel(
    rup_ref, rdn_ref, work_ref, active_ref, phase_ref, delta_ref,
    o_active, o_phase,
    f_rise, f_fall, f_processed, f_phase_used,
    *, n_blocks: int, r: int, chunk: int,
):
    """Chunked hysteresis automaton.

    The power ratios are batch-precomputed OUTSIDE the kernel (r_up/r_dn
    [B, C] — ``lastpower`` is always the previous block's power regardless
    of activity, reference: lib/PowerActivationChannel_impl.cc:286-306, so
    the ratio tests are block-local), which removes lastpower from the
    serial chain entirely. A chunk with NO ratio edges anywhere cannot
    change any channel's activity, so its flags and phase advance are
    CLOSED FORM (one vectorized store per chunk); only edge-bearing
    chunks walk the per-block loop. In steady state (hysteresis edges are
    rare by construction) the serial chain shrinks from n_blocks to
    n_chunks."""
    delta = delta_ref[:]  # [1, C]
    c_dim = delta.shape[1]

    # vector state lives in the output refs (scf.for cannot carry vectors)
    o_active[:] = active_ref[:]
    o_phase[:] = phase_ref[:]

    def body(i, _):
        active = o_active[:] != 0
        phase = o_phase[:]
        rise = ~active & (rup_ref[pl.ds(i, 1), :] != 0)
        fall = active & (rdn_ref[pl.ds(i, 1), :] != 0)
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
        o_phase[:] = phase
        return 0

    def chunk_body(c, _):
        rows = pl.ds(c * chunk, chunk)

        @pl.when(work_ref[c] == 0)
        def _quiet():
            # no edges in the chunk: activity is constant, every active
            # channel processes every block, phase advances delta/block
            active = o_active[:] != 0  # [1, C]
            phase0 = o_phase[:]
            j = jax.lax.broadcasted_iota(jnp.int32, (chunk, c_dim), 0)
            z = jnp.zeros((chunk, c_dim), jnp.int32)
            f_rise[rows, :] = z
            f_fall[rows, :] = z
            f_processed[rows, :] = jnp.broadcast_to(
                active.astype(jnp.int32), (chunk, c_dim)
            )
            f_phase_used[rows, :] = jnp.where(
                active, (phase0 + j * delta) % r, phase0
            )
            o_phase[:] = jnp.where(
                active, (phase0 + chunk * delta) % r, phase0
            )

        @pl.when(work_ref[c] != 0)
        def _edges():
            jax.lax.fori_loop(c * chunk, (c + 1) * chunk, body, 0)
        return 0

    if chunk > 1:
        jax.lax.fori_loop(0, n_blocks // chunk, chunk_body, 0)
    else:
        jax.lax.fori_loop(0, n_blocks, body, 0)


@functools.partial(
    jax.jit, static_argnames=("r", "thresh", "chunk", "interpret")
)
def powact_flags(powers, state, delta, *, r, thresh, chunk=32,
                 interpret=False):
    """Run the burst hysteresis automaton over [B, C] powers in one kernel.

    Same semantics as PowerActivationBank.scan_flags's lax.scan (same
    float ratio expressions, batch-precomputed). Returns
    (new_state, (rise, fall, processed, phase_used)) with flags [C, B].
    """
    nb, c = powers.shape
    powers = powers.astype(jnp.float32)
    lastp = jnp.concatenate(
        [state["lastpower"].astype(jnp.float32)[None, :], powers[:-1]],
        axis=0,
    )  # [B, C]: lastpower entering each block
    thr = jnp.float32(thresh)
    r_up = (powers / lastp >= thr).astype(jnp.int32)
    r_dn = (lastp / powers >= thr).astype(jnp.int32)
    if nb % chunk != 0:
        chunk = 1  # odd batch sizes fall back to the per-block loop
    if chunk > 1:
        work = jnp.max(
            jnp.max(r_up | r_dn, axis=1).reshape(-1, chunk), axis=1
        )  # [n_chunks]
    else:
        work = jnp.zeros((nb,), jnp.int32)  # unused, keeps the arity
    row = lambda a, dt: a.astype(dt).reshape(1, c)
    ins = (
        r_up,
        r_dn,
        work,
        row(state["active"], jnp.int32),
        row(state["phase"], jnp.int32),
        delta.astype(jnp.int32).reshape(1, c),
    )
    rc = lambda dt: jax.ShapeDtypeStruct((1, c), dt)
    fl = lambda dt: jax.ShapeDtypeStruct((nb, c), dt)
    kernel = functools.partial(
        _powact_kernel, n_blocks=nb, r=r, chunk=chunk
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            rc(jnp.int32), rc(jnp.int32),
            fl(jnp.int32), fl(jnp.int32), fl(jnp.int32), fl(jnp.int32),
        ),
        in_specs=[vm, vm, sm, vm, vm, vm],
        out_specs=tuple([vm] * 6),
        interpret=interpret,
    )(*ins)
    o_active, o_phase, f_rise, f_fall, f_proc, f_pu = outs
    new_state = {
        "active": o_active.reshape(c) != 0,
        "lastpower": powers[-1],
        "phase": o_phase.reshape(c),
    }
    flags = (
        (f_rise != 0).T,  # [C, B]
        (f_fall != 0).T,
        (f_proc != 0).T,
        f_pu.T,
    )
    return new_state, flags
