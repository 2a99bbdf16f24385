"""Component ablation timing on the real TPU chip (attribution tool).

The tunneled chip has no device-side profiler, so per-component cost is
attributed by timing variants of the flagship step that each run the FFT
front-end plus ONE consumer subsystem, and comparing against the full step
(see PERFORMANCE.md "Measurement methodology").

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_tpu.py
Prints one JSON dict {variant: {"ms": step_ms, "msps": Msamples/s}}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
    from fdc_tpu.ops.extract import extract_bucket, extract_dynamic
    from fdc_tpu.ops.fft import forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    cfg = _flagship(batch_blocks=512)
    fdc = FrequencyDomainChannelizer(cfg)
    sd = fdc.segments[0]
    pa = fdc.power_bank
    tp = fdc.throughput

    rng = np.random.default_rng(0)
    n = cfg.batch_blocks * cfg.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))
    carry0 = fdc._jit_init()

    def front(carry, xf_in):
        xx = f2c(xf_in)
        blocks, hist = frame_blocks(xx, carry["hist"], cfg.blocksize)
        spec = forward_spectrum(blocks)
        nc = dict(carry)
        nc["hist"] = hist
        spec_ext = jnp.concatenate([carry["prev_spec"][None], spec])
        nc["prev_spec"] = spec[-1]
        return nc, spec, spec_ext

    def v_fft(carry, xf_in, t0):
        nc, spec, _ = front(carry, xf_in)
        return nc, {"s": jnp.sum(jnp.abs(spec).astype(jnp.float32))}

    def v_sq(carry, xf_in, t0):
        nc, spec, _ = front(carry, xf_in)
        return nc, {"s": jnp.sum(jnp.abs(spec) ** 2)}

    def v_tp(carry, xf_in, t0):
        nc, spec, _ = front(carry, xf_in)
        out = []
        for bucket in tp.buckets:
            y = extract_bucket(
                spec, jnp.asarray(bucket.starts),
                jnp.asarray(bucket.windows), gain=float(bucket.width),
            )
            out.append(tp.finish_bucket(bucket, y, t0))
        return nc, {"mats": out}

    def v_pa(carry, xf_in, t0):
        nc, spec, spec_ext = front(carry, xf_in)
        powers = pa.measure(spec)
        nc["powact"], flags = pa.scan_flags(powers, carry["powact"])
        return nc, {"f": flags, "e": pa.extract_rows(spec_ext)}

    def v_seg_detect(carry, xf_in, t0):
        nc, spec, _ = front(carry, xf_in)
        power = sd.measure(spec)
        nc["seg0"], flags = sd.scan_slots(power, carry["seg0"])
        return nc, {"f": flags, "p": power}

    def v_seg_extract_traced(carry, xf_in, t0):
        # traced starts out of the carry (values static-zero, path dynamic)
        nc, spec, spec_ext = front(carry, xf_in)
        y = sd.extract_slots(spec_ext, carry["seg0"])
        return nc, {"y": y}

    st_starts = jnp.asarray(
        np.linspace(100, 3000, sd.max_slots).astype(np.int32)
    )
    st_wins = jnp.asarray(
        np.tile(sd.window_table[sd.w_cap_log2], (sd.max_slots, 1))
    )

    def v_seg_extract_static(carry, xf_in, t0):
        # same shapes, but slice starts are compile-time constants
        nc, spec, spec_ext = front(carry, xf_in)
        y = extract_dynamic(
            spec_ext, st_starts,
            jnp.full((sd.max_slots,), sd.w_cap_log2, jnp.int32),
            st_wins, sd.w_cap,
        )
        return nc, {"y": y}

    def v_seg_full(carry, xf_in, t0):
        nc, spec, spec_ext = front(carry, xf_in)
        power = sd.measure(spec)
        nc["seg0"], flags = sd.scan_slots(power, carry["seg0"])
        y = sd.extract_slots(spec_ext, nc["seg0"])
        return nc, {"f": flags, "y": y, "p": power}

    def v_roofline(carry, xf_in, t0):
        # FFT front-end + every consumer's windowing/IFFT at static starts
        # (the BASELINE "FFT+windowing" denominator: all the work that must
        # happen, none of the detection logic)
        nc, spec, spec_ext = front(carry, xf_in)
        out = []
        for bucket in tp.buckets:
            y = extract_bucket(
                spec, jnp.asarray(bucket.starts),
                jnp.asarray(bucket.windows), gain=float(bucket.width),
            )
            out.append(tp.finish_bucket(bucket, y, t0))
        for bucket in pa.buckets:
            out.append(
                extract_bucket(
                    spec_ext, jnp.asarray(bucket.starts),
                    jnp.asarray(bucket.windows),
                )
            )
        out.append(
            extract_dynamic(
                spec_ext, st_starts,
                jnp.full((sd.max_slots,), sd.w_cap_log2, jnp.int32),
                st_wins, sd.w_cap,
            )
        )
        return nc, {"o": out}

    # K sized so K * expected_step_ms >= ~25 ms: the tunnel's dispatch
    # jitter is a few ms, so K=8 differencing is pure noise for sub-ms
    # variants (symptom: component < its own front-end).
    variants = {
        "full": (fdc._device_step, 24),
        "fft": (v_fft, 96),
        "sq": (v_sq, 96),
        "tp": (v_tp, 64),
        "pa": (v_pa, 64),
        "seg_detect": (v_seg_detect, 48),
        "seg_extract_traced": (v_seg_extract_traced, 48),
        "seg_extract_static": (v_seg_extract_static, 64),
        "seg_full": (v_seg_full, 32),
        "roofline": (v_roofline, 48),
    }

    results = {}
    for name, (step, k) in variants.items():
        t_start = time.time()
        dt = time_scanned(step, carry0, xf, k=k, repeats=4)
        results[name] = {
            "ms": round(dt * 1e3, 4),
            "msps": round(n / dt / 1e6, 1),
        }
        print(
            f"{name}: {results[name]['ms']} ms  {results[name]['msps']} MS/s"
            f"  (wall {time.time()-t_start:.0f}s)",
            file=sys.stderr,
        )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
