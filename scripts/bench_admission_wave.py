"""Admission-burst A/B: batched wave prefill vs per-slot prefill.

Round-5 follow-up to the slot-scaling sweep: at wide slot counts the
residual end-to-end-over-device gap was attributed to admission
dispatching one [1, P] prefill program per free slot. The wave path
(GenerationServer(wave_prefill=True), the default) groups a burst by
length bucket and prefills power-of-two groups in ONE dispatched
program each. This script measures both paths on the Qwen3-0.6B
architecture:

* admission-only: burst-submit S requests with max_new_tokens=1 and
  drain — the wall time is prefill + first-token emission;
* end-to-end: the same burst with max_new_tokens=n_new.

Prints per-point dicts and writes results/admission_wave.csv.

Usage: python scripts/bench_admission_wave.py [n_new] [out_csv]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from a_nice_rag_tpu.models.decoder import DecoderLM, init_caches
from a_nice_rag_tpu.models.qwen3 import Qwen3Config
from a_nice_rag_tpu.serving.genserver import GenerationServer

SLOTS = (16, 64, 128)


def _drain_burst(srv, prompt, n, budget):
    reqs = [srv.submit(prompt, budget) for _ in range(n)]
    srv.drain()
    for r in reqs:
        while not r.out.empty():
            r.out.get_nowait()


def main():
    n_new = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    out_csv = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(__file__), "..", "results", "admission_wave.csv",
    )
    print(f"platform: {jax.devices()[0].platform}")
    cfg = Qwen3Config(
        vocab_size=151_936, hidden_size=1024, num_layers=28,
        num_heads=16, num_kv_heads=8, head_dim=128,
        intermediate_size=3072, dtype=jnp.bfloat16,
    )
    model = DecoderLM(cfg)
    smax = 256
    prompt = list(range(2, 66))  # one 64-token bucket for all rows
    kc0, vc0 = init_caches(cfg, 1, smax)
    params = jax.jit(
        lambda key: model.init(
            key, jnp.zeros((1, 1), jnp.int32), kc0, vc0, jnp.int32(0)
        )
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    rows = []
    for slots in SLOTS:
        for wave in (False, True):
            srv = GenerationServer(
                model, params, slots=slots, max_len=smax, chunk=16,
                eos_id=-1, wave_prefill=wave,
            )
            n_disp = {"prefill": 0}
            inner_one, inner_wave = srv._prefill, srv._prefill_wave

            def spy_one(*a, _f=inner_one, **kw):
                n_disp["prefill"] += 1
                return _f(*a, **kw)

            def spy_wave(*a, _f=inner_wave, **kw):
                n_disp["prefill"] += 1
                return _f(*a, **kw)

            srv._prefill, srv._prefill_wave = spy_one, spy_wave
            try:
                # Warm both shapes (compile).
                _drain_burst(srv, prompt, slots, 1)
                _drain_burst(srv, prompt, slots, 2)

                n_disp["prefill"] = 0
                t0 = time.perf_counter()
                _drain_burst(srv, prompt, slots, 1)
                admit_s = time.perf_counter() - t0
                admit_disp = n_disp["prefill"]

                t0 = time.perf_counter()
                _drain_burst(srv, prompt, slots, n_new)
                e2e_s = time.perf_counter() - t0
            finally:
                srv.stop()
            rows.append(dict(
                slots=slots, wave=int(wave), n_new=n_new,
                admit_ms=round(admit_s * 1e3, 1),
                admit_dispatches=admit_disp,
                admit_ms_per_req=round(admit_s * 1e3 / slots, 2),
                e2e_s=round(e2e_s, 3),
                e2e_tok_s=round(slots * n_new / e2e_s, 1),
            ))
            print(rows[-1], flush=True)

    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    cols = list(rows[0].keys())
    with open(out_csv, "w") as f:
        f.write(",".join(cols) + "\n")
        for r in rows:
            f.write(",".join(str(r[c]) for c in cols) + "\n")
    print(f"wrote {out_csv}")


if __name__ == "__main__":
    main()
