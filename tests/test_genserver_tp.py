"""Tensor-parallel continuous-batching serving: GenerationServer(mesh=)
places weights/KV caches with the Megatron column/row layout
(parallel/lm.py) and lets GSPMD partition the unchanged decode
programs. Greedy streams must be bit-identical to the single-device
server across admission modes (whole-prompt, prefix-cached, chunked
prefill) and speculative decode.

Net-new vs the reference — its generation hop is a per-request SaaS
stream (reference src/query_rag.py:434-513) with no on-device serving.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from a_nice_rag_tpu.models.decoder import (
    generate_stream,
    init_decoder,
    small_lm_config,
)
from a_nice_rag_tpu.serving.genserver import _END, GenerationServer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs >=2 devices for tp"
)


def _mesh(tp: int = 2) -> Mesh:
    return Mesh(np.array(jax.devices()[:tp]), ("tp",))


def _collect(req):
    out = []
    while True:
        item = req.out.get_nowait()
        if item is _END:
            return out
        out.append(item)


PROMPTS = [
    list(range(10, 26)),
    [256, 40, 41, 42, 43],
    list(range(60, 71)),
]
BUDGETS = [11, 7, 14]


def _run_staggered(srv):
    """Deterministic staggered scenario: one request admitted, two
    ticks of decode, then the rest admitted mid-flight."""
    r0 = srv.submit(PROMPTS[0], BUDGETS[0])
    srv.tick()
    srv.tick()
    rest = [srv.submit(p, b) for p, b in zip(PROMPTS[1:], BUDGETS[1:])]
    srv.drain()
    return [_collect(r) for r in [r0, *rest]]


def test_tp_streams_match_single_device():
    model, params = init_decoder(small_lm_config())
    plain = GenerationServer(model, params, slots=2, max_len=64, chunk=4)
    tp = GenerationServer(model, params, slots=2, max_len=64, chunk=4,
                          mesh=_mesh(2))
    got_plain = _run_staggered(plain)
    got_tp = _run_staggered(tp)
    assert got_tp == got_plain
    # And both match the single-stream ground truth.
    for p, b, got in zip(PROMPTS, BUDGETS, got_tp):
        ref = list(generate_stream(model, params, p, max_new_tokens=b))
        assert got == ref, (p[:2], ref, got)


def test_tp_speculative_decode_exact():
    """Speculative mode over the mesh: draft propose + target verify
    both GSPMD-partitioned; greedy streams stay bit-identical to the
    plain single-device server."""
    model, params = init_decoder(small_lm_config())
    draft, draft_params = init_decoder(
        small_lm_config(num_layers=1, hidden_size=64,
                        intermediate_size=128), seed=3
    )
    plain = GenerationServer(model, params, slots=2, max_len=64, chunk=4)
    tp = GenerationServer(model, params, slots=2, max_len=64,
                          draft_model=draft, draft_params=draft_params,
                          gamma=3, mesh=_mesh(2))
    assert _run_staggered(tp) == _run_staggered(plain)


def test_tp_chunked_prefill_and_prefix_cache_exact():
    """Incremental prefill + prefix caching over the mesh: the partial
    rows, suffix prefill, and install paths all run partitioned."""
    model, params = init_decoder(small_lm_config())
    prefix = list(range(100, 117))
    prompts = [prefix + [5, 6, 7], list(range(30, 55)), [256, 9, 8]]

    plain = GenerationServer(model, params, slots=3, max_len=64, chunk=4)
    tp = GenerationServer(model, params, slots=3, max_len=64, chunk=4,
                          prefill_chunk=8, mesh=_mesh(2))
    tp.cache_prefix(prefix)

    def run(srv):
        reqs = [srv.submit(p, 9) for p in prompts]
        srv.drain()
        return [_collect(r) for r in reqs]

    assert run(tp) == run(plain)
    assert tp.prefix_hits == 1


def test_tp_rejects_indivisible_config():
    cfg = small_lm_config(num_heads=4, num_kv_heads=1,
                          intermediate_size=128)
    model, params = init_decoder(cfg)
    with pytest.raises(ValueError, match="num_kv_heads"):
        GenerationServer(model, params, slots=1, max_len=32,
                         mesh=_mesh(2))
