"""Serving layer: micro-batching scheduler + feedback log."""

import asyncio
import json
import os

import numpy as np
import pytest

from a_nice_rag_tpu.index import build_index
from a_nice_rag_tpu.retrieval import FusedRetriever
from a_nice_rag_tpu.serving import BatchScheduler, FeedbackLog
from a_nice_rag_tpu.testing import synth_corpus


@pytest.fixture(scope="module")
def retriever():
    c = synth_corpus(n_docs=300, dim=32, n_queries=32, seed=91)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    fr = FusedRetriever(
        idx, ("voyage-3-large",), use_bm25=True, similarity_k=10,
        common_sections_n=5, budget=4096,
    )
    return c, idx, fr


def test_scheduler_batches_concurrent_queries(retriever):
    c, idx, fr = retriever

    async def run():
        sched = BatchScheduler(
            fr, {"voyage-3-large": 5.0, "BM25": 1.0}, max_wait_ms=20.0,
            t_max=16,
        )
        await sched.start()
        try:
            async def one(i):
                terms = idx.term_ids(c.query_tokens[i])[:16]
                return await sched.submit(
                    {"voyage-3-large": c.query_embeddings["voyage-3-large"][i]},
                    terms,
                )

            results = await asyncio.gather(*(one(i) for i in range(16)))
        finally:
            await sched.stop()
        return sched, results

    sched, results = asyncio.run(run())
    assert len(results) == 16
    assert sched.queries_served == 16
    # Coalescing: far fewer launches than queries.
    assert sched.batches_run < 16
    # Each result ranks the gold document highly.
    hits = 0
    for i, (ids, scores) in enumerate(results):
        got = [idx.meta.ids[j] for j in ids if j >= 0]
        hits += c.gold_ids[i] in got
    assert hits >= 14


def test_scheduler_matches_direct_call(retriever):
    c, idx, fr = retriever
    weights = {"voyage-3-large": 5.0, "BM25": 1.0}

    async def run():
        sched = BatchScheduler(fr, weights, max_wait_ms=1.0, t_max=16)
        await sched.start()
        try:
            terms = idx.term_ids(c.query_tokens[0])[:16]
            return await sched.submit(
                {"voyage-3-large": c.query_embeddings["voyage-3-large"][0]},
                terms,
            )
        finally:
            await sched.stop()

    ids_s, _ = asyncio.run(run())
    terms = np.full((1, 16), -1, np.int32)
    t = idx.term_ids(c.query_tokens[0])[:16]
    terms[0, : len(t)] = t
    fids, _, _ = fr(
        {"voyage-3-large": c.query_embeddings["voyage-3-large"][:1]},
        terms, weights, None, 40.0,
    )
    np.testing.assert_array_equal(np.asarray(ids_s), fids[0])


def test_feedback_log_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "fb.json")
    log = FeedbackLog(path)
    log.record("q1", "a1", "up", "fake-llm", [{"source": "NG1"}])
    log.record("q2", "a2", "down")
    entries = log.entries()
    assert len(entries) == 2
    assert entries[0]["rating"] == "up"
    assert entries[1]["query"] == "q2"
    raw = json.load(open(path))
    assert isinstance(raw, list) and len(raw) == 2


def test_debug_flags_catch_nans():
    import jax
    import jax.numpy as jnp

    from a_nice_rag_tpu.utils.debugging import disable_debug, enable_debug

    enable_debug(nans=True)
    try:
        with pytest.raises(FloatingPointError):
            jnp.asarray(jnp.log(jnp.zeros(4)) * 0).block_until_ready()
    finally:
        disable_debug()
    # And clean afterwards.
    assert np.isnan(np.asarray(jnp.asarray(float("nan")))).all()


def test_device_profile_writes_trace(tmp_path):
    import jax.numpy as jnp

    from a_nice_rag_tpu.utils.trace import device_profile

    with device_profile(str(tmp_path)):
        jnp.ones((8, 8)).sum().block_until_ready()
    import glob as g

    assert g.glob(str(tmp_path) + "/**/*.pb", recursive=True) or g.glob(
        str(tmp_path) + "/**/*trace*", recursive=True
    )


def test_terminal_app_loop(monkeypatch, tmp_path, capsys):
    from a_nice_rag_tpu.config import InfoSource
    from a_nice_rag_tpu.index import build_index
    from a_nice_rag_tpu.rag import FakeLLMClient, RAGSystem
    from a_nice_rag_tpu.retrieval.embed import PrecomputedEmbedder
    from a_nice_rag_tpu.serving import app as app_mod
    from a_nice_rag_tpu.testing import synth_corpus

    c = synth_corpus(n_docs=80, dim=16, n_queries=2, seed=171)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents, urls=c.urls,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    system = RAGSystem(
        indexes={InfoSource.NICE: idx},
        embedder=PrecomputedEmbedder(
            {"what now?": c.query_embeddings["voyage-3-large"][0]}
        ),
        llm_clients={"fake": FakeLLMClient()},
    )
    feed = iter(["what now?", "u", ""])
    monkeypatch.setattr("builtins.input", lambda *a: next(feed))
    monkeypatch.chdir(tmp_path)
    app_mod.run_terminal(system, llm_model="fake-llm")
    out = capsys.readouterr().out
    assert "[fake:fake-llm]" in out
    assert "--- sources ---" in out
    # Thumbs-up got recorded.
    from a_nice_rag_tpu.serving.feedback import FeedbackLog

    entries = FeedbackLog(
        str(tmp_path / "feedback/query_feedback.json")
    ).entries()
    assert len(entries) == 1 and entries[0]["rating"] == "up"


def test_adaptive_wait_policy(retriever):
    c, idx, fr = retriever
    sched = BatchScheduler(fr, {"voyage-3-large": 1.0}, max_wait_ms=2.0,
                           adaptive=True)
    # No estimate yet: fall back to the cap.
    assert sched._adaptive_wait_s() == pytest.approx(0.002)
    # Light load (1 query / 100 ms): expected arrivals in the window < 1
    # -> ship immediately.
    sched._inter_ewma_s = 0.1
    assert sched._adaptive_wait_s() == 0.0
    # Heavy load (1 query / us): wait only as long as filling max_batch
    # takes, well under the cap.
    sched._inter_ewma_s = 1e-6
    w = sched._adaptive_wait_s()
    assert 0 < w <= 256 * 1e-6 + 1e-9
    # adaptive off: always the cap.
    sched.adaptive = False
    assert sched._adaptive_wait_s() == pytest.approx(0.002)


def test_adaptive_scheduler_serves_bursts(retriever):
    c, idx, fr = retriever
    weights = {"voyage-3-large": 5.0, "BM25": 1.0}

    async def run():
        sched = BatchScheduler(fr, weights, max_wait_ms=5.0, t_max=16,
                               adaptive=True)
        await sched.start()
        try:
            async def one(i):
                terms = idx.term_ids(c.query_tokens[i])[:16]
                return await sched.submit(
                    {"voyage-3-large": c.query_embeddings["voyage-3-large"][i]},
                    terms,
                )
            # Burst, pause, single query (exercises the no-wait branch).
            burst = await asyncio.gather(*(one(i) for i in range(8)))
            await asyncio.sleep(0.05)
            single = await one(8)
            return sched, burst + [single]
        finally:
            await sched.stop()

    sched, results = asyncio.run(run())
    assert len(results) == 9 and sched.queries_served == 9
    hits = sum(
        c.gold_ids[i] in [idx.meta.ids[j] for j in ids if j >= 0]
        for i, (ids, _) in enumerate(results)
    )
    assert hits >= 8


def test_scheduler_pool_per_configuration(retriever):
    from a_nice_rag_tpu.serving import SchedulerPool

    c, idx, fr = retriever

    async def run():
        pool = SchedulerPool(fr, max_wait_ms=2.0, t_max=16)
        try:
            terms = idx.term_ids(c.query_tokens[0])[:16]
            q = {"voyage-3-large": c.query_embeddings["voyage-3-large"][0]}
            ids_h, _ = await pool.submit(
                q, terms, weights={"voyage-3-large": 5.0, "BM25": 1.0})
            ids_d, _ = await pool.submit(
                q, terms, weights={"voyage-3-large": 1.0})
            # Same config key -> same scheduler instance (no new entry).
            await pool.submit(
                q, terms, weights={"BM25": 1.0, "voyage-3-large": 5.0})
            return pool, ids_h, ids_d
        finally:
            await pool.stop()

    pool, ids_h, ids_d = asyncio.run(run())
    assert len(pool.stats) == 2  # two distinct configurations
    # Direct-call parity for the hybrid config.
    terms = idx.pad_term_ids([c.query_tokens[0]], 16)
    f_ids, _, _ = fr(
        {"voyage-3-large": c.query_embeddings["voyage-3-large"][:1]},
        terms, {"voyage-3-large": 5.0, "BM25": 1.0},
    )
    np.testing.assert_array_equal(ids_h, f_ids[0])


def test_scheduler_over_sharded_retriever():
    """The micro-batch scheduler serves a mesh-sharded retriever: the
    serving-at-scale composition (SURVEY §7 stage 6 over stage 5)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from a_nice_rag_tpu.parallel import shard_index
    from a_nice_rag_tpu.parallel.sharded import ShardedRetriever

    c = synth_corpus(n_docs=512, dim=32, n_queries=16, seed=95)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    mesh = Mesh(np.array(jax.devices()).reshape(1, 8), ("dp", "corpus"))
    sidx = shard_index(idx, mesh)
    sr = ShardedRetriever(
        sidx, model_names=("voyage-3-large",), use_bm25=True,
        similarity_k=10, common_sections_n=5, budget=2048,
    )

    async def run():
        sched = BatchScheduler(
            sr, {"voyage-3-large": 5.0, "BM25": 1.0}, max_wait_ms=20.0,
            t_max=16,
        )
        await sched.start()
        try:
            async def one(i):
                terms = idx.term_ids(c.query_tokens[i])[:16]
                return await sched.submit(
                    {"voyage-3-large": c.query_embeddings["voyage-3-large"][i]},
                    terms,
                )

            return sched, await asyncio.gather(*(one(i) for i in range(12)))
        finally:
            await sched.stop()

    sched, results = asyncio.run(run())
    assert len(results) == 12 and sched.queries_served == 12
    hits = 0
    for i, (ids, scores) in enumerate(results):
        got = [idx.meta.ids[j] for j in ids if j >= 0]
        hits += c.gold_ids[i] in got
    assert hits >= 8, hits


def test_submit_many_coalesces_with_single_queries(retriever):
    """A client-batched submission (one queue entry carrying B rows)
    must return per-row results identical to B single submits, and
    coalesce into the SAME device batches as concurrent single-query
    traffic."""
    c, idx, fr = retriever

    async def run():
        sched = BatchScheduler(
            fr, {"voyage-3-large": 5.0, "BM25": 1.0}, max_batch=64,
            max_wait_ms=5.0, t_max=16,
        )
        await sched.start()
        try:
            q = c.query_embeddings["voyage-3-large"]
            terms = np.asarray(idx.pad_term_ids(c.query_tokens, 16))

            async def single(i):
                return await sched.submit(
                    {"voyage-3-large": q[i]}, terms[i]
                )

            block = sched.submit_many(
                {"voyage-3-large": q[4:12]}, terms[4:12]
            )
            singles = asyncio.gather(*(single(i) for i in range(4)))
            (rows_b, scores_b), singles_out = await asyncio.gather(
                block, singles
            )
            assert rows_b.shape[0] == 8
            # per-row parity vs single submissions of the same queries
            for j, i in enumerate(range(4, 12)):
                r1, s1 = await sched.submit(
                    {"voyage-3-large": q[i]}, terms[i]
                )
                np.testing.assert_array_equal(rows_b[j], r1)
                np.testing.assert_allclose(scores_b[j], s1, rtol=1e-5)
            assert sched.queries_served >= 8 + 4
            return sched
        finally:
            await sched.stop()

    asyncio.run(run())


def test_submit_many_single_row_keeps_batch_axis(retriever):
    """A 1-row client batch must come back [1, n]/[1, n] — NOT squeezed
    to the submit() 1-D form (regression: rows==1 was ambiguous between
    submit and a 1-row submit_many; the HTTP RPC path then replied a
    flat array and clients mis-shaped it)."""
    c, idx, fr = retriever

    async def run():
        sched = BatchScheduler(
            fr, {"voyage-3-large": 5.0, "BM25": 1.0}, max_wait_ms=1.0,
            t_max=16,
        )
        await sched.start()
        try:
            q = c.query_embeddings["voyage-3-large"][:1]
            terms = np.asarray(idx.pad_term_ids(c.query_tokens[:1], 16))
            rows, scores = await sched.submit_many(
                {"voyage-3-large": q}, terms
            )
            assert rows.ndim == 2 and rows.shape[0] == 1
            assert scores.ndim == 2 and scores.shape[0] == 1
            r1, s1 = await sched.submit(
                {"voyage-3-large": q[0]}, terms[0]
            )
            assert r1.ndim == 1
            np.testing.assert_array_equal(rows[0], r1)
        finally:
            await sched.stop()

    asyncio.run(run())
