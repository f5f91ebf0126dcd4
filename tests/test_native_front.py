"""Native (C++) binary serving front: protocol, parity, coalescing.

The front (native/anr_serve.cpp + serving/native_front.py) moves
accept/parse/batch/reply framing off Python; these tests check the
full loop — client frame -> native queue -> Python dispatch -> device
program -> native reply — gives bit-identical results to calling the
retriever directly, and that concurrent clients coalesce into shared
device batches.
"""

import threading

import numpy as np
import pytest

from a_nice_rag_tpu.index import build_index
from a_nice_rag_tpu.retrieval import FusedRetriever
from a_nice_rag_tpu.testing import synth_corpus

pytest.importorskip("ctypes")


@pytest.fixture(scope="module")
def setup():
    from a_nice_rag_tpu.native.build import load_serve_lib

    if load_serve_lib() is None:
        pytest.skip("no C++ toolchain for the native front")
    c = synth_corpus(n_docs=300, dim=32, n_queries=64, seed=17)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    fr = FusedRetriever(
        idx, ("voyage-3-large",), use_bm25=True, similarity_k=10,
        common_sections_n=5, budget=4096,
    )
    return c, idx, fr


WEIGHTS = {"voyage-3-large": 5.0, "BM25": 1.0}


def _front(fr, **kw):
    from a_nice_rag_tpu.serving.native_front import NativeRetrievalFront

    kw.setdefault("t_max", 16)
    kw.setdefault("wait_ms", 5.0)
    return NativeRetrievalFront(fr, WEIGHTS, port=0, **kw)


def test_native_front_matches_direct_call(setup):
    from a_nice_rag_tpu.serving.native_front import NativeFrontClient

    c, idx, fr = setup
    B = 8
    q = np.asarray(c.query_embeddings["voyage-3-large"][:B], np.float32)
    terms = np.asarray(idx.pad_term_ids(c.query_tokens[:B], 16), np.int32)
    with _front(fr) as front:
        with NativeFrontClient("127.0.0.1", front.port) as cl:
            rows, scores = cl.search(q, terms)
    d_rows, d_scores, _ = fr.retrieve_device(
        {"voyage-3-large": q}, terms, WEIGHTS, None, 40.0
    )
    np.testing.assert_array_equal(rows, np.asarray(d_rows))
    np.testing.assert_allclose(scores, np.asarray(d_scores), rtol=1e-6)


def test_native_front_single_row_and_no_terms(setup):
    from a_nice_rag_tpu.serving.native_front import NativeFrontClient

    c, idx, fr = setup
    q = np.asarray(c.query_embeddings["voyage-3-large"][0], np.float32)
    with _front(fr) as front:
        with NativeFrontClient("127.0.0.1", front.port) as cl:
            rows, scores = cl.search(q)  # 1-row frame, no terms
            assert rows.shape[0] == 1
            # Dense-only submission still ranks the gold doc: terms
            # pad to -1 server-side so BM25 contributes nothing.
            got = [idx.meta.ids[j] for j in rows[0] if j >= 0]
            assert c.gold_ids[0] in got


def test_native_front_coalesces_concurrent_clients(setup):
    from a_nice_rag_tpu.serving.native_front import NativeFrontClient

    c, idx, fr = setup
    n_clients, per = 4, 4
    results = {}
    errors = []
    with _front(fr, wait_ms=20.0) as front:
        barrier = threading.Barrier(n_clients)

        def worker(w):
            try:
                with NativeFrontClient("127.0.0.1", front.port) as cl:
                    barrier.wait()
                    for j in range(per):
                        i = w * per + j
                        q = c.query_embeddings["voyage-3-large"][i]
                        t = idx.pad_term_ids([c.query_tokens[i]], 16)[0]
                        results[i] = cl.search(
                            np.asarray(q, np.float32),
                            np.asarray(t, np.int32),
                        )
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [
            threading.Thread(target=worker, args=(w,))
            for w in range(n_clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = front.stats()
    assert not errors, errors
    assert len(results) == n_clients * per
    assert stats["rows_in"] == n_clients * per
    assert stats["bad_frames"] == 0
    # Concurrent 1-row frames coalesce into shared device batches.
    assert stats["batches_run"] < n_clients * per
    hits = sum(
        c.gold_ids[i] in [idx.meta.ids[j] for j in rows[0] if j >= 0]
        for i, (rows, _) in results.items()
    )
    assert hits >= n_clients * per - 2


def test_native_front_rejects_garbage_then_keeps_serving(setup):
    import socket

    from a_nice_rag_tpu.serving.native_front import NativeFrontClient

    c, idx, fr = setup
    with _front(fr) as front:
        # A garbage connection is dropped without killing the server.
        s = socket.create_connection(("127.0.0.1", front.port), timeout=5)
        s.sendall(b"GET / HTTP/1.1\r\n\r\n")
        # Server drops the connection on protocol desync: either a
        # clean FIN (empty read) or an RST if our bytes were unread.
        try:
            assert s.recv(64) == b""
        except ConnectionResetError:
            pass
        s.close()
        q = np.asarray(
            c.query_embeddings["voyage-3-large"][:2], np.float32
        )
        with NativeFrontClient("127.0.0.1", front.port) as cl:
            rows, scores = cl.search(q)
            assert rows.shape[0] == 2
        assert front.stats()["bad_frames"] >= 1


def test_native_front_multi_model_rejected(setup):
    from a_nice_rag_tpu.serving.native_front import NativeRetrievalFront

    c, idx, fr = setup

    class Fake:
        model_names = ("a", "b")
        index = idx

    with pytest.raises(ValueError, match="single-dense-model"):
        NativeRetrievalFront(Fake(), WEIGHTS, port=0)


def test_native_front_hostname_binds(setup):
    """--host localhost (a hostname, not an IPv4 literal) must bind:
    anr_serve_start falls back to getaddrinfo resolution."""
    from a_nice_rag_tpu.serving.native_front import NativeFrontClient

    c, idx, fr = setup
    q = np.asarray(c.query_embeddings["voyage-3-large"][:2], np.float32)
    with _front(fr, host="localhost") as front:
        with NativeFrontClient("localhost", front.port) as cl:
            rows, _ = cl.search(q)
            assert rows.shape[0] == 2


def test_native_front_quantized_index(setup):
    """An int8-quantized index keeps its model in index.dense_q: the
    front must derive dim via dense_matrix() instead of index.dense."""
    from a_nice_rag_tpu.serving.native_front import NativeFrontClient

    c, idx, fr = setup
    q_idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents,
        embeddings=c.embeddings, token_lists=c.tokens,
        quantize_dense=True,
    )
    assert "voyage-3-large" not in q_idx.dense  # lives in dense_q
    qfr = FusedRetriever(
        q_idx, ("voyage-3-large",), use_bm25=True, similarity_k=10,
        common_sections_n=5, budget=4096,
    )
    B = 4
    q = np.asarray(c.query_embeddings["voyage-3-large"][:B], np.float32)
    terms = np.asarray(q_idx.pad_term_ids(c.query_tokens[:B], 16), np.int32)
    with _front(qfr) as front:
        assert front.dim == q.shape[1]
        with NativeFrontClient("127.0.0.1", front.port) as cl:
            rows, scores = cl.search(q, terms)
    d_rows, d_scores, _ = qfr.retrieve_device(
        {"voyage-3-large": q}, terms, WEIGHTS, None, 40.0
    )
    np.testing.assert_array_equal(rows, np.asarray(d_rows))
    np.testing.assert_allclose(scores, np.asarray(d_scores), rtol=1e-6)


def test_native_front_sharded_retriever(setup):
    """A ShardedRetriever has .sidx (no .index): the front must derive
    dim from the sharded matrices and pad batches to a dp multiple."""
    from a_nice_rag_tpu.parallel import make_mesh, shard_index
    from a_nice_rag_tpu.parallel.sharded import ShardedRetriever
    from a_nice_rag_tpu.serving.native_front import NativeFrontClient

    c, idx, fr = setup
    mesh = make_mesh(shape=(2, 4), axis_names=("dp", "corpus"))
    sidx = shard_index(idx, mesh)
    sr = ShardedRetriever(
        sidx, ("voyage-3-large",), use_bm25=True, similarity_k=10,
        common_sections_n=5, budget=4096,
    )
    B = 8
    q = np.asarray(c.query_embeddings["voyage-3-large"][:B], np.float32)
    terms = np.asarray(idx.pad_term_ids(c.query_tokens[:B], 16), np.int32)
    with _front(sr) as front:
        assert front.dim == q.shape[1]
        with NativeFrontClient("127.0.0.1", front.port) as cl:
            rows, scores = cl.search(q, terms)
    d_rows, d_scores, _ = sr.retrieve_device(
        {"voyage-3-large": q}, terms, WEIGHTS, None, 40.0
    )
    np.testing.assert_array_equal(rows, np.asarray(d_rows))
    np.testing.assert_allclose(scores, np.asarray(d_scores), rtol=1e-6)


def test_native_front_backpressure_cap(setup):
    """With a tiny max_queued_rows cap, a client that pipelines frames
    far ahead of the device hits reader backpressure (blocked reads,
    bounded server memory) but still gets every reply (order across
    batches is not guaranteed with inflight>1; req_id pairs them)."""
    import socket
    import struct

    c, idx, fr = setup
    n_frames = 24
    q = np.asarray(c.query_embeddings["voyage-3-large"][0], np.float32)
    with _front(fr, max_queued_rows=4, wait_ms=5.0) as front:
        s = socket.create_connection(("127.0.0.1", front.port), timeout=30)
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        body = q.tobytes()
        blob = b"".join(
            struct.pack("<IIIHH", 0x51524E41, 8 + len(body), rid, 1, 0)
            + body
            for rid in range(1, n_frames + 1)
        )
        # One bulk send: the socket buffer + blocked reader absorb it.
        sender = __import__("threading").Thread(
            target=s.sendall, args=(blob,)
        )
        sender.start()

        def recv_all(n):
            out = b""
            while len(out) < n:
                b = s.recv(n - len(out))
                assert b, "connection closed early"
                out += b
            return out

        got = []
        for _ in range(n_frames):
            magic, plen = struct.unpack("<II", recv_all(8))
            assert magic == 0x50524E41
            payload = recv_all(plen)
            rid = struct.unpack("<I", payload[:4])[0]
            got.append(rid)
        sender.join()
        s.close()
        assert sorted(got) == list(range(1, n_frames + 1))


def test_native_front_bf16_wire(setup):
    """wire_dtype="bf16" halves the bytes per row on the socket AND the
    host->device upload; ranking must match the f32 wire up to bf16
    query rounding (overlap, not bit equality — scores come from the
    rounded query embedding)."""
    from a_nice_rag_tpu.serving.native_front import NativeFrontClient

    c, idx, fr = setup
    B = 8
    q = np.asarray(c.query_embeddings["voyage-3-large"][:B], np.float32)
    terms = np.asarray(idx.pad_term_ids(c.query_tokens[:B], 16), np.int32)
    with _front(fr, wire_dtype="bf16") as front:
        assert front.wire_dtype == "bf16"
        with NativeFrontClient("127.0.0.1", front.port,
                               wire_dtype="bf16") as cl:
            rows, scores = cl.search(q, terms)
    d_rows, d_scores, _ = fr.retrieve_device(
        {"voyage-3-large": q}, terms, WEIGHTS, None, 40.0
    )
    d_rows = np.asarray(d_rows)
    assert rows.shape == d_rows.shape
    k = rows.shape[1]
    overlap = np.mean([
        len(set(rows[i]) & set(d_rows[i])) / k for i in range(B)
    ])
    assert overlap >= 0.9, f"bf16-wire overlap {overlap} vs f32 direct"
    # The gold doc still ranks for each query (quality, not just shape).
    hits = sum(
        c.gold_ids[i] in [idx.meta.ids[j] for j in rows[i] if j >= 0]
        for i in range(B)
    )
    assert hits >= B - 1


def test_native_front_wire_dtype_mismatch(setup):
    """A client sending the wrong embedding dtype gets a clean protocol
    error naming the expected dtype, not a dropped connection."""
    from a_nice_rag_tpu.serving.native_front import NativeFrontClient

    c, idx, fr = setup
    q = np.asarray(c.query_embeddings["voyage-3-large"][:2], np.float32)
    with _front(fr, wire_dtype="bf16") as front:
        with NativeFrontClient("127.0.0.1", front.port) as cl:  # f32
            with pytest.raises(RuntimeError, match="expects bf16"):
                cl.search(q)
    with _front(fr) as front:  # f32 server
        with NativeFrontClient("127.0.0.1", front.port,
                               wire_dtype="bf16") as cl:
            with pytest.raises(RuntimeError, match="expects f32"):
                cl.search(q)


def test_native_front_int8_wire(setup):
    """wire_dtype="int8" quarters the bytes per row (dim int8 + one f32
    per-row scale); the dispatcher uploads int8+scales and dequantizes
    on device. Ranking must match the f32 wire up to int8 query
    quantization, and a round-exact query (already i8*scale on the
    client) must reproduce the f32 path's ids bit-for-bit."""
    from a_nice_rag_tpu.serving.native_front import NativeFrontClient

    c, idx, fr = setup
    B = 8
    q = np.asarray(c.query_embeddings["voyage-3-large"][:B], np.float32)
    terms = np.asarray(idx.pad_term_ids(c.query_tokens[:B], 16), np.int32)
    with _front(fr, wire_dtype="int8") as front:
        assert front.wire_dtype == "int8"
        with NativeFrontClient("127.0.0.1", front.port,
                               wire_dtype="int8") as cl:
            rows, scores = cl.search(q, terms)
            # Round-exact probe: a query whose components are already
            # i8 * (max/127) survives the wire without loss, so the
            # device result must bit-match the f32 path on that query.
            mx = np.max(np.abs(q), axis=1, keepdims=True)
            q_exact = (
                np.clip(np.rint(q / (mx / 127.0)), -127, 127)
                * (mx / 127.0)
            ).astype(np.float32)
            rows_e, _ = cl.search(q_exact, terms)
    d_rows, _, _ = fr.retrieve_device(
        {"voyage-3-large": q}, terms, WEIGHTS, None, 40.0
    )
    d_rows = np.asarray(d_rows)
    assert rows.shape == d_rows.shape
    k = rows.shape[1]
    overlap = np.mean([
        len(set(rows[i]) & set(d_rows[i])) / k for i in range(B)
    ])
    assert overlap >= 0.9, f"int8-wire overlap {overlap} vs f32 direct"
    hits = sum(
        c.gold_ids[i] in [idx.meta.ids[j] for j in rows[i] if j >= 0]
        for i in range(B)
    )
    assert hits >= B - 1
    d_rows_e, _, _ = fr.retrieve_device(
        {"voyage-3-large": q_exact}, terms, WEIGHTS, None, 40.0
    )
    np.testing.assert_array_equal(rows_e, np.asarray(d_rows_e))


def test_native_front_int8_wire_dtype_mismatch(setup):
    """int8 frames against a non-int8 server (and vice versa) get the
    clean protocol error naming the expected dtype."""
    from a_nice_rag_tpu.serving.native_front import NativeFrontClient

    c, idx, fr = setup
    q = np.asarray(c.query_embeddings["voyage-3-large"][:2], np.float32)
    with _front(fr, wire_dtype="int8") as front:
        with NativeFrontClient("127.0.0.1", front.port) as cl:  # f32
            with pytest.raises(RuntimeError, match="expects int8"):
                cl.search(q)
    with _front(fr) as front:  # f32 server
        with NativeFrontClient("127.0.0.1", front.port,
                               wire_dtype="int8") as cl:
            with pytest.raises(RuntimeError, match="expects f32"):
                cl.search(q)
