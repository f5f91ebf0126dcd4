"""Index artifact persistence and reference-format importers.

The native artifact is a directory with one compressed ``.npz`` of arrays
plus a ``meta.json`` — the checkpoint/resume story for the index layer
(SURVEY.md §5: persist the built index as an artifact; idempotent
ingestion keyed by chunk id).

Importers read the reference's on-disk formats directly:
* SQLite chunk DBs ``chunks(id, content, source, embedding BLOB, url)``
  (reference src/processing/create_database.py:57-66) with float32 blobs,
* SQLite query DBs ``queries(id, query, query_embedding BLOB)``
  (reference notebooks/question_generation.ipynb cell 8),
* preprocessed-chunk CSVs with token-list columns
  (reference src/processing/preprocess_bm25.py:55-94).
"""

from __future__ import annotations

import ast
import json
import os
import sqlite3
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.index.array_index import (
    ArrayIndex,
    CorpusMeta,
    dense_impact_from_csr,
)
from a_nice_rag_tpu.ops.bm25 import Bm25Arrays

_FORMAT_VERSION = 1


def save_index(index: ArrayIndex, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    for model, emb in index.dense.items():
        arrays[f"dense/{model}"] = np.asarray(emb)
    if index.bm25 is not None:
        arrays["bm25/indptr"] = np.asarray(index.bm25.indptr)
        arrays["bm25/doc_ids"] = np.asarray(index.bm25.doc_ids)
        arrays["bm25/impact"] = np.asarray(index.bm25.impact)
        arrays["bm25/doc_mask"] = np.asarray(index.bm25_doc_mask)
    np.savez_compressed(os.path.join(path, "arrays.npz"), **arrays)
    meta = {
        "format_version": _FORMAT_VERSION,
        "n_docs": index.meta.n_docs,
        "n_docs_padded": index.meta.n_docs_padded,
        "ids": index.meta.ids,
        "sources": index.meta.sources,
        "urls": index.meta.urls,
        "contents": index.meta.contents,
        "dense_models": list(index.dense.keys()),
        "vocab": index.vocab,
        "bm25_stats": index.bm25_stats,
    }
    with open(os.path.join(path, "meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f)


def load_index(path: str, emb_dtype: str = "float32") -> ArrayIndex:
    with open(os.path.join(path, "meta.json"), "r", encoding="utf-8") as f:
        meta_d = json.load(f)
    data = np.load(os.path.join(path, "arrays.npz"))
    meta = CorpusMeta(
        ids=meta_d["ids"],
        sources=meta_d["sources"],
        contents=meta_d["contents"],
        urls=meta_d["urls"],
        n_docs=meta_d["n_docs"],
        n_docs_padded=meta_d["n_docs_padded"],
    )
    dense = {
        m: jnp.asarray(data[f"dense/{m}"], dtype=jnp.dtype(emb_dtype))
        for m in meta_d["dense_models"]
    }
    bm25 = None
    bm25_doc_mask = None
    bm25_dense = None
    if "bm25/indptr" in data:
        bm25 = Bm25Arrays(
            indptr=jnp.asarray(data["bm25/indptr"]),
            doc_ids=jnp.asarray(data["bm25/doc_ids"]),
            impact=jnp.asarray(data["bm25/impact"]),
            n_docs_padded=meta_d["n_docs_padded"],
        )
        bm25_doc_mask = data["bm25/doc_mask"]
        # The MXU fast-path matrix is derived, not stored: rebuild it
        # when it fits the default memory budget (see build_index).
        v = bm25.vocab_size
        if v * meta_d["n_docs_padded"] * 4 <= (4 << 30):
            bm25_dense = dense_impact_from_csr(bm25)
    return ArrayIndex(
        meta=meta,
        dense=dense,
        bm25=bm25,
        vocab=meta_d["vocab"],
        bm25_stats=meta_d["bm25_stats"],
        bm25_doc_mask=bm25_doc_mask,
        bm25_dense=bm25_dense,
    )


def load_reference_chunk_db(
    db_path: str,
) -> Tuple[List[str], List[str], List[str], List[str], np.ndarray]:
    """Read a reference-format chunk DB into columnar arrays.

    Returns (ids, contents, sources, urls, embeddings [N, D] float32).
    Unlike the reference's per-row ``np.frombuffer`` DataFrame decode
    (src/database_manager.py:49), embeddings are decoded into one
    contiguous matrix in a single pass.
    """
    conn = sqlite3.connect(db_path)
    try:
        cols = {
            r[1] for r in conn.execute("PRAGMA table_info(chunks)").fetchall()
        }
        has_url = "url" in cols
        sel = "SELECT id, content, source, embedding" + (
            ", url" if has_url else ""
        ) + " FROM chunks"
        ids, contents, sources, urls, blobs = [], [], [], [], []
        for row in conn.execute(sel):
            ids.append(row[0])
            contents.append(row[1])
            sources.append(row[2])
            blobs.append(row[3])
            urls.append(row[4] if has_url else "Unknown")
    finally:
        conn.close()
    if not blobs:
        return ids, contents, sources, urls, np.zeros((0, 0), np.float32)
    flat = np.frombuffer(b"".join(blobs), dtype=np.float32)
    emb = flat.reshape(len(blobs), -1)
    return ids, contents, sources, urls, emb


def load_reference_query_db(db_path: str) -> Tuple[List[str], List[str], np.ndarray]:
    """Read a reference-format query DB: (ids, queries, embeddings [Q, D])."""
    conn = sqlite3.connect(db_path)
    try:
        rows = conn.execute(
            "SELECT id, query, query_embedding FROM queries "
            "WHERE query_embedding IS NOT NULL"
        ).fetchall()
    finally:
        conn.close()
    ids = [r[0] for r in rows]
    queries = [r[1] for r in rows]
    if not rows:
        return ids, queries, np.zeros((0, 0), np.float32)
    flat = np.frombuffer(b"".join(r[2] for r in rows), dtype=np.float32)
    return ids, queries, flat.reshape(len(rows), -1)


def load_preprocessed_tokens_csv(
    csv_path: str, token_column: str = "tokens_lemmatized"
) -> Dict[str, List[str]]:
    """Read a reference preprocessed-chunks/queries CSV: id -> token list."""
    import csv

    out: Dict[str, List[str]] = {}
    with open(csv_path, "r", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        for row in reader:
            raw = row.get(token_column, "")
            try:
                toks = ast.literal_eval(raw) if isinstance(raw, str) else raw
            except (ValueError, SyntaxError):
                toks = []
            out[row["id"]] = toks if isinstance(toks, list) else []
    return out
