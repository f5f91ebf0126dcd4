"""Ingestion pipeline: XML->MD, chunker behavior, BM25 build/tune, intake."""

import os
import textwrap

import numpy as np
import pytest

from a_nice_rag_tpu.ingest import MarkdownChunker, TokenCounter
from a_nice_rag_tpu.ingest.bm25_build import (
    build_bm25_component,
    preprocess_chunks,
    read_tokens_csv,
    write_tokens_csv,
)
from a_nice_rag_tpu.ingest.embed_db import (
    embed_chunks_incremental,
    existing_chunk_ids,
)
from a_nice_rag_tpu.ingest.tokens import heuristic_token_count
from a_nice_rag_tpu.ingest.xml_to_md import convert_xml_to_markdown

XML_DOC = """<Guidance>
<Title>Hypertension in adults</Title>
<GuidanceNumber>NG136</GuidanceNumber>
<LastModified>2023-01-01</LastModified>
<Chapters>
<Chapter>
<Title>Recommendations</Title>
<Content><![CDATA[<p>See <a href="https://example.org/x">the evidence</a>
for <strong>stage 2</strong> hypertension.</p>
<table><caption>Drug doses</caption>
<tr><th>Drug</th><th>Dose</th></tr>
<tr><td>ACEi</td><td>10|mg</td></tr></table>]]></Content>
<Sections>
<Section><Title>Adults under 55</Title>
<Content><![CDATA[<p>Offer an <em>ACE inhibitor</em>.</p><ul><li>step 1</li><li>step 2</li></ul>]]></Content>
</Section>
</Sections>
</Chapter>
</Chapters>
</Guidance>"""


def test_xml_to_markdown():
    md = convert_xml_to_markdown(XML_DOC)
    assert md.startswith("# Hypertension in adults")
    assert "**Guidance Number:** NG136" in md
    assert "## Recommendations" in md
    assert "### Adults under 55" in md
    assert "[the evidence](https://example.org/x)" in md
    assert "**stage 2**" in md
    assert "*ACE inhibitor*" in md
    assert "- step 1" in md
    assert "**Drug doses**" in md
    assert "| Drug | Dose |" in md
    assert "10\\|mg" in md  # pipes escaped inside cells
    assert "\n\n\n" not in md


def _make_md(n_sections=3, words_per=120):
    parts = ["# NG99 guideline title", ""]
    for s in range(n_sections):
        parts.append(f"## Section {s}")
        for p in range(3):
            parts.append(" ".join(f"word{s}{p}x{i}" for i in range(words_per)))
            parts.append("")
    return "\n".join(parts)


def test_chunker_small_sections_kept_whole():
    ch = MarkdownChunker(max_tokens=600, min_tokens=10, overlap_tokens=50)
    chunks = ch.chunk_markdown(_make_md(3, 100), "NG99_doc.md")
    titles = [c.title for c in chunks]
    assert any(t.startswith("NG99_Section 0") for t in titles)
    assert all(c.source == "NG99" for c in chunks)
    assert all(c.tokens <= 600 for c in chunks)


def test_chunker_oversized_section_splits_with_overlap():
    ch = MarkdownChunker(max_tokens=120, min_tokens=10, overlap_tokens=50)
    paras = []
    for p in range(30):
        sentences = " ".join(
            " ".join(f"a{p}w{i}s{s}" for i in range(8)) + "."
            for s in range(2)
        )
        paras.append(sentences)
    md = "\n\n".join(["# NG1 title", "## Big section"] + paras)
    chunks = ch.chunk_markdown(md, "NG1_doc.md")
    parts = [c for c in chunks if " - Part " in c.title]
    assert len(parts) >= 2
    assert any("[..." in c.content for c in parts), "sentence overlap missing"
    assert all(c.title.startswith("NG1_") for c in chunks)


def test_chunker_recurses_into_children():
    ch = MarkdownChunker(max_tokens=150, min_tokens=10, overlap_tokens=0)
    body = lambda tag: "\n\n".join(
        " ".join(f"{tag}w{i}p{p}" for i in range(30)) for p in range(4)
    )
    md = textwrap.dedent(
        f"""\
        # CG5 doc

        ## Parent section

        ### Child one

        {body('a')}

        ### Child two

        {body('b')}
        """
    )
    chunks = ch.chunk_markdown(md, "CG5_doc.md")
    assert any("Parent section: Child one" in c.title for c in chunks)
    assert any(
        c.parent_section == "Parent section"
        for c in chunks
        if "Child" in c.title
    )


def test_chunker_merges_small_chunks():
    ch = MarkdownChunker(max_tokens=600, min_tokens=200, overlap_tokens=0)
    md = "\n".join(
        ["# NG7 doc", ""]
        + sum(
            (
                [f"## Tiny {s}", f"short content {s} here", ""]
                for s in range(4)
            ),
            [],
        )
    )
    chunks = ch.chunk_markdown(md, "NG7_doc.md")
    assert len(chunks) < 4
    merged = [c for c in chunks if c.merged_sections]
    assert merged and " & " in merged[0].title


def test_chunker_dedup():
    ch = MarkdownChunker(max_tokens=600, min_tokens=10)
    same = " ".join(f"dup{i}" for i in range(50))
    md = f"# X1 doc\n\n## A\n\n{same}\n\n## B\n\n{same}\n"
    chunks = ch.chunk_markdown(md, "X1_doc.md")
    assert len(chunks) == 1


def test_token_counter_heuristic_reasonable():
    text = "The quick brown fox jumps over the lazy dog."
    n = heuristic_token_count(text)
    assert 9 <= n <= 13
    assert heuristic_token_count("") == 0
    c = TokenCounter(mode="heuristic")
    assert c(text) == n  # memoized consistency


def test_preprocess_chunks_and_csv_roundtrip(tmp_path):
    chunks = [
        {"title": "NG1_A", "source": "NG1",
         "content": "Patients with diabetes need regular reviews."},
        {"title": "", "source": "NG1", "content": "skipped"},
    ]
    rows = preprocess_chunks(chunks)
    assert len(rows) == 1
    assert "diabetes" in rows[0]["tokens_lemmatized"]
    assert "patient" in rows[0]["tokens_lemmatized"]  # lemmatized
    path = os.path.join(tmp_path, "tokens.csv")
    write_tokens_csv(rows, path)
    back = read_tokens_csv(path)
    assert back[0]["tokens_lemmatized"] == rows[0]["tokens_lemmatized"]


def test_embed_incremental(tmp_path):
    class CountingEmbedder:
        def __init__(self):
            self.calls = 0

        def embed_documents(self, texts):
            self.calls += len(texts)
            return np.ones((len(texts), 4), np.float32)

    db = os.path.join(tmp_path, "chunks.db")
    chunks = [
        {"title": f"NG1_S{i}", "content": f"text {i}", "source": "NG1"}
        for i in range(5)
    ]
    e = CountingEmbedder()
    assert embed_chunks_incremental(chunks, e, db, batch_size=2) == 5
    assert e.calls == 5
    assert len(existing_chunk_ids(db)) == 5
    # Second run: nothing to embed.
    assert embed_chunks_incremental(chunks, e, db) == 0
    assert e.calls == 5


def test_bm25_tuner_small():
    from a_nice_rag_tpu.ingest.bm25_tune import tune_bm25
    from a_nice_rag_tpu.testing import synth_corpus

    c = synth_corpus(n_docs=150, dim=8, n_queries=30, seed=81)
    rows = [
        {"id": c.ids[i], "tokens_regular": c.tokens[i],
         "tokens_lemmatized": c.tokens[i]}
        for i in range(len(c.ids))
    ]
    qt = {"regular": c.query_tokens, "lemmatized": c.query_tokens}
    result = tune_bm25(
        rows, qt, c.gold_ids, n_calls=8, n_initial=4, recall_k=15
    )
    assert 0.5 <= result.best_params["k1"] <= 3.0
    assert result.best_score > 0.3
    assert len(result.history) == 8


def test_query_prep_roundtrip(tmp_path):
    """preprocess_queries -> seeded split -> CSV roundtrip (reference
    preprocess_queries.py / preprocess_suggested.py contract)."""
    import csv
    import os

    from a_nice_rag_tpu.ingest.query_prep import (
        preprocess_queries,
        split_queries,
        write_query_csv,
    )

    ids = [f"q{i}" for i in range(40)]
    queries = [f"What is the recommended dose of drug {i}?"
               for i in range(40)]
    rows = preprocess_queries(ids, queries)
    assert rows[0]["tokens_lemmatized"] and rows[0]["tokens_regular"]
    # NLTK-parity (per the reference's preprocessed ground truth):
    # noun-POS default keeps the participle "recommended"; "doses"
    # lemmatizes to "dos" (morphy picks the WordNet entry "dos"),
    # "drugs" to "drug".
    assert rows[0]["tokens_lemmatized"] == ["recommended", "dose", "drug"]
    rows_pl = preprocess_queries(["p"], ["doses of drugs"])
    assert rows_pl[0]["tokens_lemmatized"] == ["dos", "drug"]
    test, val = split_queries(rows)
    assert len(val) == 6 and len(test) == 34  # 15% of 40, seed 42
    assert {r["id"] for r in test} | {r["id"] for r in val} == set(ids)
    assert not ({r["id"] for r in test} & {r["id"] for r in val})
    # Split is deterministic (seed-42 contract).
    test2, val2 = split_queries(rows)
    assert [r["id"] for r in val2] == [r["id"] for r in val]
    p = os.path.join(tmp_path, "q.csv")
    write_query_csv(rows, p)
    with open(p) as f:
        back = list(csv.DictReader(f))
    assert len(back) == 40 and back[0]["id"] == "q0"
