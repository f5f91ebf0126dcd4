"""Synthetic corpora for tests and benchmarks.

The reference's embedding databases are not distributable, so fixtures are
generated: unit-norm embedding matrices with planted nearest neighbors, and
Zipf-ish token corpora with guideline-style sources/ids matching the
reference's naming scheme (``{guideline}_{section}`` ids, ``CG``/``NG``/
``QS`` source prefixes — see reference src/processing/chunk_mds.py:503).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class SynthCorpus:
    ids: List[str]
    sources: List[str]
    contents: List[str]
    urls: List[str]
    tokens: List[List[str]]  # lemmatized-style token lists
    embeddings: Dict[str, np.ndarray]  # model name -> [N, D] unit-norm f32
    query_tokens: List[List[str]]
    query_embeddings: Dict[str, np.ndarray]  # model name -> [Q, D]
    gold_ids: List[str]  # gold chunk id per query


def _unit(x: np.ndarray) -> np.ndarray:
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def synth_corpus(
    n_docs: int = 500,
    dim: int = 256,
    n_queries: int = 64,
    vocab_size: int = 800,
    seed: int = 0,
    models: Optional[List[str]] = None,
    prefixes: Optional[List[str]] = None,
    model_noise: Optional[Dict[str, float]] = None,
    query_token_noise: float = 0.0,
    query_len_range: Optional[tuple] = None,
) -> SynthCorpus:
    """Build a synthetic corpus where query q's gold document is doc q.

    Query embeddings are a noisy copy of their gold document embedding,
    and query tokens are sampled from the gold document's tokens, so both
    dense and BM25 retrieval have a meaningful signal to find.

    ``model_noise`` gives each dense model its own query-noise scale
    (default: 0.25 for every model — the historical stream, byte-stable
    for seeded benchmark corpora). ``query_token_noise`` replaces that
    fraction of each query's tokens with global Zipf draws, degrading the
    BM25 signal independently of the dense noise. Together they let a
    sweep reproduce the reference's qualitative §6.1 structure (dense
    models spread, dense > BM25, hybrid >= best single) instead of four
    statistically identical models — see
    ``calibrated_quality_corpus``.
    """
    rng = np.random.default_rng(seed)
    n_queries = min(n_queries, n_docs)
    models = models or ["voyage-3-large"]
    prefixes = prefixes or ["CG", "NG", "QS"]

    vocab = [f"term{i}" for i in range(vocab_size)]
    # Zipf-distributed token draws give realistic df skew.
    zipf_p = 1.0 / np.arange(1, vocab_size + 1)
    zipf_p /= zipf_p.sum()

    ids, sources, contents, urls, tokens = [], [], [], [], []
    # Per-doc rng.choice over the string vocab rebuilds the 20k-entry
    # CDF per call (minutes at 100k+ docs); past a size threshold draw
    # ALL token indices in one vectorized call. The small-corpus path
    # keeps its original RNG stream so seeded benchmark corpora (and
    # their asserted planted-gold floors) are byte-identical.
    big = n_docs > 50_000
    if big:
        lengths = rng.integers(20, 120, size=n_docs)
        draws = rng.choice(vocab_size, size=int(lengths.sum()), p=zipf_p)
        offsets = np.concatenate([[0], np.cumsum(lengths)])
    for i in range(n_docs):
        prefix = prefixes[i % len(prefixes)]
        source = f"{prefix}{i // 7 + 1}"
        ids.append(f"{source}_Section {i}")
        sources.append(source)
        urls.append(f"https://www.nice.org.uk/guidance/{source.lower()}")
        if big:
            toks = [vocab[t] for t in draws[offsets[i]:offsets[i + 1]]]
        else:
            length = int(rng.integers(20, 120))
            toks = list(rng.choice(vocab, size=length, p=zipf_p))
        tokens.append(toks)
        contents.append(" ".join(toks))

    embeddings = {
        m: _unit(rng.standard_normal((n_docs, dim)).astype(np.float32))
        for m in models
    }

    q_idx = rng.permutation(n_docs)[:n_queries]
    gold_ids = [ids[j] for j in q_idx]
    query_embeddings = {}
    for m in models:
        scale = 0.25 if model_noise is None else model_noise.get(m, 0.25)
        noise = scale * rng.standard_normal((n_queries, dim)).astype(np.float32)
        query_embeddings[m] = _unit(embeddings[m][q_idx] + noise)
    query_tokens = []
    for j in q_idx:
        doc_toks = tokens[j]
        lo, hi = query_len_range or (3, 9)
        take = min(len(doc_toks), int(rng.integers(lo, hi)))
        q_toks = list(rng.choice(doc_toks, size=take))
        if query_token_noise > 0.0:
            flips = rng.random(take) < query_token_noise
            noise_toks = rng.choice(vocab, size=take, p=zipf_p)
            q_toks = [
                noise_toks[t] if flips[t] else q_toks[t]
                for t in range(take)
            ]
        query_tokens.append(q_toks)

    return SynthCorpus(
        ids=ids,
        sources=sources,
        contents=contents,
        urls=urls,
        tokens=tokens,
        embeddings=embeddings,
        query_tokens=query_tokens,
        query_embeddings=query_embeddings,
        gold_ids=gold_ids,
    )


# Per-model query-noise scales calibrated (scripts history, round 3) so a
# 9.7k-doc sweep reproduces the reference's qualitative §6.1 structure:
# dense MRR spread Voyage-3-Large > Voyage-3.5 > Qwen3 > TE3L, every
# dense model above BM25, and hybrid/ensemble fusion lifting R@10 above
# the best single ranker (reference
# results/retrieval_evaluation_results.csv rows 2-8).
REFERENCE_QUALITY_NOISE: Dict[str, float] = {
    "voyage-3-large": 0.2135,
    "voyage-3.5": 0.2235,
    "text-embedding-3-large": 0.2315,
    "Qwen3": 0.2255,
}
REFERENCE_QUALITY_TOKEN_NOISE: float = 0.37
REFERENCE_QUALITY_QUERY_LEN: tuple = (6, 14)


def calibrated_quality_corpus(
    n_docs: int = 9728,
    dim: int = 256,
    n_queries: int = 2048,
    vocab_size: int = 20000,
    seed: int = 42,
) -> SynthCorpus:
    """Reference-§6.1-shaped synthetic corpus (see REFERENCE_QUALITY_NOISE).

    Used by the committed synthetic sweep
    (results/retrieval_evaluation_results_synthetic.csv) and the quality
    -gate tests: a fusion/scoring regression that would flip the
    reference's configuration ordering flips it here too.
    """
    return synth_corpus(
        n_docs=n_docs,
        dim=dim,
        n_queries=n_queries,
        vocab_size=vocab_size,
        seed=seed,
        models=list(REFERENCE_QUALITY_NOISE),
        model_noise=dict(REFERENCE_QUALITY_NOISE),
        query_token_noise=REFERENCE_QUALITY_TOKEN_NOISE,
        query_len_range=REFERENCE_QUALITY_QUERY_LEN,
    )
