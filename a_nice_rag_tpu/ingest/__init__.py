"""Offline ingestion pipeline (L0): API -> XML -> markdown -> chunks ->
embeddings + BM25 artifacts.

Mirrors the reference's processing stage chain
(src/processing/: nice_api_script -> convert_xml_to_md -> chunk_mds ->
create_database + preprocess_bm25 -> bm25_search) with the end product
being the framework's array-index artifact instead of SQLite+pickle
(both are still writable for compatibility).
"""

from a_nice_rag_tpu.ingest.tokens import TokenCounter  # noqa: F401
from a_nice_rag_tpu.ingest.chunker import MarkdownChunker, Chunk  # noqa: F401
from a_nice_rag_tpu.ingest.xml_to_md import convert_xml_to_markdown  # noqa: F401
