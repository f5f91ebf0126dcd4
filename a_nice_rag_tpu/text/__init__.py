"""Text preprocessing for the BM25 path.

Behavioral equivalent of the reference's query/corpus preprocessor
(``src/processing/preprocess_bm25.py:33-52``): lowercase, strip
punctuation, tokenize, drop stopwords/numerics/single-chars, optional
lemmatization. Self-contained (no NLTK data downloads): embedded English
stopword list and a rule-based WordNet-morphy-style lemmatizer, with the
real NLTK tokenizer/lemmatizer used automatically when its data packs are
installed.
"""

from a_nice_rag_tpu.text.preprocess import (  # noqa: F401
    preprocess_text,
    tokenize,
    lemmatize,
)
