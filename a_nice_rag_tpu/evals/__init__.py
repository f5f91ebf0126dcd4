"""Evaluation harnesses.

* ``a_nice_rag_tpu.evals.retrieval_eval`` — IR regression gate: gold-chunk
  ranking over synthetic query sets, the reference's 9 retrieval
  configurations, MRR/Recall@k metrics, seed-42 split, CSV sinks
  (reference src/retrieval_eval.py).
* ``a_nice_rag_tpu.evals.ragas`` — LLM-judged generation-quality framework
  (the reference's vendored ragas_modified, rebuilt).
"""

from a_nice_rag_tpu.evals.metrics import calculate_metrics  # noqa: F401
from a_nice_rag_tpu.evals.retrieval_eval import (  # noqa: F401
    EvalConfig,
    RetrievalEvaluator,
    STANDARD_CONFIGURATIONS,
)
