"""Pallas TPU kernels for the retrieval hot path."""

from a_nice_rag_tpu.ops.pallas.fused_topk import fused_dense_top_k  # noqa: F401
