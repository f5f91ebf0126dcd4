"""Multi-chip scaling: corpus sharding over a device mesh.

The reference is single-process/single-host (SURVEY.md §2.5) — this layer
is the framework's net-new distributed backend. The chunk corpus is the
scaling dimension: the dense matrix, BM25 postings, and candidate masks
are sharded along the document axis over the ``corpus`` mesh axis; query
batches shard over the ``dp`` axis. Per-shard fused top-k results are
merged with an ICI all-gather + k-way merge (XLA collectives, not
host-side communication).
"""

from a_nice_rag_tpu.parallel.health import (  # noqa: F401
    DeviceHealthMonitor,
    default_probe,
)
from a_nice_rag_tpu.parallel.engine import ShardedSearchEngine  # noqa: F401
from a_nice_rag_tpu.parallel.mesh import make_mesh  # noqa: F401
from a_nice_rag_tpu.parallel.sharded import (  # noqa: F401
    ShardedIndex,
    load_shard_ivf,
    save_shard_ivf,
    shard_index,
    shard_ivf,
    sharded_dense_top_k,
    sharded_hybrid_retrieve,
)
