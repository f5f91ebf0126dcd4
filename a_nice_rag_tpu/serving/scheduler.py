"""Micro-batching scheduler for high-QPS serving.

Concurrent callers submit single queries; the scheduler coalesces
whatever is waiting (up to ``max_batch``, waiting at most
``max_wait_ms``) into ONE fused retrieval program launch, padding the
batch to a power-of-two bucket so XLA reuses a handful of compiled
shapes. This is the TPU-native replacement for the reference's
one-query-at-a-time serving path: per-query dispatch overhead is
amortized B-ways, which is what makes >10k QPS per chip reachable from
the host side.
"""

from __future__ import annotations

import asyncio
import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class _Pending:
    q_embs: Dict[str, np.ndarray]  # model -> [D]
    q_terms: Optional[np.ndarray]  # [T] or None
    future: asyncio.Future


class BatchScheduler:
    def __init__(
        self,
        retriever,
        weights: Dict[str, float],
        filename_type_filter: Optional[str] = None,
        wrrf_k: float = 40.0,
        max_batch: int = 256,
        max_wait_ms: float = 2.0,
        t_max: int = 32,
        max_inflight: int = 2,
    ):
        self.retriever = retriever
        self.weights = weights
        self.filename_type_filter = filename_type_filter
        self.wrrf_k = wrrf_k
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self.t_max = t_max
        self._queue: asyncio.Queue = asyncio.Queue()
        self._task: Optional[asyncio.Task] = None
        self._inflight = asyncio.Semaphore(max_inflight)
        self.batches_run = 0
        self.queries_served = 0

    async def start(self) -> None:
        if self._task is None:
            self._task = asyncio.create_task(self._loop())

    async def stop(self) -> None:
        if self._task is not None:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None

    async def submit(
        self,
        q_embs: Dict[str, np.ndarray],
        q_terms: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One query in, (fused doc rows [n], fused scores [n]) out."""
        future: asyncio.Future = asyncio.get_running_loop().create_future()
        await self._queue.put(_Pending(q_embs, q_terms, future))
        return await future

    # ------------------------------------------------------------------

    @staticmethod
    def _bucket(n: int) -> int:
        b = 1
        while b < n:
            b <<= 1
        return b

    async def _collect(self) -> List[_Pending]:
        first = await self._queue.get()
        batch = [first]
        deadline = asyncio.get_running_loop().time() + self.max_wait_ms / 1e3
        while len(batch) < self.max_batch:
            timeout = deadline - asyncio.get_running_loop().time()
            if timeout <= 0:
                break
            try:
                batch.append(
                    await asyncio.wait_for(self._queue.get(), timeout)
                )
            except asyncio.TimeoutError:
                break
        return batch

    async def _loop(self) -> None:
        # Batches overlap up to max_inflight: while one batch's results
        # download, the next one launches (device execution serializes,
        # but host<->device transfers pipeline behind it).
        async def run_one(batch):
            async with self._inflight:
                try:
                    results = await asyncio.to_thread(self._run_batch, batch)
                    for pending, (ids, scores) in zip(batch, results):
                        if not pending.future.done():
                            pending.future.set_result((ids, scores))
                except Exception as e:  # noqa: BLE001 — propagate
                    for pending in batch:
                        if not pending.future.done():
                            pending.future.set_exception(e)

        while True:
            batch = await self._collect()
            asyncio.create_task(run_one(batch))

    def _run_batch(self, batch: List[_Pending]):
        models = self.retriever.model_names
        b = len(batch)
        b_pad = self._bucket(b)
        q_embs: Dict[str, np.ndarray] = {}
        for m in models:
            dim = np.asarray(batch[0].q_embs[m]).shape[-1]
            arr = np.zeros((b_pad, dim), np.float32)
            for i, p in enumerate(batch):
                arr[i] = p.q_embs[m]
            q_embs[m] = arr
        terms = np.full((b_pad, self.t_max), -1, np.int32)
        if self.retriever.use_bm25:
            for i, p in enumerate(batch):
                if p.q_terms is not None:
                    t = np.asarray(p.q_terms)[: self.t_max]
                    terms[i, : len(t)] = t
        # Device path + download of ONLY the fused outputs (the per-list
        # debug indices stay on device).
        d_fids, d_fvals, _ = self.retriever.retrieve_device(
            q_embs, terms, self.weights, self.filename_type_filter, self.wrrf_k
        )
        fids = np.asarray(d_fids)
        fvals = np.asarray(d_fvals)
        self.batches_run += 1
        self.queries_served += b
        return [(fids[i], fvals[i]) for i in range(b)]
