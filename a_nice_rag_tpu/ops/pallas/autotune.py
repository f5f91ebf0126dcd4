"""On-device block-size autotuning for the streaming fused kernel.

Block shape sensitivity is real but modest (measured spread at
N=4M/B=256: 13.3-21 ms across the candidate grid) and the best choice
shifts with (N, D, B, k) and chip load. This utility measures the live
device once per configuration signature and caches the winner, so
long-running services pay a one-time ~seconds tuning cost instead of
shipping hardcoded blocks.

Timing is tunnel-proof per the repo methodology: every sample forces a
VALUE read (block_until_ready alone can return early on tunneled PJRT
backends) and the reported figure is a best-of-trials chained-dispatch
mean.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Dict, Optional, Sequence, Tuple

import jax

logger = logging.getLogger(__name__)

DEFAULT_CANDIDATES: Tuple[Tuple[int, int, int, str], ...] = (
    (128, 8192, 2, "iterate"),
    (128, 8192, 4, "iterate"),
    (128, 16384, 2, "iterate"),
    (256, 8192, 2, "iterate"),
    (256, 16384, 2, "iterate"),
    (64, 8192, 2, "iterate"),
    # Manual double-buffered pipeline (maskless aligned fast path;
    # falls back to iterate under a mask, so safe to tune in).
    (128, 16384, 2, "dbuf"),
    (256, 16384, 2, "dbuf"),
    # Carried-argmax fold: EXACT (ids bit-match the f32 path) at ~one
    # traversal per extraction iteration — safe for the default tuner.
    (128, 8192, 2, "exact2"),
    (128, 16384, 1, "exact2"),
    (128, 16384, 2, "exact2"),
    (256, 16384, 2, "exact2"),
    # Exact i32-key fold (round 5): the packed fold's single-max
    # trigger with the FULL f32 ordering in the key (no bf16 rounding;
    # ids bit-match iterate — tests/test_pallas_fused.py xpack fuzz),
    # at one extra eq-mask traversal per extraction iteration for the
    # column pick. Safe for the default tuner.
    (128, 8192, 2, "xpack"),
    (128, 16384, 1, "xpack"),
    (128, 16384, 2, "xpack"),
    (256, 16384, 2, "xpack"),
)

# Packed value+index fold: ~20% faster at N=4M (8.4 vs 10.5 ms TRUE,
# round 4) because one i32 max reduce yields value AND column and each
# extraction iteration is a single traversal — but top-k is taken on
# bf16-ROUNDED scores, so ids near the k-th boundary can differ from
# the f32 path among scores within one bf16 ulp. Only tuned in when the
# caller opts into rounded selection (allow_rounded=True).
ROUNDED_CANDIDATES: Tuple[Tuple[int, int, int, str], ...] = (
    (128, 8192, 2, "packed"),
    (128, 16384, 1, "packed"),
    (128, 16384, 2, "packed"),
    (256, 16384, 2, "packed"),
)


@dataclasses.dataclass(frozen=True)
class FusedKernelConfig:
    block_q: int = 128
    block_n: int = 8192
    subtiles: int = 2
    algo: str = "iterate"

    def as_kwargs(self) -> Dict[str, int]:
        return dataclasses.asdict(self)


_memory_cache: Dict[str, FusedKernelConfig] = {}


def _signature(n: int, d: int, b: int, k: int, dtype: str) -> str:
    platform = jax.devices()[0].platform
    return f"{platform}:n{n}:d{d}:b{b}:k{k}:{dtype}"


def tune_fused_blocks(
    emb: jax.Array,
    queries: jax.Array,
    k: int,
    candidates: Sequence[Tuple[int, int, int]] = DEFAULT_CANDIDATES,
    reps: int = 4,
    trials: int = 2,
    cache_path: Optional[str] = None,
    allow_rounded: bool = False,
) -> FusedKernelConfig:
    """Pick the fastest (block_q, block_n, subtiles) on the live device.

    Returns the default config without measuring when not on TPU (CPU
    interpret timings are meaningless). Results are memoized per
    (platform, N, D, B, k, dtype) signature, optionally persisted to
    ``cache_path`` JSON. ``allow_rounded=True`` additionally tunes the
    packed bf16-key fold (see ROUNDED_CANDIDATES) — opt-in because its
    top-k is taken on bf16-rounded scores.
    """
    from a_nice_rag_tpu.ops.pallas import fused_dense_top_k

    if allow_rounded and candidates is DEFAULT_CANDIDATES:
        candidates = tuple(candidates) + ROUNDED_CANDIDATES
    n, d = emb.shape
    b = queries.shape[0]
    sig = _signature(n, d, b, k, str(emb.dtype))
    if allow_rounded:
        sig += ":rounded"
    if sig in _memory_cache:
        return _memory_cache[sig]
    if cache_path and os.path.exists(cache_path):
        try:
            with open(cache_path, "r", encoding="utf-8") as f:
                disk = json.load(f)
            if sig in disk:
                cfg = FusedKernelConfig(**disk[sig])
                _memory_cache[sig] = cfg
                return cfg
        except (OSError, ValueError):
            pass

    if jax.devices()[0].platform != "tpu":
        return FusedKernelConfig()

    import numpy as np

    # Reference ids from the default config: every EXACT candidate must
    # reproduce them bit-for-bit on the live chip before it may win.
    # Interpret-mode parity does not transfer to real Mosaic (the
    # round-2 bitonic kernel was correct in interpret and miscompiled
    # on hardware); a fast-but-wrong winner here would silently serve
    # wrong document ids. Rounded algos ("packed") select on bf16 keys
    # by design and are exempt (their recall is guarded by callers).
    ref_ids = np.asarray(fused_dense_top_k(emb, queries, k)[1])
    exact_algos = {"iterate", "direct", "dbuf", "exact2", "xpack"}

    best_cfg, best_ms = FusedKernelConfig(), float("inf")
    for cand in candidates:
        bq, bn, st = cand[:3]
        algo = cand[3] if len(cand) > 3 else "iterate"
        if b % min(bq, b):
            continue
        try:
            fn = lambda: fused_dense_top_k(
                emb, queries, k, block_q=bq, block_n=bn, subtiles=st,
                algo=algo,
            )
            if algo in exact_algos:
                got = np.asarray(fn()[1])
                if not (got == ref_ids).all():
                    logger.warning(
                        "autotune: (%d, %d, %d, %s) ids DIVERGE from "
                        "the reference config on this chip — skipped "
                        "(possible Mosaic miscompile)", bq, bn, st, algo,
                    )
                    continue
            from a_nice_rag_tpu.testing.timing import chained_dispatch_ms

            ms = chained_dispatch_ms(fn, n=reps, trials=trials)
        except Exception as e:  # compile failure on exotic shapes
            logger.info("autotune: (%d, %d, %d, %s) failed: %s",
                        bq, bn, st, algo, e)
            continue
        logger.info("autotune: bq=%d bn=%d st=%d algo=%s -> %.2f ms",
                    bq, bn, st, algo, ms)
        if ms < best_ms:
            best_ms = ms
            best_cfg = FusedKernelConfig(bq, bn, st, algo)

    _memory_cache[sig] = best_cfg
    if cache_path:
        try:
            disk = {}
            if os.path.exists(cache_path):
                with open(cache_path, "r", encoding="utf-8") as f:
                    disk = json.load(f)
            disk[sig] = best_cfg.as_kwargs()
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            with open(cache_path, "w", encoding="utf-8") as f:
                json.dump(disk, f, indent=1)
        except OSError as e:
            logger.info("autotune: cache write failed: %s", e)
    return best_cfg
