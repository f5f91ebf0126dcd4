"""End-to-end two-tier streaming BM25 top-k at N=2M (TPU).

Reproduces the round-1 measurement config (N=2M, V_common=512, budget
4096, B=256, k=25; was 169 ms) against the current kernel + dtype
defaults, with a stage breakdown. Structure is synthetic but
shape-faithful; large device arrays are generated on-device (host
uploads through the tunnel dominate wall clock otherwise).
"""
import functools

print = functools.partial(print, flush=True)

import jax
import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.testing.timing import chained_dispatch_ms


def timeit(fn, n=8, trials=3):
    return chained_dispatch_ms(fn, n=n, trials=trials)


def main():
    from a_nice_rag_tpu.ops.bm25 import (
        Bm25Arrays, Bm25TwoTier, bm25_top_k_two_tier, _rare_candidates,
    )
    from a_nice_rag_tpu.ops.pallas import fused_dense_top_k

    print("platform:", jax.devices()[0].platform)
    N, VC, B, K, BUDGET, V, T = 2_000_000, 512, 256, 25, 4096, 200_000, 16
    rng = np.random.default_rng(0)

    # Rare CSR: ~20 postings per rare term, doc-sorted per term.
    npost = V * 20
    df = rng.multinomial(npost, np.ones(V) / V)
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(df, out=indptr[1:])
    doc_ids = rng.integers(0, N, size=npost + 1).astype(np.int32)
    impact = rng.random(npost + 1).astype(np.float32)
    doc_ids[npost] = N
    impact[npost] = 0.0
    rare = Bm25Arrays(
        indptr=jnp.asarray(indptr.astype(np.int32)),
        doc_ids=jnp.asarray(doc_ids),
        impact=jnp.asarray(impact),
        n_docs_padded=N,
    )

    common_map = np.full(V + 1, -1, np.int32)
    common_terms = rng.choice(V, VC, replace=False)
    common_map[np.sort(common_terms)] = np.arange(VC, dtype=np.int32)

    for dtype in ("bfloat16", "float32"):
        common = jax.jit(
            lambda: jnp.abs(jax.random.normal(
                jax.random.PRNGKey(1), (N, VC), dtype=jnp.dtype(dtype))),
        )()
        jax.block_until_ready(common)
        tt = Bm25TwoTier(
            common_impact_t=common,
            common_map=jnp.asarray(common_map),
            rare=rare,
        )
        q_terms = jnp.asarray(
            rng.integers(0, V, size=(B, T)).astype(np.int32))

        full = lambda: bm25_top_k_two_tier(tt, q_terms, K, budget=BUDGET)
        ms = timeit(full)
        print(f"two-tier end-to-end dtype={dtype}: {ms:8.2f} ms "
              f"({B/ms*1000:.0f} QPS)")
        cap = int(df.max())
        capped = lambda: bm25_top_k_two_tier(
            tt, q_terms, K, budget=BUDGET, df_cap=cap)
        ms2 = timeit(capped)
        print(f"two-tier df_cap={cap} sliced:      {ms2:8.2f} ms "
              f"({B/ms2*1000:.0f} QPS)")
        v1, i1 = full(); v2, i2 = capped()
        import numpy as _np
        print("  df_cap vals match:",
              _np.allclose(_np.asarray(v1), _np.asarray(v2), rtol=1e-4))

        if dtype == "bfloat16":
            # stage breakdown
            qtf = jnp.asarray(rng.random((B, VC)).astype(np.float32))
            ck = lambda: fused_dense_top_k(
                tt.common_impact_t, qtf, K, block_q=128, block_n=8192)
            print(f"  common streaming kernel:      {timeit(ck):8.2f} ms")
            # Pass the CSR as an ARGUMENT, never close over it
            # (CLAUDE.md: closures embed arrays as compile constants).
            rc = jax.jit(lambda bm, q: jax.vmap(
                lambda qq: _rare_candidates(bm, qq, BUDGET, None))(q))
            print(f"  rare candidates (sort+seg):   {timeit(lambda: rc(rare, q_terms)):8.2f} ms")
            r_ids = jnp.asarray(
                np.sort(rng.integers(0, N, size=(B, BUDGET)), axis=1)
                .astype(np.int32))

            @jax.jit
            def addback(common, r_ids, qtf):
                safe = jnp.clip(r_ids, 0, N - 1)
                rows = jnp.take(common, safe.reshape(-1), axis=0)
                rows = rows.reshape(r_ids.shape + (VC,))
                return jnp.einsum(
                    "brv,bv->br", rows.astype(jnp.float32), qtf)

            print(f"  common-at-candidates gather:  {timeit(lambda: addback(tt.common_impact_t, r_ids, qtf)):8.2f} ms")


if __name__ == "__main__":
    main()
