"""Micro-profile the two-tier BM25 rare path at N=2M on the real TPU.

Breaks the measured ~120 ms "rare candidates + gather + merge" into its
stages so the optimization targets the real cost. Chained-dispatch
timing (n calls, one value read, /n).
"""
import functools

print = functools.partial(print, flush=True)

import jax
import jax.numpy as jnp
import numpy as np

from a_nice_rag_tpu.testing.timing import chained_dispatch_ms as timeit


def main():
    print("platform:", jax.devices()[0].platform)
    B, P = 256, 4096
    rng = np.random.default_rng(0)
    ids = np.sort(rng.integers(0, 2_000_000, size=(B, P)), axis=1).astype(np.int32)
    vals = rng.random((B, P)).astype(np.float32)
    ids_shuf = rng.permuted(ids, axis=1)
    j_ids = jnp.asarray(ids_shuf)
    j_vals = jnp.asarray(vals)

    floor = jax.jit(lambda v: v.sum())
    print(f"dispatch floor (trivial sum):         {timeit(lambda: floor(j_vals)):8.2f} ms")

    sort2 = jax.jit(lambda i, v: jax.lax.sort((i, v), dimension=-1, num_keys=1))
    print(f"variadic sort [B={B}, P={P}] i32+f32: {timeit(lambda: sort2(j_ids, j_vals)):8.2f} ms")

    sort1 = jax.jit(lambda i: jax.lax.sort(i, dimension=-1))
    print(f"single sort   [B={B}, P={P}] i32:     {timeit(lambda: sort1(j_ids)):8.2f} ms")

    argsrt = jax.jit(lambda i: jnp.argsort(i, axis=-1))
    print(f"argsort       [B={B}, P={P}] i32:     {timeit(lambda: argsrt(j_ids)):8.2f} ms")

    @jax.jit
    def segsum(s_ids, s_vals):
        csum = jnp.cumsum(s_vals, axis=1)
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), s_ids[:, 1:] != s_ids[:, :-1]], axis=1)
        last = jnp.concatenate(
            [s_ids[:, 1:] != s_ids[:, :-1], jnp.ones((B, 1), bool)], axis=1)
        csum_b = jnp.concatenate([jnp.zeros((B, 1)), csum[:, :-1]], axis=1)
        sp = jax.lax.cummax(jnp.where(first, csum_b, -jnp.inf), axis=1)
        return jnp.where(last, csum - sp, -jnp.inf)

    print(f"cumsum segsum [B={B}, P={P}]:         {timeit(lambda: segsum(j_ids, j_vals)):8.2f} ms")

    # candidate gather + einsum against a common tier [N, Vc]
    for vc in (512,):
        import jax.random as jrandom
        common = jax.jit(
            lambda: jrandom.normal(jrandom.PRNGKey(0), (2_000_000, vc),
                                   dtype=jnp.float32),
        )()
        jax.block_until_ready(common)
        q_tf = jnp.asarray(rng.random((B, vc)).astype(np.float32))

        @jax.jit
        def gath(common, ids, q_tf):
            safe = jnp.clip(ids, 0, common.shape[0] - 1)
            rows = jnp.take(common, safe.reshape(-1), axis=0)
            rows = rows.reshape(ids.shape + (common.shape[1],))
            return jnp.einsum("brv,bv->br", rows, q_tf)

        print(f"cand gather+einsum Vc={vc}:           {timeit(lambda: gath(common, j_ids, q_tf)):8.2f} ms")

        # element-gather alternative: per (candidate, query term slot)
        # element reads instead of full [Vc] rows; T<=16 slots are
        # contiguous within a candidate's row.
        T = 16
        rowmap = jnp.asarray(rng.integers(0, vc, size=(B, T)).astype(np.int32))

        @jax.jit
        def gath_elem(common, ids, rowmap):
            flat = common.reshape(-1)
            safe = jnp.clip(ids, 0, common.shape[0] - 1)
            gidx = safe[:, :, None] * vc + rowmap[:, None, :]
            vals = jnp.take(flat, gidx.reshape(B, -1)).reshape(
                B, ids.shape[1], T)
            return vals.sum(-1)

        print(f"cand elem-gather T={T}:               {timeit(lambda: gath_elem(common, j_ids, rowmap)):8.2f} ms")

        common_bf = common.astype(jnp.bfloat16)

        @jax.jit
        def gath_elem_bf(common, ids, rowmap):
            flat = common.reshape(-1)
            safe = jnp.clip(ids, 0, common.shape[0] - 1)
            gidx = safe[:, :, None] * vc + rowmap[:, None, :]
            vals = jnp.take(flat, gidx.reshape(B, -1)).reshape(
                B, ids.shape[1], T)
            return vals.astype(jnp.float32).sum(-1)

        print(f"cand elem-gather bf16:                {timeit(lambda: gath_elem_bf(common_bf, j_ids, rowmap)):8.2f} ms")

    # top_k over the merged [B, P + k] candidate list
    topk = jax.jit(lambda v: jax.lax.top_k(v, 25))
    vv = jnp.asarray(rng.random((B, P + 32)).astype(np.float32))
    print(f"lax.top_k    [B={B}, {P+32}] k=25:     {timeit(lambda: topk(vv)):8.2f} ms")

    # permutation scatter: the building block of a searchsorted-based
    # 2-way merge (out[pos] = val with pos a permutation). If this is
    # fast, a k-way merge tree beats the full sort; if it serializes
    # like add-scatter, it does not.
    perm = np.stack([rng.permutation(P) for _ in range(B)]).astype(np.int32)
    j_perm = jnp.asarray(perm)

    @jax.jit
    def perm_scatter(vals, perm):
        rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, P))
        return jnp.zeros((B, P), vals.dtype).at[
            rows.reshape(-1), perm.reshape(-1)
        ].set(vals.reshape(-1), unique_indices=True)

    print(f"perm scatter  [B={B}, P={P}]:         {timeit(lambda: perm_scatter(j_vals, j_perm)):8.2f} ms")

    @jax.jit
    def merge2(a_ids, b_ids, a_vals, b_vals):
        # searchsorted-based 2-way merge of row-sorted halves
        pa = jax.vmap(lambda a, b: jnp.searchsorted(b, a, side="left"))(
            a_ids, b_ids) + jnp.arange(a_ids.shape[1])
        pb = jax.vmap(lambda b, a: jnp.searchsorted(a, b, side="right"))(
            b_ids, a_ids) + jnp.arange(b_ids.shape[1])
        m = a_ids.shape[1] + b_ids.shape[1]
        rows = jnp.broadcast_to(
            jnp.arange(B)[:, None], (B, a_ids.shape[1]))
        out_i = jnp.zeros((B, m), a_ids.dtype)
        out_v = jnp.zeros((B, m), a_vals.dtype)
        out_i = out_i.at[rows.reshape(-1), pa.reshape(-1)].set(
            a_ids.reshape(-1), unique_indices=True)
        out_i = out_i.at[rows.reshape(-1), pb.reshape(-1)].set(
            b_ids.reshape(-1), unique_indices=True)
        out_v = out_v.at[rows.reshape(-1), pa.reshape(-1)].set(
            a_vals.reshape(-1), unique_indices=True)
        out_v = out_v.at[rows.reshape(-1), pb.reshape(-1)].set(
            b_vals.reshape(-1), unique_indices=True)
        return out_i, out_v

    half = P // 2
    a_i = jnp.asarray(np.sort(ids_shuf[:, :half], axis=1))
    b_i = jnp.asarray(np.sort(ids_shuf[:, half:], axis=1))
    a_v = j_vals[:, :half]
    b_v = j_vals[:, half:]
    print(f"2-way merge   [B={B}, {half}+{half}]:      {timeit(lambda: merge2(a_i, b_i, a_v, b_v)):8.2f} ms")

    # full rare path from ops.bm25 for an end-to-end number
    from a_nice_rag_tpu.ops.bm25 import Bm25Arrays, _rare_candidates
    V = 200_000
    npost = V * 20
    indptr = np.zeros(V + 1, np.int64)
    indptr[1:] = np.cumsum(rng.multinomial(npost, np.ones(V) / V))
    doc_ids = rng.integers(0, 2_000_000, size=npost + 1).astype(np.int32)
    for t in range(0, V, max(1, V // 50)):
        lo, hi = indptr[t], indptr[t + 1]
        doc_ids[lo:hi] = np.sort(doc_ids[lo:hi])
    impact = rng.random(npost + 1).astype(np.float32)
    doc_ids[npost] = 2_000_000
    impact[npost] = 0.0
    bm = Bm25Arrays(
        indptr=jnp.asarray(indptr.astype(np.int32)),
        doc_ids=jnp.asarray(doc_ids),
        impact=jnp.asarray(impact),
        n_docs_padded=2_000_000,
    )
    qt = jnp.asarray(rng.integers(0, V, size=(B, 16)).astype(np.int32))
    rare = jax.jit(lambda bm_arg, q: jax.vmap(
        lambda qq: _rare_candidates(bm_arg, qq, P, None))(q))
    print(f"full _rare_candidates [B={B}]:        {timeit(lambda: rare(bm, qt)):8.2f} ms")


if __name__ == "__main__":
    main()
