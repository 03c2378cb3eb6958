"""Similarity-search queries over the ``embeddings`` table.

Brute-force cosine top-k is the baseline and SQL-checkable (DuckDB
``list_cosine_similarity`` on DOUBLE[]); the LSH-bucketed variant is the
scale path (rows-only). Query vectors are broadcast once with ``ray.put``
and read inside every map_batches task — no shuffle (ray_guide.md joins
section)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
ROUND = 6


def _round(x: np.ndarray, nd: int = ROUND) -> np.ndarray:
    """Half-away-from-zero after decimal scaling — matches DuckDB ROUND
    (probed: floor(|x|*10^nd + 0.5) semantics, including x*10^nd double
    rounding effects)."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0**nd
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def _emb(sf_dir: str):
    import ray.data as rd

    from chronoxtract_ray.stages.util import ensure_sort_shuffle

    return ensure_sort_shuffle(rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]))


def _to_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy()
    # list<float> → (n, d) float64; combine_chunks for a contiguous view
    col = t["embedding"].combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    d = flat.size // ids.size
    return ids, flat.reshape(ids.size, d)


def q_knn_bruteforce(sf_dir: str):
    """Exact cosine top-5 neighbors (excluding self) for query vectors
    vec_id < N_QUERIES: per-batch matmul against the broadcast query matrix,
    then a tiny driver-side merge of per-batch partial top-ks."""
    import pyarrow.parquet as pq
    import ray

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = qt.filter(pa.compute.less(qt["vec_id"], N_QUERIES))
    q_ids, Q = _to_matrix(qt)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, Qn))

    def score(t: pa.Table) -> pa.Table:
        ids, M = _to_matrix(t)
        qids, qn = ray.get(q_ref)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = Mn @ qn.T  # (n, q)
        k = min(TOP_K + 1, ids.size)  # +1 in case self is in this batch
        top = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, q)
        rows = []
        for j in range(qids.size):
            for i in top[:, j]:
                rows.append((int(qids[j]), int(ids[i]), float(sims[i, j])))
        arr = np.array(rows, dtype=np.float64).reshape(-1, 3)
        return pa.table(
            {
                "query_id": pa.array(arr[:, 0].astype(np.int64), pa.int64()),
                "neighbor_id": pa.array(arr[:, 1].astype(np.int64), pa.int64()),
                "cosine": pa.array(arr[:, 2], pa.float64()),
            }
        )

    partial = pa.Table.from_pylist(_emb(sf_dir).map_batches(score, batch_format="pyarrow").take_all())
    df = partial.to_pandas()
    df = df[df["query_id"] != df["neighbor_id"]]
    df = df.sort_values(["query_id", "cosine", "neighbor_id"], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(TOP_K)
    return pa.table(
        {
            "query_id": pa.array(df["query_id"].to_numpy(), pa.int64()),
            "neighbor_id": pa.array(df["neighbor_id"].to_numpy(), pa.int64()),
            "cosine": pa.array(_round(df["cosine"].to_numpy()), pa.float64()),
        }
    )


SQL_KNN_BRUTEFORCE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < {N_QUERIES}
), sims AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS cosine
  FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id
), r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM sims
)
SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine FROM r WHERE rn <= {TOP_K}
"""


def q_embedding_neardup(sf_dir: str):
    """All pairs with cosine > 0.40 (embedding near-dup detection; the
    synthetic embeddings top out near 0.5 cosine, so 0.40 is this data's
    near-dup band — implementation, oracle and this docstring all use 0.40).

    Scale path: a distributed BLOCK SELF-JOIN. Stage 1 normalizes every
    vector once (map_batches) and writes B hash blocks as partitioned
    parquet; stage 2 fans out the B(B+1)/2 block pairs as a dataset and each
    task reads exactly its two blocks and emits its over-threshold pairs.
    No full-matrix broadcast, no driver-side read of the corpus; per-task
    memory = 2 blocks (pick B so 2·(n/B)·d doubles fit a worker heap — at
    100 TB the blocks live in object storage and B grows with the corpus)."""
    import glob
    import shutil
    import tempfile

    import ray.data as rd

    thresh = 0.40
    n_blocks = 8
    tmp = tempfile.mkdtemp(prefix="ctx_neardup_blocks_")

    def norm(t: pa.Table) -> pa.Table:
        ids, M = _to_matrix(t)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(Mn), pa.list_(pa.float64())),
                "block": pa.array(ids % n_blocks, pa.int64()),
            }
        )

    try:
        _emb(sf_dir).map_batches(norm, batch_format="pyarrow").write_parquet(tmp, partition_cols=["block"])

        def _read_block(b: int):
            import pyarrow.parquet as pq

            files = sorted(glob.glob(f"{tmp}/block={b}/*.parquet"))
            t = pa.concat_tables([pq.read_table(f, columns=["vec_id", "embedding"]) for f in files])
            return _to_matrix(t)

        def score(t: pa.Table) -> pa.Table:
            out = []
            for bi, bj in zip(t["block_i"].to_pylist(), t["block_j"].to_pylist()):
                ids_i, Mi = _read_block(bi)
                ids_j, Mj = (ids_i, Mi) if bj == bi else _read_block(bj)
                sims = Mi @ Mj.T
                ii, jj = np.nonzero(sims > thresh)
                if bi == bj:
                    # upper triangle: each unordered pair once, no self-pairs
                    keep = ids_i[ii] < ids_j[jj]
                    va, vb = ids_i[ii][keep], ids_j[jj][keep]
                    cs = sims[ii, jj][keep]
                else:
                    # distinct blocks: every cross pair appears exactly once
                    # in this task — orient by id, don't filter
                    va = np.minimum(ids_i[ii], ids_j[jj])
                    vb = np.maximum(ids_i[ii], ids_j[jj])
                    cs = sims[ii, jj]
                out.append(
                    pa.table(
                        {
                            "vec_a": pa.array(va, pa.int64()),
                            "vec_b": pa.array(vb, pa.int64()),
                            "cosine": pa.array(_round(cs), pa.float64()),
                        }
                    )
                )
            return pa.concat_tables(out)

        pair_items = [
            {"block_i": i, "block_j": j} for i in range(n_blocks) for j in range(i, n_blocks)
        ]
        rows = (
            rd.from_items(pair_items, override_num_blocks=len(pair_items))
            .map_batches(score, batch_format="pyarrow", batch_size=1)
            .take_all()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    if not rows:
        return pa.table({"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())})
    return pa.Table.from_pylist(rows)


SQL_EMBEDDING_NEARDUP = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.40
"""


def q_knn_lsh(sf_dir: str):
    """Approximate top-5 via random-hyperplane LSH buckets (6 planes, probe
    own bucket + all Hamming<=2 neighbors → ~1/3 of the corpus scanned).
    Rows-only — approximate by design; recall vs brute force is asserted in
    tests (>=0.5 at this parameterization)."""
    import itertools

    import pyarrow.parquet as pq
    import ray

    n_planes = 6
    rng = np.random.default_rng(42)
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qfil = qt.filter(pa.compute.less(qt["vec_id"], N_QUERIES))
    q_ids, Q = _to_matrix(qfil)
    dim = Q.shape[1]
    planes = rng.standard_normal((dim, n_planes))
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_codes = ((Qn @ planes) > 0).astype(np.uint32) @ (1 << np.arange(n_planes, dtype=np.uint32))
    probe = {}
    for i, q in enumerate(q_ids):
        ps = {int(q_codes[i])}
        for r in (1, 2):
            for bits in itertools.combinations(range(n_planes), r):
                x = int(q_codes[i])
                for b in bits:
                    x ^= 1 << b
                ps.add(x)
        probe[int(q)] = ps
    ref = ray.put((q_ids, Qn, planes, probe))

    def score(t: pa.Table) -> pa.Table:
        ids, M = _to_matrix(t)
        qids, qn, pl, pr = ray.get(ref)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        codes = ((Mn @ pl) > 0).astype(np.uint32) @ (1 << np.arange(pl.shape[1], dtype=np.uint32))
        rows = []
        for j, q in enumerate(qids):
            cand = np.isin(codes, np.fromiter(pr[int(q)], dtype=np.uint32))
            if not cand.any():
                continue
            sims = Mn[cand] @ qn[j]
            cids = ids[cand]
            k = min(TOP_K + 1, sims.size)
            top = np.argpartition(-sims, k - 1)[:k]
            for i in top:
                rows.append((int(q), int(cids[i]), float(sims[i])))
        if not rows:
            return pa.table({"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())})
        arr = np.array(rows)
        return pa.table(
            {
                "query_id": pa.array(arr[:, 0].astype(np.int64), pa.int64()),
                "neighbor_id": pa.array(arr[:, 1].astype(np.int64), pa.int64()),
                "cosine": pa.array(arr[:, 2], pa.float64()),
            }
        )

    partial = pa.Table.from_pylist(_emb(sf_dir).map_batches(score, batch_format="pyarrow").take_all())
    df = partial.to_pandas()
    df = df[df["query_id"] != df["neighbor_id"]]
    df = df.sort_values(["query_id", "cosine", "neighbor_id"], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(TOP_K)
    df["cosine"] = _round(df["cosine"].to_numpy())
    return pa.Table.from_pandas(df, preserve_index=False)


def q_knn_ivf(sf_dir: str):
    """Approximate top-5 via an IVF index: k-means coarse quantizer trained
    on a deterministic ~512-row strided sample pulled THROUGH Ray (the
    corpus is never read driver-side), centroids broadcast with ray.put,
    per-batch assignment + probe of the nprobe closest lists. Rows-only
    (approximate by design; recall asserted in tests)."""
    import pyarrow.compute as pc
    import ray

    n_lists, n_probe, iters = 8, 3, 10
    ds = _emb(sf_dir)
    # deterministic strided training sample pulled THROUGH Ray (only ~512
    # rows reach the driver — the corpus itself is never read driver-side)
    n_total = ds.count()
    step = max(n_total // 512, 1)

    def sample_batch(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["vec_id"].to_numpy() % step == 0))

    sample_tbl = pa.Table.from_pylist(ds.map_batches(sample_batch, batch_format="pyarrow").take_all())
    _, S = _to_matrix(sample_tbl)
    sample = S / np.linalg.norm(S, axis=1, keepdims=True)
    rng = np.random.default_rng(11)
    C = sample[rng.choice(sample.shape[0], n_lists, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ C.T, axis=1)
        for k in range(n_lists):
            members = sample[assign == k]
            if members.shape[0]:
                c = members.mean(axis=0)
                C[k] = c / max(np.linalg.norm(c), 1e-12)

    def query_batch(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["vec_id"], N_QUERIES))

    q_tbl = pa.Table.from_pylist(ds.map_batches(query_batch, batch_format="pyarrow").take_all())
    q_ids, Q = _to_matrix(q_tbl)
    order = np.argsort(q_ids, kind="stable")
    q_ids, Q = q_ids[order], Q[order]
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_probe = np.argsort(-(Qn @ C.T), axis=1)[:, :n_probe]  # (q, n_probe)
    ref = ray.put((q_ids, Qn, C, q_probe))

    def score(t: pa.Table) -> pa.Table:
        ids, M = _to_matrix(t)
        qids, qn, cent, probe = ray.get(ref)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        lists = np.argmax(Mn @ cent.T, axis=1)
        rows = []
        for j, qid in enumerate(qids):
            cand = np.isin(lists, probe[j])
            if not cand.any():
                continue
            sims = Mn[cand] @ qn[j]
            cids = ids[cand]
            k = min(TOP_K + 1, sims.size)
            for i in np.argpartition(-sims, k - 1)[:k]:
                rows.append((int(qid), int(cids[i]), float(sims[i])))
        if not rows:
            return pa.table({"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())})
        arr = np.array(rows)
        return pa.table(
            {
                "query_id": pa.array(arr[:, 0].astype(np.int64), pa.int64()),
                "neighbor_id": pa.array(arr[:, 1].astype(np.int64), pa.int64()),
                "cosine": pa.array(arr[:, 2], pa.float64()),
            }
        )

    partial = pa.Table.from_pylist(_emb(sf_dir).map_batches(score, batch_format="pyarrow").take_all())
    df = partial.to_pandas()
    df = df[df["query_id"] != df["neighbor_id"]]
    df = df.sort_values(["query_id", "cosine", "neighbor_id"], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(TOP_K)
    df["cosine"] = _round(df["cosine"].to_numpy())
    return pa.Table.from_pandas(df, preserve_index=False)
