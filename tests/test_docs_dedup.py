"""Near-dup chain unit tests: adversarial LSH mega-bucket block
decomposition (VERDICT r2 #5) and edge-table memoization (#6)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from chronoxtract_ray.pipelines import queries_docs as qd


@pytest.fixture()
def mega_bucket_sf(tmp_path):
    """A corpus where ONE LSH bucket holds far more docs than _BUCKET_CAP:
    40 identical long docs (every band collides) + normal background docs."""
    texts = ["the quick brown fox jumps over the lazy dog again and again"] * 40
    # background docs must be pairwise DISSIMILAR (disjoint token sets), so
    # they form singleton clusters
    texts += [" ".join(f"tok{i}x{k}q{i * k + 3}" for k in range(12)) for i in range(20)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts, pa.string())})
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _pairs_set(t: pa.Table):
    return set(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist(), t["sig_jaccard"].to_pylist()))


def test_mega_bucket_block_decomposition(ray_session, mega_bucket_sf, monkeypatch):
    """With _BUCKET_CAP forced tiny, the 40-doc degenerate bucket is split
    into block-pair tasks; the result must equal the uncapped path exactly:
    all C(40,2)=780 identical-doc pairs at sig_jaccard 1.0, each exactly
    once (the distributed groupby dedup collapses the 16 band collisions)."""
    base = qd.q_minhash_neardup(mega_bucket_sf, min_sig_jaccard=0.5)
    monkeypatch.setattr(qd, "_BUCKET_CAP", 8)
    capped = qd.q_minhash_neardup(mega_bucket_sf, min_sig_jaccard=0.5)

    dup_pairs = {(a, b, j) for a, b, j in _pairs_set(capped) if a < 40 and b < 40}
    assert len(dup_pairs) == 40 * 39 // 2
    assert all(j == 1.0 for _, _, j in dup_pairs)
    assert _pairs_set(capped) == _pairs_set(base)
    # each unordered pair exactly once
    ab = list(zip(capped["doc_a"].to_pylist(), capped["doc_b"].to_pylist()))
    assert len(ab) == len(set(ab))
    assert all(a < b for a, b in ab)


def test_edge_cache_key_uncacheable_on_missing_corpus(tmp_path):
    """OSError at key time → None (uncacheable), never a shared sentinel key
    that could serve stale edges across distinct corpora (ADVICE r3)."""
    assert qd._edge_cache_key(str(tmp_path / "no_such_dir")) is None


def test_edge_cache_shared(ray_session, mega_bucket_sf):
    """q_ngram_jaccard_pairs and q_dedup_clusters share one memoized edge
    computation per sf_dir."""
    qd._EDGE_CACHE.clear()
    edges = qd._exact_jaccard_edges(mega_bucket_sf)
    key = qd._edge_cache_key(mega_bucket_sf)
    assert key in qd._EDGE_CACHE
    marker = object()
    qd._EDGE_CACHE[key] = marker
    assert qd._exact_jaccard_edges(mega_bucket_sf) is marker  # cache hit, no recompute
    # rewriting the corpus at the same path must MISS (mtime/size keyed)
    import os, time as _time
    p = os.path.join(mega_bucket_sf, "documents.parquet")
    os.utime(p, ns=(_time.time_ns(), _time.time_ns()))
    assert qd._edge_cache_key(mega_bucket_sf) != key
    qd._EDGE_CACHE[qd._edge_cache_key(mega_bucket_sf)] = edges
    # clusters over the identical-doc corpus: docs 0..39 collapse to label 0
    clusters = qd.q_dedup_clusters(mega_bucket_sf)
    lab = dict(zip(clusters["doc_id"].to_pylist(), clusters["cluster_id"].to_pylist()))
    assert all(lab[i] == 0 for i in range(40))
    assert all(lab[i] == i for i in range(40, 60))
    qd._EDGE_CACHE.clear()


def test_embedding_neardup_blocks_scale_with_corpus(ray_session):
    """n_blocks derives from corpus size and embedding dim (VERDICT r2 #8):
    per-block payload stays under the budget, floor of 4 for parallelism."""
    from chronoxtract_ray.pipelines.queries_vec import _derive_n_blocks

    assert _derive_n_blocks(n=1000, dim=64) == 4
    big = _derive_n_blocks(n=200_000_000, dim=768)
    assert big >= 4
    # per-block matrix must fit the documented budget
    assert -(-200_000_000 // big) * 768 * 8 <= 512 * (1 << 20)
    assert _derive_n_blocks(n=0, dim=64) == 4


def test_embedding_neardup_empty_blocks(ray_session, tmp_path):
    """vec_ids covering only one residue class leave B-1 hash blocks with no
    partition dir — score tasks must treat those as empty, not crash, and
    the present near-dup pair must still come back."""
    from chronoxtract_ray.pipelines.queries_vec import q_embedding_neardup

    rng = np.random.default_rng(7)
    base = rng.standard_normal(64)
    # ids {0, 4, 8} are all ≡ 0 (mod 4): blocks 1..3 are never written
    emb = np.stack([base, base * 0.99 + rng.standard_normal(64) * 0.01,
                    rng.standard_normal(64)])
    t = pa.table({
        "vec_id": pa.array([0, 4, 8], pa.int64()),
        "embedding": pa.array([e.tolist() for e in emb], pa.list_(pa.float64())),
    })
    pq.write_table(t, os.path.join(tmp_path, "embeddings.parquet"))
    out = q_embedding_neardup(str(tmp_path))
    pairs = set(zip(out["vec_a"].to_pylist(), out["vec_b"].to_pylist()))
    assert (0, 4) in pairs  # the near-identical pair survives
    assert all(a < b for a, b in pairs)


def test_topk_tie_straddling_k_prefers_lowest_id():
    """(cosine DESC, id ASC) must hold even when an exact tie straddles the
    k-th position — bare argpartition keeps an arbitrary tied member and the
    driver merge can only reorder what the batches kept (r4 review)."""
    from chronoxtract_ray.pipelines.queries_vec import _topk_by_sim_then_id

    sims = np.array([0.9, 0.5, 0.5, 0.5, 0.1])
    ids = np.array([10, 7, 3, 5, 1])
    idx = _topk_by_sim_then_id(sims, ids, 3)
    assert ids[idx].tolist() == [10, 3, 5]
    assert _topk_by_sim_then_id(sims, ids, 5).size == 5
    assert _topk_by_sim_then_id(sims, ids, 9).size == 5


def test_knn_bruteforce_exact_ties_pick_lowest_ids(ray_session, tmp_path):
    """Seven bit-identical candidate embeddings tie at the k boundary: the
    reported top-5 must be the five lowest neighbor ids, matching the SQL
    oracle's row_number ORDER BY cosine DESC, neighbor_id ASC."""
    from chronoxtract_ray.pipelines.queries_vec import q_knn_bruteforce

    rng = np.random.default_rng(11)
    q = rng.standard_normal(64)
    dup = rng.standard_normal(64)
    vecs = [q] + [dup] * 7
    t = pa.table({
        "vec_id": pa.array([0] + list(range(11, 18)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
    })
    pq.write_table(t, os.path.join(tmp_path, "embeddings.parquet"))
    out = q_knn_bruteforce(str(tmp_path)).to_pandas()
    got = out[out.query_id == 0].neighbor_id.tolist()
    assert got == [11, 12, 13, 14, 15]


def test_embedding_neardup_tile_chunking_equivalent(ray_session, tmp_path, monkeypatch):
    """A pathologically small tile budget (1 row per matmul chunk) must give
    bit-identical pairs to the default — the chunking only bounds memory."""
    from chronoxtract_ray.pipelines import queries_vec as qv

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 64))
    vecs[25] = vecs[13] * 0.995 + rng.standard_normal(64) * 0.005  # one near-dup
    t = pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
    })
    pq.write_table(t, os.path.join(tmp_path, "embeddings.parquet"))
    base = qv.q_embedding_neardup(str(tmp_path))
    monkeypatch.setattr(qv, "_TILE_BUDGET_BYTES", 1)
    tiny = qv.q_embedding_neardup(str(tmp_path))
    key = [("vec_a", "ascending"), ("vec_b", "ascending")]
    assert base.sort_by(key).equals(tiny.sort_by(key))
    pairs = set(zip(base["vec_a"].to_pylist(), base["vec_b"].to_pylist()))
    assert (13, 25) in pairs


def test_shingle_ids_equivalent_to_string_sets():
    """The int64 shingle-id path (r5 pair-scorer vectorization) must count
    intersections/unions EXACTLY like the string-set path — including empty
    texts, sub-K texts, unicode, and repeated shingles."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(list("ab 🙂é\n"))
    texts_strategy = st.lists(st.text(alphabet=alphabet, max_size=40), min_size=1, max_size=8)

    @settings(max_examples=200, deadline=None)
    @given(texts_strategy)
    def run(texts):
        ids = qd._batch_shingle_ids(texts)
        assert ids is not None
        sets = [qd._shingle_set(t) for t in texts]
        for i in range(len(texts)):
            assert ids[i].size == len(sets[i]), texts[i]
            for j in range(i + 1, len(texts)):
                inter_ids = np.intersect1d(ids[i], ids[j], assume_unique=True).size
                assert inter_ids == len(sets[i] & sets[j]), (texts[i], texts[j])

    run()


def test_shingle_ids_degenerate_vocab_falls_back():
    # >6200 distinct codepoints in one batch -> injectivity not guaranteed
    big = "".join(chr(0x4E00 + i) for i in range(7000))
    assert qd._batch_shingle_ids([big]) is None


def test_dedup_clusters_paths_equivalent(ray_session, monkeypatch):
    """The driver-side union-find fast path and the distributed hash-to-min
    rounds must produce identical cluster labels (r5 small-graph path)."""
    import pandas as pd

    sf = "/root/testdata/sf0.001"
    fast = qd.q_dedup_clusters(sf).to_pandas()
    monkeypatch.setattr(qd, "_CC_DRIVER_EDGE_CAP", 0)  # force distributed rounds
    dist = qd.q_dedup_clusters(sf).to_pandas()
    pd.testing.assert_frame_equal(fast, dist)
    # the fixture must actually exercise both CC paths: at least one doc
    # carries a non-identity label (else this degenerates to identity-vs-
    # identity and the union-find is never covered)
    assert (fast.doc_id != fast.cluster_id).any()
    # label of every cluster is its minimum member
    mins = fast.groupby("cluster_id").doc_id.min()
    assert (mins.index.to_numpy() == mins.to_numpy()).all()
