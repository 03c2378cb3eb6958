"""Behavioral contracts for the round-4 training-data curation family
(queries_traindata.py) — oracle parity runs in test_queries_oracle.py;
these pin semantics, determinism, and the residual-mass combiner's
exactness under arbitrary batch splits."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def td(ray_session):
    from chronoxtract_ray.pipelines import queries_traindata as m

    return m


def test_decontaminate_semantics(td):
    t = td.q_decontaminate(SF).to_pandas()
    assert len(t) == 500 and t.doc_id.is_unique
    bench = t[t.is_benchmark]
    assert len(bench) == (t.doc_id % td._BENCH_MOD == 0).sum()
    # benchmark docs' grams are in the set by construction -> full overlap
    nb = bench[bench.n_trigrams > 0]
    assert (nb.n_bench_overlap == nb.n_trigrams).all()
    assert (bench.contaminated == False).all()  # noqa: E712
    # flag consistent with its own columns
    expect = (~t.is_benchmark) & (t.n_bench_overlap > 0)
    assert (t.contaminated == expect).all()
    assert t.contaminated.any(), "corpus should show some benchmark overlap at trigram order 3"
    assert (t.bench_overlap_rate >= 0).all() and (t.bench_overlap_rate <= 1).all()


def test_source_mix_accounting(td):
    t = td.q_source_mix(SF).to_pandas()
    assert t.n_docs.sum() == 500
    assert abs(t.doc_share.sum() - 1.0) < 1e-3
    assert abs(t.token_share.sum() - 1.0) < 1e-3
    assert (t.n_tokens >= t.n_docs).all()  # every synthetic doc has >= 1 word


def _ground_truth_sampling(k: int, budget: int) -> pd.DataFrame:
    """Independent single-pass reference: pandas over the raw parquet."""
    import pyarrow.parquet as pq

    df = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]).to_pandas()
    df["sample_key"] = df.doc_id.map(lambda d: hashlib.md5(str(d).encode()).hexdigest())
    df["n_tokens"] = df.text.str.strip().map(lambda s: 0 if not s else len(s.split()))
    df = df.sort_values(["sample_key", "doc_id"], kind="stable")
    g = df.groupby("source", sort=False)
    df["rn"] = g.cumcount()
    df["cum_tokens"] = g["n_tokens"].cumsum()
    parts = []
    topk = df[df.rn < k].copy()
    topk.insert(0, "method", "topk")
    parts.append(topk)
    bud = df[df.cum_tokens <= budget].copy()
    bud.insert(0, "method", "budget")
    parts.append(bud)
    out = pd.concat(parts, ignore_index=True)
    return out[["method", "source", "doc_id", "sample_key", "n_tokens", "cum_tokens"]]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def test_sampling_policies_vs_independent_reference(td):
    got = _canon(td.q_sampling_policies(SF).to_pandas())
    exp = _canon(_ground_truth_sampling(5, td._BUDGET_TOKENS))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_sampling_topk_half_equals_component_query(td):
    """The union's 'topk' half must select exactly q_stratified_sample's
    rows (the component keeps its own API; this pins them together)."""
    from chronoxtract_ray.pipelines.queries_textqc import q_stratified_sample

    union = td.q_sampling_policies(SF).to_pandas()
    topk = union[union.method == "topk"][["source", "doc_id", "sample_key"]]
    comp = q_stratified_sample(SF).to_pandas()[["source", "doc_id", "sample_key"]]
    pd.testing.assert_frame_equal(_canon(topk), _canon(comp), check_dtype=False)


def test_budget_sample_maximality(td):
    """Selected per-source prefixes are maximal: each source's selection
    fills the budget exactly up to (not past) the next doc in hash order."""
    t = td.q_token_budget_sample(SF).to_pandas()
    full = _ground_truth_sampling(0, td._BUDGET_TOKENS)
    full = full[full.method == "budget"]
    assert len(t) == len(full)
    assert (t.cum_tokens <= td._BUDGET_TOKENS).all()


def test_sample_local_prune_exact_under_random_splits(td):
    """The residual-mass combiner proof, empirically: ANY partition of the
    input into batches, pruned per batch then finalized per source, must
    reproduce the single-pass ground truth bit-for-bit."""
    rng = np.random.default_rng(7)
    for trial in range(12):
        n = int(rng.integers(20, 200))
        df = pd.DataFrame(
            {
                "source": rng.integers(0, 4, n).astype(str),
                "doc_id": np.arange(n, dtype=np.int64),
                "sample_key": [hashlib.md5(str(int(d)).encode()).hexdigest() for d in range(n)],
                "n_tokens": rng.integers(0, 120, n).astype(np.int64),
            }
        )
        k = int(rng.integers(0, 4))
        budget = int(rng.integers(50, 400))
        # ground truth: single pass
        s = df.sort_values(["sample_key", "doc_id"], kind="stable")
        g = s.groupby("source", sort=False)
        rn = g.cumcount().to_numpy()
        cum = g["n_tokens"].cumsum().to_numpy()
        truth = s[(rn < k) | (cum <= budget)].copy()
        truth["cum_tokens"] = cum[(rn < k) | (cum <= budget)]
        # batched path: random split into 1..6 batches
        nb = int(rng.integers(1, 7))
        order = rng.permutation(n)
        pieces = np.array_split(order, nb)
        pruned = [
            td._sample_local_prune(pa.Table.from_pandas(df.iloc[p], preserve_index=False), k, budget)
            for p in pieces
            if len(p)
        ]
        merged = pa.concat_tables(pruned, promote_options="default")
        outs = []
        for src, grp in merged.to_pandas().groupby("source", sort=False):
            outs.append(td._sample_final(pa.Table.from_pandas(grp, preserve_index=False), k, budget))
        got = pd.concat(outs, ignore_index=True)
        got_sel = _canon(got[["source", "doc_id", "sample_key", "n_tokens", "cum_tokens"]].drop_duplicates())
        want = _canon(truth[["source", "doc_id", "sample_key", "n_tokens", "cum_tokens"]])
        try:
            pd.testing.assert_frame_equal(got_sel, want, check_dtype=False)
        except AssertionError as e:
            raise AssertionError(f"trial {trial} (n={n}, k={k}, budget={budget}, nb={nb})") from e


def test_semdedup_semantics(td):
    a = td.q_semdedup(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = td.q_semdedup(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # deterministic end to end
    assert len(a) == 500 and a.vec_id.is_unique
    # the lowest vec_id in each cluster can never be a duplicate
    firsts = a.groupby("cluster").vec_id.min()
    assert (~a[a.vec_id.isin(firsts)].is_dup).all()
    # flag consistent with the reported similarity (rounded to 6dp)
    dup = a[a.is_dup]
    assert (dup.max_sim_lower >= td._SEM_TAU - 1e-6).all()
    assert dup.shape[0] > 0, "the synthetic embeddings contain near-dups above tau"
    assert dup.shape[0] < len(a) / 2, "pruning should not remove most of the corpus"


def test_curation_pipeline_funnel(td):
    t = td.q_curation_pipeline(SF).to_pandas()
    assert len(t) == 500 and t.doc_id.is_unique
    assert (t.kept == (t.drop_reason == "kept")).all()
    reasons = set(t.drop_reason.unique())
    assert "kept" in reasons and {"quality", "repetition", "contaminated"} & reasons
    # first-fail precedence: recompute from the component queries
    from chronoxtract_ray.pipelines.queries_docs import q_minhash_neardup
    from chronoxtract_ray.pipelines.queries_textqc import q_c4_filters

    c4 = q_c4_filters(SF).to_pandas().set_index("doc_id")
    dec = td.q_decontaminate(SF).to_pandas().set_index("doc_id")
    nd = q_minhash_neardup(SF).to_pandas()
    assert (nd.doc_a < nd.doc_b).all()  # the keep-lowest policy's premise
    joined = t.set_index("doc_id")
    q = c4.loc[joined.index]
    assert (joined.drop_reason[~q.keep] == "quality").all()
    assert (joined.drop_reason[q.keep & ~q.rep_keep] == "repetition").all()
    d = dec.loc[joined.index]
    assert (joined.drop_reason[q.keep & q.rep_keep & d.contaminated] == "contaminated").all()


def test_semdedup_block_fallback_matches_dense(td, monkeypatch):
    """VERDICT r4 #2 'done' condition: a forced mega-cluster (every vector
    in ONE list) completes through the block self-join fallback without a
    single-block group, and reproduces the dense path bit-for-bit."""
    # dense reference: cap high enough that the mega-cluster stays in-group
    monkeypatch.setattr(td, "_sem_n_lists", lambda n: 1)
    monkeypatch.setattr(td, "_SEM_DENSE_CAP", 10_000)
    dense = td.q_semdedup(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert dense.cluster.nunique() == 1  # the mega-cluster really formed
    # fallback: cap far below the cluster size -> block self-join path
    monkeypatch.setattr(td, "_SEM_DENSE_CAP", 64)
    blocked = td.q_semdedup(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(dense, blocked)


def test_sem_n_lists_derivation(td):
    # floor covers every oracle-checked corpus; growth kicks in past it
    assert td._sem_n_lists(500) == td._SEM_LISTS_MIN
    assert td._sem_n_lists(td._SEM_LISTS_MIN * td._SEM_CLUSTER_TARGET) == td._SEM_LISTS_MIN
    n = 10 * td._SEM_LISTS_MIN * td._SEM_CLUSTER_TARGET
    assert td._sem_n_lists(n) == -(-n // td._SEM_CLUSTER_TARGET)
    # expected cluster size stays bounded by the target as the corpus grows
    for n in (10**6, 10**9, 10**12):
        assert n / td._sem_n_lists(n) <= td._SEM_CLUSTER_TARGET


def test_sampling_combiner_under_adversarial_skew(td):
    """VERDICT r4 #7: one source holding 99% of documents must not break the
    residual-mass combiner's exactness NOR its shuffle bound — per batch and
    source, the combiner may keep at most k + budget + 1 rows (every
    positive-token doc adds >= 1 to the cum) plus one marker."""
    rng = np.random.default_rng(11)
    n = 2000
    src = np.where(rng.random(n) < 0.99, "mega", rng.choice(["a", "b", "c"], n))
    df = pd.DataFrame(
        {
            "source": src,
            "doc_id": np.arange(n, dtype=np.int64),
            "sample_key": [hashlib.md5(str(d).encode()).hexdigest() for d in range(n)],
            "n_tokens": rng.integers(1, 60, n).astype(np.int64),
        }
    )
    k, budget = 5, 300
    s = df.sort_values(["sample_key", "doc_id"], kind="stable")
    g = s.groupby("source", sort=False)
    rn = g.cumcount().to_numpy()
    cum = g["n_tokens"].cumsum().to_numpy()
    keep_mask = (rn < k) | (cum <= budget)
    truth = s[keep_mask].copy()
    truth["cum_tokens"] = cum[keep_mask]
    for nb in (1, 3, 8):
        pieces = np.array_split(rng.permutation(n), nb)
        pruned = []
        for p in pieces:
            out = td._sample_local_prune(pa.Table.from_pandas(df.iloc[p], preserve_index=False), k, budget)
            od = out.to_pandas()
            real = od[od.doc_id >= 0]
            markers = od[od.doc_id < 0]
            # shuffle bound: survivors per (batch, source) <= k + budget
            # (tokens >= 1 so a budget prefix has <= budget rows), + 1 marker
            assert real.groupby("source").size().max() <= k + budget
            assert markers.groupby("source").size().max() <= 1 if len(markers) else True
            pruned.append(out)
        merged = pa.concat_tables(pruned, promote_options="default").to_pandas()
        outs = [
            td._sample_final(pa.Table.from_pandas(grp, preserve_index=False), k, budget)
            for _, grp in merged.groupby("source", sort=False)
        ]
        got = pd.concat(outs, ignore_index=True)
        got_sel = _canon(got[["source", "doc_id", "sample_key", "n_tokens", "cum_tokens"]].drop_duplicates())
        want = _canon(truth[["source", "doc_id", "sample_key", "n_tokens", "cum_tokens"]])
        pd.testing.assert_frame_equal(got_sel, want, check_dtype=False)


@pytest.fixture(scope="module")
def saturated_sf(tmp_path_factory):
    """A corpus where 99% of docs repeat benchmark trigrams verbatim — the
    decontamination broadcast's adversarial case: overlap is corpus-wide
    but the BROADCAST set stays benchmark-sized."""
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("satsf")
    rng = np.random.default_rng(5)
    n = 1000
    bench_text = "alpha beta gamma delta epsilon zeta"
    texts = []
    for d in range(n):
        if d % 20 == 0:
            texts.append(bench_text)  # the benchmark slice itself
        elif rng.random() < 0.99:
            texts.append("noise " + bench_text + " tail")  # saturated overlap
        else:
            texts.append(f"clean doc {d} with its own distinct words {d * 7}")
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["s"] * n),
            "lang": pa.array(["en"] * n),
        }
    )
    pq.write_table(t, root / "documents.parquet")
    return str(root)


def test_decontaminate_broadcast_under_saturation(td, saturated_sf):
    grams = td._benchmark_grams(saturated_sf)
    # broadcast set is benchmark-content-sized: 6 tokens -> 4 trigrams,
    # regardless of 99% of the corpus repeating them
    assert len(grams) == 4
    t = td.q_decontaminate(saturated_sf).to_pandas()
    assert len(t) == 1000
    bench = t[t.is_benchmark]
    assert (~bench.contaminated).all()
    # every saturated doc contains all 4 benchmark trigrams -> contaminated
    overlap = t[~t.is_benchmark & (t.n_bench_overlap > 0)]
    assert (overlap.contaminated).all()
    assert (overlap.n_bench_overlap == 4).all()
    clean = t[~t.is_benchmark & (t.n_bench_overlap == 0)]
    assert (~clean.contaminated).all() and len(clean) > 0
