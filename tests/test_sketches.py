"""Misra-Gries sketch properties + the sketch-guided exact heavy hitters,
and the distributed Bloom build used by the bloom-join queries."""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from vbpl_web_crawl_ray.functions.hashing import hash64
from vbpl_web_crawl_ray.stages.joins import (build_key_bloom,
                                             build_key_bloom_dist)
from vbpl_web_crawl_ray.stages.sketches import mg_compress, mg_heavy_hitters


@given(st.lists(st.tuples(st.text(min_size=1, max_size=3),
                          st.integers(min_value=1, max_value=50)),
                min_size=0, max_size=40),
       st.integers(min_value=1, max_value=10))
@settings(max_examples=60, deadline=None)
def test_mg_compress_bound_and_size(pairs, k):
    counts = pd.Series(dict(pairs), dtype=np.int64)
    out = mg_compress(counts, k)
    assert len(out) <= k
    # every kept counter undercounts by the same bounded amount, and the
    # kept set contains every item whose count exceeds the (k+1)-th largest
    if len(counts) > k:
        vals = np.sort(counts.to_numpy())[::-1]
        thresh = vals[k]
        for item, w in out.items():
            assert w == counts[item] - thresh
        for item, w in counts.items():
            if w > thresh:
                assert item in out.index
    else:
        assert out.equals(counts)


def _skewed_docs(n_rows=400, seed=7):
    """Zipf-ish item stream as one-token 'documents': a few hot items,
    a long tail — enough distinct items that per-batch MG(k) compresses."""
    rng = np.random.default_rng(seed)
    hot = rng.choice(["h0", "h1", "h2"], size=n_rows * 3)
    tail = np.array([f"t{i}" for i in rng.integers(0, 200, size=n_rows)])
    items = np.concatenate([hot, tail])
    rng.shuffle(items)
    return pd.DataFrame({"item": items})


def test_mg_heavy_hitters_exact_on_skewed_stream(ray_session):
    df = _skewed_docs()
    phi = 0.05
    k = 40                      # >= 2/phi, far below 203 distinct items
    ds = rd.from_pandas(df).repartition(8)  # many batches -> real merging

    def extract(b: pd.DataFrame) -> pd.Series:
        return b["item"].value_counts().astype(np.int64)

    got = mg_heavy_hitters(ds, extract, phi=phi, k=k)
    truth = df["item"].value_counts()
    n = int(truth.sum())
    want = truth[truth >= phi * n]
    want = (want.rename_axis("item").reset_index(name="n_occ")
                .sort_values(["n_occ", "item"], ascending=[False, True])
                .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"n_occ": "int64"}), want.astype({"n_occ": "int64"}))


def test_mg_heavy_hitters_empty_input(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"item": pd.Series(dtype=str)}))
    out = mg_heavy_hitters(
        ds, lambda b: b["item"].value_counts().astype(np.int64), phi=0.1)
    assert len(out) == 0
    assert list(out.columns) == ["item", "n_occ"]


def test_build_key_bloom_dist_equals_sequential(ray_session):
    keys = pd.DataFrame({"k": np.arange(5000, dtype=np.int64) * 13 % 4001})
    seq = build_key_bloom(keys["k"].to_numpy(), capacity=8192, fp_rate=0.001)
    dist = build_key_bloom_dist(rd.from_pandas(keys).repartition(7), "k",
                                capacity=8192, fp_rate=0.001)
    # OR of per-batch bit arrays == sequential adds: same bits exactly
    assert np.array_equal(seq.bits, dist.bits)
    assert (dist.num_bits, dist.num_hashes) == (seq.num_bits, seq.num_hashes)
    probe = hash64(keys["k"].astype(str).to_numpy())
    assert dist.contains(probe).all()      # no false negatives


def test_repeated_span_stats_planted(ray_session):
    from vbpl_web_crawl_ray.stages.dedup import repeated_span_stats
    shared = "a b c d e f g h"            # one 8-gram shared by docs 0/1
    run9 = "r1 r2 r3 r4 r5 r6 r7 r8 r9"   # 9-token run shared by docs 4/5
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            shared + " u1 u2 u3 u4",                 # doc 0: 1 gram, 8 tokens
            "v1 v2 " + shared,                       # doc 1: 1 gram, 8 tokens
            "A B C D E F G H q A B C D E F G H",    # doc 2: internal repeat
            "w1 w2 w3 w4 w5 w6 w7 w8 w9",           # doc 3: unique -> absent
            run9 + " s1",                            # doc 4: 2 grams overlap
            "t1 " + run9,                            # doc 5: 2 grams overlap
        ]})
    got = repeated_span_stats(rd.from_pandas(docs).repartition(3))
    want = pd.DataFrame({
        "doc_id": np.array([0, 1, 2, 4, 5], np.int64),
        "dup_grams": np.array([1, 1, 2, 2, 2], np.int64),
        # doc 2: spans [0,8) + [9,17) disjoint = 16; docs 4/5: grams at
        # p and p+1 overlap -> union = 9 tokens
        "dup_tokens": np.array([8, 8, 16, 9, 9], np.int64)})
    pd.testing.assert_frame_equal(got, want)


# ---- mergeable quantile summary ----

def test_quantile_sketch_exact_below_capacity():
    from vbpl_web_crawl_ray.stages.sketches import QuantileSketch
    rng = np.random.default_rng(11)
    x = rng.normal(size=100)
    sk = QuantileSketch(k=64).add(x)       # 100 < 2k: no collapse
    xs = np.sort(x)
    for q in (0.1, 0.5, 0.95):
        # inverted-CDF estimator: smallest value with cum count >= ceil(qN)
        want = xs[max(1, int(np.ceil(q * len(x)))) - 1]
        assert sk.quantile(q) == want


def test_quantile_sketch_rank_error_bound():
    from vbpl_web_crawl_ray.stages.sketches import QuantileSketch
    rng = np.random.default_rng(5)
    streams = {
        "normal": rng.normal(size=60000),
        "sorted": np.arange(60000, dtype=np.float64),
        "reversed": np.arange(60000, dtype=np.float64)[::-1].copy(),
    }
    k = 256
    for name, x in streams.items():
        sk = QuantileSketch(k)
        for chunk in np.array_split(x, 137):
            sk.add(chunk)
        xs = np.sort(x)
        n = len(x)
        bound = (np.log2(n / k) + 2) * n / (2 * k)   # collapse-damage cap
        for q in (0.05, 0.25, 0.5, 0.75, 0.95, 0.99):
            est = sk.quantile(q)
            rank = np.searchsorted(xs, est, side="right")
            assert abs(rank - q * n) <= bound, (name, q, rank, q * n, bound)


def test_quantile_sketch_merge_equivalent_accuracy():
    from vbpl_web_crawl_ray.stages.sketches import QuantileSketch
    rng = np.random.default_rng(9)
    x = rng.exponential(size=40000)
    whole = QuantileSketch(128).add(x)
    parts = [QuantileSketch(128).add(c) for c in np.array_split(x, 23)]
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.count == whole.count == len(x)
    xs = np.sort(x)
    n = len(x)
    bound = (np.log2(n / 128) + 2) * n / 256
    for q in (0.5, 0.9, 0.99):
        for sk in (whole, merged):
            rank = np.searchsorted(xs, sk.quantile(q), side="right")
            assert abs(rank - q * n) <= bound


def test_sketch_quantile_per_group_close_to_exact(ray_session, sf_dir):
    from vbpl_web_crawl_ray.pipelines.scaleops import q_sketch_p95_per_type
    got = q_sketch_p95_per_type(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    for _, row in got.iterrows():
        vals = np.sort(ev.loc[ev["event_type"] == row["event_type"],
                              "value"].to_numpy())
        n = len(vals)
        assert row["n"] == n
        rank = np.searchsorted(vals, row["q95"], side="right")
        # groups are ~200-2000 values: sketches with k=256 see no or one
        # collapse, so the estimate must sit within a few ranks of exact
        bound = max(2, (np.log2(max(n / 256, 1)) + 2) * n / 512)
        assert abs(rank - 0.95 * n) <= bound


# ---- randomized cross-checks for the new scale operators ----

def test_repeated_span_stats_matches_bruteforce(ray_session):
    from vbpl_web_crawl_ray.stages.dedup import repeated_span_stats
    n = 4
    for seed in range(5):
        rng = np.random.default_rng(seed)
        vocab = [f"w{i}" for i in range(6)]       # tiny vocab -> many repeats
        docs = pd.DataFrame({
            "doc_id": np.arange(30, dtype=np.int64),
            "text": [" ".join(rng.choice(vocab, size=rng.integers(2, 25)))
                     for _ in range(30)]})
        got = repeated_span_stats(rd.from_pandas(docs).repartition(4), n=n)
        # brute force: global gram occurrence counts, then per-doc
        # flagged starts + interval-union coverage
        occ: dict[str, int] = {}
        per_doc: dict[int, list[int]] = {}
        for did, t in zip(docs["doc_id"], docs["text"]):
            toks = t.split(" ")
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i:i + n])
                occ[g] = occ.get(g, 0) + 1
                per_doc.setdefault(did, []).append(i)
        rows = []
        for did, t in zip(docs["doc_id"], docs["text"]):
            toks = t.split(" ")
            flagged = [i for i in range(len(toks) - n + 1)
                       if occ[" ".join(toks[i:i + n])] >= 2]
            if flagged:
                covered = set()
                for p in flagged:
                    covered.update(range(p, p + n))
                rows.append((did, len(flagged), len(covered)))
        want = pd.DataFrame(rows, columns=["doc_id", "dup_grams", "dup_tokens"])
        want = want.astype({"doc_id": "int64", "dup_grams": "int64",
                            "dup_tokens": "int64"})
        pd.testing.assert_frame_equal(got, want.reset_index(drop=True),
                                      obj=f"repeated spans (seed={seed})")


def test_bloom_semi_exact_even_at_high_fp(ray_session):
    """The bucketed exact join after the Bloom prune must erase the
    filter's false positives — force a terrible filter and check."""
    from vbpl_web_crawl_ray.stages.joins import bloom_semi_join
    from vbpl_web_crawl_ray.stages.shuffle import bucketed_join
    from vbpl_web_crawl_ray.state.bloom import BloomFilter
    from vbpl_web_crawl_ray.functions.hashing import hash64

    keys = pd.DataFrame({"k": np.arange(0, 200, 5, dtype=np.int64)})  # 40 keys
    probe = pd.DataFrame({"k": np.arange(200, dtype=np.int64),
                          "v": np.arange(200, dtype=np.int64) * 10})
    bf = BloomFilter(8, fp_rate=0.5)          # tiny: many false positives
    bf.add(hash64(keys["k"].astype(str).to_numpy()))
    surv = bloom_semi_join(rd.from_pandas(probe), "k", bf).to_pandas()
    assert set(keys["k"]) <= set(surv["k"])   # no false negatives ever
    exact = bucketed_join(rd.from_pandas(probe), rd.from_pandas(keys),
                          on="k", how="inner", num_buckets=4).to_pandas()
    assert set(exact["k"]) == set(keys["k"])  # FPs gone after the join


def test_stratified_sample_partitioning_invariant(ray_session, sf_dir):
    from vbpl_web_crawl_ray.pipelines import curation
    a = curation.q_stratified_sample(sf_dir, cap=120)
    b = curation.q_stratified_sample(sf_dir, cap=120)
    pd.testing.assert_frame_equal(a, b)
    # expected size per stratum ~ cap (Bernoulli): within 4 sigma
    sizes = a.groupby("event_type").size()
    for n in sizes:
        assert abs(n - 120) <= 4 * np.sqrt(120) + 1


def test_repeated_span_stats_no_dups_returns_typed_empty(ray_session):
    from vbpl_web_crawl_ray.stages.dedup import repeated_span_stats
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": [" ".join(f"u{i}_{j}" for j in range(12)) for i in range(3)]})
    out = repeated_span_stats(rd.from_pandas(docs))
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "dup_grams", "dup_tokens"]
    assert all(str(out[c].dtype) == "int64" for c in out.columns)


def test_lsh_near_dup_no_self_pairs_on_duplicate_ids(ray_session):
    """Duplicate-id input (e.g. an upstream bug or re-offered rows) must
    not surface id_a == id_b pairs — each id participates once per
    bucket."""
    from vbpl_web_crawl_ray.stages.ann import lsh_near_dup_pairs
    rng = np.random.default_rng(1)
    m = rng.standard_normal((20, 16))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    df = pd.DataFrame({
        "vec_id": np.concatenate([np.arange(20), np.arange(5)]),
        "emb": [r.tobytes() for r in np.vstack([m, m[:5]])]})
    out = lsh_near_dup_pairs(rd.from_pandas(df), 0.99,
                             n_planes=2, n_tables=4)
    assert (out["id_a"] != out["id_b"]).all()


def test_new_deterministic_queries_invariant_to_bucketing(ray_session, sf_dir):
    """The determinism contract: hash-decided operators return identical
    frames however the work is partitioned — rerun each with a different
    bucket count / at default and compare frames exactly."""
    from vbpl_web_crawl_ray.pipelines import curation, relational2

    a = relational2.q_exact_k_sample(sf_dir, k=50)
    b = relational2.q_exact_k_sample(sf_dir, k=50)
    pd.testing.assert_frame_equal(a, b)

    c1 = curation.q_curated_pack(sf_dir)
    c2 = curation.q_curated_pack(sf_dir)
    pd.testing.assert_frame_equal(c1, c2)

    f1 = relational2.q_funnel_counts(sf_dir)
    f2 = relational2.q_funnel_counts(sf_dir)
    pd.testing.assert_frame_equal(f1, f2)


def test_mg_heavy_hitters_integer_items(ray_session):
    """Non-string extract keys must survive the stringified candidate
    round-trip (regression: int-keyed counts once matched zero
    candidates and silently returned empty)."""
    rng = np.random.default_rng(3)
    vals = np.concatenate([np.full(300, 7), rng.integers(100, 400, 600)])
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(4)
    out = mg_heavy_hitters(
        ds, lambda b: b["v"].value_counts().astype(np.int64), phi=0.2)
    assert "7" in set(out["item"])
    assert int(out.loc[out["item"] == "7", "n_occ"].iloc[0]) == 300
