"""LSH-bucketed near-dup recall and actor-held streaming state."""

import numpy as np
import pandas as pd
import ray.data as rd

from vbpl_web_crawl_ray.stages import ann, dedup
from vbpl_web_crawl_ray.stages.streaming import run_stream


def test_embedding_near_dup_lsh_recall(sf_dir):
    exact = dedup.embedding_near_dup_pairs(sf_dir, threshold=0.45)
    approx = ann.embedding_near_dup_lsh(sf_dir, threshold=0.45)
    exact_set = set(zip(exact["id_a"], exact["id_b"]))
    approx_set = set(zip(approx["id_a"], approx["id_b"]))
    # verification makes precision exact; LSH recall must be high
    assert approx_set <= exact_set
    if exact_set:
        recall = len(approx_set & exact_set) / len(exact_set)
        assert recall >= 0.8, (recall, len(exact_set))


def test_embedding_near_dup_auto_gate(sf_dir):
    """The corpus-size gate drives BOTH branches: default gate picks the
    brute exact path at fixture scale (pair set == brute), a forced
    max_brute_rows=0 picks the LSH path (subset of brute with the pinned
    recall floor, same schema)."""
    brute = dedup.embedding_near_dup_pairs(sf_dir, threshold=0.45)
    auto = dedup.embedding_near_dup_auto(sf_dir, threshold=0.45)
    pd.testing.assert_frame_equal(
        auto.reset_index(drop=True), brute.reset_index(drop=True))
    forced = dedup.embedding_near_dup_auto(sf_dir, threshold=0.45,
                                           max_brute_rows=0)
    assert list(forced.columns) == ["id_a", "id_b"]
    f = set(zip(forced["id_a"], forced["id_b"]))
    b = set(zip(brute["id_a"], brute["id_b"]))
    assert f <= b
    if b:
        assert len(f & b) / len(b) >= 0.8


def test_minhash_signature_roundtrip_integrity():
    """Signatures must survive the Arrow roundtrip as exact uint64s —
    identical docs estimate Jaccard exactly 1.0; estimates track true
    Jaccard for near-dups."""
    from vbpl_web_crawl_ray.stages.dedup import MinHasher
    import pandas as pd
    mh = MinHasher(num_perm=128)
    t1 = "a b c d e f g h i j k l m n o p"
    t2 = "a b c d e f g h i j k l m n o q"   # one shingle end changed
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [t1, t1, t2]})
    sigs = mh(df)
    ds = rd.from_pandas(sigs).to_pandas()   # through Arrow and back
    s = {d: np.asarray(v, dtype=np.uint64)
         for d, v in zip(ds["doc_id"], ds["signature"])}
    assert float((s[1] == s[2]).mean()) == 1.0
    est = float((s[1] == s[3]).mean())
    assert 0.4 < est < 1.0   # true shingle Jaccard = 11/17 ~ 0.65


def test_simhash_banding_is_exact(sf_dir):
    """Chunk-banding is not approximate: two 64-bit hashes within Hamming
    distance d MUST share one of d+1 chunks (pigeonhole), so the banded
    result equals brute force exactly."""
    from vbpl_web_crawl_ray.stages.dedup import simhash_pairs, simhash_signatures
    got = simhash_pairs(sf_dir, max_hamming=3)
    sigs = simhash_signatures(
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])).to_pandas()
    ids = sigs["doc_id"].to_numpy()
    hs = sigs["simhash"].to_numpy().astype(np.uint64)
    a, b = np.triu_indices(len(ids), k=1)
    x = hs[a] ^ hs[b]
    ham = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    want = {(min(i, j), max(i, j))
            for i, j in zip(ids[a][ham <= 3], ids[b][ham <= 3])}
    got_set = {(min(i, j), max(i, j))
               for i, j in zip(got["id_a"], got["id_b"])}
    assert got_set == want


def test_ivf_topk_recall(sf_dir):
    exact = ann.brute_force_topk(sf_dir, query_vec_id=0, k=10)
    approx = ann.ivf_topk(sf_dir, query_vec_id=0, k=10, nprobe=6)
    overlap = len(set(exact["vec_id"]) & set(approx["vec_id"]))
    assert overlap >= 7  # >=70% recall at nprobe=6/16 cells


def test_stream_state_matches_batch(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    got = run_stream(ds, num_buckets=3, alpha=0.2)
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["event_id", "user_id", "ts", "value"])
    pdf = pdf.sort_values(["ts", "event_id"])
    want_n = pdf.groupby("user_id")["value"].size()
    want_sum = pdf.groupby("user_id")["value"].sum()

    def ema(vals, a=0.2):
        e = None
        for v in vals:
            e = v if e is None else a * v + (1 - a) * e
        return e

    want_ema = pdf.groupby("user_id")["value"].agg(ema)
    got = got.set_index("user_id")
    assert (got["n"] == want_n).all()
    assert np.allclose(got["total"], want_sum)
    assert np.allclose(got["ema"], want_ema)


def test_stream_never_materializes_input(sf_dir, monkeypatch):
    """run_stream must feed actors via iter_batches — a full to_pandas of
    the input on the driver is the 100-TB scale-killer it replaced."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    def boom(self, *a, **k):
        raise AssertionError("run_stream materialized the input on the driver")

    monkeypatch.setattr(rd.Dataset, "to_pandas", boom)
    out = run_stream(ds, num_buckets=2, alpha=0.2, feed_batch_rows=512)
    assert len(out) > 0


def test_dedup_verify_never_materializes_corpus(sf_dir, monkeypatch):
    """With the broadcast gate forced off, the MinHash/ngram verify steps
    must keep signatures and shingle sets fully distributed (pair-halves
    shuffle): the only driver-side to_pandas allowed is the final small
    pair list."""
    monkeypatch.setattr(dedup, "BROADCAST_MAX_BYTES", 0)
    real = rd.Dataset.to_pandas

    def bounded(self, *a, **k):
        df = real(self, *a, **k)
        assert len(df) < 10_000, \
            f"driver materialized {len(df)} rows (corpus-sized)"
        return df

    monkeypatch.setattr(rd.Dataset, "to_pandas", bounded)
    pairs = dedup.minhash_lsh_pairs(sf_dir, threshold=0.5)
    assert {"id_a", "id_b", "est_jaccard"} <= set(pairs.columns)
    jac = dedup.ngram_jaccard_pairs(sf_dir, threshold=0.5)
    assert {"id_a", "id_b", "jaccard"} <= set(jac.columns)


def test_minhash_banding_matches_brute_force(sf_dir):
    """The vectorized banding (reshape + mix64 fold, no per-doc Python) must
    produce exactly the brute-force pair set: docs sharing >=1 identical band
    slice AND signature agreement >= threshold. This pins the LSH contract
    independent of the band-hash mix function."""
    threshold, num_perm, bands = 0.5, 128, 32
    rows = num_perm // bands
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
    mh = dedup.MinHasher(num_perm=num_perm, n=3)
    sigs = {d: s for d, s in zip(pdf["doc_id"],
                                 (mh.signature(t) for t in pdf["text"]))}
    ids = sorted(sigs)
    expected = set()
    for i, a in enumerate(ids):
        sa = sigs[a].reshape(bands, rows)
        for b in ids[i + 1:]:
            sb = sigs[b].reshape(bands, rows)
            if not (sa == sb).all(axis=1).any():
                continue                      # no band collision
            if float((sigs[a] == sigs[b]).mean()) >= threshold:
                expected.add((min(a, b), max(a, b)))
    got = dedup.minhash_lsh_pairs(sf_dir, threshold=threshold,
                                  num_perm=num_perm, bands=bands)
    got_set = set(zip(got["id_a"], got["id_b"]))
    assert got_set == expected


def test_dedup_verify_broadcast_matches_shuffle(sf_dir, monkeypatch):
    """The size-gated broadcast verify and the pair-halves shuffle verify
    are two implementations of the same attach — results must agree."""
    bcast = dedup.minhash_lsh_pairs(sf_dir, threshold=0.5)
    monkeypatch.setattr(dedup, "BROADCAST_MAX_BYTES", 0)
    shuf = dedup.minhash_lsh_pairs(sf_dir, threshold=0.5)
    assert bcast.equals(shuf)


def test_stream_incremental_across_feeds(sf_dir):
    """State carries across successive datasets (the incremental claim)."""
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["event_id", "user_id", "ts", "value"])
    pdf = pdf.sort_values(["ts", "event_id"])
    half = len(pdf) // 2
    import ray
    from vbpl_web_crawl_ray.stages.streaming import StreamBucket
    a = StreamBucket.remote(0.2)
    ray.get(a.feed.remote(pdf.iloc[:half]))
    ray.get(a.feed.remote(pdf.iloc[half:]))
    got = ray.get(a.snapshot.remote()).set_index("user_id").sort_index()
    want = pdf.groupby("user_id")["value"].size().sort_index()
    assert got["n"].to_numpy().tolist() == want.to_numpy().tolist()


def test_minhash_banding_non_multiple_num_perm(sf_dir):
    """num_perm that is not an exact band multiple must not crash (the old
    slice banding ignored the leftover permutations; the vectorized reshape
    truncates to bands*rows first — regression for the reshape ValueError)."""
    got = dedup.minhash_lsh_pairs(sf_dir, threshold=0.5,
                                  num_perm=100, bands=32)
    assert {"id_a", "id_b", "est_jaccard"} <= set(got.columns)


def test_watermark_windows_ordered_equals_batch(sf_dir):
    """Fed in event-time order, the watermark windows drop nothing and
    equal the batch GROUP BY computed straight off the parquet."""
    import ray.data as rd
    from vbpl_web_crawl_ray.stages.streaming import run_watermark_windows

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "ts", "value"])
    out, metrics = run_watermark_windows(ds, key_col="event_type",
                                         window_size_s=1800.0)
    assert metrics["dropped_late"] == 0
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["event_type", "ts", "value"])
    win = (pdf["ts"].astype("datetime64[us]").astype("int64")
           // 1_800_000_000) * 1800
    want = (pdf.assign(win_start=win)
               .groupby(["event_type", "win_start"], as_index=False)
               .agg(n=("value", "size"), sum_value=("value", "sum"))
               .sort_values(["event_type", "win_start"])
               .reset_index(drop=True))
    got = out.rename(columns={"key": "event_type"})
    assert got["n"].to_list() == want["n"].to_list()
    assert got["win_start"].to_list() == want["win_start"].to_list()
    np.testing.assert_allclose(got["sum_value"], want["sum_value"],
                               rtol=0, atol=1e-9)


def test_watermark_late_events_dropped_and_counted():
    """Out-of-order arrival behind the watermark: the finalized window
    emits once with only its on-time rows; the straggler is counted as
    dropped, never double-emitted. Within allowed lateness it is merged."""
    import ray
    from vbpl_web_crawl_ray.stages.streaming import WatermarkWindow

    def mk(ts_s, key="a", value=1.0):
        return pd.DataFrame({
            "key": [key],
            "ts": pd.to_datetime([ts_s], unit="s").astype("datetime64[us]"),
            "value": [value]})

    # lateness 0: window [0,10) finalizes once watermark reaches 10
    a = WatermarkWindow.remote(window_size_s=10.0, allowed_lateness_s=0.0)
    ray.get(a.feed.remote(mk(1)))
    ray.get(a.feed.remote(mk(12)))       # watermark=12 -> [0,10) finalized
    ray.get(a.feed.remote(mk(5)))        # straggler: dropped
    out = ray.get(a.flush.remote())
    m = ray.get(a.metrics.remote())
    assert m["dropped_late"] == 1
    assert out[out["win_start"] == 0]["n"].item() == 1  # emitted ONCE, n=1

    # lateness 5: the same straggler at wm=12 is still inside the horizon
    b = WatermarkWindow.remote(window_size_s=10.0, allowed_lateness_s=5.0)
    ray.get(b.feed.remote(mk(1)))
    ray.get(b.feed.remote(mk(12)))       # frontier = 12-5 = 7 < 10: open
    ray.get(b.feed.remote(mk(5)))        # merges into [0,10)
    out = ray.get(b.flush.remote())
    m = ray.get(b.metrics.remote())
    assert m["dropped_late"] == 0
    assert out[out["win_start"] == 0]["n"].item() == 2


def test_session_windows_bridge_merge_and_late_drop():
    """The merging-window semantics: a late-but-allowed event landing
    between two open sessions BRIDGES them into one; an event behind the
    lateness horizon is dropped and counted, never resurrects a
    finalized session."""
    import ray
    from vbpl_web_crawl_ray.stages.streaming import SessionWindow

    def mk(ts_s, key=1, value=1.0):
        return pd.DataFrame({
            "key": [key],
            "ts": pd.to_datetime([ts_s], unit="s").astype("datetime64[us]"),
            "value": [value]})

    # gap 10, lateness 30: events at 0 and 15 open TWO sessions; the
    # late event at 8 (inside lateness, wm=15 -> frontier=-15) touches
    # both (8 <= 0+10 and 8 >= 15-10) and merges them into one
    a = SessionWindow.remote(gap_s=10.0, allowed_lateness_s=30.0)
    ray.get(a.feed.remote(mk(0)))
    ray.get(a.feed.remote(mk(15)))
    m = ray.get(a.metrics.remote())
    assert m["open_sessions"] == 2
    ray.get(a.feed.remote(mk(8)))        # the bridge
    out = ray.get(a.flush.remote())
    assert len(out) == 1
    assert out["n"].item() == 3
    assert (out["start_us"].item(), out["end_us"].item()) == (0, 15_000_000)
    assert ray.get(a.metrics.remote())["dropped_late"] == 0

    # lateness 0: the session ending at 5 finalizes once wm-0 passes
    # 5+gap; the straggler at 3 is behind the horizon -> dropped
    b = SessionWindow.remote(gap_s=10.0, allowed_lateness_s=0.0)
    ray.get(b.feed.remote(mk(5)))
    ray.get(b.feed.remote(mk(40)))       # frontier=40 > 15: finalized
    ray.get(b.feed.remote(mk(3)))        # dropped, nothing resurrected
    out = ray.get(b.flush.remote())
    m = ray.get(b.metrics.remote())
    assert m["dropped_late"] == 1
    assert len(out) == 2                 # [5,5] and [40,40], each once
    assert out["n"].tolist() == [1, 1]


def test_session_windows_ordered_equals_batch(sf_dir):
    """Ordered feed == batch gaps-and-islands: same sessions, counts and
    bounds as a pandas reference over the same events."""
    import ray.data as rd
    from vbpl_web_crawl_ray.stages.streaming import run_session_windows

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    got, metrics = run_session_windows(ds, key_col="user_id", gap_s=1800.0)
    assert metrics["dropped_late"] == 0

    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    gap = pd.Timedelta(seconds=1800)
    new = (ev["user_id"].ne(ev["user_id"].shift(1))
           | (ev["ts"] > ev.groupby("user_id")["ts"].shift(1) + gap))
    sid = new.cumsum()
    want = (ev.groupby(["user_id", sid])
              .agg(session_start=("ts", "min"), session_end=("ts", "max"),
                   n=("ts", "size"), sum_value=("value", "sum"))
              .reset_index(level=0).reset_index(drop=True)
              .sort_values(["user_id", "session_start"])
              .reset_index(drop=True))
    got = got.rename(columns={"key": "user_id"})
    got["user_id"] = got["user_id"].astype("int64")
    pd.testing.assert_frame_equal(
        got[["user_id", "session_start", "session_end", "n"]],
        want[["user_id", "session_start", "session_end", "n"]],
        check_dtype=False)
    assert np.allclose(got["sum_value"], want["sum_value"])


def test_projected_topk_recall(sf_dir):
    """Two-stage JL retrieval (reduced-space candidates -> exact rescore)
    must recover nearly all of the full-dim exact top-k; the raw reduced
    ranking alone does not (that's the point of the rescore stage)."""
    from vbpl_web_crawl_ray.stages import ann

    exact = ann.brute_force_topk(sf_dir, 0, 10)
    red = ann.projected_topk(sf_dir, 0, 10)
    recall = len(set(red["vec_id"]) & set(exact["vec_id"]))
    assert recall >= 9
    # determinism: the seeded projection gives identical output per run
    again = ann.projected_topk(sf_dir, 0, 10)
    assert red.equals(again)


def test_interval_join_watermark_eviction_and_late_drop():
    """The stream-stream interval join: (1) a probe finalizes only once
    the watermark strictly passes it, counting exactly the builds in its
    trailing window; (2) build state EVICTS past watermark-late-window
    (bounded by horizon activity, not stream length); (3) an event behind
    the lateness horizon drops and is counted."""
    import ray
    from vbpl_web_crawl_ray.stages.streaming import IntervalJoin

    def mk(ts_s, side, eid, key=1):
        return pd.DataFrame({
            "key": [key],
            "ts": pd.to_datetime([ts_s], unit="s").astype("datetime64[us]"),
            "side": [side],
            "event_id": [eid]})

    # window 10s, lateness 0
    a = IntervalJoin.remote(window_s=10.0, allowed_lateness_s=0.0)
    ray.get(a.feed.remote(mk(0, "build", 100)))
    ray.get(a.feed.remote(mk(5, "build", 101)))
    ray.get(a.feed.remote(mk(8, "probe", 1)))     # sees both (0, 5)
    m = ray.get(a.metrics.remote())
    assert m["buffered_builds"] == 2              # nothing evictable yet
    # watermark jumps to 100: probe 1 finalizes with n=2; builds at 0,5
    # are behind 100-0-10=90 -> evicted; the new build stays
    ray.get(a.feed.remote(mk(100, "build", 102)))
    m = ray.get(a.metrics.remote())
    assert m["evicted_builds"] == 2
    assert m["buffered_builds"] == 1
    # a probe at 95 would be behind the watermark -> dropped late
    ray.get(a.feed.remote(mk(95, "probe", 2)))
    assert ray.get(a.metrics.remote())["dropped_late"] == 1
    # probe at 105 sees only build 102 (100 >= 105-10)
    ray.get(a.feed.remote(mk(105, "probe", 3)))
    out = ray.get(a.flush.remote()).set_index("event_id")["n_clicks"]
    assert out.to_dict() == {1: 2, 3: 1}

    # boundary inclusivity: clicks at exactly t-window and t both count;
    # a probe NOT finalized early still counts a tie-timestamp build
    # that arrives after it (the strict-watermark contract)
    b = IntervalJoin.remote(window_s=10.0, allowed_lateness_s=0.0)
    ray.get(b.feed.remote(mk(10, "build", 200)))
    ray.get(b.feed.remote(mk(20, "probe", 4)))
    ray.get(b.feed.remote(mk(20, "build", 201)))  # tie with probe 4
    out = ray.get(b.flush.remote()).set_index("event_id")["n_clicks"]
    assert out.to_dict() == {4: 2}


def test_interval_join_ordered_equals_batch(sf_dir):
    """Ordered feed == the batch trailing-window theta join (the same
    count purchase_click_attribution computes)."""
    import ray.data as rd
    from vbpl_web_crawl_ray.pipelines.analytics2 import (
        q_purchase_click_attribution,
    )
    from vbpl_web_crawl_ray.stages.streaming import run_interval_join

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type", "ts"])
    got, metrics = run_interval_join(ds, key_col="user_id",
                                     build_type="click",
                                     probe_type="purchase",
                                     window_s=1800.0)
    assert metrics["dropped_late"] == 0
    want = q_purchase_click_attribution(sf_dir)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))


def test_hopping_window_overlap_and_late_drop():
    """Every event lands in size/hop overlapping windows; a window
    finalizes once the watermark passes its end and an event for it
    afterwards drops (counted), never resurrecting it."""
    import ray
    from vbpl_web_crawl_ray.stages.streaming import HoppingWindow

    def mk(ts_s, key="a", value=1.0):
        return pd.DataFrame({
            "key": [key],
            "ts": pd.to_datetime([ts_s], unit="s").astype("datetime64[us]"),
            "value": [value]})

    # size 40, hop 10 -> each event covers 4 windows
    a = HoppingWindow.remote(window_size_s=40.0, hop_s=10.0,
                             allowed_lateness_s=0.0)
    ray.get(a.feed.remote(mk(35)))            # windows 0,10,20,30
    assert ray.get(a.metrics.remote())["open_windows"] == 4
    # watermark to 100: all four finalize (end <= 100)
    ray.get(a.feed.remote(mk(100)))           # windows 70,80,90,100
    m = ray.get(a.metrics.remote())
    assert m["open_windows"] == 4             # only the new event's
    # straggler at 36 targets finalized windows 0..30 -> all 4 drop
    ray.get(a.feed.remote(mk(36)))
    m = ray.get(a.metrics.remote())
    assert m["dropped_late"] == 4
    out = ray.get(a.flush.remote())
    w35 = out[out["win_start"].isin([0, 10, 20, 30])]
    assert (w35["n"] == 1).all()              # the straggler never landed


def test_dedup_gate_drops_in_horizon_retry_and_evicts_past_horizon():
    """The exactly-once contract AND its stated bound: a retry inside
    the horizon is dropped; once the watermark advances past horizon,
    the id evicts (bounded state) so a later replay is redelivered."""
    import ray
    from vbpl_web_crawl_ray.stages.streaming import DedupGate

    g = DedupGate.remote(horizon_s=100.0)
    t0 = pd.Timestamp("2024-01-01")

    def feed(rows):
        ray.get(g.feed.remote(pd.DataFrame(rows)))

    feed([{"event_id": 1, "event_type": "a", "ts": t0}])
    # retry 50 s later: inside horizon -> dropped
    feed([{"event_id": 1, "event_type": "a",
           "ts": t0 + pd.Timedelta(seconds=50)}])
    m = ray.get(g.metrics.remote())
    assert m["dups_dropped"] == 1
    # advance watermark far past the horizon -> id 1 evicts
    feed([{"event_id": 2, "event_type": "a",
           "ts": t0 + pd.Timedelta(seconds=500)}])
    assert ray.get(g.metrics.remote())["ids_held"] == 1  # only id 2
    # replay of id 1 after eviction is DELIVERED (the documented bound)
    feed([{"event_id": 1, "event_type": "a",
           "ts": t0 + pd.Timedelta(seconds=501)}])
    out = ray.get(g.flush.remote())
    assert int(out["n_events"].sum()) == 3
    assert int(out["n_dups"].sum()) == 1


def test_dedup_gate_ordered_stream_equals_batch_distinct(sf_dir):
    """Planted retries over the real events table: the gate's per-type
    delivered counts must equal the batch COUNT(*) per type, and drops
    must equal the plant size."""
    import ray.data as rd
    from vbpl_web_crawl_ray.stages.streaming import run_dedup_gate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "ts"])
    base = ds.to_pandas()

    def plant(df):
        extra = df[df["event_id"] % 13 == 0].copy()
        extra["ts"] = extra["ts"] + pd.Timedelta(seconds=120)
        return pd.concat([df, extra], ignore_index=True)

    out, metrics = run_dedup_gate(
        ds.map_batches(plant, batch_format="pandas"), horizon_s=3600.0)
    want = (base.groupby("event_type", as_index=False).size()
                .rename(columns={"size": "n_events"}))
    got = out[["event_type", "n_events"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want.sort_values("event_type").reset_index(drop=True),
        check_dtype=False)
    assert metrics["dups_dropped"] == int((base["event_id"] % 13 == 0).sum())
