"""Unit tests for the analytics operators' novel mechanics — the parts a
DuckDB twin can't isolate: the ragged vectorized pair explosion, the
monotone local-skyline merge, selection-pass edge cases, and sequence
tie-breaking. (End-to-end SQL parity runs in test_conformance /
test_driver_exactness via the oracle twins.)"""

import itertools

import numpy as np
import pandas as pd
import pytest

from vbpl_web_crawl_ray.pipelines import analytics as A


def _brute_pairs(d: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, g in d.drop_duplicates(["okey", "brand"]).groupby("okey"):
        for a, b in itertools.combinations(sorted(g["brand"]), 2):
            rows.append((a, b))
    out = (pd.DataFrame(rows, columns=["brand_a", "brand_b"])
             .groupby(["brand_a", "brand_b"], as_index=False).size()
             .rename(columns={"size": "n"}))
    return out.sort_values(["brand_a", "brand_b"]).reset_index(drop=True)


def test_ragged_pair_explosion_matches_itertools():
    rng = np.random.default_rng(11)
    d = pd.DataFrame({
        "okey": rng.integers(0, 60, 500),
        "brand": [f"B{b}" for b in rng.integers(0, 9, 500)]})
    # the in-bucket kernel, restated inline on one "bucket" (all rows)
    dd = (d.drop_duplicates(["okey", "brand"])
            .sort_values(["okey", "brand"], kind="mergesort"))
    m = dd.groupby("okey", sort=False)["brand"].transform("size").to_numpy()
    pos = dd.groupby("okey", sort=False).cumcount().to_numpy()
    cnt = m - pos - 1
    a_idx = np.repeat(np.arange(len(dd)), cnt)
    starts = np.cumsum(cnt) - cnt
    b_idx = (np.arange(int(cnt.sum())) - np.repeat(starts, cnt)
             + np.repeat(np.arange(len(dd)) + 1, cnt))
    brands = dd["brand"].to_numpy()
    got = (pd.DataFrame({"brand_a": brands[a_idx], "brand_b": brands[b_idx]})
             .groupby(["brand_a", "brand_b"], as_index=False).size()
             .rename(columns={"size": "n"})
             .sort_values(["brand_a", "brand_b"]).reset_index(drop=True))
    want = _brute_pairs(d)
    pd.testing.assert_frame_equal(got, want)


def _brute_skyline(df: pd.DataFrame) -> pd.DataFrame:
    keep = []
    pts = df[["p_size", "p_retailprice"]].to_numpy()
    for i, (s, p) in enumerate(pts):
        # a point never strictly dominates itself, so no j != i guard needed
        dominated = any(s2 <= s and p2 <= p and (s2 < s or p2 < p)
                        for s2, p2 in pts)
        if not dominated:
            keep.append(i)
    return (df.iloc[keep].sort_values("p_partkey").reset_index(drop=True))


@pytest.mark.parametrize("seed", [0, 7])
def test_local_skyline_merge_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "p_partkey": np.arange(300),
        "p_size": rng.integers(1, 12, 300).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(10, 99, 300), 2)})
    # plant exact duplicates on the frontier: neither dominates the other,
    # both must survive (the strict-clause subtlety)
    df.loc[0, ["p_size", "p_retailprice"]] = [1, 10.0]
    df.loc[1, ["p_size", "p_retailprice"]] = [1, 10.0]

    # split into blocks, reduce each with the local kernel, merge once —
    # exactly the distributed plan
    def run(blocks):
        cands = pd.concat([_kernel(b) for b in blocks], ignore_index=True)
        return (_kernel(cands).sort_values("p_partkey")
                .reset_index(drop=True))

    def _kernel(d: pd.DataFrame) -> pd.DataFrame:
        dd = d.sort_values(["p_size", "p_retailprice"], kind="mergesort")
        gmin = dd.groupby("p_size")["p_retailprice"].transform("min")
        dd = dd[dd["p_retailprice"] == gmin]
        u = dd.drop_duplicates("p_size")
        prefix = u["p_retailprice"].cummin().shift(1)
        alive = u.loc[prefix.isna() | (u["p_retailprice"] < prefix),
                      "p_size"]
        return dd[dd["p_size"].isin(alive)]

    want = _brute_skyline(df)
    one = run([df])
    many = run([df.iloc[i::5] for i in range(5)])
    pd.testing.assert_frame_equal(
        one.reset_index(drop=True), want.reset_index(drop=True))
    pd.testing.assert_frame_equal(
        many.sort_values("p_partkey").reset_index(drop=True), want)
    assert (want[["p_size", "p_retailprice"]].values == [1, 10.0]).all(
        axis=1).sum() == 2, "duplicate frontier points must both survive"


def test_skyline_query_end_to_end(ray_session, sf_dir):
    got = A.q_skyline_parts(sf_dir)
    full = pd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_size", "p_retailprice"])
    want = _brute_skyline(full)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[want.columns].astype(want.dtypes.to_dict()),
        want)


def test_exact_global_quantiles_degenerate_constant(ray_session, tmp_path):
    # all-equal column: hi == lo short-circuit must not divide by zero
    pd.DataFrame({"l_extendedprice": np.full(100, 42.5)}).to_parquet(
        tmp_path / "lineitem.parquet")
    from vbpl_web_crawl_ray.pipelines.scaleops import q_exact_global_quantiles
    out = q_exact_global_quantiles(str(tmp_path))
    assert out["median_price"].iloc[0] == 42.5
    assert out["p90_price"].iloc[0] == 42.5


def test_exact_global_quantiles_matches_numpy(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    v = np.round(rng.uniform(1.0, 1000.0, 4321), 2)
    pd.DataFrame({"l_extendedprice": v}).to_parquet(
        tmp_path / "lineitem.parquet")
    from vbpl_web_crawl_ray.pipelines.scaleops import q_exact_global_quantiles
    out = q_exact_global_quantiles(str(tmp_path))
    s = np.sort(v)
    for col, q in [("median_price", 0.5), ("p90_price", 0.9)]:
        rn = q * (len(s) - 1)
        f, c = int(np.floor(rn)), int(np.ceil(rn))
        want = s[f] if f == c else s[f] + (rn - f) * (s[c] - s[f])
        assert abs(out[col].iloc[0] - round(want, 4)) < 5e-5


def test_event_transitions_tiebreak_is_event_id(ray_session, tmp_path):
    # two events at the SAME timestamp: order must resolve by event_id
    ts = pd.Timestamp("2024-01-01")
    pd.DataFrame({
        "event_id": [2, 1, 3],
        "user_id": [7, 7, 7],
        "event_type": ["click", "view", "purchase"],
        "ts": [ts, ts, ts + pd.Timedelta(seconds=1)],
    }).to_parquet(tmp_path / "events.parquet")
    out = A.q_event_transitions(str(tmp_path))
    want = pd.DataFrame({"prev_type": ["click", "view"],
                         "next_type": ["purchase", "click"],
                         "n": np.array([1, 1], dtype=np.int64)})
    pd.testing.assert_frame_equal(
        out.sort_values(["prev_type", "next_type"]).reset_index(drop=True),
        want)


def test_mutual_information_known_cases(ray_session, tmp_path):
    ts_mon = pd.Timestamp("2024-01-01 10:00")   # Monday  -> isodow 1
    ts_tue = pd.Timestamp("2024-01-02 10:00")   # Tuesday -> isodow 2
    # perfectly dependent: type determines the day -> MI = ln(2)
    pd.DataFrame({"event_type": ["view"] * 50 + ["click"] * 50,
                  "ts": [ts_mon] * 50 + [ts_tue] * 50}).to_parquet(
        tmp_path / "events.parquet")
    out = A.q_mutual_information(str(tmp_path))
    assert abs(out["mutual_information"].iloc[0] - round(np.log(2), 6)) < 1e-6
    assert out["n_events"].iloc[0] == 100
    # independent: uniform over (type, day) -> MI = 0
    pd.DataFrame({"event_type": ["view", "click"] * 50,
                  "ts": ([ts_mon] * 50 + [ts_tue] * 50)}).to_parquet(
        tmp_path / "events.parquet")
    out = A.q_mutual_information(str(tmp_path))
    assert out["mutual_information"].iloc[0] == 0.0


def test_decile_boundaries_match_numpy(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    v = np.round(rng.uniform(1.0, 500.0, 2999), 2)
    pd.DataFrame({"l_extendedprice": v}).to_parquet(
        tmp_path / "lineitem.parquet")
    from vbpl_web_crawl_ray.pipelines.scaleops import q_decile_boundaries
    out = q_decile_boundaries(str(tmp_path))
    s = np.sort(v)
    for i in range(1, 10):
        rn = (i / 10) * (len(s) - 1)
        f, c = int(np.floor(rn)), int(np.ceil(rn))
        want = s[f] if f == c else s[f] + (rn - f) * (s[c] - s[f])
        assert abs(out[f"d{i}"].iloc[0] - round(want, 4)) < 5e-5
    # boundaries are nondecreasing
    row = out.iloc[0].to_numpy()
    assert (np.diff(row) >= 0).all()


def test_embedding_gram_pca_matches_eigh(sf_dir):
    """One-pass Gram + power iteration must agree with numpy's dense
    eigendecomposition of the same Gram (top eigenpair, sign-fixed)."""
    import numpy as np
    import pandas as pd

    from vbpl_web_crawl_ray.pipelines.analytics2 import q_embedding_gram_pca

    out = q_embedding_gram_pca(sf_dir)
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["embedding"])
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    G = m.T @ m
    wv, vv = np.linalg.eigh(G)
    top = vv[:, -1]
    top = top * (1.0 if top[int(np.argmax(np.abs(top)))] >= 0 else -1.0)
    assert abs(out["eigenvalue"].iloc[0] - wv[-1]) <= 1e-4 * abs(wv[-1])
    assert np.max(np.abs(out["loading"].to_numpy() - np.round(top, 6))) \
        <= 1e-5
    assert int(out["n_rows"].iloc[0]) == len(m)


def test_knn_label_agreement_matches_bruteforce(sf_dir):
    import numpy as np
    import pandas as pd

    from vbpl_web_crawl_ray.pipelines.analytics import q_knn_label_agreement

    out = q_knn_label_agreement(sf_dir)
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    m = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    s = m @ m.T
    np.fill_diagonal(s, -np.inf)
    nn = s.argmax(axis=1)
    lab = e["label"].to_numpy()
    agree = pd.DataFrame({"label": lab, "a": (lab[nn] == lab).astype(int)})
    want = agree.groupby("label", as_index=False)["a"].sum()
    got = out.set_index("label")["n_agree"]
    for _, r in want.iterrows():
        assert int(got[r["label"]]) == int(r["a"])
