"""Randomized multi-block differential tests for the session-8 window
operators (rank / funnel / moving-avg / median / mode / first-last):
each runs the DISTRIBUTED pipeline over a hostile layout (many tiny
blocks, so most users straddle block edges and exercise the edge pass)
and compares against an independent pandas implementation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Small synthetic events table with heavy per-user tie load and a
    mega-user, written as <dir>/events.parquet for sf_dir callables."""
    import pyarrow.parquet as pq
    rng = np.random.default_rng(42)
    n = 4000
    user = rng.integers(0, 25, n)
    user[: n // 5] = 7  # hot key: one user owns 20% of events
    d = tmp_path_factory.mktemp("ev")
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(
            np.int64(1_700_000_000_000_000)
            + rng.integers(0, 10**9, n) * 1000).cast(pa.timestamp("us")),
        "user_id": pa.array(user.astype(np.int64)),
        "event_type": pa.array(
            rng.choice(["signup", "view", "purchase", "x"], n).tolist()),
        "value": pa.array(rng.integers(0, 40, n).astype(np.float64)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, d / "events.parquet")
    return str(d), t


def _pdf(t):
    return t.to_pandas()


def test_value_rank_differential(ray_session, events_dir):
    from zhtml_ray.pipelines.ops_queries import q_events_value_rank
    d, t = events_dir
    got = q_events_value_rank(d).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    pdf = _pdf(t)
    pdf["fv"] = np.floor(pdf["value"]).astype("int64")
    g = pdf.groupby("user_id")["fv"]
    pdf["rnk"] = g.rank(method="min", ascending=False).astype("int64")
    pdf["drnk"] = g.rank(method="dense", ascending=False).astype("int64")
    want = pdf.sort_values("event_id").reset_index(drop=True)
    for c in ("fv", "rnk", "drnk"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_moving_avg_differential(ray_session, events_dir):
    from zhtml_ray.pipelines.ops_queries import q_events_moving_avg
    d, t = events_dir
    got = q_events_moving_avg(d).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    pdf = _pdf(t).sort_values(["user_id", "ts", "event_id"])
    m = pdf.groupby("user_id")["value"] \
        .rolling(3, min_periods=1).mean().reset_index(level=0, drop=True)
    pdf["mavg_value"] = np.floor(m * 1e6 + 0.5) / 1e6
    want = pdf.sort_values("event_id").reset_index(drop=True)
    assert np.allclose(got["mavg_value"], want["mavg_value"],
                       rtol=0, atol=0)


def test_funnel_differential(ray_session, events_dir):
    from zhtml_ray.pipelines.ops_queries import q_events_funnel
    d, t = events_dir
    got = dict(zip(*(q_events_funnel(d)[c] for c in ("stage", "users"))))
    pdf = _pdf(t).sort_values(["user_id", "ts"])
    counts = {"signup": 0, "view": 0, "purchase": 0}
    for _, g in pdf.groupby("user_id"):
        thr = -1
        reached = []
        for st in ("signup", "view", "purchase"):
            hits = g[(g["event_type"] == st)
                     & (g["ts"].astype("int64") > thr)]
            if len(hits) == 0:
                break
            thr = int(hits["ts"].astype("int64").min())
            reached.append(st)
        for st in reached:
            counts[st] += 1
    assert got == counts


def test_user_median_differential(ray_session, events_dir):
    from zhtml_ray.pipelines.ops_queries import q_user_median_value
    d, t = events_dir
    got = q_user_median_value(d).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    want = _pdf(t).groupby("user_id")["value"].median().reset_index()
    assert np.allclose(got["med_value"],
                       want["value"], rtol=0, atol=0)


def test_user_mode_differential(ray_session, events_dir):
    from zhtml_ray.pipelines.ops_queries import q_user_mode
    d, t = events_dir
    got = q_user_mode(d).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    pdf = _pdf(t)
    want = (pdf.groupby(["user_id", "event_type"]).size()
            .rename("n").reset_index()
            .sort_values(["user_id", "n", "event_type"],
                         ascending=[True, False, True])
            .groupby("user_id").head(1)
            .sort_values("user_id").reset_index(drop=True))
    assert (got["mode_type"].to_numpy() ==
            want["event_type"].to_numpy()).all()
    assert (got["mode_n"].to_numpy() == want["n"].to_numpy()).all()


def test_user_first_last_differential(ray_session, events_dir):
    from zhtml_ray.pipelines.ops_queries import q_user_first_last
    d, t = events_dir
    got = q_user_first_last(d).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    pdf = _pdf(t).sort_values(["user_id", "ts", "event_id"])
    first = pdf.groupby("user_id").head(1).set_index("user_id")
    last = pdf.groupby("user_id").tail(1).set_index("user_id")
    users = got["user_id"].tolist()
    assert got["first_type"].tolist() == \
        [first.loc[u, "event_type"] for u in users]
    assert got["last_type"].tolist() == \
        [last.loc[u, "event_type"] for u in users]


def test_distinct_users_differential(ray_session, events_dir):
    from zhtml_ray.pipelines.ops_queries import q_events_distinct_users
    d, t = events_dir
    got = q_events_distinct_users(d)
    pdf = _pdf(t)
    want = pdf.groupby("event_type").agg(
        n_events=("user_id", "size"),
        n_users=("user_id", "nunique")).reset_index()
    want = want.sort_values("event_type").reset_index(drop=True)
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["n_users"].tolist() == want["n_users"].tolist()


def test_events_ntile_differential(ray_session, events_dir):
    import duckdb
    from zhtml_ray.pipelines.ops_queries import (SQL_EVENTS_NTILE,
                                                 q_events_ntile)
    d, t = events_dir
    got = q_events_ntile(d).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", t)
    want = con.sql(SQL_EVENTS_NTILE).df() \
        .sort_values("event_id").reset_index(drop=True)
    for c in ("rn", "nt"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    for c in ("prk", "cd"):
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c


def test_user_event_path_differential(ray_session, events_dir):
    import duckdb
    from zhtml_ray.pipelines.ops_queries import (SQL_USER_EVENT_PATH,
                                                 q_user_event_path)
    d, t = events_dir
    got = q_user_event_path(d).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", t)
    want = con.sql(SQL_USER_EVENT_PATH).df() \
        .sort_values("user_id").reset_index(drop=True)
    assert got["path"].tolist() == want["path"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    # hot user's path is capped at 20 hops but counts every event
    hot = got[got["user_id"] == 7].iloc[0]
    n7 = int((_pdf(t)["user_id"] == 7).sum())
    assert hot["path"].count(">") == 19 and hot["n_events"] == n7 > 20


def test_events_retention_differential(ray_session, events_dir):
    import duckdb
    from zhtml_ray.pipelines.ops_queries import (SQL_EVENTS_RETENTION,
                                                 q_events_retention)
    d, t = events_dir
    got = q_events_retention(d).to_pandas() \
        .sort_values(["cohort_week", "week_offset"]) \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", t)
    want = con.sql(SQL_EVENTS_RETENTION).df() \
        .sort_values(["cohort_week", "week_offset"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


def test_event_trigrams_matches_pandas(ray_session, events_dir):
    """Trigram mining vs an independent pandas implementation on the
    hostile layout (25 users incl. a 20%-of-rows hot key, 40 tiny
    blocks so most users straddle edges)."""
    from collections import Counter

    from zhtml_ray.pipelines.ops_queries import q_event_trigrams

    d, t = events_dir
    got = [(r["trigram"], r["cnt"])
           for r in q_event_trigrams(d, k=15).take_all()]

    df = _pdf(t).sort_values(["user_id", "ts", "event_id"])
    c = Counter()
    for _, g in df.groupby("user_id"):
        ev = g["event_type"].tolist()
        c.update(">".join(ev[i:i + 3]) for i in range(len(ev) - 2))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert got == want


def test_range_window_differential(ray_session, events_dir):
    """RANGE-frame trailing 1-hour window vs an independent per-user
    searchsorted implementation on the hostile layout (hot user, tiny
    blocks). Bounds are value comparisons, so ts ties (peers) must all
    be included — the rolling/ROWS machinery cannot reproduce this."""
    from zhtml_ray.pipelines.ops_queries import q_events_range_window

    d, t = events_dir
    got = q_events_range_window(d).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    pdf = _pdf(t)
    pdf["tsi"] = pdf["ts"].astype("int64")
    W = 3600 * 1_000_000
    rows = []
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values(["tsi", "event_id"])
        ts = g["tsi"].to_numpy()
        v = g["value"].to_numpy()
        for i in range(len(g)):
            lo = np.searchsorted(ts, ts[i] - W, side="left")
            hi = np.searchsorted(ts, ts[i], side="right")
            s = float(v[lo:hi].sum())
            rows.append((int(g["event_id"].iloc[i]),
                         np.floor(s * 1e2 + 0.5) / 1e2, int(hi - lo)))
    want = pd.DataFrame(rows, columns=["event_id", "w_sum", "w_cnt"]) \
        .sort_values("event_id").reset_index(drop=True)
    assert (got["w_cnt"].to_numpy() == want["w_cnt"].to_numpy()).all()
    assert np.allclose(got["w_sum"], want["w_sum"], rtol=0, atol=0)


def test_window_join_differential_hostile_layout(ray_session):
    """Interval join equals a brute-force O(n²) reference — inclusive
    bounds both ends, same-instant click included, pair fan-out — on
    a hot-user corpus over a 40-block layout (edge users resolve
    whole in the per-group pass)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zhtml_ray.pipelines.ops_queries import events_window_join

    rng = np.random.default_rng(23)
    n = 3000
    user = rng.integers(0, 25, n)
    user[:1200] = 7  # hot user straddles many blocks
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 3_000_000, n) * np.int64(1_000_000)
    kinds = rng.choice(["purchase", "click", "view"], n,
                       p=[0.3, 0.5, 0.2])
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(user, pa.int64()),
        "event_type": pa.array(kinds.tolist(), pa.string())})
    ds = rd.from_arrow(t).repartition(40)
    W = 3600 * 1_000_000
    got = {(r["purchase_id"], r["click_id"]): r["lag_s"]
           for r in events_window_join(ds, window_s=3600).take_all()}
    want = {}
    for i in range(n):
        if kinds[i] != "purchase":
            continue
        for j in range(n):
            if kinds[j] == "click" and user[j] == user[i] \
                    and ts[i] - W <= ts[j] <= ts[i]:
                want[(i, j)] = float(ts[i] - ts[j]) / 1e6
    assert got == want and len(want) > 100


def test_event_dedup_window_differential(ray_session):
    """LAG-suppression dedup equals a serial per-(user,type) reference
    on a hot-user multi-block layout — boundary inclusivity (prev
    exactly W older is still suppressed... kept? prev < ts - W keeps),
    same-instant duplicates, and straddling runs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zhtml_ray.pipelines.ops_queries import events_dedup_window

    rng = np.random.default_rng(31)
    n = 4000
    user = rng.integers(0, 20, n)
    user[:1500] = 4
    kinds = rng.choice(["a", "b", "c"], n)
    base = 1_700_000_000_000_000
    W = 3600
    ts = base + rng.integers(0, 40 * W, n) * np.int64(1_000_000)
    # planted exact-boundary pair: prev == ts - W must be SUPPRESSED
    user[0] = user[1] = 19
    kinds[0] = kinds[1] = "a"
    ts[0] = base
    ts[1] = base + np.int64(W) * 1_000_000
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(user, pa.int64()),
        "event_type": pa.array(kinds.tolist(), pa.string())})
    ds = rd.from_arrow(t).repartition(37)
    got = sorted(r["event_id"] for r in
                 events_dedup_window(ds, window_s=W).take_all())

    rows = sorted(zip(user.tolist(), kinds.tolist(), ts.tolist(),
                      range(n)))
    keep, prev = [], {}
    for u, k, tv, i in rows:
        p = prev.get((u, k))
        if p is None or p < tv - W * 1_000_000:
            keep.append(i)
        prev[(u, k)] = tv
    assert got == sorted(keep)
    assert 1 not in got and 0 in got  # boundary pair: second suppressed
