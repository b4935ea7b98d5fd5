"""Distributed as-of join vs DuckDB ASOF LEFT JOIN — randomized
differential across block layouts, with skew, ties and no-match keys,
so the block-boundary carry chain is exercised hard (a single-block
run never touches it)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from zhtml_ray.stages.asof import asof_join


def _mk(seed: int, n_users: int, n_rows: int):
    """Random event stream: one mega-user (~40% of rows), some users
    with clicks only / purchases only, duplicate timestamps."""
    rng = np.random.default_rng(seed)
    users = np.where(rng.random(n_rows) < 0.4, 0,
                     rng.integers(0, n_users, n_rows))
    # coarse integer ts → plenty of exact ties (inclusive-bound cases)
    ts = rng.integers(0, n_rows // 2 + 1, n_rows)
    is_probe = rng.random(n_rows) < 0.5
    # some users never click, some never purchase
    is_probe[users % 5 == 1] = True
    is_probe[users % 5 == 2] = False
    uid = np.arange(n_rows)
    probe = pa.table({"event_id": pa.array(uid[is_probe], pa.int64()),
                      "u": pa.array(users[is_probe], pa.int64()),
                      "t": pa.array(ts[is_probe], pa.int64())})
    build = pa.table({"event_id": pa.array(uid[~is_probe], pa.int64()),
                      "u": pa.array(users[~is_probe], pa.int64()),
                      "t": pa.array(ts[~is_probe], pa.int64()),
                      "pay_t": pa.array(ts[~is_probe], pa.int64())})
    return probe, build


def _oracle(probe: pa.Table, build: pa.Table):
    con = duckdb.connect()
    con.register("p", probe)
    con.register("b", build)
    rows = con.sql("""
        SELECT p.event_id, p.u, p.t, b.pay_t
        FROM p ASOF LEFT JOIN b ON p.u = b.u AND p.t >= b.pay_t
        ORDER BY p.event_id
    """).fetchall()
    return rows


@pytest.mark.parametrize("seed,blocks", [(1, 1), (2, 4), (3, 16),
                                         (4, 16), (5, 32)])
def test_asof_join_matches_duckdb(ray_session, seed, blocks):
    import ray.data as rd

    probe, build = _mk(seed, n_users=12, n_rows=400)
    got = asof_join(rd.from_arrow(probe).repartition(blocks),
                    rd.from_arrow(build).repartition(max(1, blocks // 2)),
                    by="u", on="t", uid="event_id",
                    payload_cols=["pay_t"]).take_all()
    got = sorted(((r["event_id"], r["u"], r["t"], r["pay_t"])
                  for r in got))
    assert got == _oracle(probe, build)
    assert len(got) == probe.num_rows


def test_asof_all_probe_no_build(ray_session):
    import ray.data as rd

    probe, build = _mk(7, n_users=6, n_rows=60)
    empty_build = build.slice(0, 0)
    got = asof_join(rd.from_arrow(probe).repartition(4),
                    rd.from_arrow(empty_build),
                    by="u", on="t", uid="event_id",
                    payload_cols=["pay_t"]).take_all()
    assert len(got) == probe.num_rows
    assert all(r["pay_t"] is None for r in got)


def test_asof_payload_name_collision_raises(ray_session):
    import ray.data as rd

    probe, build = _mk(8, n_users=3, n_rows=20)
    build = build.rename_columns(["event_id", "u", "t", "t2"])
    with pytest.raises(ValueError):
        asof_join(rd.from_arrow(probe), rd.from_arrow(build),
                  by="u", on="t", uid="event_id", payload_cols=["u"])
