"""Dev stand-in for the driver's correctness gate: run each queries()
entry and its oracle_sql() via DuckDB on the same sf dir, compare
row-count + sorted-column value content (order-insensitive).

Comparison semantics (r3 review hardening): every non-float column is
compared EXACTLY — the driver's gate is an exact value hash, and a
tolerance on integer IDs/counts/CRCs silently passed genuinely wrong
values (confirmed: vec_id off by 1 at 1e5 magnitude slipped through
rtol=1e-5). Floats are rounded to 6 decimals BEFORE the row sort so a
sub-tolerance float difference in a sort key cannot reorder the two
sides differently and misalign rows.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

import sys

import duckdb
import pandas as pd


def to_pandas(res):
    import pyarrow as pa
    try:
        import ray.data
        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # round floats BEFORE sorting: rounding after the sort let two
    # within-tolerance float sort keys order rows differently on the
    # two sides, misaligning the row-wise compare (r3 review)
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def frames_match(got: pd.DataFrame, want: pd.DataFrame) -> None:
    """Exact compare for non-float columns; floats keep the historical
    rtol=1e-5 on the 6dp-rounded values (a stricter atol would
    false-fail engine-vs-DuckDB last-ulp differences that flip a
    round-boundary digit; truly pinned aggregates are rounded
    in-query on both sides already)."""
    for c in got.columns:
        if got[c].dtype == "float64" or want[c].dtype == "float64":
            pd.testing.assert_series_equal(
                got[c].astype("float64"), want[c].astype("float64"),
                check_exact=False, rtol=1e-5, atol=1e-9,
                check_names=False)
        else:
            pd.testing.assert_series_equal(
                got[c], want[c], check_dtype=False, check_exact=True,
                check_names=False)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import importlib
    sys.path.insert(0, "/root/repo")
    entry = importlib.import_module("__ray_entry__")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    # gate-integrity checks: an oracle key orphaned from its query, or
    # a typo'd `only` name, must FAIL loudly — not silently check less
    orphaned = set(oracles) - set(qs)
    if orphaned:
        print(f"FAIL <gate>: oracle_sql() keys with no queries() entry: "
              f"{sorted(orphaned)}")
        failures += 1
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL <gate>: unknown query names requested: "
              f"{sorted(unknown)}")
        failures += 1
    try:
        for name, fn in qs.items():
            if only and name not in only:
                continue
            try:
                got = to_pandas(fn(sf_dir))
                if name in oracles:
                    got = normalize(got)
            except Exception as e:
                print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
                failures += 1
                continue
            if name not in oracles:
                print(f"ok   {name}: rows={len(got)} "
                      "(rows-only check, no oracle)")
                continue
            try:
                want = normalize(con.execute(oracles[name]).df())
            except Exception as e:
                # one broken golden/SQL must not abort the whole gate
                print(f"FAIL {name}: oracle raised "
                      f"{type(e).__name__}: {e}")
                failures += 1
                continue
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != "
                      f"{list(want.columns)}")
                failures += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                failures += 1
                continue
            try:
                frames_match(got, want)
                print(f"ok   {name}: rows={len(got)} MATCH")
            except AssertionError as e:
                print(f"FAIL {name}: value mismatch: {str(e)[:400]}")
                failures += 1
    finally:
        ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
