"""Headline benchmarks over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "extract_docs_per_s": ..., "extract_mb_per_s": ...}

--scaling: run the headline extraction twice in fresh processes at
num_cpus=8 and 32 (the sandbox stand-in for N vs 4N nodes, SURVEY.md
§4.3) and print throughput at both + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
MEGA_DOCS = int(os.environ.get("ZHTML_RAY_BENCH_MEGA", "4"))


def prepare_pages(sf_dir: str) -> tuple[str, int, int]:
    """Generate (cached, deterministic, Ray-parallel) the pages fixture
    for this scale. Untimed. Returns (dir, n_rows, html_bytes)."""
    import ray
    from zhtml_ray.pipelines.extract import n_pages_for, _PAGES_CACHE_ROOT
    from zhtml_ray.sources.pages import FIXTURE_VERSION

    n = n_pages_for(sf_dir)
    out = os.path.join(_PAGES_CACHE_ROOT,
                       f"v{FIXTURE_VERSION}_n{n}_seed42_mega{MEGA_DOCS}")
    done = os.path.join(out, ".done")
    if not os.path.exists(done):
        @ray.remote
        def gen_shard(start: int, rows: int, mega: int):
            import pyarrow.parquet as pq
            from zhtml_ray.sources.pages import gen_pages_table
            os.makedirs(out, exist_ok=True)
            if mega:
                path = os.path.join(out, "pages-mega.parquet")
                tbl = gen_pages_table(0, start=start, mega_docs=mega)
            else:
                path = os.path.join(out, f"pages-{start:08d}.parquet")
                tbl = gen_pages_table(rows, start=start)
            tmp = path + f".tmp{os.getpid()}"
            pq.write_table(tbl, tmp)
            os.replace(tmp, path)
            return path

        futs = [gen_shard.remote(s, min(1000, n - s), 0)
                for s in range(0, n, 1000)]
        if MEGA_DOCS:
            futs.append(gen_shard.remote(n, 0, MEGA_DOCS))
        ray.get(futs)
        with open(done, "w") as f:
            f.write("ok")
    import glob
    import pyarrow.parquet as pq
    total_rows = 0
    html_bytes = 0
    for p in glob.glob(os.path.join(out, "*.parquet")):
        md = pq.read_metadata(p)
        total_rows += md.num_rows
        # html column compressed size is close enough for MB/s denominators;
        # use exact sum from a metadata-only scan of column statistics
    import pyarrow.dataset as pads
    scan = pads.dataset(out).scanner(columns=["html"])
    for b in scan.to_batches():
        html_bytes += b.column(0).nbytes
    return out, total_rows, html_bytes


def bench_extract(pages_dir: str, out_dir: str) -> float:
    from zhtml_ray.stages.skew import extract_with_skew_routing
    t0 = time.time()
    ds = extract_with_skew_routing(pages_dir)  # giants → batch_size=1 path
    ds.write_parquet(out_dir)
    return time.time() - t0


def bench_error_histogram(pages_dir: str) -> float:
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from zhtml_ray.pipelines.extract import extract_pages
    ds = rd.read_parquet(pages_dir, columns=["url", "html", "lang"])
    t0 = time.time()
    ds = extract_pages(ds, include_spans=False)
    ds = ds.map_batches(
        lambda t: pa.table({"code": pc.list_flatten(t.column("error_codes"))}),
        batch_format="pyarrow")
    ds.groupby("code").count().to_pandas()
    return time.time() - t0


def bench_q1(sf_dir: str) -> float:
    from zhtml_ray.pipelines.queries import q1_pricing_summary
    t0 = time.time()
    q1_pricing_summary(sf_dir)
    return time.time() - t0


def main():
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    pages_dir, n_rows, html_bytes = prepare_pages(SF_DIR)
    # warm page cache: one untimed metadata+first-column read
    import pyarrow.dataset as pads
    pads.dataset(pages_dir).head(10)

    out_dir = f"/tmp/zhtml_ray_bench_out_{NUM_CPUS}"
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)

    queries = {}
    queries["extract"] = bench_extract(pages_dir, out_dir)
    queries["error_histogram"] = bench_error_histogram(pages_dir)
    queries["q1_pricing_summary"] = bench_q1(SF_DIR)

    value = queries["extract"]
    sf = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    print(json.dumps({
        "metric": "extract_pipeline_wall",
        "value": round(value, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": NUM_CPUS,
        "pages_rows": n_rows,
        "html_mb": round(html_bytes / 1e6, 1),
        "extract_docs_per_s": round(n_rows / value, 1),
        "extract_mb_per_s": round(html_bytes / 1e6 / value, 2),
    }))
    ray.shutdown()


def scaling():
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)   # first run also warms the fixture cache for both
    r_lo = run(lo)   # timed at steady state
    r_hi = run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": t_lo, "sec_32": t_hi,
        "docs_per_s_8": r_lo["extract_docs_per_s"],
        "docs_per_s_32": r_hi["extract_docs_per_s"],
        "mb_per_s_8": r_lo["extract_mb_per_s"],
        "mb_per_s_32": r_hi["extract_mb_per_s"],
        "num_cpus": [lo, hi],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
