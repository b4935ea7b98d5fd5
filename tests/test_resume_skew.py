"""North-rule tests: checkpoint/resume without recompute (SURVEY.md
§5.5) and mega-doc skew handling (§5.6)."""

import glob
import json
import os

import pytest


@pytest.fixture(scope="module")
def shards(ray_session, tmp_path_factory):
    from zhtml_ray.sources.pages import write_pages_dataset
    out = str(tmp_path_factory.mktemp("shards"))
    return write_pages_dataset(out, 300, rows_per_file=50)


def test_resume_skips_completed_partitions(shards, tmp_path):
    from zhtml_ray.stages.manifest import (
        completed_partitions, run_partitioned)
    out_dir = str(tmp_path / "out")

    # first run "killed" after 2 partitions
    r1 = run_partitioned(shards, out_dir, group_size=2, overlap=1,
                         fail_after=2)
    assert r1["partitions_ran"] == 2
    assert not r1["complete"]
    done_before = completed_partitions(out_dir)
    mtimes = {p: os.path.getmtime(p)
              for p in glob.glob(os.path.join(out_dir, "_manifests", "*.json"))}

    # resume: must run ONLY the remaining partitions, not recompute
    r2 = run_partitioned(shards, out_dir, group_size=2, overlap=2)
    assert r2["complete"]
    assert r2["partitions_previously_done"] == 2
    assert r2["partitions_ran"] == r2["partitions_total"] - 2
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t, f"completed manifest {p} was rewritten"

    # identical output to a fresh single-shot run (same checksum)
    out2 = str(tmp_path / "fresh")
    r3 = run_partitioned(shards, out2, group_size=2, overlap=2)
    assert r3["checksum"] == r2["checksum"]
    assert r3["rows"] == r2["rows"] == 300


def test_manifest_lineage_fields(shards, tmp_path):
    from zhtml_ray.stages.manifest import run_partitioned
    out_dir = str(tmp_path / "out")
    run_partitioned(shards[:2], out_dir, group_size=1, overlap=1)
    m = json.load(open(sorted(glob.glob(os.path.join(
        out_dir, "_manifests", "part-*.json")))[0]))
    assert set(m) >= {"partition_id", "input_files", "rows", "checksum",
                      "error_counts", "wall_s", "output_dir", "html_bytes"}
    assert m["rows"] == 50
    assert m["input_files"]  # lineage: input shard paths recorded
    assert sum(m["error_counts"].values()) > 0


def test_skew_routing_matches_unrouted(ray_session, tmp_path):
    from zhtml_ray.sources.pages import write_pages_dataset
    from zhtml_ray.stages.skew import extract_with_skew_routing
    from zhtml_ray.pipelines.extract import extract_pages
    import ray.data as rd

    out = str(tmp_path / "pages")
    # 100 normal docs + 2 "mega" docs (small threshold makes them giants)
    write_pages_dataset(out, 100, rows_per_file=50, mega_docs=2)
    routed = extract_with_skew_routing(out)
    plain = extract_pages(
        rd.read_parquet(out, columns=["url", "html", "lang"]))
    a = {r["url"]: r["extracted_text"] for r in routed.take_all()}
    b = {r["url"]: r["extracted_text"] for r in plain.take_all()}
    assert a == b
    assert len(a) == 102


def test_spread_giants_preserves_rows(ray_session, tmp_path):
    import ray.data as rd
    from zhtml_ray.sources.pages import write_pages_dataset
    from zhtml_ray.stages.skew import spread_giants
    out = str(tmp_path / "pages")
    write_pages_dataset(out, 100, rows_per_file=100)
    ds = spread_giants(rd.read_parquet(out, columns=["url"]),
                       buckets=8).materialize()
    assert ds.count() == 100 and ds.num_blocks() == 8


def test_job_cli_resume_flow(shards, ray_session, tmp_path, capsys):
    """The `python -m zhtml_ray.job` CLI: fresh run → complete; rerun
    without --resume → refused; with --resume → no-op completion. Run
    in-process (main() must reuse — and NOT tear down — the session)."""
    import json as _json
    import ray
    from zhtml_ray.job import main

    out = str(tmp_path / "out")
    rc = main(["--input", shards[0].rsplit("/", 1)[0], "--output", out,
               "--group-size", "3"])
    assert rc == 0
    s1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["complete"] and s1["rows"] == 300

    # without --resume: refuse to clobber
    assert main(["--input", shards[0].rsplit("/", 1)[0],
                 "--output", out]) == 2

    # with --resume: everything already done, nothing recomputed
    rc = main(["--input", shards[0].rsplit("/", 1)[0], "--output", out,
               "--group-size", "3", "--resume"])
    assert rc == 0
    s2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["complete"] and s2["partitions_ran"] == 0
    assert s2["checksum"] == s1["checksum"]
    assert ray.is_initialized()  # CLI must not kill the caller's session


def test_giant_document_completes(ray_session):
    """SURVEY.md §5.6: a multi-MB doc among small ones parses on its own
    block without OOM and yields nonempty extraction."""
    from zhtml_ray.sources.pages import gen_pages_table
    from zhtml_ray.pipelines.extract import extract_pages
    import ray.data as rd

    t = gen_pages_table(20, mega_docs=1)  # 1 × ~3.6 MB + 20 small
    ds = extract_pages(rd.from_arrow(t.select(["url", "html", "lang"])),
                       include_spans=False)
    out = ds.to_pandas()
    assert len(out) == 21
    assert out["ok"].all()
    giant = out[out["html_bytes"] > 1_000_000]
    assert len(giant) == 1 and giant["extracted_text"].str.len().iloc[0] > 1000


def test_error_histogram_from_manifests(shards, tmp_path):
    """Manifest-merged error histogram (zero re-parse) must equal the
    histogram computed by re-parsing the same shards."""
    from collections import Counter
    import pyarrow.parquet as pq
    from zhtml_ray.html.extract import extract_document
    from zhtml_ray.stages.manifest import (
        error_histogram_from_manifests, run_partitioned)

    out_dir = str(tmp_path / "out")
    run_partitioned(shards[:2], out_dir, group_size=1, overlap=1)
    got = error_histogram_from_manifests(out_dir)

    want: Counter = Counter()
    for shard in shards[:2]:
        t = pq.read_table(shard, columns=["html"])
        for h in t["html"].to_pylist():
            want.update(extract_document(h or b"")["error_codes"])
    assert got == dict(sorted(want.items()))
    assert sum(got.values()) > 0


def test_zero_row_shard_partition_completes(ray_session, tmp_path):
    """An empty input parquet shard (legal; happens in real crawls) must
    complete its partition with an empty manifest — not crash on the
    missing output dir and poison --resume forever."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from zhtml_ray.stages.manifest import run_partitioned

    empty = str(tmp_path / "empty.parquet")
    pq.write_table(pa.table({
        "url": pa.array([], pa.string()),
        "html": pa.array([], pa.binary()),
        "lang": pa.array([], pa.string()),
        "warc_ts": pa.array([], pa.timestamp("us")),
        "text": pa.array([], pa.string()),
    }), empty)
    out_dir = str(tmp_path / "out")
    r = run_partitioned([empty], out_dir, group_size=1, overlap=1)
    assert r["complete"]
    assert r["rows"] == 0
    # second run resumes cleanly with nothing to do
    r2 = run_partitioned([empty], out_dir, group_size=1, overlap=1)
    assert r2["complete"] and r2["partitions_previously_done"] == 1


def test_resume_with_different_config_raises(shards, tmp_path):
    """A kill + rerun with different extraction flags must refuse to
    mix two semantic configs into one 'complete' output (the checksum
    cannot catch it — it only covers rows written under each config).
    Perf-only knobs and explicit-default configs must NOT refuse."""
    from zhtml_ray.stages.manifest import run_partitioned
    out_dir = str(tmp_path / "out")
    run_partitioned(shards[:4], out_dir, group_size=2, overlap=1,
                    fail_after=1, extract_kwargs={"include_spans": True})
    with pytest.raises(ValueError, match="different extraction config"):
        run_partitioned(shards[:4], out_dir, group_size=2, overlap=1,
                        extract_kwargs={"include_spans": False})
    # perf knob change + explicit-default == absent: legitimate resume
    r = run_partitioned(shards[:4], out_dir, group_size=2, overlap=1,
                        extract_kwargs={"batch_size": 16})
    assert r["complete"]


def test_resume_plan_predating_clean_key(shards, tmp_path):
    """A plan.json written BEFORE the 'clean' key existed must resume
    under the current code (missing key == default false, r4 advisor:
    raw-string tag compare broke --resume for every old output dir) —
    while a resume that actually flips clean still refuses."""
    import json

    from zhtml_ray.stages.manifest import run_partitioned
    out_dir = str(tmp_path / "out")
    run_partitioned(shards[:4], out_dir, group_size=2, overlap=1,
                    fail_after=1, extract_kwargs={"include_spans": True})
    plan_path = str(tmp_path / "out" / "_manifests" / "plan.json")
    with open(plan_path) as f:
        plan = json.load(f)
    cfg = json.loads(plan["extract_config"])
    assert "clean" in cfg
    del cfg["clean"]  # simulate a pre-r3 plan without the key
    plan["extract_config"] = json.dumps(cfg, sort_keys=True)
    with open(plan_path, "w") as f:
        json.dump(plan, f)

    with pytest.raises(ValueError, match="different extraction config"):
        run_partitioned(shards[:4], out_dir, group_size=2, overlap=1,
                        extract_kwargs={"include_spans": True,
                                        "clean": True})
    r = run_partitioned(shards[:4], out_dir, group_size=2, overlap=1,
                        extract_kwargs={"include_spans": True})
    assert r["complete"]


def test_partition_run_tolerates_missing_lang(ray_session, tmp_path):
    """Shards with only (url, html) — e.g. from read_html_files — must
    process, not crash on a hardcoded column list."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from zhtml_ray.stages.manifest import run_partitioned
    shard = str(tmp_path / "nolang.parquet")
    pq.write_table(pa.table({
        "url": ["http://a/1", "http://a/2"],
        "html": [b"<p>one doc</p>", b"<p>two docs</p>"],
    }), shard)
    out_dir = str(tmp_path / "out")
    r = run_partitioned([shard], out_dir, group_size=1, overlap=1)
    assert r["complete"] and r["rows"] == 2


def test_partition_run_mixed_schema_group(ray_session, tmp_path):
    """One partition grouping a (url, html) shard with a
    (url, html, lang) shard must process BOTH orders, null-filling
    lang for the shard that lacks it (r3 review: first-fragment
    schema inference crashed one order and dropped lang the other)."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    from zhtml_ray.stages.manifest import run_partitioned
    a = str(tmp_path / "a_nolang.parquet")
    b = str(tmp_path / "b_lang.parquet")
    pq.write_table(pa.table({
        "url": ["http://x/1"], "html": [b"<p>one</p>"]}), a)
    pq.write_table(pa.table({
        "url": ["http://x/2"], "html": [b"<p>two</p>"],
        "lang": ["en"]}), b)
    out_dir = str(tmp_path / "out")
    r = run_partitioned([a, b], out_dir, group_size=2, overlap=1)
    assert r["complete"] and r["rows"] == 2
    got = pads.dataset(str(tmp_path / "out" / "part-000000")).to_table()
    langs = dict(zip(got["url"].to_pylist(), got["lang"].to_pylist()))
    assert langs == {"http://x/1": None, "http://x/2": "en"}


def test_clean_stage_job(shards, tmp_path):
    """--clean appends (clean_text, n_kept, clean_keep) per row without
    dropping rows, the config pin refuses a mismatched resume, and a
    matching resume completes the run."""
    import pyarrow.dataset as pads
    import pytest
    from zhtml_ray.stages.manifest import run_partitioned
    out_dir = str(tmp_path / "clean_out")

    r1 = run_partitioned(shards, out_dir, group_size=2, overlap=1,
                         fail_after=1,
                         extract_kwargs={"include_spans": False,
                                         "clean": True})
    assert not r1["complete"]

    # resume with the clean flag dropped must refuse, not mix configs
    with pytest.raises(ValueError, match="different extraction config"):
        run_partitioned(shards, out_dir, group_size=2, overlap=1,
                        extract_kwargs={"include_spans": False})

    r2 = run_partitioned(shards, out_dir, group_size=2, overlap=2,
                         extract_kwargs={"include_spans": False,
                                         "clean": True})
    assert r2["complete"]
    assert r2["rows"] == 300  # no row drops: lineage invariant holds

    dset = pads.dataset([p for p in glob.glob(out_dir + "/part-*/*.parquet")])
    names = dset.schema.names
    assert {"clean_text", "n_kept", "clean_keep"} <= set(names)
    t = dset.to_table(columns=["clean_keep", "n_kept", "clean_text"])
    kept = t.filter(t["clean_keep"])
    assert 0 < kept.num_rows < t.num_rows  # a real filter, not a constant
    # every kept row has >= 3 surviving lines by construction
    import pyarrow.compute as pc
    assert pc.min(kept["n_kept"]).as_py() >= 3


def _neardup_shards(tmp_path) -> list[str]:
    """6 single-doc-ish shards -> 3 partitions (group_size=2) with
    planted duplicates: a cross-partition twin, a within-partition
    twin pair, and a later twin of the within-pair SURVIVOR (only
    visible if the survivor was appended to the index)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    text_t = " ".join(f"alpha bravo charlie delta echo {i}"
                      for i in range(12))
    text_s = " ".join(f"foxtrot golf hotel india juliet {i}"
                      for i in range(12))

    def page(txt):
        return f"<html><body><p>{txt}</p></body></html>".encode()

    def uniq(i):
        # genuinely distinct texts: every shingle carries doc id i
        return " ".join(f"w{i}x{j} y{i}z{j} q{i}r{j}"
                        for j in range(20))

    rows = [
        # partition 0 (shards 0,1)
        [("http://p0/base-t", page(text_t)),
         ("http://p0/u0", page(uniq(0)))],
        [("http://p0/u1", page(uniq(1)))],
        # partition 1 (shards 2,3): cross-partition dup of text_t +
        # a within-partition twin pair on text_s
        [("http://p1/dup-t", page(text_t)),
         ("http://p1/twin-a", page(text_s))],
        [("http://p1/twin-b", page(text_s)),
         ("http://p1/u2", page(uniq(2)))],
        # partition 2 (shards 4,5): twin of the p1 SURVIVOR (twin-a)
        [("http://p2/dup-s", page(text_s)),
         ("http://p2/u3", page(uniq(3)))],
        [("http://p2/u4", page(uniq(4)))],
    ]
    shards = []
    for i, docs in enumerate(rows):
        f = str(tmp_path / f"nd-{i:02d}.parquet")
        pq.write_table(pa.table({
            "url": [u for u, _ in docs],
            "html": [h for _, h in docs]}), f)
        shards.append(f)
    return shards


def test_neardup_index_job_lifecycle(ray_session, tmp_path):
    """--neardup-index end-to-end: probe -> mark -> append across
    sequential partitions, kill/resume determinism, crash-after-append
    recovery, and the index-config pin."""
    import pyarrow.dataset as pads
    import pytest
    from zhtml_ray.stages.manifest import run_partitioned
    from zhtml_ray.stages.neardup import pin_lsh_config

    shards = _neardup_shards(tmp_path)
    out_dir = str(tmp_path / "out")
    idx = str(tmp_path / "lsh_index")

    def keep_map(odir):
        dset = pads.dataset(
            sorted(glob.glob(odir + "/part-*/*.parquet")))
        t = dset.to_table(columns=["url", "neardup_keep"])
        return dict(zip(t["url"].to_pylist(),
                        t["neardup_keep"].to_pylist()))

    # kill after partition 0, then resume to completion
    r1 = run_partitioned(shards, out_dir, group_size=2, overlap=1,
                         fail_after=1,
                         extract_kwargs={"include_spans": False,
                                         "neardup_index": idx})
    assert not r1["complete"]
    r2 = run_partitioned(shards, out_dir, group_size=2, overlap=2,
                         extract_kwargs={"include_spans": False,
                                         "neardup_index": idx})
    assert r2["complete"] and r2["rows"] == 10  # append-only: no drops

    keeps = keep_map(out_dir)
    assert keeps["http://p0/base-t"]            # first sighting keeps
    assert not keeps["http://p1/dup-t"]         # cross-partition dup
    assert keeps["http://p1/twin-a"]            # within-pair min keeps
    assert not keeps["http://p1/twin-b"]
    assert not keeps["http://p2/dup-s"]         # dup of APPENDED twin-a
    assert all(keeps[u] for u in keeps if "/u" in u)  # uniques keep

    # manifest records the stage lineage
    m1 = json.load(open(os.path.join(out_dir, "_manifests",
                                     "part-000001.json")))
    nd = m1["neardup"]
    assert nd["probed"] == 4 and nd["dropped_index"] == 1
    assert nd["dropped_within"] == 1 and nd["appended"] == 2

    # crash-after-append recovery: wipe partition 1's manifest+output
    # but LEAVE its index files (the mid-crash state); the rerun must
    # clean them pre-probe and converge to the identical keep map
    os.remove(os.path.join(out_dir, "_manifests", "part-000001.json"))
    import shutil
    shutil.rmtree(os.path.join(out_dir, "part-000001"))
    from zhtml_ray.stages.neardup import job_tag
    tag = job_tag(out_dir)
    stale = glob.glob(os.path.join(idx, "bucket_part=*",
                                   f"part-{tag}000001.parquet"))
    assert stale  # the crashed partition DID append
    r3 = run_partitioned(shards, out_dir, group_size=2, overlap=1,
                         extract_kwargs={"include_spans": False,
                                         "neardup_index": idx})
    assert r3["complete"]
    m1b = json.load(open(os.path.join(out_dir, "_manifests",
                                      "part-000001.json")))
    assert m1b["neardup"]["stale_files_cleaned"] == len(stale)
    assert keep_map(out_dir) == keeps

    # a fresh single-shot run over a fresh index agrees exactly
    out2, idx2 = str(tmp_path / "fresh"), str(tmp_path / "lsh2")
    run_partitioned(shards, out2, group_size=2, overlap=1,
                    extract_kwargs={"include_spans": False,
                                    "neardup_index": idx2})
    assert keep_map(out2) == keeps

    # the index config is pinned: mismatched params refuse loudly
    with pytest.raises(ValueError, match="own parameters"):
        pin_lsh_config(idx, {"bands": 16})


def test_clean_and_neardup_compose(ray_session, tmp_path):
    """--clean and --neardup-index together: both column families
    appear, rows == inputs holds, and the config pin covers both."""
    import pyarrow.dataset as pads
    import pytest
    from zhtml_ray.stages.manifest import run_partitioned

    shards = _neardup_shards(tmp_path)
    out_dir = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    r = run_partitioned(shards, out_dir, group_size=2, overlap=1,
                        extract_kwargs={"include_spans": False,
                                        "clean": True,
                                        "neardup_index": idx})
    assert r["complete"] and r["rows"] == 10
    dset = pads.dataset(sorted(glob.glob(out_dir + "/part-*/*.parquet")))
    names = set(dset.schema.names)
    assert {"clean_text", "clean_keep", "neardup_keep"} <= names
    t = dset.to_table(columns=["url", "neardup_keep"])
    keeps = dict(zip(t["url"].to_pylist(),
                     t["neardup_keep"].to_pylist()))
    assert not keeps["http://p1/dup-t"] and keeps["http://p0/base-t"]

    # resume missing either stage flag must refuse
    with pytest.raises(ValueError, match="different extraction config"):
        run_partitioned(shards, out_dir, group_size=2, overlap=1,
                        extract_kwargs={"include_spans": False,
                                        "clean": True})


def test_neardup_two_jobs_share_one_index(ray_session, tmp_path):
    """Two different jobs appending into ONE shared index must not
    clobber each other's partition files: job B's partition-0 crash
    cleanup is namespaced by job tag, so job A's partition-0 appends
    survive — and job B's docs dedup against job A's appends."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads
    from zhtml_ray.stages.manifest import run_partitioned

    text = " ".join(f"shared corpus words {i} x{i}y" for i in range(15))

    def shard(path, url, txt):
        pq.write_table(pa.table({
            "url": [url],
            "html": [f"<html><body><p>{txt}</p></body></html>"
                     .encode()]}), path)
        return path

    a = shard(str(tmp_path / "a.parquet"), "http://a/doc", text)
    b = shard(str(tmp_path / "b.parquet"), "http://b/doc", text)
    idx = str(tmp_path / "idx")

    ra = run_partitioned([a], str(tmp_path / "out_a"), group_size=1,
                         overlap=1,
                         extract_kwargs={"include_spans": False,
                                         "neardup_index": idx})
    assert ra["complete"]
    rb = run_partitioned([b], str(tmp_path / "out_b"), group_size=1,
                         overlap=1,
                         extract_kwargs={"include_spans": False,
                                         "neardup_index": idx})
    assert rb["complete"]

    def keep(odir):
        import glob as g
        t = pads.dataset(sorted(g.glob(odir + "/part-*/*.parquet"))) \
            .to_table(columns=["url", "neardup_keep"])
        return dict(zip(t["url"].to_pylist(),
                        t["neardup_keep"].to_pylist()))

    # job A's doc survived (fresh index); job B's twin was caught
    # against job A's append — which job B's own partition-0 cleanup
    # must NOT have deleted
    assert keep(str(tmp_path / "out_a"))["http://a/doc"]
    assert not keep(str(tmp_path / "out_b"))["http://b/doc"]


def test_job_cli_compact_index_mode(ray_session, tmp_path, capsys):
    """`--compact-index DIR` maintenance mode: compacts and prints
    stats without touching --input/--output; bare invocation without
    either mode refuses."""
    import json as _json
    import pyarrow as pa
    import ray.data as rd
    from zhtml_ray.functions.dedup import append_lsh_index, build_lsh_index
    from zhtml_ray.job import main

    idx = str(tmp_path / "idx")
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["alpha beta gamma delta words"])})
    build_lsh_index(rd.from_arrow(t), idx)
    append_lsh_index(rd.from_arrow(t), idx)
    assert main(["--compact-index", idx]) == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["files_after"] <= stats["files_before"]
    assert main([]) == 2
