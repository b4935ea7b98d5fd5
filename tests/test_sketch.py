"""HyperLogLog sketch kernels (functions/sketch.py): bit-level rho
correctness, merge algebra, layout invariance, and accuracy vs exact."""

import numpy as np
import pyarrow as pa
import pytest

from zhtml_ray.functions.sketch import (approx_distinct, hll_estimate,
                                        hll_partial_batch, hll_registers,
                                        hll_rho, splitmix64)


def test_splitmix64_reference_vector():
    # public reference sequence (Steele et al. splitmix64, seed 0):
    # first output of the generator == finalizer applied to state 0
    out = splitmix64(np.array([0], np.uint64))
    assert out[0] == np.uint64(0xE220A8397B1DCDAF)


def test_rho_bit_math():
    p = 12
    # suffix all zeros -> sentinel 64 - p + 1
    z = np.array([0], np.uint64)
    j, rho = hll_rho(z, p)
    assert j[0] == 0 and rho[0] == 64 - p + 1
    # suffix with its top bit set -> rho 1
    z = np.array([np.uint64(1) << np.uint64(63 - p)], np.uint64)
    _, rho = hll_rho(z, p)
    assert rho[0] == 1
    # suffix == 1 (lowest bit only) -> rho 64 - p
    z = np.array([1], np.uint64)
    _, rho = hll_rho(z, p)
    assert rho[0] == 64 - p
    # top p bits form the register index
    z = np.array([np.uint64(5) << np.uint64(64 - p)], np.uint64)
    j, _ = hll_rho(z, p)
    assert j[0] == 5


def test_rho_matches_python_bit_scan():
    p = 10
    rng = np.random.default_rng(7)
    z = rng.integers(0, 2**63, 2000, np.uint64) * np.uint64(2) + \
        rng.integers(0, 2, 2000, np.uint64)
    _, rho = hll_rho(z, p)
    for zi, ri in zip(z[:200].tolist(), rho[:200].tolist()):
        suffix = (zi << p) & ((1 << 64) - 1)
        if suffix == 0:
            want = 64 - p + 1
        else:
            want = 64 - suffix.bit_length() + 1
        assert ri == want


def test_registers_merge_is_partition_invariant():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 10**9, 5000, np.int64)
    codes = rng.integers(0, 3, 5000, np.int64)
    whole = hll_registers(vals, codes, 3, p=8)
    # fold over arbitrary splits must give identical registers
    acc = np.zeros_like(whole)
    for lo, hi in [(0, 17), (17, 1000), (1000, 1001), (1001, 5000)]:
        acc = np.maximum(acc, hll_registers(vals[lo:hi], codes[lo:hi],
                                            3, p=8))
    assert np.array_equal(whole, acc)
    # duplication-invariant (idempotent merge)
    acc2 = np.maximum(acc, hll_registers(vals[:300], codes[:300], 3, p=8))
    assert np.array_equal(whole, acc2)


@pytest.mark.parametrize("n,p,tol", [(100, 12, 0.05), (5000, 12, 0.05),
                                     (200000, 12, 0.05)])
def test_estimate_accuracy(n, p, tol):
    rng = np.random.default_rng(n)
    vals = rng.integers(0, 2**62, n, np.int64)
    exact = len(np.unique(vals))
    regs = hll_registers(vals, np.zeros(n, np.int64), 1, p=p)
    est = hll_estimate(regs[0])
    assert abs(est - exact) / exact < tol


def test_partial_batch_empty_and_groups():
    t = pa.table({"g": pa.array([], pa.string()),
                  "v": pa.array([], pa.int64())})
    out = hll_partial_batch(t, "g", "v", p=6)
    assert out.num_rows == 0 and out["regs"].type == pa.binary(64)
    t = pa.table({"g": ["a", "b", "a"], "v": [1, 2, 3]})
    out = hll_partial_batch(t, "g", "v", p=6)
    assert sorted(out["g"].to_pylist()) == ["a", "b"]


def test_cms_overestimate_only_and_bound():
    from zhtml_ray.functions.sketch import (cms_build, cms_estimate,
                                            word_hash64)
    rng = np.random.default_rng(9)
    words = [f"w{i}" for i in range(3000)]
    counts = rng.integers(1, 50, 3000).astype(np.int64)
    h = word_hash64(words)
    tbl = cms_build(h, counts, log2_w=12, d=4)
    est = cms_estimate(tbl, h, 12)
    assert (est >= counts).all()  # CMS never underestimates
    n = counts.sum()
    # standard bound: overshoot ≤ e/w · N w.h.p.; generous factor 3
    assert (est - counts).max() <= 3 * np.e / 4096 * n
    absent = cms_estimate(tbl, word_hash64(["nope-1", "nope-2"]), 12)
    assert (absent >= 0).all()


def test_cms_merge_partition_invariant():
    from zhtml_ray.functions.sketch import cms_build, word_hash64
    rng = np.random.default_rng(10)
    words = [f"t{i}" for i in range(500)]
    counts = rng.integers(1, 9, 500).astype(np.int64)
    h = word_hash64(words)
    whole = cms_build(h, counts, 10, 3)
    acc = np.zeros_like(whole)
    for lo, hi in [(0, 7), (7, 300), (300, 500)]:
        acc += cms_build(h[lo:hi], counts[lo:hi], 10, 3)
    assert np.array_equal(whole, acc)


def test_bloom_no_false_negatives_and_fp_rate():
    from zhtml_ray.functions.sketch import bloom_build, bloom_probe
    rng = np.random.default_rng(5)
    members = rng.integers(0, 2**62, 20000, np.int64)
    bm = bloom_build(members, log2_bits=20, k=6)
    assert bloom_probe(bm, members, 20, 6).all()  # never a false negative
    probes = rng.integers(0, 2**62, 50000, np.int64)
    outside = probes[~np.isin(probes, members)]
    fp = bloom_probe(bm, outside, 20, 6).mean()
    assert fp < 0.01  # ~0.5% theoretical at n=20k, m=2^20, k=6


def test_bloom_merge_partition_invariant():
    from zhtml_ray.functions.sketch import bloom_build
    rng = np.random.default_rng(6)
    vals = rng.integers(0, 2**60, 5000, np.int64)
    whole = bloom_build(vals, 16, 4)
    acc = np.zeros_like(whole)
    for lo, hi in [(0, 1), (1, 999), (999, 5000)]:
        acc |= bloom_build(vals[lo:hi], 16, 4)
    assert np.array_equal(whole, acc)


def test_bloom_join_survivor_bound(ray_session):
    """The bloom prefilter must actually prune: survivors ≤ true
    matches + fp slack. A probe regression (e.g. a mask bug passing
    everything) fails this, not just slows the join down."""
    import ray
    import ray.data as rd

    from zhtml_ray.functions.sketch import bloom_from_dataset, bloom_probe
    rng = np.random.default_rng(8)
    keys = np.arange(10000, dtype=np.int64)
    member = keys[keys % 10 == 0]  # 10% true match rate
    small = rd.from_arrow(pa.table({"k": pa.array(member, pa.int64())}))
    bm = bloom_from_dataset(small, "k", log2_bits=18, k=6)
    keep = bloom_probe(bm, keys, 18, 6)
    assert keep[keys % 10 == 0].all()
    assert keep.mean() < 0.15  # 10% true + small fp slack — it pruned


def test_approx_distinct_dataset_layout_invariant(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(11)
    n = 20000
    t = pa.table({"g": pa.array(rng.integers(0, 4, n).astype(str)),
                  "v": pa.array(rng.integers(0, 3000, n), pa.int64())})
    import duckdb
    exact = dict(duckdb.sql(
        "SELECT g, count(DISTINCT v) FROM t GROUP BY g").fetchall())

    def run(nblocks):
        ds = rd.from_arrow(t).repartition(nblocks)
        out = approx_distinct(ds, "g", "v", p=12).to_pandas()
        return dict(zip(out["g"], out["approx_n"]))

    a, b = run(3), run(17)
    assert a == b  # byte-identical registers -> identical estimates
    for g, ex in exact.items():
        assert abs(a[g] - ex) / ex < 0.05


# --------------------------------------------------- log-histogram sketch

def test_loghist_bucket_bit_math():
    from zhtml_ray.functions.sketch import loghist_bucket
    iv = np.array([0, 1, 2, 3, 4, 7, 8, -1, -2, -1000000,
                   2**62, -(2**62)], np.int64)
    got = loghist_bucket(iv)
    # bucket = sign * bit_length(|iv|)
    want = np.array([0, 1, 2, 2, 3, 3, 4, -1, -2,
                     -(1000000).bit_length(), 63, -63], np.int64)
    assert np.array_equal(got, want)


def test_loghist_rep_is_bucket_lower_bound():
    from zhtml_ray.functions.sketch import _loghist_rep, loghist_bucket
    for v in (0.000001, 0.5, 1.0, 3.7, -42.0, 123456.789):
        iv = int(np.floor(v * 1e6 + 0.5))
        b = int(loghist_bucket(np.array([iv], np.int64))[0])
        rep = _loghist_rep(b)
        if iv == 0:
            assert rep == 0.0
        elif iv > 0:
            assert rep <= iv / 1e6 < 2 * rep
        else:
            assert rep >= iv / 1e6 > 2 * rep


def test_loghist_quantiles_layout_invariant_and_bounded(ray_session):
    """Merged sketch (int64 count sums) must be layout-invariant, and
    every reported quantile within the DDSketch 2x relative-error
    guarantee of the exact discrete quantile."""
    import duckdb
    import ray.data as rd

    from zhtml_ray.functions.sketch import loghist_quantiles
    rng = np.random.default_rng(7)
    n = 30000
    t = pa.table({"g": pa.array(rng.integers(0, 3, n).astype(str)),
                  "v": pa.array(np.abs(rng.lognormal(2.0, 1.5, n)),
                                pa.float64())})

    def run(nblocks):
        ds = rd.from_arrow(t).repartition(nblocks)
        return loghist_quantiles(ds, "g", "v").to_pandas()

    a, b = run(3), run(19)
    assert a.equals(b)

    con = duckdb.connect()
    con.register("t", t)
    for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        exact = dict(con.sql(
            f"SELECT g, quantile_disc(v, {q}) FROM t GROUP BY g"
        ).fetchall())
        for _, row in a.iterrows():
            ex = exact[row["g"]]
            assert row[col] <= ex <= 2 * row[col] + 2e-6
