"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (ray.put once, read in every task), then a global
merge of per-batch partial top-ks (no shuffle: the partials are tiny).

Scale path: IVF — k-means coarse centroids (trained on a sample),
assign each vector to its nearest centroid in a map_batches pass, then
probe only the closest n_probe centroid partitions at query time.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_matrix(col) -> np.ndarray:
    """``list<float>`` column → (n, dim) float32 matrix. When the
    layout allows (no nulls, rectangular), reshape the ListArray's
    values buffer directly — ``to_pylist`` round-trips every float
    through a Python object (measured ~40× slower per batch and the
    dominant cost of a distributed k-means round)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # null ELEMENTS inside a list leave the outer null_count at 0 but
    # would decode as silent NaNs through the values buffer — check the
    # child too so malformed embeddings still fail loudly (review find)
    if len(col) > 0 and col.null_count == 0 and col.values.null_count == 0:
        offs = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if widths.size and (widths == widths[0]).all() and widths[0] > 0:
            vals = col.values.to_numpy(zero_copy_only=False)
            return np.asarray(vals[offs[0]:offs[-1]],
                              np.float32).reshape(len(col), int(widths[0]))
    return np.asarray(col.to_pylist(), np.float32)


def _collect_topk(sims, keys, k, qid_of, qid_out, key_out, sim_out):
    """Shared per-batch top-k selection: tie-inclusive candidate set
    (keep EVERY element equal to the k-th largest cosine), then order
    by (-cosine, key) so the batch-level truncation agrees with the
    oracle's deterministic tie-break (cosine DESC, key ASC).
    ``qid_of[qi]`` maps the local sims row to the emitted query id."""
    kk = min(k, sims.shape[1])
    if kk == 0:
        return
    for qi in range(sims.shape[0]):
        row = sims[qi]
        kth = np.partition(-row, kk - 1)[kk - 1]
        cand = np.nonzero(-row <= kth)[0]
        order = np.lexsort((keys[cand], -row[cand]))
        for j in cand[order[:kk]]:
            qid_out.append(qid_of[qi])
            key_out.append(keys[j])
            sim_out.append(float(row[j]))


class BruteForceTopK:
    """Per-batch partial top-k against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int, key: str, col: str):
        import ray
        q = ray.get(queries_ref)  # (n_queries, dim), read once per actor
        self.q = _normalize(np.asarray(q, np.float32))
        self.k = k
        self.key = key
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch[self.col]))
        keys = np.asarray(batch[self.key].to_pylist())
        sims = self.q @ emb.T  # (n_queries, batch)
        qid_out, key_out, sim_out = [], [], []
        _collect_topk(sims, keys, self.k, range(sims.shape[0]),
                      qid_out, key_out, sim_out)
        return pa.table({
            "query_id": pa.array(qid_out, pa.int32()),
            self.key: pa.array(key_out),
            "cosine": pa.array(sim_out, pa.float64()),
        })


def brute_force_topk(ds, query_vectors: np.ndarray, k: int = 10,
                     key: str = "vec_id", col: str = "embedding"):
    """Exact cosine top-k for each query vector. Returns a Dataset of
    (query_id, key, cosine) with exactly k rows per query (merged on the
    driver from per-batch partials — partials are n_queries × k rows)."""
    import ray
    import ray.data as rd

    from zhtml_ray.stages.util import stateless_stage

    qref = ray.put(np.asarray(query_vectors, np.float32))
    # stateless tasks, not an actor pool: setup is a cached ray.get
    # (stages/util.py:stateless_stage, r5)
    partials = ds.map_batches(
        stateless_stage(BruteForceTopK, queries_ref=qref, k=k,
                        key=key, col=col),
        batch_format="pyarrow")
    # global merge: tiny (n_batches × n_queries × k rows)
    pdf = partials.to_pandas()
    out = (pdf.sort_values(["query_id", "cosine", key],
                           ascending=[True, False, True])
              .groupby("query_id", as_index=False).head(k)
              .reset_index(drop=True))
    return out


class _LabelFilteredTopK:
    """Per-batch partial top-k where query qi only scores rows whose
    ``label_col`` equals the query's own label — the tenant-scoped /
    hard-positive-mining form, fused into ONE pass over the corpus
    (r4: one Dataset pipeline per distinct label paid a ~2 s Ray
    latency floor each). Same normalized-float32 cosine and
    deterministic tie-break as BruteForceTopK."""

    def __init__(self, queries_ref, k: int, key: str, col: str,
                 label_col: str):
        import ray
        q, qlabels = ray.get(queries_ref)
        self.q = _normalize(np.asarray(q, np.float32))
        self.qlabels = np.asarray(qlabels, object)
        self.k = k
        self.key = key
        self.col = col
        self.label_col = label_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch[self.col]))
        keys = np.asarray(batch[self.key].to_pylist())
        labs = np.asarray(batch[self.label_col].to_pylist(), object)
        qid_out, key_out, sim_out = [], [], []
        for lab in sorted(set(self.qlabels.tolist())):
            qs = np.flatnonzero(self.qlabels == lab)
            rows = np.flatnonzero(labs == lab)
            if not len(qs) or not len(rows):
                continue
            sims = self.q[qs] @ emb[rows].T
            _collect_topk(sims, keys[rows], self.k,
                          [int(q) for q in qs],
                          qid_out, key_out, sim_out)
        return pa.table({
            "query_id": pa.array(qid_out, pa.int32()),
            self.key: pa.array(key_out),
            "cosine": pa.array(sim_out, pa.float64()),
        })


def brute_force_topk_filtered(ds, query_vectors, query_labels,
                              k: int = 10, key: str = "vec_id",
                              col: str = "embedding",
                              label_col: str = "label"):
    """Label-filtered exact cosine top-k, one pass (see
    _LabelFilteredTopK). Returns (query_id, key, cosine), ≤ k rows per
    query (fewer when the label has fewer rows)."""
    import ray

    from zhtml_ray.stages.util import stateless_stage

    qref = ray.put((np.asarray(query_vectors, np.float32),
                    list(query_labels)))
    partials = ds.map_batches(
        stateless_stage(_LabelFilteredTopK, queries_ref=qref, k=k,
                        key=key, col=col, label_col=label_col),
        batch_format="pyarrow")
    pdf = partials.to_pandas()
    return (pdf.sort_values(["query_id", "cosine", key],
                            ascending=[True, False, True])
               .groupby("query_id", as_index=False).head(k)
               .reset_index(drop=True))


# ----------------------------------------------------------------- IVF ANN


def _kmeans(x: np.ndarray, n_centroids: int, iters: int,
            seed: int) -> np.ndarray:
    """Seeded Lloyd iterations on normalized rows — pure numpy, shared
    by the distributed trainer and the serial pinned golden
    (pipelines/golden.py) so both run the IDENTICAL kernel."""
    x = _normalize(x)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def train_centroids(ds, n_centroids: int = 16, col: str = "embedding",
                    sample: int = 2048, iters: int = 10, seed: int = 42):
    """K-means (Lloyd) on a driver-side sample — the coarse quantizer.
    Deterministic: seeded init, fixed iterations.

    The sample is an unbiased CONTENT-hash filter across ALL blocks —
    taking the first blocks would train the quantizer on one shard's
    distribution at scale (skewed centroids, bad probe recall). Rows
    are put in content order before thinning/training
    (``_content_sorted``): the streaming executor gives no arrival-
    order guarantee through map operators (measured — it silently
    broke reproducibility), so anything collected on the driver must
    impose its own total order. The result is layout- and schedule-
    invariant at EVERY scale; when the table fits the sample budget
    (n ≤ sample) the training set is the whole table — the path that
    lets the serial golden pin the gate-scale IVF output."""
    n = ds.count()
    if n > sample * 2:
        x = _content_hash_sample(ds, col, target=sample * 2, n=n,
                                 seed=seed)
        if len(x) < n_centroids:   # degenerate residue skew: head fallback
            x = np.concatenate(
                [_emb_matrix(b[col]) for b in ds.limit(sample)
                 .iter_batches(batch_size=1024, batch_format="pyarrow")])
    else:
        arr = [_emb_matrix(b[col])
               for b in ds.iter_batches(batch_size=1024,
                                        batch_format="pyarrow")]
        x = np.concatenate(arr) if arr else np.zeros((0, 1), np.float32)
    x = _content_sorted(x)
    if len(x) > sample:
        idx = np.random.RandomState(seed).permutation(len(x))[:sample]
        x = x[idx]
    return _kmeans(x, n_centroids, iters, seed)


class IvfAssign:
    def __init__(self, centroids_ref, col: str):
        import ray
        self.cent = ray.get(centroids_ref)
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch[self.col]))
        assign = (emb @ self.cent.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(assign))


def ivf_topk(ds, query_vectors: np.ndarray, k: int = 10, n_probe: int = 4,
             n_centroids: int = 16, key: str = "vec_id",
             col: str = "embedding", seed: int = 42,
             scan_stats: dict | None = None):
    """Approximate top-k: assign vectors to IVF cells (one map_batches
    pass), then brute-force only rows whose cell is among each query's
    n_probe nearest centroids. At scale the assignment is written
    partitioned-by-cell so probes read a fraction of the corpus.

    ``scan_stats`` (optional dict) receives {"n_total", "n_scanned"} so
    callers/tests can assert the probe filter actually pruned — a
    filter regression silently degrading to full brute force must fail
    loudly (VERDICT r2 #6)."""
    import ray

    cent = train_centroids(ds, n_centroids=n_centroids, col=col, seed=seed)
    cref = ray.put(cent)
    from zhtml_ray.stages.util import stateless_stage
    assigned = ds.map_batches(
        stateless_stage(IvfAssign, centroids_ref=cref, col=col),
        batch_format="pyarrow")
    q = _normalize(np.asarray(query_vectors, np.float32))
    probe_cells = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]
    wanted = sorted({int(c) for row in probe_cells for c in row})
    filtered = assigned.filter(expr=f"ivf_cell in {wanted}")
    if scan_stats is not None:
        filtered = filtered.materialize()
        scan_stats["n_total"] = ds.count()
        scan_stats["n_scanned"] = filtered.count()
    results = brute_force_topk(filtered, q, k=k, key=key, col=col)
    # brute_force over the union of probed cells is the standard IVF
    # coarse-probe behavior (per-query cell masking would only shrink
    # recall); keep as-is.
    return results


# -------------------------------------------------- distributed k-means

def _content_sorted(x: np.ndarray) -> np.ndarray:
    """Rows in a deterministic CONTENT order (lexicographic over the
    raw row bytes). Ray's streaming executor does not preserve block
    order through map operators (preserve_order is off), so anything
    collected on the driver arrives in completion order — imposing a
    content total order makes the fit layout- AND schedule-invariant.
    Tie rows are byte-identical, hence interchangeable downstream."""
    if len(x) <= 1:
        return x
    v = np.ascontiguousarray(x).view(
        np.dtype((np.void, x.shape[1] * x.dtype.itemsize))).ravel()
    return x[np.argsort(v, kind="stable")]


def _row_content_hash(emb: np.ndarray, seed: int) -> np.ndarray:
    """Per-row uint64 content hash of a float32 matrix: each column
    gets its own wrapping power of an odd multiplier (position-
    DEPENDENT — a plain ``(u*R).sum`` reduces to R·Σu, which collapses
    permutations and equal-sum rows into one residue class and lets a
    duplicate-heavy corpus defeat hash sampling entirely; review
    find)."""
    u = np.ascontiguousarray(emb).view(np.uint32).astype(np.uint64)
    R = np.uint64(0x9E3779B97F4A7C15)
    muls = np.empty(u.shape[1], np.uint64)
    m = R
    for j in range(u.shape[1]):
        muls[j] = m
        m = m * R   # wraps mod 2^64
    return (u * muls).sum(axis=1) + np.uint64(seed)


def _content_hash_sample(ds, col: str, target: int, n: int,
                         seed: int) -> np.ndarray:
    """~``target`` rows sampled by a deterministic CONTENT hash of each
    vector (keep when hash % (n//target) == 0) — unbiased across all
    blocks like a seeded random sample, but with the chosen set a pure
    function of the data (``ds.random_sample(frac, seed=...)``'s row
    set is empirically stable on this Ray version, but that is
    undocumented — and per-row RNG costs more than a vectorized hash).
    Collected rows are returned WITHOUT order guarantees (streaming
    executor arrival order); callers must sort by content."""
    mod = max(1, n // max(target, 1))

    def _keep(b: pa.Table) -> pa.Table:
        emb = _emb_matrix(b[col])
        if emb.size == 0:
            return pa.table({col: b[col]})
        m = (_row_content_hash(emb, seed) % np.uint64(mod)) == 0
        c = b[col].combine_chunks() if isinstance(b[col], pa.ChunkedArray) \
            else b[col]
        return pa.table({col: c.filter(pa.array(m))})

    rows = [_emb_matrix(b[col])
            for b in ds.map_batches(_keep, batch_format="pyarrow")
            .iter_batches(batch_size=1024, batch_format="pyarrow")]
    rows = [r for r in rows if r.size]
    return np.concatenate(rows) if rows else np.zeros((0, 1), np.float32)


def kmeans_fit(ds, n_centroids: int = 16, iters: int = 10,
               col: str = "embedding", seed: int = 42,
               driver_budget_rows: int = 65536) -> np.ndarray:
    """Full-dataset Lloyd iterations, distributed: each round is ONE
    ``map_batches`` pass emitting per-(batch, cell) float64 partial
    sums + counts (≤ blocks×k tiny rows), reduced on the driver in a
    DETERMINISTIC order (partials sorted by value, so arrival order —
    which Ray does not fix — cannot change the float result). Per
    round the driver holds O(blocks×k×dim), never O(n).

    Below ``driver_budget_rows`` the vectors stream to the driver,
    are put in deterministic content order (``_content_sorted``) and
    the shared serial ``_kmeans`` kernel runs — exactly layout- and
    schedule-invariant, byte-deterministic; that is the mode every
    gate scale uses and the pinned serial golden replicates (the same
    duality as ``train_centroids`` / ``_gen_ivf_topk``). The
    distributed mode is differential-tested against the serial kernel
    with a float tolerance instead."""
    import ray

    n = ds.count()
    if n <= driver_budget_rows:
        arr = [_emb_matrix(b[col])
               for b in ds.iter_batches(batch_size=4096,
                                        batch_format="pyarrow")]
        x = np.concatenate(arr) if arr else np.zeros((0, 1), np.float32)
        return _kmeans(_content_sorted(x), n_centroids, iters, seed)

    # deterministic unbiased init sample (see _content_hash_sample)
    target = n_centroids * 8
    xi = _content_hash_sample(ds, col, target=target, n=n, seed=seed)
    if len(xi) < n_centroids:   # pathological mod skew: fall back to head
        xi = np.concatenate([_emb_matrix(b[col])
                             for b in ds.limit(target).iter_batches(
                                 batch_size=1024, batch_format="pyarrow")])
    xi = _normalize(_content_sorted(xi))
    rng = np.random.RandomState(seed)
    cent = xi[rng.choice(len(xi), size=min(n_centroids, len(xi)),
                         replace=False)]

    # iterate over the PRUNED, materialized vector column: without this
    # every Lloyd round re-executes the upstream read (measured ~5 s of
    # re-read+convert per round at 200k×64 vs <0.5 s of real work)
    ds = ds.select_columns([col]).materialize()

    for _ in range(iters):
        cref = ray.put(cent)

        def partial(b: pa.Table) -> pa.Table:
            c = ray.get(cref)
            emb = _normalize(_emb_matrix(b[col]))
            if emb.size == 0:
                return pa.table({
                    "cell": pa.array([], pa.int32()),
                    "n": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64()))})
            a = (emb @ c.T).argmax(axis=1)
            order = np.argsort(a, kind="stable")
            srt = emb[order].astype(np.float64)
            asrt = a[order]
            starts = np.flatnonzero(np.r_[True, asrt[1:] != asrt[:-1]])
            sums = np.add.reduceat(srt, starts, axis=0)
            cnt = np.diff(np.r_[starts, len(asrt)])
            return pa.table({
                "cell": pa.array(asrt[starts], pa.int32()),
                "n": pa.array(cnt, pa.int64()),
                "vsum": pa.array([r.tolist() for r in sums],
                                 pa.list_(pa.float64()))})

        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        # deterministic reduce order: sort by full value, not arrival
        parts.sort(key=lambda r: (r["cell"], r["n"], tuple(r["vsum"])))
        new = cent.astype(np.float64).copy()
        acc: dict = {}
        cnts: dict = {}
        for r in parts:
            cell = r["cell"]
            v = np.asarray(r["vsum"], np.float64)
            if cell in acc:
                acc[cell] = acc[cell] + v
                cnts[cell] += r["n"]
            else:
                acc[cell] = v
                cnts[cell] = r["n"]
        for cell, v in acc.items():
            new[cell] = v / cnts[cell]
        cent = _normalize(new.astype(np.float32))
    return cent


# ------------------------------------------- SemDeDup semantic dedup

def _greedy_leader(keys: np.ndarray, emb_n: np.ndarray,
                   threshold: float, chunk: int = 1024):
    """Greedy leader dedup inside one cluster, in ascending-key order:
    a member is a duplicate of the EARLIEST already-kept member with
    cosine ≥ threshold, else becomes a leader itself. Vectorized in
    ``chunk``-row blocks against the leader matrix (one matmul per
    block); only rows with no prior-leader hit take the short
    sequential pass against the block's own new leaders. Returns
    (sorted keys, kept mask, leader key or -1) — shared verbatim by
    the distributed operator and the pinned serial golden."""
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    E = np.ascontiguousarray(emb_n[order])
    m = len(ks)
    dup_of = np.full(m, -1, np.int64)
    leader_idx: list = []
    lmat = np.empty((0, E.shape[1]), E.dtype)
    for s in range(0, m, chunk):
        blk = E[s:s + chunk]
        hit = np.full(len(blk), -1, np.int64)
        if leader_idx:
            sims = blk @ lmat.T
            ok = sims >= threshold
            has = ok.any(axis=1)
            first = ok.argmax(axis=1)
            la = np.asarray(leader_idx)
            hit[has] = la[first[has]]
        new_loc: list = []
        for i in np.flatnonzero(hit < 0):
            gi = s + i
            if new_loc:
                sims_i = E[new_loc] @ E[gi]
                j = np.flatnonzero(sims_i >= threshold)
                if j.size:
                    hit[i] = new_loc[int(j[0])]
                    continue
            new_loc.append(gi)
        dup_of[s:s + len(blk)] = hit
        if new_loc:
            leader_idx.extend(new_loc)
            lmat = np.concatenate([lmat, E[new_loc]])
    kept = dup_of < 0
    leader_key = np.where(kept, np.int64(-1), ks[np.maximum(dup_of, 0)])
    return ks, kept, leader_key


def semantic_dedup(ds, threshold: float = 0.98, n_centroids: int = 16,
                   iters: int = 10, key: str = "vec_id",
                   col: str = "embedding", seed: int = 42,
                   cell_cap: int = 100_000):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means the
    embedding space, then deduplicate WITHIN each cluster — members
    with cosine ≥ threshold to an earlier kept member (ascending key)
    are dropped as semantic duplicates. Output one row per input:
    (key, cell, kept, dup_of).

    Scale shape: the fit is ``kmeans_fit`` (per-round partial sums,
    driver holds O(blocks×k×dim)); assignment is a pure map; the
    per-cluster pass is a ``groupby(cell).map_groups`` — exactly the
    partitioning SemDeDup prescribes (size ``n_centroids`` so clusters
    fit a worker: n/5k at corpus scale). The within-cluster cost is
    O(|cell|·leaders) vectorized matmuls, not all-pairs — but a hot
    cell of DISTINCT vectors makes leaders ≈ |cell| and the pass
    quadratic, so cells beyond ``cell_cap`` are salted by vector
    content hash into ⌈size/cap⌉ sub-cells (dedup then sees only
    within-sub-cell pairs — bounded work, reduced recall on the hot
    cell, loudly warned; the ``bucket_cap``/``clique_limit`` pattern
    of the LSH dedups). Cell sizes come from per-batch bincounts, a
    k-bounded driver reduce."""
    import warnings

    import ray
    from zhtml_ray.stages.util import stateless_stage

    cent = kmeans_fit(ds, n_centroids=n_centroids, iters=iters,
                      col=col, seed=seed)
    k = len(cent)
    cref = ray.put(cent)
    assigned = ds.map_batches(
        stateless_stage(IvfAssign, centroids_ref=cref, col=col),
        batch_format="pyarrow").materialize()

    def cell_counts(b: pa.Table) -> pa.Table:
        c = np.bincount(b["ivf_cell"].combine_chunks().to_numpy(
            zero_copy_only=False), minlength=k)
        return pa.table({"cell": pa.array(np.arange(k), pa.int32()),
                         "n": pa.array(c, pa.int64())})

    sizes = np.zeros(k, np.int64)
    for r in assigned.map_batches(cell_counts,
                                  batch_format="pyarrow").take_all():
        sizes[r["cell"]] += r["n"]
    nsub = np.maximum(1, -(-sizes // cell_cap))  # ceil-div
    hot = np.flatnonzero(nsub > 1)
    if hot.size:
        warnings.warn(
            f"semantic_dedup: {hot.size} cell(s) over cell_cap="
            f"{cell_cap} (max {int(sizes.max())} rows) salted into "
            f"sub-cells — within-sub-cell dedup only on those; raise "
            f"n_centroids for full recall")
    nsub_ref = ray.put(nsub)

    def add_group(b: pa.Table) -> pa.Table:
        cells = b["ivf_cell"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        ns = ray.get(nsub_ref)[cells]
        sub = np.zeros(len(cells), np.int64)
        m = ns > 1
        if m.any():
            h = _row_content_hash(_emb_matrix(b[col])[m], seed)
            sub[m] = (h % ns[m].astype(np.uint64)).astype(np.int64)
        return b.append_column(
            "gkey", pa.array(cells * (1 << 20) + sub, pa.int64()))

    grouped = assigned.map_batches(add_group, batch_format="pyarrow")

    def dedup_cell(g: pa.Table) -> pa.Table:
        keys = g[key].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        emb_n = _normalize(_emb_matrix(g[col]))
        cell = int(g["gkey"][0].as_py() >> 20)
        ks, kept, leader = _greedy_leader(keys, emb_n, threshold)
        return pa.table({
            key: pa.array(ks, pa.int64()),
            "cell": pa.array([cell] * len(ks), pa.int32()),
            "kept": pa.array(kept, pa.bool_()),
            "dup_of": pa.array(leader, pa.int64())})

    return grouped.groupby("gkey").map_groups(
        dedup_cell, batch_format="pyarrow")


# ------------------------------------------- IVF partitioned index

def build_ivf_index(ds, out_dir: str, n_centroids: int = 16,
                    key: str = "vec_id", col: str = "embedding",
                    seed: int = 42, iters: int = 10,
                    fit_kwargs: dict | None = None):
    """Materialize the IVF scale path `ivf_topk`'s docstring promises:
    assign every vector to its cell and WRITE the corpus partitioned
    by cell (``cell=<c>/`` parquet dirs, Hive layout) plus
    ``centroids.npy``. Probes then READ only the probed cells'
    files — the at-rest form of the probe filter, so query cost is
    `n_probe / n_centroids` of the corpus I/O, not a full scan that
    filters after reading. One ``map_batches`` assignment pass + one
    partitioned write; the fit is ``kmeans_fit`` (distributed beyond
    the driver budget)."""
    import os
    import shutil

    import ray
    from zhtml_ray.stages.util import stateless_stage

    # a rebuild over a stale index would UNION old and new partitions
    # at probe time (write_parquet appends) — clear first (review find)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    cent = kmeans_fit(ds, n_centroids=n_centroids, iters=iters,
                      col=col, seed=seed, **(fit_kwargs or {}))
    cref = ray.put(cent)
    assigned = ds.map_batches(
        stateless_stage(IvfAssign, centroids_ref=cref, col=col),
        batch_format="pyarrow")
    # sorted write: avoids the blocks × cells file fan-out (r5)
    assigned.sort("ivf_cell").write_parquet(
        out_dir, partition_cols=["ivf_cell"])
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    return cent


def ivf_index_topk(out_dir: str, query_vectors: np.ndarray, k: int = 10,
                   n_probe: int = 4, key: str = "vec_id",
                   col: str = "embedding",
                   scan_stats: dict | None = None):
    """Query a ``build_ivf_index`` directory: pick each query's
    ``n_probe`` nearest cells from the stored centroids, read ONLY
    those cells' parquet partitions (directory-level pruning — the
    other cells' files are never opened), brute-force within.
    ``scan_stats`` receives {"n_cells_total", "n_cells_read"} so tests
    can assert the read actually pruned."""
    import glob
    import os

    import ray.data as rd

    cent = np.load(os.path.join(out_dir, "centroids.npy"))
    q = _normalize(np.asarray(query_vectors, np.float32))
    probe_cells = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]
    wanted = sorted({int(c) for row in probe_cells for c in row})
    all_cells = sorted(glob.glob(os.path.join(out_dir, "ivf_cell=*")))
    dirs = [d for d in all_cells
            if int(d.rsplit("=", 1)[1]) in set(wanted)]
    if scan_stats is not None:
        scan_stats["n_cells_total"] = len(all_cells)
        scan_stats["n_cells_read"] = len(dirs)
    # expand to files: this Ray version reads list elements as files
    files = sorted(f for d in dirs
                   for f in glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        # every probed cell is memberless: empty result, not a crash
        return pd.DataFrame({"query_id": pd.array([], dtype="int32"),
                             key: pd.array([], dtype="int64"),
                             "cosine": pd.array([], dtype="float64")})
    ds = rd.read_parquet(files, columns=[key, col])
    return brute_force_topk(ds, q, k=k, key=key, col=col)


# ------------------------------------------------------------ distributed PCA

def pca_fit(ds, k: int = 4, col: str = "embedding") -> np.ndarray:
    """Distributed PCA via moment accumulation: each BLOCK emits one
    flattened (n, Σx, ΣxxT) partial row — d²+d+1 float64s, so the
    driver folds #blocks rows regardless of corpus size — partials are
    summed in content order and the folded moments are decimal-PINNED
    (3 dp — pin-unit rationale in ``_pca_from_moments``) before the
    eigendecomposition. The pin makes the covariance
    matrix IDENTICAL across block layouts and schedules (accumulation-
    order noise ≪ the pin unit at gate magnitudes), so `eigh` — run
    once, on the driver — returns bit-identical components and the
    whole fit is layout/schedule-invariant like `kmeans_fit`.

    Returns (k, d) float64 components, eigenvalue-descending, each
    sign-fixed so its largest-|coordinate| entry is positive (the
    eigenvector sign is otherwise arbitrary)."""
    import pyarrow as pa

    def partial(b: pa.Table) -> pa.Table:
        M = _emb_matrix(b[col]).astype(np.float64)
        n = len(M)
        if n == 0:
            return pa.table({"m": pa.array([], pa.list_(pa.float64()))})
        s = M.sum(axis=0)
        ss = M.T @ M
        row = np.concatenate(([float(n)], s, ss.ravel()))
        return pa.table({"m": pa.array([row.tolist()],
                                       pa.list_(pa.float64()))})

    parts = ds.map_batches(partial, batch_size=None,
                           batch_format="pyarrow").take_all()
    rows = np.asarray([r["m"] for r in parts], np.float64)
    tot = _content_sorted(rows).sum(axis=0)
    return _pca_from_moments(tot, k)


def _pca_from_moments(tot: np.ndarray, k: int) -> np.ndarray:
    """Pin the folded (n, Σx, Σxxᵀ) moments to 3 dp, then eigh + the
    deterministic sign fix. Shared by the distributed fit and the
    serial golden generator — the SAME code path, so an edit here can
    never diverge the two.

    Pin-unit choice (the house decimal-pinned-moments rule): the d²+d+1
    moments each carry ~1e-11 accumulation-order noise at gate
    magnitudes, so a 1e-6 pin would put SOME moment within noise of a
    rounding boundary with probability ~1e-1 per run — 1e-3 drops that
    to ~1e-4 while perturbing covariance entries by <1e-6, far below
    eigengap scale. Once the moments pin identically, eigh and the
    projections are bit-identical everywhere downstream."""
    tot = np.floor(tot * 1e3 + 0.5) / 1e3
    n = tot[0]
    # len(tot) = 1 + d + d²  →  d = (-1 + √(1+4(len-1))) / 2
    d = int(round((-1 + (1 + 4 * (len(tot) - 1)) ** 0.5) / 2))
    mu = tot[1:1 + d] / n
    cov = tot[1 + d:].reshape(d, d) / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    comp = v[:, np.argsort(-w)[:k]].T
    # deterministic sign: largest-|coord| entry positive (ties: the
    # earliest such index decides)
    amax = np.argmax(np.abs(comp), axis=1)
    sign = np.sign(comp[np.arange(len(comp)), amax])
    sign[sign == 0] = 1.0
    return comp * sign[:, None]


def pca_transform(ds, components: np.ndarray, key: str = "vec_id",
                  col: str = "embedding"):
    """Project every vector onto the fitted components: components
    broadcast once, one matmul per batch, scores 6-dp pinned (row-
    independent float ops — identical on any layout once the
    components are identical). Output: key + pc0..pc{k-1}."""
    import pyarrow as pa
    import ray

    ref = ray.put(np.asarray(components, np.float64))

    class Project:
        def __init__(self):
            self.C = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            M = _emb_matrix(b[col]).astype(np.float64)
            S = np.floor(M @ self.C.T * 1e6 + 0.5) / 1e6
            cols = {key: b[key]}
            for i in range(self.C.shape[0]):
                cols[f"pc{i}"] = pa.array(S[:, i], pa.float64())
            return pa.table(cols)

    from zhtml_ray.stages.util import stateless_stage
    return ds.map_batches(stateless_stage(Project),
                          batch_format="pyarrow")


# ------------------------------------------------- product quantization ANN

def _kmeans_l2(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Plain-L2 seeded Lloyd for PQ sub-codebooks (the cosine `_kmeans`
    normalizes rows — subvectors must NOT be renormalized or the
    reconstruction y=Σ_j c_j no longer approximates the vector).
    Deterministic given x's row order (callers content-sort); empty
    cells keep their previous centroid. Shared by the distributed
    trainer and the serial pinned golden."""
    x = np.asarray(x, np.float64)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    for _ in range(iters):
        # argmin squared L2 via the expansion -2x·c + |c|² (|x|² is
        # row-constant); ties -> lowest centroid id (argmin rule)
        d = -2.0 * (x @ cent.T) + (cent * cent).sum(axis=1)
        a = d.argmin(axis=1)
        for c in range(len(cent)):
            sel = a == c
            if sel.any():
                cent[c] = x[sel].mean(axis=0)
    return cent.astype(np.float32)


def pq_fit(ds, m: int = 8, ks: int = 16, iters: int = 10,
           col: str = "embedding", seed: int = 42,
           driver_budget_rows: int = 65536) -> np.ndarray:
    """Train PQ sub-codebooks (Jégou, Douze & Schmid 2011, "Product
    Quantization for Nearest Neighbor Search"): split the normalized
    vector into ``m`` contiguous subspaces, k-means each with ``ks``
    centroids. Training runs on a DETERMINISTIC sample — full table
    content-sorted below ``driver_budget_rows`` (the gate mode, exactly
    replicated by the serial golden), content-hash sampled above (the
    scale mode: PQ codebooks are always sample-trained in practice;
    one corpus pass, sample bounded). Returns (m, ks, dim/m) float32."""
    n = ds.count()
    if n <= driver_budget_rows:
        arr = [_emb_matrix(b[col])
               for b in ds.iter_batches(batch_size=4096,
                                        batch_format="pyarrow")]
        x = np.concatenate(arr) if arr else np.zeros((0, 1), np.float32)
    else:
        x = _content_hash_sample(ds, col, target=driver_budget_rows,
                                 n=n, seed=seed)
    x = _normalize(_content_sorted(x))
    d = x.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, ks, dsub), np.float32)
    for j in range(m):
        books[j] = _kmeans_l2(x[:, j * dsub:(j + 1) * dsub], ks,
                              iters, seed + j)
    return books


def pq_encode_matrix(emb_n: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) normalized vectors → (n, m) uint8 codes: per subspace
    argmin squared L2 to the sub-codebook (ties → lowest code).
    Shared by the distributed encode map and the serial golden."""
    n = len(emb_n)
    m, ks, dsub = books.shape
    codes = np.empty((n, m), np.uint8)
    for j in range(m):
        sub = emb_n[:, j * dsub:(j + 1) * dsub].astype(np.float64)
        c = books[j].astype(np.float64)
        d2 = -2.0 * (sub @ c.T) + (c * c).sum(axis=1)
        codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
    return codes


def pq_encode(ds, books: np.ndarray, key: str = "vec_id",
              col: str = "embedding"):
    """Corpus → compressed at-rest code table (key, pq_code list<m
    uint8>): pure map, zero shuffles — the 8-byte-per-vector index
    that makes billion-scale ANN memory-feasible."""
    import ray

    from zhtml_ray.stages.util import stateless_stage

    bref = ray.put(np.asarray(books, np.float32))

    class Encode:
        def __init__(self):
            self.books = ray.get(bref)

        def __call__(self, b: pa.Table) -> pa.Table:
            emb = _normalize(_emb_matrix(b[col]))
            codes = pq_encode_matrix(emb, self.books)
            return pa.table({
                key: b[key],
                "pq_code": pa.array(list(codes), pa.list_(pa.uint8()))})

    return ds.map_batches(stateless_stage(Encode),
                          batch_format="pyarrow")


def pq_adc_scores(codes: np.ndarray, books: np.ndarray,
                  q: np.ndarray) -> np.ndarray:
    """Asymmetric-distance (ADC) approximate inner products: LUT[j,c] =
    q_sub_j · c_{j,c}, score = Σ_j LUT[j, code_j]. Returns (len(q),
    n) float64, 6-dp pinned (identical float ops on every engine, so
    the pin is stable)."""
    m, ks, dsub = books.shape
    nq = len(q)
    out = np.zeros((nq, len(codes)), np.float64)
    for j in range(m):
        lut = q[:, j * dsub:(j + 1) * dsub].astype(np.float64) \
            @ books[j].astype(np.float64).T   # (nq, ks)
        out += lut[:, codes[:, j]]
    return np.floor(out * 1e6 + 0.5) / 1e6


def pq_topk(codes_ds, query_vectors: np.ndarray, books: np.ndarray,
            k: int = 10, key: str = "vec_id"):
    """Approximate top-k over the compressed code table: queries +
    codebooks broadcast once, per-batch LUT scoring + tie-inclusive
    partial top-k (the BruteForceTopK convention: every row equal to
    the k-th pinned score survives the batch cut), tiny driver merge
    ordered by (score DESC, key ASC) on the 6-dp-pinned score."""
    import ray

    from zhtml_ray.stages.util import stateless_stage

    qref = ray.put(_normalize(np.asarray(query_vectors, np.float32))
                   .astype(np.float64))
    bref = ray.put(np.asarray(books, np.float32))

    class Score:
        def __init__(self):
            self.q = ray.get(qref)
            self.books = ray.get(bref)

        def __call__(self, b: pa.Table) -> pa.Table:
            cod = b["pq_code"].combine_chunks()
            codes = np.asarray(cod.values.to_numpy(zero_copy_only=False)
                               ).reshape(b.num_rows, self.books.shape[0])
            keys = np.asarray(b[key].to_pylist())
            sims = pq_adc_scores(codes, self.books, self.q)
            kk = min(k, sims.shape[1])
            qid_out, key_out, sim_out = [], [], []
            for qi in range(sims.shape[0]):
                row = sims[qi]
                kth = np.partition(-row, kk - 1)[kk - 1]
                cand = np.nonzero(-row <= kth)[0]
                order = np.lexsort((keys[cand], -row[cand]))
                for i in cand[order[:kk]]:
                    qid_out.append(qi)
                    key_out.append(keys[i])
                    sim_out.append(float(row[i]))
            return pa.table({
                "query_id": pa.array(qid_out, pa.int32()),
                key: pa.array(key_out),
                "score": pa.array(sim_out, pa.float64())})

    partials = codes_ds.map_batches(stateless_stage(Score),
                                    batch_format="pyarrow")
    pdf = partials.to_pandas()
    return (pdf.sort_values(["query_id", "score", key],
                            ascending=[True, False, True])
               .groupby("query_id", as_index=False).head(k)
               .reset_index(drop=True))


def pq_exact_scores(emb_n: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Exact cosine of normalized rows vs normalized float64 queries,
    6-dp pinned — the re-rank scoring kernel shared by the distributed
    path and the serial pinned golden."""
    s = q @ emb_n.astype(np.float64).T
    return np.floor(s * 1e6 + 0.5) / 1e6


def pq_rerank(shortlist: pd.DataFrame, emb_ds, query_vectors: np.ndarray,
              k: int = 10, key: str = "vec_id", col: str = "embedding"
              ) -> pd.DataFrame:
    """Exact re-rank of a PQ ADC shortlist (the standard two-stage ANN
    design: cheap 8-byte-code scan selects R candidates per query, then
    true cosine on just those R vectors). The candidate gather is a
    distributed ``pc.is_in`` prune over the embedding table — only the
    ≤ n_queries×R matching rows ever reach the driver, so the gather is
    bounded regardless of corpus size. Scoring/sort order is the shared
    pinned kernel (score DESC, key ASC)."""
    import pyarrow.compute as pc

    q = _normalize(np.asarray(query_vectors, np.float32)).astype(np.float64)
    wanted = pa.array(sorted(set(shortlist[key].tolist())), pa.int64())

    def keep(b: pa.Table) -> pa.Table:
        return b.select([key, col]).filter(pc.is_in(b[key], wanted))

    parts = [b for b in emb_ds.map_batches(keep, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow")
             if b.num_rows]
    cand = (pa.concat_tables(parts) if parts
            else pa.table({key: pa.array([], pa.int64()),
                           col: pa.array([], pa.list_(pa.float32()))}))
    # arrival order through the map is schedule-dependent — key-sort
    cand = cand.sort_by(key)
    keys = np.asarray(cand[key].to_pylist(), np.int64)
    emb_n = _normalize(_emb_matrix(cand[col])) if cand.num_rows else \
        np.zeros((0, q.shape[1]), np.float32)
    sims = pq_exact_scores(emb_n, q)
    by_q = shortlist.groupby("query_id")[key].agg(set)
    qid_out, key_out, sim_out = [], [], []
    for qi in sorted(by_q.index):
        sel = np.fromiter((kk in by_q[qi] for kk in keys), bool,
                          count=len(keys))
        ks_, row = keys[sel], sims[qi][sel]
        order = np.lexsort((ks_, -row))[:k]  # score DESC, key ASC
        qid_out.extend([int(qi)] * len(order))
        key_out.extend(ks_[order].tolist())
        sim_out.extend(row[order].tolist())
    return pd.DataFrame({"query_id": np.asarray(qid_out, np.int32),
                         key: np.asarray(key_out, np.int64),
                         "score": np.asarray(sim_out, np.float64)})
