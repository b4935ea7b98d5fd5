"""functions/inference.py — the formalized actor-pool model-scoring
stage (r5, VERDICT #5): load-once model resolution from all three
source forms, chunk-size invariance, layer validation, and an sf0.1
end-to-end run over the driver embeddings table."""

import numpy as np
import pyarrow as pa
import pytest


def _fixture_layers(dim=8, hidden=3):
    w1 = np.array([[((i * 7 + j * 13) % 19 - 9) / 10.0
                    for j in range(hidden)] for i in range(dim)])
    b1 = np.array([(j - 1.5) / 10.0 for j in range(hidden)])
    w2 = np.array([[2.0], [-1.0], [1.0]])
    b2 = np.array([0.05])
    return [(w1, b1), (w2, b2)]


def _emb_table(n=50, dim=8, seed=0):
    rng = np.random.RandomState(seed)
    m = np.round(rng.standard_normal((n, dim)), 3).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([r for r in m], pa.list_(pa.float32()))})


def test_model_sources_agree(ray_session, tmp_path):
    """Layer-list, ray.put ObjectRef, and .npz-path model sources must
    resolve to the same weights and produce identical scores."""
    import ray

    from zhtml_ray.functions.inference import (ModelScoreStage,
                                               save_model_npz)

    layers = _fixture_layers()
    npz = str(tmp_path / "model.npz")
    save_model_npz(npz, layers)
    batch = _emb_table()
    outs = []
    for src in (layers, ray.put(layers), npz):
        st = ModelScoreStage(model=src, threshold=0.0)
        outs.append(st(batch))
    assert outs[0].equals(outs[1]) and outs[0].equals(outs[2])
    assert set(outs[0].schema.names) == {"vec_id", "score", "keep"}
    # keep is the thresholded pinned score
    s = outs[0]["score"].to_numpy()
    assert outs[0]["keep"].to_pylist() == (s > 0.0).tolist()


def test_chunked_forward_is_chunk_size_invariant(ray_session):
    """chunk_rows bounds peak memory only — scores must be
    bit-identical at any chunking (pin-then-derive makes each row's
    forward independent of its neighbors)."""
    from zhtml_ray.functions.inference import ModelScoreStage

    batch = _emb_table(101)
    ref = ModelScoreStage(model=_fixture_layers(), chunk_rows=10_000)(batch)
    for cr in (1, 7, 101):
        got = ModelScoreStage(model=_fixture_layers(), chunk_rows=cr)(batch)
        assert got.equals(ref), cr


def test_model_validation_fails_loudly():
    from zhtml_ray.functions.inference import load_model

    w1 = np.zeros((8, 3))
    with pytest.raises(ValueError, match="b \\(d_out,\\)"):
        load_model([(w1, np.zeros(4))])
    with pytest.raises(ValueError, match="d_in 5 != previous d_out 3"):
        load_model([(w1, np.zeros(3)), (np.zeros((5, 1)), np.zeros(1))])


def test_multi_output_model_columns(ray_session):
    """A model whose last layer has k outputs emits score_0..score_k-1
    (the multi-label classifier shape)."""
    from zhtml_ray.functions.inference import ModelScoreStage

    layers = [(np.eye(8)[:, :2] * 2.0, np.array([0.25, -0.25]))]
    out = ModelScoreStage(model=layers)(_emb_table(10))
    assert set(out.schema.names) == {"vec_id", "score_0", "score_1"}


def test_score_embeddings_sf01_e2e(ray_session):
    """End-to-end at sf0.1 over the driver embeddings parquet: the
    actor-pool stage scores every row, agrees with a driver-side
    numpy forward, and keeps a real (non-constant) subset."""
    import ray
    import ray.data as rd

    from zhtml_ray.functions.inference import score_embeddings
    from zhtml_ray.functions.similarity import _emb_matrix
    from zhtml_ray.pipelines.ops_queries import _mlp_weights

    sf_dir = "/root/testdata/sf0.1"
    w1, b1, w2, b2 = _mlp_weights()
    model = [(np.asarray(w1), np.asarray(b1)),
             (np.asarray(w2), np.asarray(b2))]
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = score_embeddings(ds, ray.put(model), threshold=0.0,
                           concurrency=2).take_all()
    assert len(out) == ds.count()
    got = {r["vec_id"]: (r["score"], r["keep"]) for r in out}
    # serial reference forward with the same pinning
    t = pa.concat_tables(ds.to_arrow_refs() and
                         [ray.get(r) for r in ds.to_arrow_refs()])
    m = _emb_matrix(t["embedding"]).astype(np.float64)
    h = np.floor(np.maximum(m @ w1 + b1, 0.0) * 1e6 + 0.5) / 1e6
    lg = np.floor((h @ w2 + b2) * 1e6 + 0.5) / 1e6
    for vid, ref in zip(t["vec_id"].to_pylist(), lg[:, 0]):
        assert got[vid] == (ref, ref > 0.0)
    kept = sum(1 for s, k in got.values() if k)
    assert 0 < kept < len(got)
