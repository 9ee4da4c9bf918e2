"""Training-data operator tests: text analysis, dedup family, similarity
search, multimodal plumbing — against the driver testdata + crafted
duplicates."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(ray_session):
    import ray.data
    return ray.data.read_parquet(f"{SF}/documents.parquet")


def test_token_count_matches_oracle(docs):
    from raystack.ops.text import add_token_count
    got = add_token_count(docs).to_pandas()
    exp = got["text"].str.findall(r"\S+").str.len()
    assert (got["n_tokens"] == exp).all()


def test_char_stats(docs):
    from raystack.ops.text import add_char_stats
    got = add_char_stats(docs).to_pandas()
    assert (got["n_chars_actual"] == got["text"].str.len()).all()
    assert (got["n_spaces"] == got["text"].str.count(" ")).all()


def test_quality_and_langid(docs):
    from raystack.ops.text import add_quality_score, add_language_id
    q = add_quality_score(docs).to_pandas()
    assert q["quality"].between(0, 1).all()
    lid = add_language_id(docs, concurrency=2).to_pandas()
    assert set(lid["lang_pred"]) <= set(
        ["en", "de", "fr", "es", "pt", "it", "nl", "und"])
    # the testdata text is english-ish vocabulary
    assert (lid["lang_pred"] == "en").mean() > 0.5


def test_fingerprint_content_sensitive(ray_session):
    import ray.data
    from raystack.ops.text import add_fingerprint
    t = pa.table({"text": ["hello world", "hello world", "hello worle",
                           "", "x"]})
    got = add_fingerprint(ray.data.from_arrow(t)).to_pandas()
    fp = got["fingerprint"].tolist()
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
    assert len({fp[3], fp[4], fp[0]}) == 3


def test_exact_dedup(ray_session):
    import ray.data
    from raystack.ops.dedup import exact_dedup
    t = pa.table({"doc_id": [5, 1, 2, 3, 4],
                  "text": ["a", "a", "b", "b", "c"]})
    got = exact_dedup(ray.data.from_arrow(t), "text", "doc_id").to_pandas()
    got = got.sort_values("text").reset_index(drop=True)
    assert got["doc_id"].tolist() == [1, 2, 4]


def test_minhash_dedup_finds_near_dups(ray_session):
    import ray.data
    from raystack.ops.dedup import minhash_lsh_dedup
    base = ("the quick brown fox jumps over the lazy dog and keeps running "
            "through the quiet green forest while birds sing softly") * 3
    near = base.replace("quiet", "silent")
    texts = [base, near, "completely different tiny text", base + " extra tail words here"]
    t = pa.table({"doc_id": [10, 11, 12, 13], "text": texts})
    got = minhash_lsh_dedup(ray.data.from_arrow(t), sim_threshold=0.5).to_pandas()
    flagged = set(got["doc_id"])
    assert 11 in flagged or 13 in flagged  # near-dups detected
    assert 12 not in flagged               # distinct doc untouched


def test_simhash_near_vs_far(ray_session):
    import ray.data
    from raystack.ops.dedup import simhash
    base = "the quick brown fox jumps over the lazy dog " * 5
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": [base, base, "zzz completely other content qqq"]})
    got = simhash(ray.data.from_arrow(t), "text", "doc_id").to_pandas()
    s = dict(zip(got["doc_id"], got["simhash"]))
    assert s[1] == s[2]
    d = bin(int(np.uint64(s[1]) ^ np.uint64(s[3]))).count("1")
    assert d > 4  # far docs differ in many bits


def test_embedding_near_dup(ray_session):
    import ray.data
    from raystack.ops.dedup import embedding_near_dup
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    vecs = [base, base + 1e-4 * rng.standard_normal(16),
            rng.standard_normal(16), -base]
    t = pa.table({"vec_id": [0, 1, 2, 3],
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        type=pa.list_(pa.float32()))})
    got = embedding_near_dup(ray.data.from_arrow(t), threshold=0.99).to_pandas()
    assert got["vec_id"].tolist() == [1] and got["dup_of"].tolist() == [0]


def test_ann_topk_matches_bruteforce(ray_session):
    import ray.data
    from raystack.ops.similarity import ann_topk
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    df = emb.to_pandas()
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    qids = df["vec_id"].to_numpy()[:3]
    qm = m[:3]
    got = ann_topk(emb, qm, qids, k=5).to_pandas()
    for qi, qid in enumerate(qids):
        sims = m @ qm[qi]
        order = np.argsort(-sims, kind="stable")
        exp = [int(df["vec_id"][j]) for j in order if df["vec_id"][j] != qid][:5]
        g = got[got["query_id"] == qid].sort_values("rank")
        assert g["neighbor_id"].tolist() == exp, qid


def test_ivf_topk_reasonable_recall(ray_session):
    import ray.data
    from raystack.ops.similarity import ann_topk, ivf_topk
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    df = emb.to_pandas()
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    qids = df["vec_id"].to_numpy()[:3]
    exact = ann_topk(emb, m[:3], qids, k=10).to_pandas()
    approx = ivf_topk(emb, m[:3], qids, k=10, n_centroids=8, n_probe=4).to_pandas()
    inter = 0
    for qid in qids:
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        inter += len(e & a) / len(e)
    assert inter / len(qids) >= 0.5  # probing 4/8 buckets → decent recall


def test_multimodal_plumbing(ray_session):
    import ray.data
    from raystack.ops.multimodal import (MEDIA_SCHEMA, extract_image_features,
                                         frame_sample_stub)
    rng = np.random.default_rng(5)
    t = pa.table({
        "media_id": pa.array(range(10), pa.int64()),
        "payload": pa.array([rng.integers(0, 256, 2000, dtype=np.uint8).tobytes()
                             for _ in range(10)], pa.large_binary()),
        "mime": pa.array(["image/png"] * 10),
        "meta": pa.array(["{}"] * 10),
    }, schema=MEDIA_SCHEMA)
    ds = ray.data.from_arrow(t)
    feats = extract_image_features(ds, concurrency=2).to_pandas()
    assert len(feats) == 10
    assert all(len(f) == 16 for f in feats["features"])
    assert np.allclose([sum(f) for f in feats["features"]], 1.0)
    frames = frame_sample_stub(ds).to_pandas()
    assert len(frames) >= 10 and {"media_id", "frame_idx", "frame"} <= set(frames)


def test_real_decode_true_dims_and_pixel_histogram(ray_session):
    """use_real_decode=True routes payloads through the shared
    magic-byte sniffer: a real image yields TRUE dims + a pixel-value
    histogram; an unrecognized payload falls back per-row to the
    byte-histogram/fake-dims tier with the same schema."""
    import numpy as np
    import ray.data

    from raystack.ops.multimodal import extract_image_features
    from raystack.ops.vp8l import encode_vp8l
    img = np.zeros((6, 9, 4), np.uint8)  # all-zero pixels → bin 0 == 1.0
    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([encode_vp8l(img), b"not-an-image"],
                                      pa.large_binary()),
                  "mime": ["image/webp", "application/octet-stream"],
                  "meta": ["{}", "{}"]})
    ds = ray.data.from_arrow(t)
    out = extract_image_features(ds, concurrency=1,
                                 use_real_decode=True).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert (int(out.loc[0, "width"]), int(out.loc[0, "height"]),
            int(out.loc[0, "channels"])) == (9, 6, 4)
    f0 = out.loc[0, "features"]
    assert abs(f0[0] - 1.0) < 1e-12 and sum(f0[1:]) < 1e-12
    # fallback row: deterministic fake dims from payload length
    from raystack.ops.multimodal import _fake_decode_shape
    w, h, c = _fake_decode_shape(np.array([len(b"not-an-image")]))
    assert (int(out.loc[1, "width"]), int(out.loc[1, "height"])) == \
        (int(w[0]), int(h[0]))


def test_tumbling_window(ray_session):
    import ray.data
    from raystack.ops.window import tumbling_window_agg
    t = pa.table({
        "k": ["a", "a", "a", "b"],
        "ts": pa.array([0, 30_000_000, 90_000_000, 10_000_000],
                       type=pa.int64()).cast(pa.timestamp("us")),
    })
    got = tumbling_window_agg(ray.data.from_arrow(t), "ts", "k",
                              window_sec=60).to_pandas()
    got = got.sort_values(["k", "window_start"]).reset_index(drop=True)
    assert got["n_events"].tolist() == [2, 1, 1]
    assert got.loc[0, "min_ts"] == pd.Timestamp(0)


def test_broadcast_and_semi_join(ray_session):
    import ray.data
    from raystack.ops.join import anti_join, broadcast_join, semi_join
    big = ray.data.from_arrow(pa.table({"k": [1, 2, 3, 4], "v": list("wxyz")}))
    small = pd.DataFrame({"k": [2, 4], "name": ["two", "four"]})
    j = broadcast_join(big, small, on="k").to_pandas().sort_values("k")
    assert j["name"].tolist() == ["two", "four"]
    s = semi_join(big, [1, 3], on="k").to_pandas()
    assert sorted(s["k"]) == [1, 3]
    a = anti_join(big, [1, 3], on="k").to_pandas()
    assert sorted(a["k"]) == [2, 4]


def test_sessionize(ray_session):
    import ray.data
    from raystack.ops.window import sessionize
    t = pa.table({
        "user": [1, 1, 1, 2],
        "eid": [10, 11, 12, 20],
        "ts": pa.array([0, 60_000_000, 4_000_000_000, 5],
                       type=pa.int64()).cast(pa.timestamp("us")),
    })
    got = sessionize(ray.data.from_arrow(t), "ts", "user", "eid",
                     gap_sec=1800).to_pandas().sort_values("eid")
    assert got["session_id"].tolist() == [1, 1, 2, 1]


def test_sessionize_bucketed_matches_plain(ray_session):
    # the hot-key-safe two-phase variant must produce exactly the plain
    # groupby(key) session ids, including sessions spanning bucket
    # boundaries and sessions separated by several empty buckets
    import ray.data
    from raystack.ops.window import sessionize, sessionize_bucketed
    rng = np.random.default_rng(11)
    n = 400
    users = rng.integers(1, 6, n)
    # bursty: clustered arrivals with occasional >gap jumps
    steps = rng.choice([1_000_000, 5_000_000, 40_000_000, 400_000_000],
                       size=n, p=[0.6, 0.25, 0.1, 0.05])
    ts = np.cumsum(steps)
    t = pa.table({
        "user": pa.array(users, pa.int64()),
        "eid": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(t)
    want = sessionize(ds, "ts", "user", "eid", gap_sec=30,
                      plain=True).to_pandas() \
        .sort_values("eid").reset_index(drop=True)
    # bucket_sec=60 with gap=30 forces many cross-bucket merges
    got = sessionize_bucketed(ds, "ts", "user", "eid", gap_sec=30,
                              bucket_sec=60).to_pandas() \
        .sort_values("eid").reset_index(drop=True)
    assert got.equals(want)


def test_sessionize_bucketed_join_path(ray_session, monkeypatch):
    # forcing the base table over the broadcast limit exercises the
    # distributed join apply path
    import ray.data
    from raystack.ops import dedup
    from raystack.ops.window import sessionize, sessionize_bucketed
    t = pa.table({
        "user": [1, 1, 1, 2],
        "eid": [10, 11, 12, 20],
        "ts": pa.array([0, 60_000_000, 4_000_000_000, 5],
                       type=pa.int64()).cast(pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(t)
    want = sessionize(ds, "ts", "user", "eid", gap_sec=1800,
                      plain=True).to_pandas() \
        .sort_values("eid").reset_index(drop=True)
    monkeypatch.setattr(dedup, "_BROADCAST_LIMIT", 0)
    got = sessionize_bucketed(ds, "ts", "user", "eid", gap_sec=1800,
                              bucket_sec=600).to_pandas() \
        .sort_values("eid").reset_index(drop=True)
    assert got[["eid", "user", "session_id"]].equals(
        want[["eid", "user", "session_id"]])


def test_list_column_roundtrip(ray_session):
    from raystack.codecs import decode_blob
    from raystack.select import encode_auto
    arr = pa.array([[1.0, 2.0], None, [], [3.5]], type=pa.list_(pa.float32()))
    chunk = encode_auto(arr, "emb", 0)
    assert decode_blob(chunk.to_bytes()).equals(arr)


def test_column_stats(ray_session, docs):
    from raystack.ops.colstats import column_stats
    got = column_stats(docs).to_pandas().set_index("column")
    assert got.loc["doc_id", "n_rows"] == 500
    assert got.loc["doc_id", "n_valid"] == 500
    assert got.loc["doc_id", "min_v"] == "0" and got.loc["doc_id", "max_v"] == "499"
    # exact below k: 5 distinct langs
    assert got.loc["lang", "distinct_est"] == 5
    # estimate within 15% for 500 distinct texts (KMV k=256)
    est = got.loc["text", "distinct_est"]
    assert 0.8 * 500 <= est <= 1.25 * 500, est


def test_kmv_merge_accuracy(ray_session):
    import ray.data
    from raystack.ops.colstats import column_stats
    t = pa.table({"v": pa.array([f"val-{i % 3000}" for i in range(20000)])})
    # many blocks → sketch must merge across partials
    ds = ray.data.from_arrow(t).repartition(8)
    got = column_stats(ds, columns=["v"]).to_pandas()
    est = got["distinct_est"].iloc[0]
    assert 0.75 * 3000 <= est <= 1.3 * 3000, est


def test_exact_dedup_by_hash(ray_session):
    import ray.data
    from raystack.ops.dedup import exact_dedup_by_hash
    t = pa.table({"doc_id": [5, 1, 2, 3, 4],
                  "text": ["aaaa aaaa", "aaaa aaaa", "bbbb bbbb",
                           "bbbb bbbb", "cc"]})
    kept = exact_dedup_by_hash(ray.data.from_arrow(t), "text", "doc_id"
                               ).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 2, 4]


def test_verify_pairs_jaccard(ray_session):
    import ray.data
    from raystack.ops.dedup import minhash_lsh_dedup, verify_pairs_jaccard
    base = ("the quick brown fox jumps over the lazy dog and keeps on "
            "running through the quiet green forest while birds sing") * 3
    near = base.replace("quiet", "silent")
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": [base, near, "totally unrelated short stuff"]})
    ds = ray.data.from_arrow(t)
    pairs = minhash_lsh_dedup(ds, sim_threshold=0.4).to_pandas()
    assert len(pairs) >= 1
    verified = verify_pairs_jaccard(ds, pairs, threshold=0.7)
    assert set(verified["doc_id"]) <= {2}
    assert (verified["jaccard"] > 0.7).all()
    # a strict threshold rejects everything
    none = verify_pairs_jaccard(ds, pairs, threshold=0.999)
    assert len(none) == 0


def test_resolve_clusters_and_dedup_corpus(ray_session):
    import ray.data
    from raystack.ops.dedup import dedup_corpus, resolve_clusters
    pairs = pd.DataFrame({"doc_id": [2, 3, 5], "dup_of": [1, 2, 4]})
    cl = resolve_clusters(pairs).set_index("doc_id")["keep_id"]
    assert cl[3] == 1 and cl[2] == 1 and cl[5] == 4  # transitive 3->2->1
    base = ("many shared words build a long duplicated paragraph here that "
            "goes on and on with plenty of shingles to hash") * 3
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": [base, base + " tail", "something else entirely ok"]})
    ds = ray.data.from_arrow(t)
    filtered, clusters = dedup_corpus(ds, sim_threshold=0.5)
    kept = sorted(filtered.to_pandas()["doc_id"])
    assert 1 in kept and 3 in kept and 2 not in kept


def test_propagate_labels(ray_session):
    import ray.data
    from raystack.ops.dedup import propagate_labels
    pairs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([2, 3, 5], pa.int64()),
        "dup_of": pa.array([1, 2, 4], pa.int64())}))
    labels = propagate_labels(pairs).to_pandas().set_index("node")["label"]
    assert labels[3] == 1 and labels[2] == 1 and labels[1] == 1
    assert labels[5] == 4 and labels[4] == 4


def test_short_doc_fingerprints_distinct(ray_session):
    # ADVICE r1: docs shorter than the 8-byte window used to fingerprint by
    # length only ('cat' and 'dog' collided) — tail hash now folds content in
    import ray.data
    from raystack.ops.text import add_fingerprint
    t = pa.table({"text": ["cat", "dog", "cat", "", "a", "b"]})
    fp = add_fingerprint(ray.data.from_arrow(t)).to_pandas()["fingerprint"]
    assert fp[0] != fp[1]          # distinct short docs differ
    assert fp[0] == fp[2]          # identical short docs agree
    assert len({fp[3], fp[4], fp[5]}) == 3


def test_short_doc_minhash_not_sentinel(ray_session):
    # ADVICE r1: all sub-8-byte docs shared the all-MAXU64 sentinel signature
    import ray.data
    from raystack.ops.dedup import minhash_signatures, minhash_lsh_dedup
    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["cat", "dog", "cat", "mouse"]})
    sigs = minhash_signatures(ray.data.from_arrow(t)).to_pandas()
    s = {r.doc_id: tuple(r.sig) for r in sigs.itertuples()}
    assert s[1] != s[2]      # cat vs dog differ
    assert s[1] == s[3]      # identical short docs agree exactly
    assert s[2] != s[4]
    pairs = minhash_lsh_dedup(ray.data.from_arrow(t)).to_pandas()
    # only the true duplicate pair (3 dup of 1) may appear
    assert set(pairs["doc_id"]) <= {3}


def test_ivf_trained_centroids(ray_session):
    # VERDICT r1 #8: centroids are now trained (spherical k-means on a
    # sample), not random; full probe must equal brute force exactly
    import ray.data
    from raystack.ops.similarity import ann_topk, ivf_topk, train_centroids
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    df = emb.to_pandas()
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    qids = df["vec_id"].to_numpy()[:5]
    qm = m[:5]
    exact = ann_topk(emb, qm, qids, k=10).to_pandas()
    cent = train_centroids(m[:256], 16)

    def recall(approx):
        return np.mean([
            len(set(exact[exact.query_id == q].neighbor_id)
                & set(approx[approx.query_id == q].neighbor_id)) / 10
            for q in qids])

    trained = ivf_topk(emb, qm, qids, k=10, centroids=cent, n_probe=4)
    rnd = ivf_topk(emb, qm, qids, k=10, n_centroids=16, n_probe=4)
    assert recall(trained.to_pandas()) > recall(rnd.to_pandas())
    # full probe ⇒ exact (the oracle-checked configuration)
    full = ivf_topk(emb, qm, qids, k=10, centroids=cent,
                    n_probe=16).to_pandas()
    assert full.sort_values(["query_id", "rank"]).reset_index(drop=True).equals(
        exact.sort_values(["query_id", "rank"]).reset_index(drop=True))


def test_minhash_join_path_matches_broadcast(ray_session, monkeypatch):
    # the distributed hash-join candidate filter (taken when the hot-key
    # set exceeds the broadcast limit) must agree with the broadcast path
    import ray.data
    from raystack.ops import dedup
    base = ("shared words build a long duplicated paragraph that goes on "
            "with plenty of shingles to hash repeatedly ") * 3
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": [base, base + " tail", "something else wholly"]})
    ds = ray.data.from_arrow(t)
    want = dedup.minhash_lsh_dedup(ds, sim_threshold=0.5).to_pandas()
    # _DRIVER_COUNT_ROWS=0 forces the distributed count pass and
    # _BROADCAST_LIMIT=0 forces the hash-join candidate filter
    monkeypatch.setattr(dedup, "_DRIVER_COUNT_ROWS", 0)
    monkeypatch.setattr(dedup, "_BROADCAST_LIMIT", 0)
    got = dedup.minhash_lsh_dedup(ds, sim_threshold=0.5).to_pandas()
    assert got.sort_values("doc_id").reset_index(drop=True).equals(
        want.sort_values("doc_id").reset_index(drop=True))


def test_minhash_distributed_count_matches_driver_count(ray_session,
                                                        monkeypatch):
    # the distributed count pass (taken when the exploded row count
    # exceeds _DRIVER_COUNT_ROWS) must agree with the driver-side count
    import ray.data
    from raystack.ops import dedup
    base = ("shared words build a long duplicated paragraph that goes on "
            "with plenty of shingles to hash repeatedly ") * 3
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": [base, base + " tail", "something else wholly"]})
    ds = ray.data.from_arrow(t)
    want = dedup.minhash_lsh_dedup(ds, sim_threshold=0.5).to_pandas()
    monkeypatch.setattr(dedup, "_DRIVER_COUNT_ROWS", 0)
    got = dedup.minhash_lsh_dedup(ds, sim_threshold=0.5).to_pandas()
    assert got.sort_values("doc_id").reset_index(drop=True).equals(
        want.sort_values("doc_id").reset_index(drop=True))


def test_simhash_join_path_matches_broadcast(ray_session, monkeypatch):
    # same gate as minhash: forcing the distributed-join branch must not
    # change the verdicts
    import ray.data
    from raystack.ops import dedup
    base = ("identical content repeated for the simhash prefix bucket "
            "and the full hash equality check too ") * 3
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": [base, base, "different text wholly here"]})
    ds = ray.data.from_arrow(t)
    want = dedup.simhash_dedup(ds).to_pandas()
    monkeypatch.setattr(dedup, "_BROADCAST_LIMIT", 0)
    got = dedup.simhash_dedup(ds).to_pandas()
    assert got.sort_values("doc_id").reset_index(drop=True).equals(
        want.sort_values("doc_id").reset_index(drop=True))


def test_curate_distributed_drop_filter(ray_session, monkeypatch):
    # forcing the drop lists over the broadcast limit must route them
    # through the distributed anti-join and keep the result identical
    import ray.data
    from raystack import curate
    from raystack.ops import dedup
    base = ("many common words build one long paragraph that keeps going "
            "with lots of shingles to hash and match again ") * 3
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": [base, base + " tail", base, base,
                           "completely different words assembled into a "
                           "decent paragraph of reasonable length " * 3]})
    ds = ray.data.from_arrow(t)
    want = curate.curate_corpus(ds, quality_threshold=0.45,
                                sim_threshold=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(dedup, "_BROADCAST_LIMIT", 0)
    got = curate.curate_corpus(ds, quality_threshold=0.45,
                               sim_threshold=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)
    assert got["doc_id"].tolist() == [0, 4]


def test_range_join_empty_ranges(ray_session):
    # zero intervals: inner matches nothing, left keeps rows null-filled
    # (regression: indexing the empty hi array raised IndexError)
    import ray.data
    from raystack.ops.join import range_join
    ds = ray.data.from_arrow(pa.table({"id": [1, 2], "v": [1.0, 7.0]}))
    bands = pd.DataFrame({"lo": pd.Series(dtype=float),
                          "hi": pd.Series(dtype=float),
                          "band": pd.Series(dtype=str)})
    inner = range_join(ds, bands, value_col="v").to_pandas()
    assert len(inner) == 0
    left = range_join(ds, bands, value_col="v", how="left").to_pandas()
    assert len(left) == 2 and left["band"].isna().all()


def test_minhash_slim_shuffle_matches_default(ray_session):
    # slim_shuffle re-explodes with signatures only for candidate rows —
    # results must equal the default (sig-carrying) path
    import ray.data
    from raystack.ops.dedup import minhash_lsh_dedup
    base = ("many common words build one long duplicated paragraph that "
            "keeps going with lots of shingles to hash ") * 3
    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": [base, base + " tail", "other text entirely here",
                           base.replace("common", "shared")]})
    ds = ray.data.from_arrow(t)
    a = minhash_lsh_dedup(ds, sim_threshold=0.5).to_pandas()
    b = minhash_lsh_dedup(ds, sim_threshold=0.5, slim_shuffle=True).to_pandas()
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True))


def test_asof_join_bucketed_matches_plain(ray_session):
    # the hot-key-safe carry-in variant must reproduce asof_join exactly,
    # including matches that reach across several empty buckets
    import ray.data
    from raystack.ops.join import asof_join, asof_join_bucketed
    rng = np.random.default_rng(3)
    n_l, n_r = 300, 80
    lt = pa.table({
        "k": pa.array(rng.integers(1, 5, n_l), pa.int64()),
        "lid": pa.array(np.arange(n_l), pa.int64()),
        "ts": pa.array(np.sort(rng.integers(0, 3_000_000_000, n_l)),
                       pa.int64()).cast(pa.timestamp("us")),
    })
    rt = pa.table({
        "k": pa.array(rng.integers(1, 5, n_r), pa.int64()),
        "ts": pa.array(np.sort(rng.choice(3_000_000_000, n_r,
                                          replace=False)),
                       pa.int64()).cast(pa.timestamp("us")),
        "price": pa.array(rng.normal(size=n_r)),
    })
    lds, rds = ray.data.from_arrow(lt), ray.data.from_arrow(rt)
    want = asof_join(lds, rds, key="k", ts="ts",
                     plain=True).to_pandas() \
        .sort_values("lid").reset_index(drop=True)
    # bucket_sec=60 over a ~3000s span → ~50 buckets, many carry-ins
    got = asof_join_bucketed(lds, rds, key="k", ts="ts",
                             bucket_sec=60).to_pandas() \
        .sort_values("lid").reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    for c in want.columns:
        assert got[c].equals(want[c]), c


def test_asof_join_matches_pandas(ray_session):
    # unmatched lefts keep nulls; ties (ts equal) match; multiple rights
    # pick the greatest ts <= left ts
    import ray.data
    from raystack.ops.join import asof_join
    left = pa.table({
        "k": [1, 1, 1, 2, 2, 3],
        "t": [10, 20, 30, 5, 50, 7],
        "lv": ["a", "b", "c", "d", "e", "f"]})
    right = pa.table({
        "k": [1, 1, 2, 4],
        "t": [15, 25, 50, 1],
        "rv": [100, 200, 300, 400]})
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    key="k", ts="t", right_cols=["rv"]).to_pandas()
    out = out.sort_values(["k", "t"]).reset_index(drop=True)
    want = {
        "lv":  ["a", "b", "c", "d", "e", "f"],
        "t_r": [None, 15, 25, None, 50, None],
        "rv":  [None, 100, 200, None, 300, None]}
    assert out["lv"].tolist() == want["lv"]
    for col in ["t_r", "rv"]:  # nullable ints surface as float64 + NaN
        got_vals = [None if pd.isna(v) else int(v) for v in out[col]]
        assert got_vals == want[col], col


def test_asof_join_name_collision_suffix(ray_session):
    import ray.data
    from raystack.ops.join import asof_join
    left = pa.table({"k": [1], "t": [10], "value": [1.0]})
    right = pa.table({"k": [1], "t": [5], "value": [9.0]})
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    key="k", ts="t").to_pandas()
    assert sorted(out.columns) == ["k", "t", "t_r", "value", "value_r"]
    assert out["value_r"].iloc[0] == 9.0


def test_range_join_left_and_validation(ray_session):
    import ray.data
    from raystack.ops.join import range_join
    ds = ray.data.from_arrow(pa.table({"id": [1, 2, 3], "v": [1.0, 7.0, 99.0]}))
    bands = pd.DataFrame({"lo": [0.0, 5.0], "hi": [5.0, 10.0],
                          "band": ["a", "b"]})
    inner = range_join(ds, bands, value_col="v").to_pandas()
    assert sorted(inner["id"]) == [1, 2]
    left = range_join(ds, bands, value_col="v", how="left").to_pandas() \
        .sort_values("id")
    assert left["band"].tolist()[:2] == ["a", "b"] and pd.isna(
        left["band"].iloc[2])
    with pytest.raises(ValueError, match="non-overlapping"):
        range_join(ds, pd.DataFrame({"lo": [0.0, 3.0], "hi": [5.0, 8.0],
                                     "band": ["x", "y"]}), value_col="v")


def test_assign_clusters_partitions_all_rows(ray_session):
    import ray.data
    from raystack.ops.similarity import assign_clusters, train_centroids
    rng = np.random.default_rng(5)
    # two well-separated blobs -> assignments must recover them
    a = rng.normal(loc=(5, 0, 0, 0), scale=0.1, size=(40, 4))
    b = rng.normal(loc=(0, 5, 0, 0), scale=0.1, size=(40, 4))
    vecs = np.vstack([a, b])
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(80), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64()))}))
    cent = train_centroids(vecs, n_centroids=2)
    out = assign_clusters(ds, cent).to_pandas().sort_values("vec_id")
    first, second = out["cluster"][:40], out["cluster"][40:]
    assert first.nunique() == 1 and second.nunique() == 1
    assert first.iloc[0] != second.iloc[0]


def test_hash_split_deterministic_fraction(ray_session):
    import ray.data
    from raystack.ops.text import hash_split
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(range(20000),
                                                          pa.int64())}))
    a = hash_split(ds, fraction=0.1).to_pandas()
    b = hash_split(ds, fraction=0.1).to_pandas()
    assert a.equals(b)                      # retry-stable
    frac = a["holdout"].mean()
    assert 0.08 < frac < 0.12               # ~10% held out
    # different salt -> a different (still deterministic) split
    c = hash_split(ds, fraction=0.1, salt=7).to_pandas()
    assert not a["holdout"].equals(c["holdout"])


def test_hopping_window_agrees_with_tumbling_when_hop_equals_window(ray_session):
    import ray.data
    from raystack.ops.window import hopping_window_agg, tumbling_window_agg
    ts = pd.to_datetime([1_000_000 * t for t in
                         [10, 70, 130, 190, 610, 1210]], unit="us")
    t = pa.table({"k": ["a"] * 6, "ts": pa.array(ts)})
    ds = ray.data.from_arrow(t)
    hop = hopping_window_agg(ds, "ts", "k", window_sec=600,
                             hop_sec=600).to_pandas()
    tum = tumbling_window_agg(ds, "ts", "k", window_sec=600).to_pandas()
    key = ["k", "window_start"]
    assert hop.sort_values(key).reset_index(drop=True).equals(
        tum[hop.columns].sort_values(key).reset_index(drop=True))
    # overlapping case: every event appears in window_sec/hop_sec windows
    h2 = hopping_window_agg(ds, "ts", "k", window_sec=600,
                            hop_sec=300).to_pandas()
    assert h2["n_events"].sum() == 12  # 6 events x 2 windows
    with pytest.raises(ValueError):
        hopping_window_agg(ds, "ts", "k", window_sec=600, hop_sec=250)


def test_value_quantiles_exact(ray_session):
    import ray.data
    from raystack.ops.colstats import value_quantiles
    vals = [float(v) for v in range(1, 101)]  # 1..100
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)}))
    out = value_quantiles(ds, "v", quantiles=(0.5, 0.9, 0.99))
    got = dict(zip(out["quantile"], out["value"]))
    assert got == {0.5: 50.0, 0.9: 90.0, 0.99: 99.0}
    with pytest.raises(ValueError, match="distinct"):
        value_quantiles(ds, "v", max_distinct=10)


def test_frequent_items_exact_with_ties(ray_session):
    import ray.data
    from raystack.ops.colstats import frequent_items
    vals = ["a"] * 5 + ["b"] * 5 + ["c"] * 3 + ["d"]
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)}))
    out = frequent_items(ds, "v", k=3)
    # ties (a,b at 5) break by value ascending
    assert out["value"].tolist() == ["a", "b", "c"]
    assert out["n"].tolist() == [5, 5, 3]


def test_add_url_parts(ray_session):
    import ray.data
    from raystack.ops.text import add_url_parts
    ds = ray.data.from_arrow(pa.table({"url": pa.array(
        ["https://www.x.com/a/b?q=1", "ftp://h/", "not a url"])}))
    out = add_url_parts(ds).to_pandas()
    assert out["scheme"].tolist()[:2] == ["https", "ftp"]
    assert out["host"].tolist()[:2] == ["www.x.com", "h"]
    assert out["path"].tolist()[:2] == ["/a/b", "/"]
    assert pd.isna(out["host"].iloc[2])


def test_curate_corpus_pipeline(ray_session):
    import ray.data
    from raystack.curate import curate_corpus
    base = ("many common words build one long paragraph that keeps going "
            "with lots of shingles to hash and match again ") * 3
    t = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": [base, base + " tail",          # near-dups: 1 dropped
                 "x",                           # low quality: dropped
                 "completely different words assembled into a decent "
                 "paragraph of reasonable length for quality purposes "
                 * 3,
                 base, base]})                  # exact dups of 0: dropped
    ds = ray.data.from_arrow(t)
    out = curate_corpus(ds, quality_threshold=0.45, sim_threshold=0.5) \
        .to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 3]
    assert set(out.columns) == {"doc_id", "lang_pred", "quality", "holdout"}


def test_bpe_token_count(ray_session):
    import ray.data
    from raystack.ops.text import add_bpe_token_count
    ds = ray.data.from_arrow(pa.table({"text": pa.array(
        ["Hello world, it's 2024!", ""])}))
    out = add_bpe_token_count(ds).to_pandas()
    # Hello| world|,| it|'s| 2024|!  -> 7 pieces
    assert out["n_bpe_tokens"].tolist() == [7, 0]


def test_stratified_sample_deterministic(ray_session):
    import ray.data
    from raystack.ops.text import stratified_sample
    t = pa.table({"doc_id": pa.array(range(1000), pa.int64()),
                  "g": pa.array(["a" if i % 3 else "b" for i in range(1000)])})
    ds = ray.data.from_arrow(t)
    a = stratified_sample(ds, "g", k=7).to_pandas() \
        .sort_values(["g", "doc_id"]).reset_index(drop=True)
    b = stratified_sample(ds, "g", k=7).to_pandas() \
        .sort_values(["g", "doc_id"]).reset_index(drop=True)
    assert a.equals(b)
    assert (a.groupby("g").size() == 7).all()
    # block layout must not change the sample (placement independence)
    c = stratified_sample(ds.repartition(13), "g", k=7).to_pandas() \
        .sort_values(["g", "doc_id"]).reset_index(drop=True)
    assert a.equals(c)


def test_ivf_persisted_index_roundtrip(ray_session, tmp_path):
    # build once, query many: the persisted bucket-partitioned layout
    # with full probe must equal brute force; a partial probe must read
    # only the probed bucket= directories
    import os

    import ray.data
    from raystack.ops.similarity import (ann_topk, build_ivf_index,
                                         query_ivf_index)
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    df = emb.to_pandas()
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    qids = df["vec_id"].to_numpy()[:4]
    qm = m[:4]
    idx_dir = str(tmp_path / "ivf")
    meta = build_ivf_index(emb, idx_dir, n_centroids=8, sample_size=256)
    assert meta["n_centroids"] == 8
    assert os.path.exists(os.path.join(idx_dir, "ivf_meta.json"))
    buckets = [d for d in os.listdir(idx_dir) if d.startswith("bucket=")]
    assert 1 < len(buckets) <= 8
    # index holds every vector exactly once
    import glob
    files = [f for b in buckets for f in glob.glob(
        os.path.join(idx_dir, b, "*.parquet"))]
    total = ray.data.read_parquet(files).count()
    assert total == len(df)

    exact = ann_topk(emb, qm, qids, k=10).to_pandas()
    full = query_ivf_index(idx_dir, qm, qids, k=10, n_probe=8).to_pandas()
    assert full.sort_values(["query_id", "rank"]).reset_index(drop=True) \
        .equals(exact.sort_values(["query_id", "rank"])
                .reset_index(drop=True))

    # partial probe: decent recall, and deterministic across calls
    p1 = query_ivf_index(idx_dir, qm, qids, k=10, n_probe=3).to_pandas()
    p2 = query_ivf_index(idx_dir, qm, qids, k=10, n_probe=3).to_pandas()
    assert p1.sort_values(["query_id", "rank"]).reset_index(drop=True) \
        .equals(p2.sort_values(["query_id", "rank"]).reset_index(drop=True))
    rec = np.mean([
        len(set(exact[exact.query_id == q].neighbor_id)
            & set(p1[p1.query_id == q].neighbor_id)) / 10 for q in qids])
    assert rec >= 0.5


def _make_ppm(w, h, value=None, comment=False, bits16=False):
    rng = np.random.default_rng(w * 1000 + h)
    maxv, dt = (65535, ">u2") if bits16 else (255, np.uint8)
    px = (np.full((h, w, 3), value, dtype=np.int64) if value is not None
          else rng.integers(0, maxv + 1, (h, w, 3)))
    hdr = b"P6\n" + (b"# a comment\n" if comment else b"") \
        + f"{w} {h}\n{maxv}\n".encode()
    return hdr + px.astype(dt).tobytes(), px


def _make_pgm(w, h):
    rng = np.random.default_rng(w + h)
    px = rng.integers(0, 256, (h, w, 1))
    return b"P5\n" + f"{w} {h}\n255\n".encode() \
        + px.astype(np.uint8).tobytes(), px


def _make_wav(rate=8000, seconds=0.5, freq=440.0, channels=1, width=2):
    import io
    import wave
    n = int(rate * seconds)
    x = np.sin(2 * np.pi * freq * np.arange(n) / rate)
    if width == 2:
        frames = np.repeat((x * 32767).astype("<i2"), channels).tobytes()
    else:
        frames = np.repeat(((x * 127) + 128).astype(np.uint8),
                           channels).tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue(), x


def test_decode_pnm_and_wav_kernels():
    from raystack.ops.multimodal import decode_pnm, decode_wav, resize_nearest
    p, px = _make_ppm(17, 9, comment=True)
    img = decode_pnm(p)
    assert img.shape == (9, 17, 3) and (img == px).all()
    p16, px16 = _make_ppm(4, 3, bits16=True)
    img16 = decode_pnm(p16)
    assert img16.dtype == np.dtype(">u2") and (img16 == px16).all()
    g, gx = _make_pgm(5, 7)
    assert (decode_pnm(g) == gx).all()
    small = resize_nearest(img, 8, 4)
    assert small.shape == (4, 8, 3)
    assert (small == img[np.arange(4) * 9 // 4][:, np.arange(8) * 17 // 8]).all()
    wav, x = _make_wav(rate=8000, seconds=0.25, channels=2)
    samples, rate = decode_wav(wav)
    assert rate == 8000 and samples.shape == (2000, 2)
    np.testing.assert_allclose(samples[:, 0], x, atol=1e-4)
    with pytest.raises(ValueError):
        decode_pnm(b"JUNKJUNK")


def test_decode_media_stage(ray_session):
    import ray.data
    from raystack.ops.multimodal import MEDIA_SCHEMA, decode_media
    ppm, _ = _make_ppm(32, 20, value=128)
    pgm, _ = _make_pgm(6, 4)
    wav, _ = _make_wav(rate=16000, seconds=0.5)
    trunc_ppm = ppm[:20]  # sniffs as image, malformed body
    t = pa.table({
        "media_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "payload": pa.array([ppm, pgm, wav, b"\x89PNG\r\n junk", trunc_ppm],
                            pa.large_binary()),
        "mime": pa.array(["image/x-ppm", "image/x-pgm", "audio/wav",
                          "image/png", "image/x-ppm"]),
        "meta": pa.array(["{}"] * 5),
    }, schema=MEDIA_SCHEMA)
    got = decode_media(ray.data.from_arrow(t), concurrency=1).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert got["kind"].tolist() == ["image", "image", "audio",
                                    "unknown", "unknown"]
    assert got["decoded"].tolist() == [True, True, True, False, False]
    assert got.loc[0, ["width", "height", "channels"]].tolist() == [32, 20, 3]
    assert got.loc[0, "mean_level"] == pytest.approx(128 / 255)
    assert got.loc[1, ["width", "height", "channels"]].tolist() == [6, 4, 1]
    assert got.loc[2, "sample_rate"] == 16000
    assert got.loc[2, "duration_s"] == pytest.approx(0.5)
    # sine RMS ~ 1/sqrt(2)
    assert got.loc[2, "mean_level"] == pytest.approx(0.7071, abs=0.01)


def _para_corpus():
    boiler = "Subscribe to our newsletter!"
    return pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([
            f"unique intro zero\n\n{boiler}\n\nbody zero",
            f"{boiler}\n\nunique body one",
            "all original here\n\nnothing shared",
            f"{boiler}\n\n{boiler}",             # in-doc repeat + corpus dup
            "unique intro zero\n\nfresh tail",    # cross-doc dup paragraph
            "",                                   # empty doc
        ]),
    })


def _para_oracle(df):
    import duckdb
    con = duckdb.connect()
    con.register("t", df)
    return con.execute("""
        WITH ps AS (
          SELECT doc_id,
                 struct_extract(z, 1) AS para,
                 struct_extract(z, 2) AS idx
          FROM (SELECT doc_id,
                       unnest(list_zip(parts, range(1, len(parts)+1))) AS z
                FROM (SELECT doc_id,
                             string_split(text, chr(10)||chr(10)) AS parts
                      FROM t))),
        ranked AS (
          SELECT doc_id, para, idx,
                 row_number() OVER (PARTITION BY para
                                    ORDER BY doc_id, idx) AS rn
          FROM ps),
        agg AS (
          SELECT doc_id, string_agg(para, chr(10)||chr(10) ORDER BY idx)
                   AS text
          FROM ranked WHERE rn = 1 GROUP BY doc_id)
        SELECT t.doc_id, coalesce(agg.text, '') AS text
        FROM t LEFT JOIN agg USING (doc_id) ORDER BY doc_id""").df()


def test_dedup_paragraphs_oracle(ray_session):
    import ray.data
    from raystack.ops.dedup import dedup_paragraphs
    t = _para_corpus()
    got = dedup_paragraphs(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _para_oracle(t.to_pandas())
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    # the boilerplate survives exactly once, at its first occurrence
    joined = "\n\n".join(got["text"])
    assert joined.count("Subscribe to our newsletter!") == 1
    assert "Subscribe" in got.loc[0, "text"]


def test_dedup_paragraphs_real_corpus_oracle(ray_session):
    import duckdb
    import ray.data
    from raystack.ops.dedup import dedup_paragraphs
    df = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'").df()
    got = dedup_paragraphs(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _para_oracle(df)
    assert got["text"].tolist() == want["text"].tolist()


def test_dedup_paragraphs_distributed_parity(ray_session, monkeypatch):
    import ray.data
    from raystack.ops import dedup
    t = _para_corpus()
    broadcast = dedup.dedup_paragraphs(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(dedup, "_BROADCAST_LIMIT", 0)
    dist = dedup.dedup_paragraphs(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert broadcast["doc_id"].tolist() == dist["doc_id"].tolist()
    assert broadcast["text"].tolist() == dist["text"].tolist()


def test_semi_join_bloom_exact(ray_session):
    # bloom-accelerated semi/anti must be EXACTLY equivalent to the
    # broadcast reference on both string and int keys
    import pyarrow.parquet as pq
    import ray.data
    from raystack.ops.join import semi_join, semi_join_bloom
    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["doc_id", "source"])
    ds = ray.data.from_arrow(t)
    drop = [s for i, s in enumerate(sorted(set(t["source"].to_pylist())))
            if i % 3 == 0]
    keys = ray.data.from_arrow(pa.table({"source": drop}))
    for anti in (False, True):
        got = semi_join_bloom(ds, keys, on="source", anti=anti,
                              num_partitions=4, broadcast_limit=0) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = semi_join(ds, drop, on="source", anti=anti) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert got.equals(want), f"anti={anti}"
    # int keys
    ids = t["doc_id"].to_pylist()[::7]
    keys_i = ray.data.from_arrow(pa.table({"doc_id": ids}))
    got = semi_join_bloom(ds, keys_i, on="doc_id", anti=True,
                          num_partitions=4, broadcast_limit=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = semi_join(ds, ids, on="doc_id", anti=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)


def test_semi_join_bloom_exact_under_false_positives(ray_session):
    # a deliberately starved bloom (1 bit/key, 1 hash → massive fp rate)
    # must still return exact results — fp rows are re-checked by the
    # exact distributed join
    import numpy as np
    import ray.data
    from raystack.ops import join as j
    from raystack.ops.join import semi_join, semi_join_bloom
    t = pa.table({"k": [f"key{i}" for i in range(500)],
                  "v": list(range(500))})
    ds = ray.data.from_arrow(t)
    drop = [f"key{i}" for i in range(0, 500, 5)]
    keys = ray.data.from_arrow(pa.table({"k": drop}))
    for anti in (False, True):
        got = semi_join_bloom(ds, keys, on="k", anti=anti,
                              num_partitions=2, bits_per_key=1,
                              n_hashes=1, broadcast_limit=0) \
            .to_pandas().sort_values("v").reset_index(drop=True)
        want = semi_join(ds, drop, on="k", anti=anti) \
            .to_pandas().sort_values("v").reset_index(drop=True)
        assert got.equals(want), f"anti={anti}"
    # the byte-cap fallback path returns the same thing
    old = j._BLOOM_MAX_BYTES
    try:
        j._BLOOM_MAX_BYTES = 0
        got = semi_join_bloom(ds, keys, on="k", anti=True,
                              num_partitions=2,
                              broadcast_limit=0).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        want = semi_join(ds, drop, on="k", anti=True).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        assert got.equals(want)
    finally:
        j._BLOOM_MAX_BYTES = old


def test_approx_quantiles_close_to_exact(ray_session):
    import pyarrow.parquet as pq
    import ray.data
    from raystack.ops.colstats import approx_quantiles, value_quantiles
    ds = ray.data.read_parquet("/root/testdata/sf0.01/events.parquet",
                               columns=["value"]).repartition(16)
    exact = value_quantiles(ds, "value", quantiles=(0.1, 0.5, 0.9, 0.99))
    approx = approx_quantiles(ds, "value", quantiles=(0.1, 0.5, 0.9, 0.99))
    vals = ray.data.read_parquet("/root/testdata/sf0.01/events.parquet",
                                 columns=["value"]).to_pandas()["value"] \
        .dropna().sort_values().reset_index(drop=True)
    n = len(vals)
    for (_, e), (_, a) in zip(exact.iterrows(), approx.iterrows()):
        # rank error bound: the approximate value's true rank must be
        # within ~2% of the requested rank
        import numpy as np
        rank_a = np.searchsorted(vals.to_numpy(), a["value"]) / n
        assert abs(rank_a - a["quantile"]) < 0.02, (a["quantile"], rank_a)
    # deterministic for a fixed block layout
    again = approx_quantiles(ds, "value", quantiles=(0.1, 0.5, 0.9, 0.99))
    assert approx["value"].tolist() == again["value"].tolist()


def test_decode_bmp_roundtrip(ray_session):
    import ray.data
    from raystack.ops.multimodal import (MEDIA_SCHEMA, decode_bmp,
                                         decode_media, encode_bmp)
    rng = np.random.default_rng(11)
    img24 = rng.integers(0, 256, (13, 10, 3), dtype=np.uint8)
    img32 = rng.integers(0, 256, (5, 7, 4), dtype=np.uint8)
    # bit-exact round trips, both row orders, both depths (odd widths
    # exercise the 4-byte row padding)
    assert np.array_equal(decode_bmp(encode_bmp(img24)), img24)
    assert np.array_equal(decode_bmp(encode_bmp(img24, top_down=True)),
                          img24)
    assert np.array_equal(decode_bmp(encode_bmp(img32)), img32)
    # the actor stage decodes it and flags malformed bodies undecoded
    t = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([encode_bmp(img24), encode_bmp(img24)[:20]],
                            pa.large_binary()),
        "mime": pa.array(["image/bmp"] * 2),
        "meta": pa.array(["{}"] * 2),
    }, schema=MEDIA_SCHEMA)
    got = decode_media(ray.data.from_arrow(t), concurrency=1).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert got["decoded"].tolist() == [True, False]
    assert got.loc[0, ["width", "height", "channels"]].tolist() == [10, 13, 3]
    assert got.loc[0, "mean_level"] == pytest.approx(img24.mean() / 255)


def test_text_index_build_query_vs_duckdb(ray_session, tmp_path):
    # persisted inverted index: AND/OR keyword queries must match
    # DuckDB computing the same membership on the raw strings, and the
    # query path must only read the query words' bucket dirs
    import os
    import duckdb
    import pyarrow.parquet as pq
    import ray.data
    from raystack.ops.textindex import build_text_index, query_text_index

    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["doc_id", "text"])
    idx = str(tmp_path / "tidx")
    meta = build_text_index(ray.data.from_arrow(t), idx, num_buckets=16)
    assert meta["num_buckets"] == 16

    con = duckdb.connect()
    con.register("docs", t.to_pandas())

    def oracle(words, mode):
        conds = [("list_contains(list_filter(string_split_regex("
                  f"lower(text), '\\W+'), x -> x <> ''), '{w}')")
                 for w in words]
        glue = " AND " if mode == "and" else " OR "
        return sorted(con.execute(
            "SELECT doc_id FROM docs WHERE " + glue.join(conds)
        ).df()["doc_id"])

    words = ["stream", "query"]
    for mode in ("and", "or"):
        got = query_text_index(idx, words, mode=mode).to_pandas()
        assert sorted(got["doc_id"]) == oracle(words, mode), mode
    # single rare-ish word + case folding
    got1 = query_text_index(idx, ["Spark"]).to_pandas()
    assert sorted(got1["doc_id"]) == oracle(["spark"], "and")
    # a word absent from the corpus matches nothing (even under OR with
    # a present word, AND must go empty)
    assert query_text_index(idx, ["zzzyxx"]).count() == 0
    assert query_text_index(idx, ["stream", "zzzyxx"]).count() == 0
    or_only = query_text_index(idx, ["stream", "zzzyxx"],
                               mode="or").to_pandas()
    assert sorted(or_only["doc_id"]) == oracle(["stream"], "and")


def test_approx_quantiles_skewed_distributions(ray_session):
    # rank-error bound must hold on adversarial shapes: heavy-tailed,
    # near-constant, and few-distinct columns
    import ray.data
    from raystack.ops.colstats import approx_quantiles
    rng = np.random.default_rng(0)
    cases = {
        "lognormal": rng.lognormal(0, 3, 60_000),
        "mostly_constant": np.where(rng.random(60_000) < 0.98, 7.0,
                                    rng.random(60_000) * 1e6),
        "few_distinct": rng.integers(0, 5, 60_000).astype(float),
    }
    for name, vals in cases.items():
        ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(16)
        got = approx_quantiles(ds, "v", quantiles=(0.1, 0.5, 0.9, 0.99))
        sv = np.sort(vals)
        for _, r in got.iterrows():
            lo = np.searchsorted(sv, r["value"], side="left") / len(sv)
            hi = np.searchsorted(sv, r["value"], side="right") / len(sv)
            # the value's true rank INTERVAL must cover q within 2%
            assert lo - 0.02 <= r["quantile"] <= hi + 0.02, \
                (name, r["quantile"], lo, hi)


def test_semi_join_bloom_null_int_keys_exact(ray_session):
    # regression: int64 key batches containing a null used to promote to
    # float64 on one side of the bloom, hashing the SAME key differently
    # per batch — real members then looked like bloom misses and the
    # anti-join silently kept rows it should drop
    import ray.data
    from raystack.ops.join import semi_join, semi_join_bloom
    t = pa.table({"k": pa.array(list(range(400)) + [None, None],
                                pa.int64()),
                  "v": list(range(402))})
    ds = ray.data.from_arrow(t).repartition(4)
    drop = list(range(0, 400, 3))
    keys = ray.data.from_arrow(
        pa.table({"k": pa.array(drop + [None], pa.int64())}))
    for anti in (False, True):
        got = semi_join_bloom(ds, keys, on="k", anti=anti,
                              num_partitions=2, broadcast_limit=0) \
            .to_pandas().sort_values("v").reset_index(drop=True)
        want = semi_join(ds, drop, on="k", anti=anti) \
            .to_pandas().sort_values("v").reset_index(drop=True)
        assert got["v"].tolist() == want["v"].tolist(), f"anti={anti}"
    # broadcast tier tolerates the null key too
    got = semi_join_bloom(ds, keys, on="k", anti=True).to_pandas()
    assert len(got) == len(t) - len(drop)  # nulls never match → kept


def test_text_index_query_word_normalization(ray_session, tmp_path):
    # query words tokenize exactly like the build: hyphenated/cased
    # probes expand to their tokens instead of silently matching nothing
    import ray.data
    from raystack.ops.textindex import build_text_index, query_text_index
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["State-of-the-art systems", "state art",
                           "nothing here"]})
    idx = str(tmp_path / "idx")
    build_text_index(ray.data.from_arrow(t), idx, num_buckets=4)
    got = query_text_index(idx, ["State-of-the-ART"]).to_pandas()
    assert sorted(got["doc_id"]) == [1]  # all four tokens required
    got_or = query_text_index(idx, ["state-art"], mode="or").to_pandas()
    assert sorted(got_or["doc_id"]) == [1, 2]


def test_flag_contamination_pandas_benchmark(ray_session):
    import pandas as pd
    import ray.data
    from raystack.ops.text import flag_contamination
    t = pa.table({"doc_id": [0, 1],
                  "text": ["alpha beta gamma delta", "unrelated words"]})
    bench = pd.DataFrame({"text": ["alpha beta gamma"]})
    got = flag_contamination(ray.data.from_arrow(t), bench, n=3) \
        .to_pandas().sort_values("doc_id")
    assert got["contaminated"].tolist() == [True, False]


def test_dedup_ops_tolerate_empty_batches(ray_session):
    # regression: flatten_column returned a phantom starts=[0] for empty
    # columns, making signature batches 1 row long for 0-row tables
    import ray.data
    from raystack.ops.dedup import minhash_signatures, simhash
    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    full = pa.table({"doc_id": [1, 2], "text": ["hello world", "bye"]})
    ds = ray.data.from_arrow([t, full])  # one empty block + one real
    assert minhash_signatures(ds).count() == 2
    assert simhash(ds, "text", "doc_id").count() == 2


def test_dedup_paragraphs_rejects_out_of_range_ids(ray_session):
    import ray.data
    from raystack.ops.dedup import dedup_paragraphs
    t = pa.table({"doc_id": pa.array([1 << 50], pa.int64()),
                  "text": ["a\n\nb"]})
    with pytest.raises(Exception, match="2\\^42"):
        dedup_paragraphs(ray.data.from_arrow(t)).count()


def test_windows_handle_ns_unit_timestamps(ray_session):
    # regression: epoch math compared native-unit int64 against
    # microsecond constants — ns inputs (pandas parquet default) made
    # 60 s windows into 60 ms windows and split every session, silently
    import ray.data
    from raystack.ops.window import (sessionize, sessionize_bucketed,
                                     tumbling_window_agg)
    base = pa.table({
        "k": ["a", "a", "a", "b"],
        "ts": pa.array([0, 30_000_000, 90_000_000, 10_000_000],
                       type=pa.int64()).cast(pa.timestamp("us")),
    })
    ns = base.set_column(1, "ts", base["ts"].cast(pa.timestamp("ns")))
    for t in (base, ns):
        got = tumbling_window_agg(ray.data.from_arrow(t), "ts", "k",
                                  window_sec=60).to_pandas() \
            .sort_values(["k", "window_start"]).reset_index(drop=True)
        assert got["n_events"].tolist() == [2, 1, 1], t["ts"].type
    ev = pa.table({
        "user": [1, 1, 1], "eid": [10, 11, 12],
        "ts": pa.array([0, 60_000_000, 4_000_000_000],
                       pa.int64()).cast(pa.timestamp("us"))
        .cast(pa.timestamp("ns")),  # same instants, ns storage
    })
    s1 = sessionize(ray.data.from_arrow(ev), "ts", "user",
                    "eid", gap_sec=1800).to_pandas().sort_values("eid")
    assert s1["session_id"].tolist() == [1, 1, 2]
    s2 = sessionize_bucketed(ray.data.from_arrow(ev), "ts", "user",
                             "eid", gap_sec=1800).to_pandas() \
        .sort_values("eid")
    assert s2["session_id"].tolist() == [1, 1, 2]


def test_image_features_empty_and_nondividing_bins(ray_session):
    # regressions: a trailing empty payload stole the previous row's
    # last byte from the histogram; n_bins not dividing 256 dropped the
    # top byte values entirely
    import ray.data
    from raystack.ops.multimodal import MEDIA_SCHEMA, extract_image_features
    t = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array([b"\x00\xff", b"", b"\xfa\xfb\xff"],
                            pa.large_binary()),
        "mime": pa.array(["x"] * 3), "meta": pa.array(["{}"] * 3),
    }, schema=MEDIA_SCHEMA)
    got = extract_image_features(ray.data.from_arrow(t), concurrency=1) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    f0 = got["features"][0]
    assert f0[0] == 0.5 and f0[15] == 0.5  # last byte NOT stolen
    assert sum(got["features"][1]) == 0.0  # empty payload → zero hist
    assert sum(got["features"][2]) == 1.0  # all bytes binned

    from raystack.ops.multimodal import ImageFeatureExtractor
    ex = ImageFeatureExtractor(n_bins=10)
    out = ex(t)
    assert abs(sum(out["features"][2].as_py()) - 1.0) < 1e-9  # 250-255 kept


def test_frequent_items_driver_bounded(ray_session):
    # high-cardinality column: 10k distinct values + 3 heavy hitters. The
    # distributed sort+limit means the driver collect is ≤ k rows — pin
    # that by intercepting to_pandas's input size via the returned frame
    # (k rows) and by exactness of the top-k despite the per-batch cut.
    import ray.data

    from raystack.ops.colstats import frequent_items
    vals = [f"u{i:05d}" for i in range(10_000)] \
        + ["hot"] * 500 + ["warm"] * 300 + ["mild"] * 200
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})) \
        .repartition(8)
    out = frequent_items(ds, "v", k=3)
    assert len(out) == 3
    assert out["value"].tolist() == ["hot", "warm", "mild"]
    assert out["n"].tolist() == [500, 300, 200]
    # bounded-shuffle variant stays exact here (m >> k)
    out2 = frequent_items(ds, "v", k=3, per_batch_cut=64)
    assert out2["value"].tolist() == ["hot", "warm", "mild"]
    assert out2["n"].tolist() == [500, 300, 200]


def test_decode_png_roundtrip(ray_session):
    import ray.data
    from raystack.ops.multimodal import (MEDIA_SCHEMA, decode_media,
                                         decode_png, encode_png)
    rng = np.random.default_rng(13)
    # every channel count × every scanline filter is bit-exact
    for nch in (1, 2, 3, 4):
        img = rng.integers(0, 256, (19, 11, nch), dtype=np.uint8)
        for ft in range(5):
            assert np.array_equal(decode_png(encode_png(img, ft)), img), \
                (nch, ft)
    # palette color type: hand-build an indexed PNG and compare to the
    # palette-expanded truth
    import struct
    import zlib as _z

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", _z.crc32(ctype + data)))
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    idxs = rng.integers(0, 7, (6, 9), dtype=np.uint8)
    lines = b"".join(b"\x00" + idxs[y].tobytes() for y in range(6))
    ihdr = struct.pack(">IIBBBBB", 9, 6, 8, 3, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"PLTE", pal.tobytes())
               + chunk(b"IDAT", _z.compress(lines)) + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), pal[idxs])

    # interlaced and 16-bit are real formats now (tests/test_png_full.py);
    # lying about them in the header of an 8-bit progressive-free stream
    # must still fail loudly (length mismatch), never emit wrong pixels
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    bad_i = bytearray(good)
    bad_i[8 + 8 + 12] = 1  # IHDR interlace byte
    with pytest.raises(ValueError):  # misaligned passes / length mismatch
        decode_png(bytes(bad_i))
    bad_d = bytearray(good)
    bad_d[8 + 8 + 8] = 16  # IHDR bit depth byte
    with pytest.raises(ValueError):
        decode_png(bytes(bad_d))

    # the actor stage sniffs PNG magic, decodes, flags truncated bodies
    t = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([encode_png(img, 4), good[:24]],
                            pa.large_binary()),
        "mime": pa.array(["image/png"] * 2),
        "meta": pa.array(["{}"] * 2),
    }, schema=MEDIA_SCHEMA)
    got = decode_media(ray.data.from_arrow(t), concurrency=1).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert got["decoded"].tolist() == [True, False]
    assert got.loc[0, ["width", "height", "channels"]].tolist() == [4, 4, 3]
    assert got.loc[0, "kind"] == "image"
    assert got.loc[0, "mean_level"] == pytest.approx(img.mean() / 255)


def test_bm25_topk_vs_duckdb(ray_session, tmp_path):
    # BM25 over the persisted index must match DuckDB computing the
    # identical Lucene-style formula on the raw strings (tf, dl, df, idf
    # and the final ranking), reading only the query words' buckets
    import duckdb
    import pyarrow.parquet as pq
    import ray.data
    from raystack.ops.textindex import bm25_topk, build_text_index

    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["doc_id", "text"])
    idx = str(tmp_path / "bmidx")
    meta = build_text_index(ray.data.from_arrow(t), idx, num_buckets=16)
    assert meta["n_docs"] == t.num_rows and meta["avgdl"] > 0

    k1, b, k = 1.2, 0.75, 12
    words = ["stream", "query", "data"]
    got = bm25_topk(idx, words, k=k, k1=k1, b=b).to_pandas()

    con = duckdb.connect()
    con.register("docs", t.to_pandas())
    wlist = ", ".join(f"'{w}'" for w in words)
    oracle = con.execute(f"""
        WITH toks AS (
          SELECT doc_id, tok.x AS token
          FROM docs, UNNEST(list_filter(string_split_regex(lower(text),
               '\\W+'), x -> x <> '')) AS tok(x)),
        tf AS (SELECT doc_id, token, count(*)::DOUBLE AS tf
               FROM toks GROUP BY 1, 2),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY 1),
        stats AS (SELECT (SELECT count(*) FROM docs)::DOUBLE AS n,
                         (SELECT sum(dl) FROM dl)
                         / (SELECT count(*) FROM docs)::DOUBLE AS avgdl),
        df AS (SELECT token, count(*)::DOUBLE AS df FROM tf
               WHERE token IN ({wlist}) GROUP BY 1)
        SELECT tf.doc_id,
               sum(ln(1 + ((SELECT n FROM stats) - df.df + 0.5)
                          / (df.df + 0.5))
                   * tf.tf * ({k1} + 1)
                   / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl
                                      / (SELECT avgdl FROM stats))))
                   AS score
        FROM tf JOIN dl USING (doc_id) JOIN df USING (token)
        WHERE tf.token IN ({wlist})
        GROUP BY 1 ORDER BY score DESC, doc_id LIMIT {k}
    """).df()
    assert got["doc_id"].tolist() == oracle["doc_id"].tolist()
    assert np.allclose(got["score"], oracle["score"], rtol=1e-9)

    # absent word contributes nothing; all-absent query returns empty
    got2 = bm25_topk(idx, ["stream", "zzzyxx"], k=5).to_pandas()
    only = bm25_topk(idx, ["stream"], k=5).to_pandas()
    assert got2["doc_id"].tolist() == only["doc_id"].tolist()
    assert np.allclose(got2["score"], only["score"], rtol=1e-9)
    assert bm25_topk(idx, ["zzzyxx"], k=5).count() == 0


def test_bm25_requires_rebuilt_index(ray_session, tmp_path):
    import json
    import os
    import ray.data
    from raystack.ops.textindex import bm25_topk, build_text_index
    t = pa.table({"doc_id": [1, 2], "text": ["a b", "a c"]})
    idx = str(tmp_path / "old")
    build_text_index(ray.data.from_arrow(t), idx, num_buckets=2)
    # simulate a pre-BM25 index: strip the stats from the meta
    mp = os.path.join(idx, "text_index_meta.json")
    meta = json.load(open(mp))
    meta.pop("avgdl")
    json.dump(meta, open(mp, "w"))
    with pytest.raises(ValueError, match="rebuild"):
        bm25_topk(idx, ["a"])


def test_text_index_append_equals_full_build(ray_session, tmp_path):
    # incremental ingest: build(A) + append(B) answers boolean AND BM25
    # queries identically to build(A + B), with exactly-recomputed stats
    import pyarrow.parquet as pq
    import ray.data
    from raystack.ops.textindex import (append_text_index, bm25_topk,
                                        build_text_index,
                                        query_text_index)

    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["doc_id", "text"])
    a, b = t.slice(0, 300), t.slice(300)
    inc = str(tmp_path / "inc")
    build_text_index(ray.data.from_arrow(a), inc, num_buckets=8)
    meta_inc = append_text_index(ray.data.from_arrow(b), inc)
    full = str(tmp_path / "full")
    meta_full = build_text_index(ray.data.from_arrow(t), full,
                                 num_buckets=8)
    assert meta_inc["n_docs"] == meta_full["n_docs"] == t.num_rows
    assert meta_inc["avgdl"] == pytest.approx(meta_full["avgdl"], rel=0)

    for mode in ("and", "or"):
        gi = query_text_index(inc, ["stream", "query"], mode=mode) \
            .to_pandas()
        gf = query_text_index(full, ["stream", "query"], mode=mode) \
            .to_pandas()
        assert sorted(gi["doc_id"]) == sorted(gf["doc_id"]), mode

    ri = bm25_topk(inc, ["stream", "query", "data"], k=15).to_pandas()
    rf = bm25_topk(full, ["stream", "query", "data"], k=15).to_pandas()
    assert ri["doc_id"].tolist() == rf["doc_id"].tolist()
    assert np.allclose(ri["score"], rf["score"], rtol=1e-12)


def test_text_index_row_group_pruning(ray_session, tmp_path, monkeypatch):
    """Postings are written sorted by token in small row groups, and the
    query filter is an OR-of-equality chain (this pyarrow build does not
    prune row groups on isin): a query's words must touch a small
    fraction of a bucket's row groups, with results unchanged."""
    import glob
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data
    import raystack.ops.textindex as tx

    monkeypatch.setattr(tx, "_RG_ROWS", 64)
    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["doc_id", "text"])
    idx = str(tmp_path / "tidx")
    tx.build_text_index(ray.data.from_arrow(t), idx, num_buckets=4)

    words = ["stream", "query"]
    got = tx.query_text_index(idx, words, mode="or").to_pandas()
    assert len(got)  # the words do occur in the corpus

    kept = total = 0
    expr = tx._words_filter(words)
    for f in glob.glob(os.path.join(idx, "bucket=*", "*.parquet")):
        frag = list(pads.dataset(f).get_fragments())[0]
        kept += len(list(frag.split_by_row_group(expr)))
        total += frag.metadata.num_row_groups
    assert total >= 40 and kept <= total // 4, (kept, total)


def test_ivf_append_equivalence_and_tags(ray_session, tmp_path):
    """append_ivf_index: build(A, centroids=C) + append(B) answers every
    query identically to build(A∪B, centroids=C); tagged re-runs are
    no-ops (duplicate rows would surface twice in top-k)."""
    import glob
    import os

    import ray.data
    from raystack.ops.similarity import (append_ivf_index,
                                         build_ivf_index,
                                         query_ivf_index,
                                         train_centroids)
    import pyarrow.parquet as pqt
    t = pqt.read_table(f"{SF}/embeddings.parquet")
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    df = emb.to_pandas()
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    cent = train_centroids(m[:256], 8)
    half = t.num_rows // 2
    a = ray.data.from_arrow(t.slice(0, half))
    b = ray.data.from_arrow(t.slice(half))
    qm, qids = m[:4], df["vec_id"].to_numpy()[:4]

    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_ivf_index(a, inc, n_centroids=8, centroids=cent)
    append_ivf_index(b, inc, tag="day2")
    build_ivf_index(emb, full, n_centroids=8, centroids=cent)
    for probe in (3, 8):
        gi = query_ivf_index(inc, qm, qids, k=10, n_probe=probe) \
            .to_pandas().sort_values(["query_id", "rank"]) \
            .reset_index(drop=True)
        gf = query_ivf_index(full, qm, qids, k=10, n_probe=probe) \
            .to_pandas().sort_values(["query_id", "rank"]) \
            .reset_index(drop=True)
        assert gi.equals(gf), probe

    # tagged retry: no new files, results unchanged
    files_before = sorted(glob.glob(os.path.join(inc, "bucket=*",
                                                 "*.parquet")))
    append_ivf_index(b, inc, tag="day2")
    assert sorted(glob.glob(os.path.join(inc, "bucket=*",
                                         "*.parquet"))) == files_before


def test_text_index_append_tags_exactly_once(ray_session, tmp_path):
    import json
    import os

    import pyarrow.parquet as pqt
    import ray.data
    from raystack.ops.textindex import append_text_index, build_text_index
    t = pqt.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text"])
    idx = str(tmp_path / "tidx")
    build_text_index(ray.data.from_arrow(t.slice(0, 100)), idx,
                     num_buckets=8)
    inc = ray.data.from_arrow(t.slice(100, 50))
    append_text_index(inc, idx, tag="day2")
    with open(os.path.join(idx, "text_index_meta.json")) as f:
        m1 = json.load(f)
    append_text_index(inc, idx, tag="day2")     # retry: no-op
    with open(os.path.join(idx, "text_index_meta.json")) as f:
        m2 = json.load(f)
    assert m1["n_docs"] == m2["n_docs"] == 150
    assert m2["applied"] == ["day2"]
