"""Dedup family, ANN, text stats, multimodal plumbing — each checked
against a brute-force single-process reimplementation (golden-invariant
style, SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dataflowkit_ray.pipelines.training import (
    q_ann_topk,
    q_embedding_dup_pairs,
    q_exact_dedup,
    q_lsh_dup_pairs,
    q_minhash_dup_pairs,
    q_simhash_pairs,
    q_text_stats,
)
from dataflowkit_ray.stages.dedup import (
    ngram_jaccard_pairs,
    shingle_hashes,
    simhash64,
)
from dataflowkit_ray.stages.multimodal import MediaDecodeStage, media_pipeline

SF = "/root/testdata/sf0.001"


def _docs_df():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_exact_dedup_matches_pandas(ray_session):
    got = q_exact_dedup(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = (
        _docs_df()
        .groupby("text")
        .doc_id.agg(["min", "count"])
        .rename(columns={"min": "doc_id", "count": "n_copies"})
        .reset_index(drop=True)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp[["doc_id", "n_copies"]], check_dtype=False)
    assert got.n_copies.max() >= 1


def _brute_jaccard_pairs(threshold=0.8, w=3):
    df = _docs_df()
    sh = shingle_hashes(pa.array(df.text.tolist()), w)
    out = []
    for i in range(len(df)):
        for j in range(i + 1, len(df)):
            a, b = sh[i], sh[j]
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            jac = inter / union if union else 1.0
            if jac >= threshold:
                out.append((df.doc_id[i], df.doc_id[j], round(jac, 6)))
    return sorted(out)


def test_minhash_pairs_match_brute_force(ray_session):
    got = q_minhash_dup_pairs(SF).to_pandas()
    got_t = sorted(zip(got.doc_a, got.doc_b, got.jaccard))
    assert got_t == _brute_jaccard_pairs()
    assert len(got_t) > 0  # corpus contains near-dups


def test_simhash_recall_is_exact(ray_session):
    """4-block pigeonhole blocking has recall 1.0 at hamming <= 3 —
    engine output must EQUAL the all-pairs brute force."""
    df = _docs_df()
    sh = shingle_hashes(pa.array(df.text.tolist()), 3)
    fps = [simhash64(s) for s in sh]
    exp = []
    for i in range(len(df)):
        for j in range(i + 1, len(df)):
            d = bin(fps[i] ^ fps[j]).count("1")
            if d <= 3:
                exp.append((df.doc_id[i], df.doc_id[j], d))
    got = q_simhash_pairs(SF).to_pandas()
    assert sorted(zip(got.doc_a, got.doc_b, got.hamming)) == sorted(exp)


def test_lang_id_classifies_planted_languages(ray_session):
    """The trigram profiles must separate clearly-English / German /
    French sentences and fall back to 'unk' when no profile trigram
    occurs; argmax ties break lexicographically (asserted via a doc
    built to score identically for two languages)."""
    import ray

    from dataflowkit_ray.stages.textstats import lang_id

    docs = {
        0: "the quick brown fox is jumping over the lazy dog and the cat",
        1: "ich habe ein buch und der hund schlief unter der schoenen eiche",
        2: "le chien de la ville est entre dans les maisons que nous aimons",
        3: "zzz qqq xxx",  # no profile trigram anywhere
        # 'ing' (en, w=5) vs 'die' (de, w=5): equal score 5 -> tie ->
        # lexicographic winner 'de'
        4: "bingx die",
    }
    ds = ray.data.from_items(
        [{"doc_id": k, "text": v} for k, v in docs.items()]
    )
    got = (
        lang_id(ds)
        .to_pandas()
        .astype({"doc_id": int})
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[0, "lang_pred"] == "en"
    assert got.loc[1, "lang_pred"] == "de"
    assert got.loc[2, "lang_pred"] == "fr"
    assert got.loc[3, "lang_pred"] == "unk" and got.loc[3, "lang_score"] == 0
    assert got.loc[4, "lang_pred"] == "de" and got.loc[4, "lang_score"] == 5
    assert (got.loc[[0, 1, 2], "lang_score"] > 10).all()


def test_lang_id_multibyte_text_matches_sql_semantics(ray_session):
    """Byte-scan counting must equal character-position counting on
    multibyte text (UTF-8 self-synchronization): an ASCII trigram
    straddled by multibyte chars still counts, a row boundary does not."""
    import duckdb
    import ray

    from dataflowkit_ray.stages.textstats import LANG_ID_SQL, lang_id

    texts = [
        "café the über der ingénieur",  # accents around hits
        "中文 und ein 中文 buch",  # CJK between hits
        "the",  # exact-length row: match must not leak into next row
        "der",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    got = (
        lang_id(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.execute(LANG_ID_SQL).df().sort_values("doc_id").reset_index(drop=True)
    assert got.lang_pred.tolist() == exp.lang_pred.tolist()
    assert got.lang_score.tolist() == exp.lang_score.tolist()


def test_ngram_jaccard_counting_is_exact(ray_session):
    """Inverted-index co-occurrence counting is EXACT: at t=0.5 —
    where 64/32-band minhash misses ~36% of J=0.5 pairs — the engine
    must return precisely the brute-force all-pairs set, including
    planted mid-range (J~0.55) variants that banding would drop."""
    import ray

    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(400)]
    texts, ids = [], []
    for i in range(30):
        base = [vocab[x] for x in rng.choice(400, size=24, replace=False)]
        texts.append(" ".join(base))
        ids.append(len(ids))
        if i % 3 == 0:
            # replace the last 6 words: ~16 of 22 shingles survive,
            # J ~ 16/28 ~ 0.57 — squarely in the lossy-banding regime
            tail = [vocab[int(x)] for x in rng.integers(0, 400, size=6)]
            texts.append(" ".join(base[:18] + tail))
            ids.append(len(ids))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    )
    got = ngram_jaccard_pairs(ds, threshold=0.5, n_buckets=8).to_pandas()

    sh = shingle_hashes(pa.array(texts), 3)
    exp = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = sh[i], sh[j]
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            jac = inter / union if union else 1.0
            if jac >= 0.5:
                exp.append((ids[i], ids[j], round(jac, 6)))
    assert sorted(zip(got.doc_a, got.doc_b, got.jaccard)) == sorted(exp)
    mids = [j for _, _, j in exp if j < 0.7]
    assert len(mids) >= 5  # the mid-J regime is actually exercised


def test_ann_topk_matches_numpy(ray_session):
    got = q_ann_topk(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for q in range(10):
        sims = np.round(m[ids == q][0] @ m.T, 6)
        mask = ids != q
        order = np.lexsort((ids[mask], -sims[mask]))[:5]
        exp_n = ids[mask][order].tolist()
        got_q = got[got.query_id == q].sort_values("rank")
        assert got_q.neighbor_id.tolist() == exp_n


def test_lsh_pairs_find_planted_dups(ray_session):
    """The high-threshold LSH query must recover exactly the planted
    near-dup pairs (miss prob ~1e-10 per pair) with cosine ~0.99995."""
    import pyarrow.parquet as pq

    lsh = q_lsh_dup_pairs(SF).to_pandas()
    ids = pq.read_table(f"{SF}/embeddings.parquet")["vec_id"].to_pylist()
    expected = {(int(i), int(i) + 10_000_000) for i in ids}
    got = set(zip(lsh.doc_a, lsh.doc_b))
    assert got == expected
    assert (lsh.cosine > 0.999).all()


def test_text_stats_matches_pandas(ray_session):
    got = (
        q_text_stats(SF)
        .to_pandas()
        .astype({"doc_id": int})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df = _docs_df()
    words = df.text.str.split(" ")
    exp = pd.DataFrame(
        {
            "doc_id": df.doc_id,
            "n_words": words.str.len(),
            "n_distinct_words": words.apply(lambda w: len(set(w))),
        }
    )
    # half-AWAY rounding, matching the engine and the DuckDB oracle
    # (python round() / pandas .round() are half-to-even and diverge on
    # 6dp ties)
    r6 = lambda x: np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6
    exp["stopword_ratio"] = r6(
        words.apply(lambda w: sum(x in ("a", "the") for x in w) / max(len(w), 1))
    )
    exp["quality_score"] = r6(exp.n_distinct_words / exp.n_words.clip(lower=1))
    exp["lang_pred"] = np.where(exp.stopword_ratio >= 0.02, "en", "unk")
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)


def test_multimodal_pipeline_deterministic(ray_session):
    a = media_pipeline_df()
    b = media_pipeline_df()
    pd.testing.assert_frame_equal(a, b)
    assert set(a.columns) == {"media_id", "frame_idx"}
    assert len(a) >= 500  # at least one frame per doc


def media_pipeline_df():
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return (
        media_pipeline(ds)
        .to_pandas()
        .astype({"media_id": int})
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )


def test_decode_rejects_unknown_type():
    stage = MediaDecodeStage()
    bad = pa.table(
        {
            "media_id": ["x"],
            "payload": pa.array([b"zz"], pa.binary()),
            "media_type": ["hologram"],
            "n_bytes": pa.array([2], pa.int64()),
        }
    )
    with pytest.raises(NotImplementedError):
        stage(bad)


def test_y4m_container_roundtrip():
    """Synthesized Y4M streams decode back to their construction
    parameters — the container round-trip for the video branch."""
    from dataflowkit_ray.stages.multimodal import _decode_y4m, _y4m_payload

    for text, w, h, nf in [(b"hello world", 32, 24, 7), (b"", 16, 16, 1), (b"x" * 500, 38, 30, 71)]:
        got = _decode_y4m(_y4m_payload(text, w, h, nf))
        assert got == {"width": w, "height": h, "n_frames": nf}


def test_y4m_parses_foreign_streams_and_rejects_bad_ones():
    """The parser handles spec features our synthesizer never emits
    (C444/Cmono colorspaces, extra header tags, FRAME parameters) and
    rejects malformed streams — i.e. it is a real Y4M reader, not a
    replay of our own writer."""
    from dataflowkit_ray.stages.multimodal import _decode_y4m

    c444 = b"YUV4MPEG2 W4 H2 F30000:1001 It A128:117 C444 XYSCSS=444\n" + (
        b"FRAME Xmeta\n" + b"\x01" * 24
    ) * 3
    assert _decode_y4m(c444) == {"width": 4, "height": 2, "n_frames": 3}

    mono = b"YUV4MPEG2 W6 H4 Cmono\n" + (b"FRAME\n" + b"\x00" * 24) * 2
    assert _decode_y4m(mono) == {"width": 6, "height": 4, "n_frames": 2}

    # default colorspace is C420 when no C tag is present
    c420 = b"YUV4MPEG2 W4 H4\n" + b"FRAME\n" + b"\x00" * 24
    assert _decode_y4m(c420) == {"width": 4, "height": 4, "n_frames": 1}

    with pytest.raises(ValueError):  # truncated frame payload
        _decode_y4m(b"YUV4MPEG2 W4 H4\nFRAME\n" + b"\x00" * 10)
    with pytest.raises(ValueError):  # garbage between frames
        _decode_y4m(b"YUV4MPEG2 W4 H4\nJUNK!\n" + b"\x00" * 24)
    with pytest.raises(ValueError):  # missing dimensions
        _decode_y4m(b"YUV4MPEG2 C420\nFRAME\n")
    with pytest.raises(NotImplementedError):  # known-unknown colorspace
        _decode_y4m(b"YUV4MPEG2 W4 H4 C411\nFRAME\n" + b"\x00" * 24)


def test_video_rows_carry_decoded_geometry(ray_session):
    """Decoded video metadata equals the Y4M header/stream contents:
    width/height from the synthesis formula, n_frames from counting
    FRAME markers."""
    import ray.data

    from dataflowkit_ray.stages.multimodal import synthesize_media

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    meta = (
        ds.map_batches(synthesize_media, batch_format="pyarrow")
        .map_batches(MediaDecodeStage, batch_format="pyarrow", concurrency=2, num_cpus=0.5)
        .to_pandas()
    )
    vids = meta[meta.media_type == "video"]
    assert len(vids) > 0
    docs = _docs_df().set_index(_docs_df().doc_id.astype(str))
    for _, r in vids.iterrows():
        n = len(docs.loc[r.media_id, "text"].encode())
        assert r.width == 16 + 2 * (n % 12)
        assert r.height == 16 + 2 * ((n // 3) % 8)
        assert r.n_frames == 8 + n % 64


def test_ivf_topk_exact_at_full_probe_and_recall_at_partial(ray_session):
    """n_probe = n_centroids must equal brute force exactly; a partial
    probe keeps high recall at a fraction of the compute."""
    import pyarrow.parquet as pq

    from dataflowkit_ray.pipelines.training import _emb, q_ann_topk
    from dataflowkit_ray.stages.ann import ivf_centroids, ivf_topk

    t = pq.read_table(f"{SF}/embeddings.parquet", filters=[("vec_id", "<", 10)])
    qv = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    qi = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    cent = ivf_centroids(_emb(SF), n_centroids=8)

    brute = q_ann_topk(SF).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    full = ivf_topk(_emb(SF), qv, qi, cent, k=5, n_probe=len(cent)).to_pandas(
    ).sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert full.equals(brute)

    part = ivf_topk(_emb(SF), qv, qi, cent, k=5, n_probe=3).to_pandas()
    bs = set(zip(brute.query_id, brute.neighbor_id))
    ps = set(zip(part.query_id, part.neighbor_id))
    # the synthetic embeddings are near-uniform random (no cluster
    # structure for the quantizer to exploit) so partial-probe recall is
    # modest by construction; on clusterable real embeddings it is far
    # higher.  Bound it loosely and check the sims are exact (precision 1)
    assert len(ps & bs) >= 0.4 * len(bs)
    merged = part.merge(brute, on=["query_id", "neighbor_id"], suffixes=("_p", "_b"))
    assert (merged.sim_p == merged.sim_b).all()


def test_exact_dedup_handles_null_text(ray_session):
    """Regression: null text rows hash like '' (the crc64 behavior) and
    must not crash the dictionary-encoded hash path."""
    import pyarrow as pa
    import ray.data

    from dataflowkit_ray.stages.dedup import exact_dedup

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a", None, "a", ""], pa.string()),
        }
    )
    got = (
        exact_dedup(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # 'a' (docs 1,3) merges; None and '' hash identically (docs 2,4 merge)
    assert list(got.doc_id) == [1, 2]
    assert list(got.n_copies) == [2, 2]


def test_ivf_scored_rows_shrink():
    """IVF must prune COMPUTE, not just output: the total number of
    scored (query, vector) entries across cells scales with
    n_probe / n_centroids, and full probe scores exactly Q x N."""
    import pyarrow as pa

    from dataflowkit_ray.stages.ann import _score_cell, _unit

    rng = np.random.default_rng(7)
    n, dim, n_cent, n_q = 400, 16, 8, 10
    vecs = _unit(rng.normal(size=(n, dim)))
    cent = _unit(rng.normal(size=(n_cent, dim)))
    q = _unit(rng.normal(size=(n_q, dim)))
    qids = np.arange(10_000, 10_000 + n_q, dtype=np.int64)
    cells = np.argmax(vecs @ cent.T, axis=1)

    def scored_total(n_probe: int) -> int:
        probe = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]
        probed = np.zeros((n_q, n_cent), dtype=bool)
        probed[np.arange(n_q)[:, None], probe] = True
        total = 0
        for c in range(n_cent):
            m = cells == c
            t = pa.table(
                {
                    "_cell": pa.array(np.full(m.sum(), c, dtype=np.int64)),
                    "vec_id": pa.array(np.nonzero(m)[0].astype(np.int64)),
                    "vec": pa.array(vecs[m].tolist()),
                }
            )
            _tbl, n_scored = _score_cell(t, q, qids, probed, k=5)
            total += n_scored
        return total

    full = scored_total(n_cent)
    assert full == n_q * n  # full probe == brute-force compute
    half = scored_total(n_cent // 2)
    quarter = scored_total(n_cent // 4)
    # cells are uneven, so bound loosely around the proportional shrink
    assert 0.2 * full <= half <= 0.8 * full
    assert quarter < half


def test_pairs_from_groups_drops_overdense_groups(caplog):
    """A band key shared by L docs emits O(L^2) pairs; beyond
    max_group_size the group is dropped WITH a logged count (the
    no-silent-caps rule) while normal groups still pair."""
    import logging

    from dataflowkit_ray.stages.dedup import _pairs_from_groups

    hot = np.arange(2000, dtype=np.int64)  # one band key, 2e6 candidate pairs
    cool = np.array([9001, 9002], dtype=np.int64)
    ids = np.concatenate([hot, cool])
    groups = np.concatenate(
        [np.zeros(2000, dtype=np.int64), np.ones(2, dtype=np.int64)]
    )
    with caplog.at_level(logging.WARNING, logger="dataflowkit_ray.stages.dedup"):
        pairs = _pairs_from_groups(ids, groups, max_group_size=512)
    assert pairs.tolist() == [[9001, 9002]]  # hot group dropped, cool kept
    assert any("over-dense" in r.message for r in caplog.records)
    assert any("1999000" in r.message for r in caplog.records)  # forfeited count


def test_minhash_hot_band_bounded(ray_session):
    """1000 identical docs (every band key shared by all of them)
    completes in bounded time/memory: the over-dense guard drops the
    exploding band groups instead of emitting ~5e5 pairs per band."""
    import time

    import pyarrow as pa
    import ray.data

    from dataflowkit_ray.stages.dedup import minhash_lsh_pairs

    n = 1000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["the same boilerplate text repeated verbatim"] * n),
        }
    )
    ds = ray.data.from_arrow(t)
    t0 = time.perf_counter()
    out = minhash_lsh_pairs(ds, threshold=0.8, k=64, bands=16).to_pandas()
    assert time.perf_counter() - t0 < 60
    # every surviving pair must still be a true duplicate
    assert (out["jaccard"] >= 0.8).all() if len(out) else True


def test_multimodal_real_container_roundtrip():
    """The PGM/WAV payloads are REAL container files: the decode stage
    recovers exactly the planted dimensions / sample counts by parsing
    bytes, and a corrupted image raises instead of guessing."""
    import pyarrow as pa
    import pytest

    from dataflowkit_ray.stages.multimodal import (
        MediaDecodeStage,
        _decode_pgm,
        synthesize_media,
    )

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),  # 0 -> image, 1 -> audio
            "text": pa.array(["hello world tokens here", "a b c d e f g"]),
        }
    )
    media = synthesize_media(docs)
    out = MediaDecodeStage()(media)
    img = out.slice(0, 1).to_pylist()[0]
    n = len("hello world tokens here".encode())
    assert img["width"] == 8 + n % 24 and img["height"] == 8 + (n // 3) % 16
    aud = out.slice(1, 1).to_pylist()[0]
    m = len("a b c d e f g".encode())
    assert aud["n_frames"] == 64 + m % 256  # decoded WAV sample count
    assert aud["width"] == 8000 and aud["height"] == 1  # rate / channels

    with pytest.raises(ValueError, match="truncated"):
        _decode_pgm(b"P5\n4 4\n255\n" + b"x" * 7)


def test_ngram_jaccard_boilerplate_corpus_completes(ray_session):
    """The planted hot-shingle corpus: 1000 IDENTICAL boilerplate docs
    (every shingle df=1000 >> df_cap) plus two near-dup distinct docs.
    Round 4 raised here; the df-capped semantics complete — boilerplate
    shingles leave the similarity universe, the real near-dup pair
    survives with its jaccard computed over the capped universe."""
    import ray

    boiler = "terms of service apply to all users of this site"
    texts = [boiler] * 1000 + [
        "quick brown foxes jump over lazy dogs today",
        "quick brown foxes jump over lazy dogs tonight",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
            }
        )
    )
    out = (
        ngram_jaccard_pairs(ds, threshold=0.3, n_buckets=4, df_cap=512)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    # identical boilerplate docs: all their shingles are hot -> no pairs
    # from them; the two distinct 8-word docs share 5 of their 6+6
    # trigrams (union 7)
    assert out.doc_a.tolist() == [1000]
    assert out.doc_b.tolist() == [1001]
    assert abs(out.jaccard[0] - round(5 / 7, 6)) < 1e-9


def test_ngram_jaccard_df_cap_matches_filtered_oracle(ray_session):
    """With the cap ACTIVE (small df_cap on a templated corpus) the
    engine must equal DuckDB computing exact Jaccard over the SAME
    df-filtered gram universe (the gate at sf0.01 never activates the
    filter — every df <= corpus size < 512)."""
    import duckdb
    import ray

    from dataflowkit_ray.pipelines.training import ngram_jaccard_oracle_sql

    rng = range(30)
    texts = [
        # shared template head (hot at df_cap=8) + per-group tail
        "the standard header line for docs group %d variant %d extra words"
        % (i % 3, i % 2)
        for i in rng
    ]
    t = pa.table({"doc_id": pa.array(rng, pa.int64()), "text": texts})
    got = (
        ngram_jaccard_pairs(
            ray.data.from_arrow(t), threshold=0.4, n_buckets=4, df_cap=8
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    exp = (
        con.execute(ngram_jaccard_oracle_sql(threshold=0.4, df_cap=8))
        .df()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(exp) > 0  # the scenario really produces pairs
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dedup_clusters_transitive_chains(ray_session):
    """Hash-min CC must collapse transitive chains (A~B, B~C with A!~C)
    to one survivor, keep singletons, and converge on a long path
    (diameter >> 2 exercises the iteration loop, not just one round)."""
    import ray

    from dataflowkit_ray.stages.dedup import dedup_clusters

    chain = list(range(10, 20))  # path 10-11-...-19, diameter 9
    pairs = [(1, 2), (2, 3)] + list(zip(chain[:-1], chain[1:]))
    pairs_t = pa.table(
        {
            "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
            "doc_b": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    ids_t = pa.table({"doc_id": pa.array(range(25), pa.int64())})
    out = (
        dedup_clusters(ray.data.from_arrow(pairs_t), ray.data.from_arrow(ids_t))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[[1, 2, 3], "cluster_id"].tolist() == [1, 1, 1]
    assert (out.loc[chain, "cluster_id"] == 10).all()
    singles = [i for i in range(25) if i not in {1, 2, 3, *chain}]
    assert (out.loc[singles, "cluster_id"] == singles).all()
    assert out.keep.sum() == 25 - 2 - (len(chain) - 1)
    assert len(out) == 25


def test_dedup_clusters_modes_agree(ray_session):
    """The actor-BSP path (default) and the Dataset formulation must
    produce identical components on a random graph."""
    import ray

    from dataflowkit_ray.stages.dedup import dedup_clusters

    rng = np.random.default_rng(3)
    a = rng.integers(0, 200, size=120).astype("int64")
    b = rng.integers(0, 200, size=120).astype("int64")
    m = a != b
    pairs_t = pa.table({"doc_a": pa.array(a[m]), "doc_b": pa.array(b[m])})
    ids_t = pa.table({"doc_id": pa.array(range(200), pa.int64())})

    outs = {}
    for mode in ("actors", "dataset"):
        outs[mode] = (
            dedup_clusters(
                ray.data.from_arrow(pairs_t),
                ray.data.from_arrow(ids_t),
                mode=mode,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert outs["actors"].equals(outs["dataset"])
    assert outs["actors"].keep.sum() < 200  # graph actually merged nodes


def test_dedup_clusters_unknown_endpoints_dropped(ray_session):
    """The ids stream defines the node universe: edges touching ids
    absent from it must be DROPPED in both modes — not mint output rows
    for non-existent docs, and not transitively merge components
    through them."""
    import ray

    from dataflowkit_ray.stages.dedup import dedup_clusters

    pairs_t = pa.table(
        {
            "doc_a": pa.array([1, 99, 5], pa.int64()),
            "doc_b": pa.array([99, 2, 6], pa.int64()),
        }
    )
    ids_t = pa.table({"doc_id": pa.array(range(10), pa.int64())})
    for mode in ("actors", "dataset"):
        out = (
            dedup_clusters(
                ray.data.from_arrow(pairs_t),
                ray.data.from_arrow(ids_t),
                mode=mode,
            )
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert len(out) == 10 and 99 not in out.index, mode
        # 1 and 2 must NOT merge through the unknown node 99
        assert out.loc[1, "cluster_id"] == 1 and out.loc[2, "cluster_id"] == 2, mode
        assert out.loc[6, "cluster_id"] == 5, mode  # real edge still works


def test_exact_dedup_128bit_survives_lane1_collision(ray_session):
    """Two DISTINCT texts whose first 64-bit hash lane collides must BOTH
    survive exact_dedup (the round-4 verdict's false-merge finding): the
    group key is both lanes.  The collision is planted via the injectable
    hash_fn — lane 1 constant (total collision), lane 2 = real hash."""
    import ray

    from dataflowkit_ray.stages.dedup import exact_dedup
    from dataflowkit_ray.tokenize import full_hash128

    def colliding(text):
        h1, h2 = full_hash128(text)
        return np.zeros_like(h1), h2  # lane 1 collides for EVERY doc

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["alpha text", "beta text", "alpha text"],
        }
    )
    out = (
        exact_dedup(ray.data.from_arrow(t), hash_fn=colliding)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # distinct texts kept apart despite full lane-1 collision; the true
    # duplicate still folds
    assert out.doc_id.tolist() == [0, 1]
    assert out.n_copies.tolist() == [2, 1]


def test_full_hash128_lanes_independent_and_deterministic():
    from dataflowkit_ray.tokenize import full_hash128

    a = pa.array(["x", "y", "x", None, ""])
    l1, l2 = full_hash128(a)
    m1, m2 = full_hash128(a)
    assert (l1 == m1).all() and (l2 == m2).all()
    assert l1[0] == l1[2] and l2[0] == l2[2]
    assert l1[0] != l1[1] and l2[0] != l2[1]
    assert l1[3] == l1[4] and l2[3] == l2[4]  # null hashes as ""
    assert l1[0] != l2[0]  # lanes are different functions


def test_decontaminate_planted_overlap(ray_session):
    """Planted train/test overlap: shared trigram counted, disjoint doc
    clean, <3-word docs fall back to word-level overlap (same regimes
    as the shingle definition)."""
    import pyarrow as pa
    import ray.data

    from dataflowkit_ray.stages.dedup import decontaminate

    bench = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["100", "101"],
                "text": ["alpha beta gamma delta", "zz qq"],
            }
        )
    )
    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["1", "2", "3"],
                "text": [
                    # shares trigrams "alpha beta gamma" + "beta gamma delta"
                    "prefix alpha beta gamma delta suffix",
                    "completely disjoint words here",
                    "zz",  # <3 words: word-level hit against bench doc 101
                ],
            }
        )
    )
    got = (
        decontaminate(train, bench)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.doc_id.tolist() == [1, 2, 3]
    assert got.n_contaminated_shingles.tolist() == [2, 0, 1]
    assert got.contaminated.tolist() == [True, False, True]


def test_mixture_sample_rates(ray_session):
    """rate 1000 keeps every row, rate 0 drops every row, unknown
    sources take the default, and the predicate is deterministic."""
    import pyarrow as pa
    import ray.data

    from dataflowkit_ray.stages.policy import mixture_bucket, mixture_sample

    import numpy as np

    n = 400
    t = pa.table(
        {
            "doc_id": [str(i) for i in range(n)],
            "n_tok": pa.array(np.arange(n, dtype=np.int64)),
            "source": (["all"] * 100 + ["none"] * 100 + ["half"] * 100 + ["other"] * 100),
        }
    )
    rates = {"all": 1000, "none": 0, "half": 500}
    got = (
        mixture_sample(ray.data.from_arrow(t), rates, default_pm=1000)
        .to_pandas()
        .sort_values("doc_id")
    )
    by = got.groupby("source").size().to_dict()
    assert by["all"] == 100
    assert "none" not in by
    assert by["other"] == 100  # default_pm=1000
    # half: exactly the ids whose bucket < 500 (deterministic replay)
    ids = np.arange(200, 300, dtype=np.int64)
    expect_half = int((mixture_bucket(ids) < 500).sum())
    assert by["half"] == expect_half and 0 < expect_half < 100


def test_mixture_bucket_sql_parity_including_negative_ids():
    """The DuckDB twin must bucket IDENTICALLY to the engine — DuckDB's
    sign-keeping % vs numpy's wrapping uint64 cast diverge unless the id
    is mapped into [0, 2^64) first; negative and extreme ids exercise
    that mapping."""
    import duckdb
    import numpy as np

    from dataflowkit_ray.stages.policy import MIXTURE_KEY_SQL, mixture_bucket

    ids = np.array(
        [-5, -1, 0, 7, -(2**62), 2**62, (2**63) - 1, -(2**63)], dtype=np.int64
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(int(i),) for i in ids])
    sql = (
        con.execute(f"SELECT {MIXTURE_KEY_SQL} FROM t ORDER BY rowid")
        .df()
        .iloc[:, 0]
        .to_numpy()
    )
    assert (sql == mixture_bucket(ids)).all()


def test_mixture_sample_sql_empty_rates_and_quote_escape():
    """Degenerate SQL shapes must stay parseable: no rates (default-only,
    a WHEN-less CASE would be a parse error) and a source name with a
    single quote."""
    import duckdb

    from dataflowkit_ray.stages.policy import mixture_sample_sql

    cte = "tok AS (SELECT 1 AS doc_id, 2 AS n_tok, 'o''reilly' AS source)"
    con = duckdb.connect()
    for rates in ({}, {"o'reilly": 1000}):
        q = mixture_sample_sql(rates, default_pm=1000, token_cte=cte)
        assert len(con.execute(q).df()) == 1  # parses and keeps the row


def test_pack_manifest_planted_boundaries(ray_session):
    """Hand-checked packing: docs straddling pack boundaries, an exact
    fit, and a zero-token doc (clamped into its starting pack)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dataflowkit_ray.stages.pack import pack_manifest

    t = pa.table(
        {
            "doc_id": pa.array(list(range(5)), pa.int64()),
            "n_tok": pa.array([6, 4, 0, 10, 3], pa.int64()),
            "event_seq": pa.array([0, 1, 2, 3, 4], pa.int64()),
        }
    )
    got = (
        pack_manifest(ray.data.from_arrow(t).repartition(3), seq_len=8, group_size=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # stream: [0,6) [6,10) [10,10) [10,20) [20,23)  with packs of 8
    assert got.global_start.tolist() == [0, 6, 10, 10, 20]
    assert got.pack_first.tolist() == [0, 0, 1, 1, 2]
    assert got.pack_last.tolist() == [0, 1, 1, 2, 2]  # zero-tok doc clamped


def test_pack_manifest_empty_and_negative_inputs(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dataflowkit_ray.stages.pack import pack_manifest

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_tok": pa.array([], pa.int64()),
            "event_seq": pa.array([], pa.int64()),
        }
    )
    out = pack_manifest(ray.data.from_arrow(empty), seq_len=8)
    assert out.schema().names == [
        "doc_id", "global_start", "pack_first", "pack_last",
    ]
    assert out.count() == 0

    neg = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "n_tok": pa.array([3, 4], pa.int64()),
            "event_seq": pa.array([-2, 0], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="non-negative"):
        pack_manifest(ray.data.from_arrow(neg), seq_len=8).to_pandas()


def test_spec_terminal_rejects_ignored_analytic_stages():
    from dataflowkit_ray.spec import (
        PackSpec,
        PipelineSpec,
        SourceSpec,
        SpecError,
        WindowSpec,
        validate_spec,
    )

    with pytest.raises(SpecError, match="silently ignored"):
        validate_spec(
            PipelineSpec(
                name="p",
                source=SourceSpec(paths=["x.parquet"]),
                pack=PackSpec(),
                window=WindowSpec(),
            )
        )
