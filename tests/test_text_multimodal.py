"""Text-analysis + multimodal plumbing validation."""

from pyspark.sql import functions as F

from guardian_for_apache_kafka_spark.operators.multimodal import (
    attach_media,
    extract_image_features,
    frame_sample_plan,
)
from guardian_for_apache_kafka_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)
from guardian_for_apache_kafka_spark.sources.tables import load_table


def test_token_stats_first_principles(spark):
    df = spark.createDataFrame([(1, "a bb ccc a")], "doc_id long, text string")
    r = token_stats(df).collect()[0]
    assert r.n_tokens == 4
    assert r.n_distinct_tokens == 3
    assert r.text_len == 10
    assert abs(r.avg_token_len - 7 / 4) < 1e-12
    assert r.n_bpe_tokens == 4


def test_quality_score_bounds(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    scored = quality_score(d)
    assert scored.where((F.col("quality") < 0) | (F.col("quality") > 1)).count() == 0
    # repeated-token junk scores below diverse text
    junk = spark.createDataFrame([(1, " ".join(["spam"] * 60))], "doc_id long, text string")
    good = spark.createDataFrame(
        [(2, "the quick brown fox jumps over lazy dogs with great skill and energy " * 4)],
        "doc_id long, text string",
    )
    jq = quality_score(junk).collect()[0].quality
    gq = quality_score(good).collect()[0].quality
    assert gq > jq


def test_language_id_stopword_evidence(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is that big with fur"),
            (2, "el perro y la casa de los gatos que en madrid por ahi"),
            (3, "der hund und die katze ist von den bergen mit schnee"),
            (4, "xyzzy qwerty plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang_pred for r in language_id(df).collect()}
    assert got[1] == "en" and got[2] == "es" and got[3] == "de" and got[4] == "und"


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    assert fps[1] == fps[3]
    assert fps[1] != fps[2]


def test_multimodal_plumbing_roundtrip(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(d, "blob", "image", "png")
    assert [f.name for f in media.schema.fields] == ["doc_id", "content", "meta"]
    feats = extract_image_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert 64 <= r.width < 256 and 64 <= r.height < 256
        assert 1 <= r.n_channels <= 4
        assert r.media_type == "image"
        assert len(r.sha256) == 64
    # determinism: same content -> same fake decode
    again = {r.doc_id: (r.width, r.height) for r in extract_image_features(media).collect()}
    assert all(again[r.doc_id] == (r.width, r.height) for r in rows)


def test_frame_sample_plan_shape(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(3).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(d, "blob", "video", "mp4")
    plan = frame_sample_plan(media, every_n=10, max_frames=4)
    rows = plan.collect()
    assert len(rows) == 12
    assert {r.frame_index for r in rows} == {0, 10, 20, 30}


def test_audio_features_and_resize_plumbing(spark, sf_dir):
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.operators.multimodal import (
        extract_audio_features,
        resize_images,
    )
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").limit(50).withColumn(
        "blob", F.encode("text", "utf-8")
    )
    media = attach_media(d, "blob", "audio", "wav")

    audio = extract_audio_features(media)
    rows = audio.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.sample_rate in (8000, 16000, 22050, 44100)
        assert abs(r.duration_s - r.n_samples / r.sample_rate) < 1e-5
    # determinism across runs
    again = {r.doc_id: r.sha256 for r in extract_audio_features(media).collect()}
    assert {r.doc_id: r.sha256 for r in rows} == again

    resized = resize_images(attach_media(d, "blob", "image", "png"), 128, 128)
    rr = resized.collect()
    assert len(rr) == 50
    assert all(r.width == 128 and r.height == 128 and r.format == "png" for r in rr)
    assert all(len(bytes(r.content)) >= 32 for r in rr)


def test_repetition_stats_first_principles(spark):
    from guardian_for_apache_kafka_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a a a b"),          # top 'a' x3, bigrams: [a a, a a, a b] -> dup ratio 1/3
            (2, "x"),                # single token: no bigrams
            (3, "p q p q"),          # bigrams [p q, q p, p q] -> dup 1/3; top share 0.5
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows[1].n_tokens == 4
    assert rows[1].distinct_ratio == 0.5
    assert rows[1].top_share == 0.75
    assert rows[1].dup_bigram_ratio == round(1 - 2 / 3, 4)
    assert rows[2].n_tokens == 1 and rows[2].dup_bigram_ratio == 0.0
    assert rows[2].top_share == 1.0
    assert rows[3].top_share == 0.5
    assert rows[3].dup_bigram_ratio == round(1 - 2 / 3, 4)


def test_quality_filter_reasons_independent(spark):
    from guardian_for_apache_kafka_spark.operators.text import quality_filter

    short_spam = "the " * 9 + "the"          # 10 tokens, 1 distinct, all stopwords
    good = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, short_spam.strip()), (2, good)], "doc_id int, text string"
    )
    rows = {r.doc_id: r for r in quality_filter(df).collect()}
    assert rows[1].too_short and rows[1].low_diversity and rows[1].stopword_heavy
    assert not rows[1].kept
    assert rows[2].kept and not any(
        [rows[2].too_short, rows[2].too_long, rows[2].low_diversity, rows[2].stopword_heavy]
    )


def test_chunk_documents_covers_every_token_with_overlap(spark):
    """Chunking invariants: full coverage (every token position lands in some
    chunk), stride spacing, window-bounded lengths, and the final chunk
    reaching the document end; short docs give exactly one chunk."""
    from guardian_for_apache_kafka_spark.operators.text import chunk_documents

    texts = [
        (1, " ".join(f"t{i}" for i in range(100))),   # many chunks
        (2, " ".join(f"t{i}" for i in range(32))),     # exactly window
        (3, " ".join(f"t{i}" for i in range(31))),     # just under
        (4, " ".join(f"t{i}" for i in range(33))),     # just over
        (5, "single"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = chunk_documents(df, window=32, stride=24).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    import math

    for doc_id, text in texts:
        n = len(text.split(" "))
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        expect = 1 if n <= 32 else math.ceil((n - 32) / 24) + 1
        assert len(chunks) == expect, (doc_id, n)
        assert [c.chunk_id for c in chunks] == list(range(expect))
        # all but the last chunk are full windows; coverage reaches the end
        for c in chunks[:-1]:
            assert c.n_tokens == 32
        last_start = (expect - 1) * 24
        assert chunks[-1].n_tokens == n - last_start
        assert last_start + chunks[-1].n_tokens == n  # no token dropped


def test_incremental_dedup_drops_only_new_near_dups(spark):
    """New docs near-duplicating the reference are dropped; new-new
    duplicates survive (incremental dedup must not compare the batch against
    itself) and the reference is untouched by construction."""
    from guardian_for_apache_kafka_spark.operators.dedup import incremental_dedup

    base = " ".join(f"w{i}" for i in range(20))
    ref = spark.createDataFrame([(0, base)], "doc_id long, text string")
    new = spark.createDataFrame(
        [
            (10, base),                                  # exact dup of ref -> dropped
            (11, base.replace("w19", "changed")),        # near-dup of ref -> dropped
            (12, " ".join(f"x{i}" for i in range(20))),  # novel -> kept
            (13, " ".join(f"x{i}" for i in range(20))),  # dup of 12 (new-new) -> kept
        ],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in incremental_dedup(new, ref, threshold=0.5).collect())
    assert kept == [12, 13]


def test_cluster_representatives_pick_best_quality(spark):
    """Representative = highest quality in the component, ties to lowest id;
    cluster ids and sizes follow the min-id component convention."""
    from guardian_for_apache_kafka_spark.operators.clusters import cluster_representatives

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (7, 5), (8, 50)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id_a long, id_b long")
    got = {r.component: r for r in cluster_representatives(docs, pairs).collect()}
    assert set(got) == {1, 7}
    assert got[1].cluster_size == 3 and got[1].rep_id == 2 and got[1].rep_quality == 99
    assert got[7].cluster_size == 2 and got[7].rep_id == 8


def test_decontaminate_flags_match_brute_force(spark):
    """Every flagged vector has a true eval neighbor >= threshold, every
    unflagged one has none, and the reported eval id is the argmax."""
    from guardian_for_apache_kafka_spark.operators.similarity import decontaminate
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = e.where("vec_id >= 10")
    eval_set = e.where("vec_id < 10").selectExpr("vec_id AS query_id", "embedding")
    got = {r.vec_id: (r.best_eval_id, r.cosine) for r in
           decontaminate(corpus, eval_set, threshold=0.3).collect()}

    import numpy as np

    ev = {r.query_id: np.array(r.embedding, dtype=np.float64)
          for r in eval_set.collect()}
    for row in corpus.collect():
        v = np.array(row.embedding, dtype=np.float64)
        best = max(
            ((qid, float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))))
             for qid, q in ev.items()),
            key=lambda t: (t[1], -t[0]),
        )
        if best[1] >= 0.3 + 1e-9:
            assert row.vec_id in got, row.vec_id
            assert got[row.vec_id][0] == best[0]
        elif best[1] < 0.3 - 1e-9:
            assert row.vec_id not in got


def test_pack_sequences_greedy_invariants(spark):
    """pack_sequences: every sequence's fill <= budget unless it is a single
    over-budget document; seq_ids are dense per group; offsets reconstruct
    the fill exactly; a repeat run is identical (deterministic walk)."""
    from guardian_for_apache_kafka_spark.operators.packing import (
        pack_sequences,
        packing_stats,
    )

    rows = [
        ("a", 0, "w " * 50), ("a", 1, "w " * 60), ("a", 2, "w " * 10),
        ("a", 3, "w " * 200),          # over budget: alone in its sequence
        ("a", 4, "w " * 30),
        ("b", 10, "w " * 100), ("b", 11, "w " * 100),
    ]
    df = spark.createDataFrame(
        [(s, i, t.strip()) for s, i, t in rows], "source string, doc_id long, text string"
    )
    packed = pack_sequences(df, budget=100)
    got = {(r.source, r.doc_id): (r.n_tokens, r.seq_id, r.seq_offset)
           for r in packed.collect()}
    assert got[("a", 0)] == (50, 0, 0)
    assert got[("a", 1)] == (60, 1, 0)      # 50+60 > 100 -> new sequence
    assert got[("a", 2)] == (10, 1, 60)
    assert got[("a", 3)] == (200, 2, 0)     # over-budget doc sits alone
    assert got[("a", 4)] == (30, 3, 0)      # and closes its sequence
    assert got[("b", 10)] == (100, 0, 0)
    assert got[("b", 11)] == (100, 1, 0)

    fills = {}
    for (src, _), (n, seq, off) in got.items():
        assert off + n <= 100 or (off == 0 and n > 100)
        fills.setdefault((src, seq), 0)
        fills[(src, seq)] += n
    seqs_a = sorted(seq for (src, seq) in fills if src == "a")
    assert seqs_a == list(range(len(seqs_a)))  # dense numbering

    stats = {r.source: r for r in packing_stats(packed, budget=100).collect()}
    assert stats["a"].n_seqs == 4 and stats["a"].n_docs == 5
    assert stats["b"].utilization == 1.0

    again = {(r.source, r.doc_id): (r.n_tokens, r.seq_id, r.seq_offset)
             for r in pack_sequences(df, budget=100).collect()}
    assert again == got


def test_scrub_pii_redacts_and_counts(spark):
    """scrub_pii: every planted email/phone/IP is tagged, counts match the
    plants, PII-free text passes through byte-identical."""
    from guardian_for_apache_kafka_spark.operators.text import scrub_pii

    rows = [
        (0, "mail me at alice.smith+x@sub.example.org thanks"),
        (1, "call +1-555-0199 or +44-555-0200 now"),
        (2, "server at 192.168.1.7 and 10.0.0.255"),
        (3, "mixed bob@ex.co +1-555-1234 1.2.3.4"),
        (4, "nothing sensitive here 12345 not.an.ip"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert (got[0].n_email, got[0].n_phone, got[0].n_ipv4) == (1, 0, 0)
    assert "<EMAIL>" in got[0].redacted and "alice" not in got[0].redacted
    assert (got[1].n_phone, got[1].n_email) == (2, 0)
    assert got[1].redacted.count("<PHONE>") == 2
    assert (got[2].n_ipv4, got[2].n_email) == (2, 0)
    assert got[2].redacted.count("<IP>") == 2
    assert (got[3].n_email, got[3].n_phone, got[3].n_ipv4) == (1, 1, 1)
    assert (got[4].n_email, got[4].n_phone, got[4].n_ipv4) == (0, 0, 0)
    assert got[4].redacted == rows[4][1]


def test_temperature_mixture_quotas_and_stability(spark):
    """temperature_mixture: kept total <= target, per-group kept <= group
    size, sqrt scaling keeps a LARGER share of small groups, membership is
    repeat-stable and content-stable (ids independent of row order)."""
    from guardian_for_apache_kafka_spark.operators.sampling import temperature_mixture

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_mixture(df, target=200, group_col="lang").collect()
    by = {}
    for r in kept:
        by.setdefault(r.lang, set()).add(r.doc_id)
    assert len(kept) <= 200
    assert len(by["big"]) <= 900 and len(by["small"]) <= 100
    # sqrt scaling: big keeps a smaller FRACTION than small
    assert len(by["big"]) / 900 < len(by["small"]) / 100
    again = temperature_mixture(df.orderBy(F.rand(7)), target=200, group_col="lang").collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in kept}


def test_rolling_zscore_first_principles(spark):
    """rolling_zscore_anomalies vs a direct numpy computation: same flagged
    ids and z values; rows without a full lookback window never score."""
    import datetime as dt

    import numpy as np

    from guardian_for_apache_kafka_spark.operators.timeseries import (
        rolling_zscore_anomalies,
    )

    base = dt.datetime(2024, 1, 1)
    vals = [10.0 + (i % 5) * 0.25 for i in range(40)]
    vals[30] = 99.99  # planted spike
    rows = [(i, base + dt.timedelta(minutes=i), "k", vals[i]) for i in range(40)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    got = {r.event_id: r.z for r in rolling_zscore_anomalies(df, lookback=20, z_threshold=3.0).collect()}

    xs = np.round(np.array(vals) * 100).astype(np.int64)
    expect = {}
    for i in range(20, 40):
        w = xs[i - 20 : i]
        n, sx, sxx = 20, int(w.sum()), int((w * w).sum())
        var_term = n * sxx - sx * sx
        if var_term <= 0:
            continue
        z = float((n * xs[i] - sx) * np.sqrt((n - 1) / (n * var_term)))
        if abs(z) >= 3.0:
            expect[i] = z
    assert set(got) == set(expect)
    for i, z in expect.items():
        assert abs(got[i] - z) < 1e-9
    assert all(i >= 20 for i in got)


def test_normalize_text_canonicalizes_for_dedup(spark):
    """normalize_text: NFC composes decomposed accents (so exact-dedup
    hashing can't be defeated by encoding), case folds, strips control
    chars, collapses whitespace; already-canonical text is unchanged."""
    from guardian_for_apache_kafka_spark.operators.text import normalize_text

    decomposed = "café  BAR\tbaz\n"     # e + combining acute
    composed = "café bar baz"
    rows = [(1, decomposed), (2, composed), (3, "plain text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.norm_text for r in normalize_text(df).collect()}
    assert got[1] == got[2] == "café bar baz"
    assert got[3] == "plain text"


def test_heavy_hitters_recall_under_adversarial_partitioning(spark):
    """The Misra-Gries candidate pass must have recall 1 whatever the
    partitioning: a heavy token spread thinly across partitions (never
    locally dominant) still reaches the exact confirm, and the output
    equals the exact GROUP BY result. A tiny summary cap stresses the
    trim path."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.operators.text import token_heavy_hitters

    # 64 partitions; 'needle' appears twice per partition (never a local
    # majority against 150 DISTINCT fillers per partition — more than the
    # summary cap, so every partition trims repeatedly), globally 128/9728
    # = 1.3% >= the 1% threshold, inside the n/(cap+1) recall bound the
    # operator enforces (cap=100 >= 1/frac)
    rows = []
    for p in range(64):
        fillers = " ".join(f"f{p}_{i}" for i in range(150))
        rows.append((p, f"needle {fillers} needle"))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(64, "doc_id")
    got = {
        (r.token, r.cnt)
        for r in token_heavy_hitters(df, threshold_frac=0.01, summary_size=100).collect()
    }
    exact = {
        (r.token, r.cnt)
        for r in df.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(
            df.select(F.explode(F.split("text", " ")).alias("t"))
            .agg(F.count("*").alias("tot"))
        )
        .where(F.col("cnt") >= F.col("tot") * 0.01)
        .select(F.col("t").alias("token"), F.col("cnt").cast("long").alias("cnt"))
        .collect()
    }
    assert got == exact and ("needle", 128) in got


def test_bigram_cross_entropy_short_docs_excluded(spark):
    """Docs with < 2 tokens produce no bigrams and must be absent; scores
    are identical between the broadcast and shuffle-join branches."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.operators.text import bigram_cross_entropy

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "solo"), (3, "a b")],
        "doc_id long, text string",
    )
    bc = {r.doc_id: round(r.cross_entropy, 9) for r in bigram_cross_entropy(df, broadcast_model=True).collect()}
    sh = {r.doc_id: round(r.cross_entropy, 9) for r in bigram_cross_entropy(df, broadcast_model=False).collect()}
    assert set(bc) == {1, 3} and bc == sh


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "hot"]),
                 min_size=1, max_size=12),
        min_size=1, max_size=25,
    ),
    frac=st.sampled_from([0.05, 0.1, 0.2]),
)
def test_heavy_hitters_property_equals_exact(spark, docs, frac):
    """Property: the Misra-Gries candidate + exact-confirm pipeline equals
    the plain exact GROUP BY/HAVING on arbitrary small corpora and
    thresholds. The smallest cap the recall bound allows stresses the trim
    path (a smaller one is refused — see the operator guard)."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.operators.text import token_heavy_hitters

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    cap = int(1 / frac) + 1
    got = {
        (r.token, r.cnt)
        for r in token_heavy_hitters(df, threshold_frac=frac, summary_size=cap).collect()
    }
    from collections import Counter

    counts = Counter(t for toks in docs for t in toks)
    total = sum(counts.values())
    want = {(t, c) for t, c in counts.items() if c >= total * frac}
    assert got == want


def _ref_bpe(texts, rounds):
    """Driver-side reference BPE (index-walk greedy merge, the textbook
    formulation) — deliberately a DIFFERENT algorithm shape than the
    operator's aggregate fold, so structural bugs in either can't cancel."""
    from collections import Counter

    words = Counter(w for t in texts for w in t.split(" ") if w)
    segs = {w: list(w) for w in words}
    rules = []
    for rnd in range(1, rounds + 1):
        pc = Counter()
        for w, c in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((rnd, l, r, l + r, cnt))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return rules


def test_bpe_greedy_overlap_and_tiebreak(spark):
    """'aaaa' with rule (a,a) must merge non-overlapping left-to-right
    ([aa, aa], never [a, aa, a] or cascade to [aaaa]); count ties must
    break on (lhs, rhs) ascending."""
    from guardian_for_apache_kafka_spark.operators.text import bpe_merge_rules

    texts = ["aaaa aaaa", "bc bc"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_merge_rules(df, rounds=3)
    assert got == _ref_bpe(texts, 3)
    # round 1: (a,a) appears 3x per 'aaaa' word-occurrence = 6; (b,c) = 2
    assert got[0] == (1, "a", "a", "aa", 6)
    # round 2: after merging, each 'aaaa' is [aa, aa] -> pair (aa,aa) x2
    # ties with (b,c) x2 -> (aa,aa) wins lexicographically
    assert got[1] == (2, "aa", "aa", "aaaa", 2)


def test_bpe_matches_reference_on_seeded_corpus(spark):
    """5 rounds over a seeded 2-letter corpus (dense overlaps and ties)
    must match the reference index-walk implementation exactly."""
    import random

    from guardian_for_apache_kafka_spark.operators.text import bpe_merge_rules

    rng = random.Random(42)
    texts = [
        " ".join(
            "".join(rng.choice("ab") for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(40)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert bpe_merge_rules(df, rounds=5) == _ref_bpe(texts, 5)


def _ref_bpe_batched(texts, rounds, batch_k):
    """Driver-side reference for BATCHED BPE: same dominance selection
    (rank by (-cnt, l, r); candidate window 16*batch_k; a pair is selected
    iff no higher-ranked candidate shares a symbol) and a single
    left-to-right non-overlapping merge pass per round applying all
    selected pairs. Index-walk shape, independent of the operator's fold."""
    from collections import Counter

    words = Counter(w for t in texts for w in t.split(" ") if w)
    segs = {w: list(w) for w in words}
    rules = []
    for _ in range(rounds):
        pc = Counter()
        for w, c in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[: 16 * batch_k]
        sel, used = [], set()
        for (l, r), cnt in ranked:
            if len(sel) == batch_k:
                break
            if l not in used and r not in used:
                sel.append((l, r, cnt))
            used.add(l)
            used.add(r)
        batch = {(l, r): l + r for l, r, _ in sel}
        for l, r, cnt in sel:
            rules.append((len(rules) + 1, l, r, l + r, cnt))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) in batch:
                    out.append(batch[(s[i], s[i + 1])])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return rules


def test_bpe_batched_matches_reference(spark):
    """batch_k > 1 learns multiple symbol-disjoint merges per Spark round;
    results must match the independent index-walk reference, and batch_k=1
    must stay the textbook sequential algorithm on the same corpus."""
    import random

    from guardian_for_apache_kafka_spark.operators.text import bpe_merge_rules

    rng = random.Random(7)
    texts = [
        " ".join(
            "".join(rng.choice("abcdefgh") for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(1, 10))
        )
        for _ in range(50)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_merge_rules(df, rounds=2, batch_k=4)
    assert got == _ref_bpe_batched(texts, 2, 4)
    # strictly more rules than rounds => at least one batch selected >1 rule
    assert len(got) > 2
    # sequential compatibility unchanged
    assert bpe_merge_rules(df, rounds=2, batch_k=1) == _ref_bpe(texts, 2)


def test_bpe_batched_rules_are_symbol_disjoint(spark):
    """Within one round's batch, no symbol may appear in two rules (the
    invariant that makes the single-pass application well-defined)."""
    from guardian_for_apache_kafka_spark.operators.text import bpe_merge_rules

    texts = ["the cat sat on the mat", "the bat and the rat", "that hat"] * 5
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rules = bpe_merge_rules(df, rounds=1, batch_k=6)
    syms = [s for _, l, r, _, _ in rules for s in (l, r)]
    assert len(syms) == len(set(syms)), rules


def test_bpe_single_symbol_exhaustion(spark):
    """A corpus whose words collapse to single symbols stops early instead
    of raising (the empty-argmax branch)."""
    from guardian_for_apache_kafka_spark.operators.text import bpe_merge_rules

    df = spark.createDataFrame([("ab ab cd",)], "text string")
    got = bpe_merge_rules(df, rounds=10)
    # round1 merges (a,b) cnt=2; round2 merges (c,d) cnt=1; then no pairs
    assert got == [(1, "a", "b", "ab", 2), (2, "c", "d", "cd", 1)]


def test_audio_segments_tile_and_alternate(spark, sf_dir):
    """Per doc the segment runs must tile [0, total_frames) exactly
    (start_frame/n_frames contiguous, no gaps or overlaps), alternate
    kinds (a run-length encoding never has two adjacent equal kinds), and
    agree with the m2 stub's frame count contract (<= 8 frames)."""
    from guardian_for_apache_kafka_spark.operators.multimodal import (
        attach_media,
        segment_audio,
    )
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").withColumn(
        "blob", F.col("text").cast("binary")
    )
    segs = segment_audio(attach_media(d, "blob", "audio", "wav")).collect()
    by_doc: dict = {}
    for r in segs:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc, "no segments produced"
    for doc, rows in by_doc.items():
        rows.sort(key=lambda r: r.seg_index)
        assert [r.seg_index for r in rows] == list(range(len(rows)))
        pos = 0
        for i, r in enumerate(rows):
            assert r.start_frame == pos, (doc, i)
            assert r.n_frames >= 1
            pos += r.n_frames
            if i:
                assert r.kind != rows[i - 1].kind
        assert pos <= 8


def test_bm25_matches_reference_implementation(spark):
    """BM25 vs a driver-side textbook implementation on a hand corpus with
    known tf/df/length spread — including a doc matching no query term
    (absent from output) and repeated terms in one doc (tf > 1)."""
    import math

    from guardian_for_apache_kafka_spark.operators.text import bm25_scores

    corpus = {
        1: "apple banana apple",
        2: "banana cherry",
        3: "durian durian durian durian",
        4: "apple banana cherry apple apple",
    }
    terms = ["apple", "cherry"]
    df = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "doc_id long, text string"
    )
    qt = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {r.doc_id: r.score_micros for r in bm25_scores(df, qt).collect()}

    k1, b = 1.2, 0.75
    n_docs = len(corpus)
    dl = {k: len(v.split()) for k, v in corpus.items()}
    avgdl = sum(dl.values()) / n_docs
    tf = {
        (k, t): v.split().count(t)
        for k, v in corpus.items()
        for t in terms
        if t in v.split()
    }
    dfreq = {t: sum(1 for k in corpus if (k, t) in tf) for t in terms}
    expect = {}
    for (k, t), f in tf.items():
        idf = math.log((n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
        ts = idf * (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * dl[k] / avgdl))
        expect[k] = expect.get(k, 0) + round(ts * 1_000_000)
    assert got == expect
    assert 3 not in got  # durian-only doc matches nothing


def test_perceptual_hash_identical_blobs_collide(spark):
    """aHash: byte-identical blobs share a hash; the packed value matches a
    pure-Python replay of the stub (digest bytes, integer mean threshold)."""
    import hashlib

    from guardian_for_apache_kafka_spark.operators.multimodal import (
        attach_media,
        perceptual_hash,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], "doc_id BIGINT, text STRING"
    ).withColumn("blob", F.col("text").cast("binary"))
    got = {
        r.doc_id: r.phash
        for r in perceptual_hash(attach_media(df, "blob", "image", "png")).collect()
    }

    def replay(s: str) -> int:
        px = hashlib.sha256(s.encode()).digest()
        total = sum(px)
        return sum(1 << k for k, b in enumerate(px) if 32 * b > total)

    assert got[1] == got[2] == replay("same")
    assert got[3] == replay("other")
    assert got[1] != got[3]


def test_gopher_quality_flags_rules(spark):
    # one doc per rule boundary; flags are exact and passes_gopher is the
    # AND of all seven
    good = " ".join(["the", "be", "to"] + [f"word{i}" for i in range(60)])
    short = "the be " + " ".join(f"w{i}" for i in range(10))
    longwords = " ".join(["the", "be"] + ["x" * 40 for _ in range(58)])
    symbols = " ".join(["the", "be"] + ["tag#" + str(i) for i in range(58)])
    nostop = " ".join(f"w{i}" for i in range(60))
    bullets = "\n".join("- the be item w" + str(i) for i in range(10))
    numeric = " ".join(["the", "be"] + [str(i) for i in range(58)])
    df = spark.createDataFrame(
        [
            (1, good), (2, short), (3, longwords), (4, symbols),
            (5, nostop), (6, bullets), (7, numeric),
        ],
        "doc_id long, text string",
    )
    from guardian_for_apache_kafka_spark.operators.text import gopher_quality_flags

    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert out[1].passes_gopher
    assert not out[2].word_count_ok and not out[2].passes_gopher
    assert not out[3].mean_word_len_ok
    assert not out[4].symbol_ratio_ok
    assert out[5].n_stopwords == 0 and not out[5].stopword_ok
    assert not out[6].bullet_ok  # 10/10 bullet lines > 0.9
    assert not out[7].alpha_ok  # 58/60 numeric words < 0.8 alpha


def test_gopher_quality_flags_scratch_collision(spark):
    # a caller frame already holding __toks must come through untouched
    df = spark.createDataFrame(
        [(1, "the be " + " ".join(f"w{i}" for i in range(60)), "keepme")],
        "doc_id long, text string, __toks string",
    )
    from guardian_for_apache_kafka_spark.operators.text import gopher_quality_flags

    assert gopher_quality_flags(df).count() == 1


def test_kneser_ney_reference_and_branch_parity(spark):
    """KN scores match a hand-computed reference on a tiny corpus (absolute
    discount 0.75 + continuation backoff), short docs are absent, and the
    broadcast and shuffle-join branches agree bit-for-bit."""
    import math

    from guardian_for_apache_kafka_spark.operators.text import (
        kneser_ney_cross_entropy,
    )

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "solo"), (3, "a b")],
        "doc_id long, text string",
    )
    # corpus bigrams: d1: ab, ba, ab, bc ; d3: ab  -> c12: ab=3, ba=1, bc=1
    # left:  a -> c1=3 n1p=1 ; b -> c1=2 n1p=2
    # cont:  b <- 1 ctx ; a <- 1 ctx ; c <- 1 ctx ; total types T=3
    d = 0.75
    p_ab = (3 - d) / 3 + d * 1 / 3 * (1 / 3)
    p_ba = (1 - d) / 2 + d * 2 / 2 * (1 / 3)
    p_bc = (1 - d) / 2 + d * 2 / 2 * (1 / 3)
    want1 = -(math.log(p_ab) * 2 + math.log(p_ba) + math.log(p_bc)) / 4
    want3 = -math.log(p_ab)

    bc = {r.doc_id: round(r.kn_cross_entropy, 9)
          for r in kneser_ney_cross_entropy(df, broadcast_model=True).collect()}
    sh = {r.doc_id: round(r.kn_cross_entropy, 9)
          for r in kneser_ney_cross_entropy(df, broadcast_model=False).collect()}
    assert set(bc) == {1, 3} and bc == sh  # 9dp: avg fold order may differ by ulps
    assert abs(bc[1] - want1) < 1e-9 and abs(bc[3] - want3) < 1e-9


def test_cdc_chunks_edit_robustness_vs_fixed_windows(spark):
    """The CDC property itself: inserting ONE token early in a document
    leaves every chunk after the edit region byte-identical (boundaries are
    content-anchored), where fixed windows shift everything; and chunks
    reconstruct the document exactly."""
    from guardian_for_apache_kafka_spark.operators.text import cdc_chunks

    base = " ".join(f"w{i % 97}x{i % 13}" for i in range(400))
    edited = "INSERTED " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    rows = cdc_chunks(df).collect()
    a = [r.chunk for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_index)) if r.doc_id == 1]
    b = [r.chunk for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_index)) if r.doc_id == 2]
    assert " ".join(a) == base and " ".join(b) == edited  # lossless cover
    # all but the first few chunks realign exactly after the insertion
    shared = set(a) & set(b)
    assert len(shared) >= len(a) - 2, (len(shared), len(a))


def test_bpe_segmentation_consistent_with_rules(spark):
    """bpe_segmentation's final vocab table must equal applying the
    returned rules round-by-round to each distinct word (the t29
    apply-surface contract): same rules as bpe_merge_rules, and each
    word's symbol list reassembles to the word with len == the reference
    walk's token count."""
    import random

    from guardian_for_apache_kafka_spark.operators.text import (
        bpe_merge_rules,
        bpe_segmentation,
    )

    rng = random.Random(11)
    texts = [
        " ".join(
            "".join(rng.choice("abcde") for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(1, 10))
        )
        for _ in range(30)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rules, seg = bpe_segmentation(df, rounds=2, batch_k=4)
    assert rules == bpe_merge_rules(df, rounds=2, batch_k=4)

    ref_rules = _ref_bpe_batched(texts, 2, 4)
    # replay the reference segmentation walk to get expected token lists
    from collections import Counter, defaultdict

    words = Counter(w for t in texts for w in t.split(" ") if w)
    segs = {w: list(w) for w in words}
    by_round = defaultdict(dict)
    # reference batches are ordered; regroup into rounds by walking counts
    # (simplest faithful regrouping: re-run the reference and capture segs)
    segs = {w: list(w) for w in words}
    for rnd in range(2):
        batch = {}
        start = None
        # recompute this round's batch exactly as _ref_bpe_batched does
        pc = Counter()
        for w, c in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[: 16 * 4]
        used = set()
        for (l, r), cnt in ranked:
            if len(batch) == 4:
                break
            if l not in used and r not in used:
                batch[(l, r)] = l + r
            used.add(l)
            used.add(r)
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) in batch:
                    out.append(batch[(s[i], s[i + 1])])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out

    got = {r.word: (r.c, list(r.sy)) for r in seg.collect()}
    assert set(got) == set(words)
    for w, (c, sy) in got.items():
        assert c == words[w]
        assert "".join(sy) == w
        assert sy == segs[w], (w, sy, segs[w])
