"""Text analysis operators (north star): token stats, quality scoring,
language ID, fingerprinting. All built-in column expressions over the
``documents`` table shape (doc_id, text, lang, source, n_chars)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from guardian_for_apache_kafka_spark.functions.columns import rolling_fingerprint, tokens_col

#: Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
#: Real deployments swap in fastText/CLD3 via a Pandas UDF; the heuristic keeps
#: the operator dependency-free and deterministic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "por"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den"],
    "fr": ["le", "la", "les", "et", "de", "des", "est", "dans"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不"],
}

#: A BPE-ish word/number/punctuation splitter (GPT-2-style coarse classes).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _with_tokens_scratch(df: DataFrame, text_col: str) -> tuple[DataFrame, str]:
    """Hoist the token array into a collision-checked scratch column.

    The scratch name is uniquified against the caller's frame (``__toks``,
    then ``__toks_1``, ...) so a pre-existing column of that name is never
    clobbered or silently dropped (ADVICE r5). Returns (frame, name); the
    caller drops ``name`` before returning."""
    name = "__toks"
    i = 0
    while name in df.columns:
        i += 1
        name = f"__toks_{i}"
    return df.withColumn(name, tokens_col(text_col)), name


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics: whitespace tokens, distinct tokens,
    BPE-ish regex tokens, char length, avg token length. Token array
    hoisted into a scratch column (Catalyst does not CSE repeated split()
    across output columns — see repetition_stats)."""
    df, scratch = _with_tokens_scratch(df, text_col)
    toks = F.col(scratch)
    return df.withColumns(
        {
            "n_tokens": F.size(toks),
            "n_distinct_tokens": F.size(F.array_distinct(toks)),
            "n_bpe_tokens": F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0))),
            "text_len": F.length(text_col),
            "avg_token_len": F.try_divide(
                F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double"),
                F.size(toks).cast("double"),
            ),
        }
    ).drop(scratch)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality rubric in [0,1]: length band, lexical diversity,
    alpha ratio, stopword presence — the shape of Gopher/C4-style quality
    filters, as one arithmetic expression (token array hoisted once — see
    repetition_stats)."""
    df, scratch = _with_tokens_scratch(df, text_col)
    toks = F.col(scratch)
    n = F.size(toks).cast("double")
    uniq_ratio = F.size(F.array_distinct(toks)) / n
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    alpha_ratio = alpha_chars / F.greatest(F.length(text_col), F.lit(1)).cast("double")
    en_stops = F.array([F.lit(s) for s in STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), en_stops))
    length_band = F.least(n / 50.0, F.lit(1.0))
    score = (
        length_band * 0.3
        + uniq_ratio * 0.3
        + alpha_ratio * 0.2
        + F.least(stop_hits.cast("double") / 4.0, F.lit(1.0)) * 0.2
    )
    return df.withColumn("quality", F.round(score, 4)).drop(scratch)


def language_scores(text: str | Column = "text") -> Column:
    """Map of lang -> stopword-hit count (the lang-ID evidence vector)."""
    toks = F.array_distinct(tokens_col(text))
    return F.map_from_arrays(
        F.array([F.lit(lang) for lang in STOPWORDS]),
        F.array(
            [
                F.size(F.array_intersect(toks, F.array([F.lit(s) for s in sw])))
                for sw in STOPWORDS.values()
            ]
        ),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language = argmax stopword hits (ties -> lexicographically first
    language; 'und' when nothing matches)."""
    scores = language_scores(text_col)
    entries = F.map_entries(scores)  # array<struct<key,value>>
    best = F.array_sort(
        entries,
        lambda a, b: F.when(a["value"] > b["value"], -1)
        .when(a["value"] < b["value"], 1)
        .when(a["key"] < b["key"], -1)
        .when(a["key"] > b["key"], 1)
        .otherwise(0),
    )[0]
    return df.withColumn(
        "lang_pred", F.when(best["value"] > 0, best["key"]).otherwise(F.lit("und"))
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (shift-resistant exact
    dup detection cheaper than storing full text)."""
    return df.withColumn("fingerprint", rolling_fingerprint(tokens_col(text_col)))


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals: distinct-token ratio,
    top-token share (most frequent token's fraction), duplicate-bigram ratio.

    Scale shape: every signal is a per-row column expression — one scan, ZERO
    shuffles (repetition filtering is embarrassingly parallel; an explode +
    groupBy(doc_id, token) formulation would shuffle the whole corpus). The
    top-token count comes from a single sorted-run scan: sort the token array,
    then fold a (prev, run, max) struct over it.

    The token array is MATERIALIZED once into a scratch column before the
    four signal expressions reference it: Catalyst does not CSE a repeated
    split() across independent output columns, so expression-level reuse
    re-tokenized every row 4x (measured ~1.8x end-to-end at sf0.1)."""
    df, scratch = _with_tokens_scratch(df, text_col)
    toks = F.col(scratch)
    n = F.size(toks)
    run_scan = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("mx")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["mx"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("mx"),
        ),
    )
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bg = F.size(bigrams)
    return df.withColumns(
        {
            "n_tokens": n,
            "distinct_ratio": F.round(F.size(F.array_distinct(toks)) / n.cast("double"), 4),
            "top_share": F.round(run_scan["mx"] / n.cast("double"), 4),
            "dup_bigram_ratio": F.round(
                F.when(
                    n_bg > 0,
                    1.0 - F.size(F.array_distinct(bigrams)) / n_bg.cast("double"),
                ).otherwise(F.lit(0.0)),
                4,
            ),
        }
    ).drop(scratch)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 25,
    max_tokens: int = 90,
    min_distinct_ratio: float = 0.35,
    max_stop_ratio: float = 0.12,
    stopwords: tuple[str, ...] = ("the", "a"),
) -> DataFrame:
    """C4/Gopher-style composite keep/drop filter with per-rule reason flags
    (too_short / too_long / low_diversity / stopword_heavy; ``kept`` = passes
    all). Thresholds are data-calibrated defaults; every flag is a per-row
    column expression — one scan, no shuffle, no UDF (token array hoisted
    once — see repetition_stats)."""
    df, scratch = _with_tokens_scratch(df, text_col)
    toks = F.col(scratch)
    n = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / n.cast("double")
    stops = F.array([F.lit(s) for s in stopwords])
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(stops, t))) / n.cast("double")
    )
    flags = {
        "too_short": n < min_tokens,
        "too_long": n > max_tokens,
        "low_diversity": distinct_ratio < min_distinct_ratio,
        "stopword_heavy": stop_ratio > max_stop_ratio,
    }
    out = df.withColumns({k: v.cast("boolean") for k, v in flags.items()})
    kept = ~flags["too_short"] & ~flags["too_long"] & ~flags["low_diversity"] & ~flags["stopword_heavy"]
    return out.withColumn("kept", kept).drop(scratch)


def chunk_documents(
    df: DataFrame,
    window: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Fixed token-window chunking with overlap — the context-packing
    primitive of a training pipeline (long documents become ``window``-token
    chunks every ``stride`` tokens; ``window - stride`` tokens of overlap
    preserve cross-chunk context). Documents at most ``window`` tokens yield
    one chunk; longer ones yield ``ceil((n - window) / stride) + 1`` so the
    final chunk always reaches the document's end.

    Pure column expressions (sequence/transform/slice + one posexplode): the
    token array is HOISTED into a column once per row (a free tokens_col()
    reference inside the transform lambda would re-split the text per chunk
    index — Catalyst does not CSE it; the t15 lesson), chunk rows fan out
    executor-side, and nothing shuffles — at 100 TB this is a map-only
    stage whose output partitioning follows the input. Returns
    (id, chunk_id, n_tokens, chunk_md5) — the md5 stands in for chunk text
    so downstream exact-dedup of chunks shuffles 32 hex chars, not text."""
    if not 0 < stride <= window:
        raise ValueError(f"need 0 < stride <= window, got stride={stride} window={window}")
    hoisted = df.select(
        F.col(id_col), *[F.col(c) for c in carry], tokens_col(text_col).alias("__tk")
    )
    toks = F.col("__tk")
    n = F.size(toks)
    n_chunks = F.when(n <= window, F.lit(1).cast("long")).otherwise(
        F.ceil((n - window) / F.lit(float(stride))).cast("long") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, (i * stride + 1).cast("int"), window), " "),
    )
    return (
        hoisted.select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            F.posexplode(chunks).alias("chunk_id", "__chunk"),
        )
        .select(
            id_col,
            *carry,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size(F.split("__chunk", " ")).cast("long").alias("n_tokens"),
            F.md5("__chunk").alias("chunk_md5"),
        )
    )


def boilerplate_chunks(
    df: DataFrame,
    window: int = 3,
    min_docs: int = 3,
    group_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate inventory: non-overlapping ``window``-token chunk hashes
    that recur across at least ``min_docs`` distinct documents — the
    paragraph-hash boilerplate-removal primitive of CCNet-style corpus
    cleaning, adapted to chunk granularity (this corpus has no newlines; on
    real data pass paragraph splits and a larger window). ``group_col``
    scopes recurrence to a domain/source; ``None`` means corpus-global.

    Returns (group_col?, chunk_md5, n_docs). Scale posture: chunking is
    map-only (see ``chunk_documents``); the distinct-count is the standard
    two-phase pair of exchanges keyed on (md5, id) then (md5) — fixed-width
    keys with map-side partials, never chunk text.
    Joining the result back to drop boilerplate spans is a broadcast join in
    practice (the inventory is tiny relative to the corpus: only recurring
    hashes survive the HAVING)."""
    from guardian_for_apache_kafka_spark.operators.layout import spread_narrow_scan

    keys = [group_col] if group_col else []
    df = spread_narrow_scan(df)  # the md5-per-chunk stage is CPU-dense; a
    # narrow single-file scan would serialize it onto a few tasks
    chunks = chunk_documents(
        df, window=window, stride=window, id_col=id_col, text_col=text_col,
        carry=tuple(keys),
    )
    return (
        chunks.groupBy(*keys, "chunk_md5")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


# PII patterns chosen for dialect portability: plain character classes,
# bounded repetition, ASCII word boundaries — identical semantics under
# Java regex (Spark) and RE2 (DuckDB/Go), no lookaround or backreferences,
# so the t10 oracle can re-run the exact same scrub.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+\d{1,2}-\d{3}-\d{4}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

# redaction applies in this fixed order; counts are taken on the ORIGINAL
# text so they are order-independent
_PII_ORDER = ("email", "phone", "ipv4")


def pii_counts(text: Column | str = "text") -> list[Column]:
    """Per-kind PII match counts on the raw text (one column per kind, named
    ``n_<kind>``). Pure JVM regex expressions — no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[k]), F.lit(0)))
        .cast("long")
        .alias(f"n_{k}")
        for k in _PII_ORDER
    ]


def redact_pii(text: Column | str = "text") -> Column:
    """Replace every PII match with a typed tag (``<EMAIL>``, ``<PHONE>``,
    ``<IP>``) in the fixed ``_PII_ORDER``. Returns the scrubbed string
    column; chain of global regexp_replace, streams through codegen."""
    tags = {"email": "<EMAIL>", "phone": "<PHONE>", "ipv4": "<IP>"}
    c = F.col(text) if isinstance(text, str) else text
    for k in _PII_ORDER:
        c = F.regexp_replace(c, PII_PATTERNS[k], tags[k])
    return c


def scrub_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII scrub pass over a document frame: returns (id, n_email, n_phone,
    n_ipv4, redacted) — counts from the raw text, text with every match
    replaced by its typed tag. One scan, zero shuffles, all codegen."""
    return df.select(
        F.col(id_col),
        *pii_counts(text_col),
        redact_pii(text_col).alias("redacted"),
    )


def token_df_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-statistics commonness score: per document, the mean DOCUMENT
    FREQUENCY of its distinct tokens — a cheap quality/outlier proxy (docs of
    rare tokens are unusual: OCR noise, code, other languages; docs of
    ubiquitous tokens are boilerplate). Complements t6's TF-IDF (per-term
    ranking) with a per-document scalar.

    Determinism: df counts are int64; mean_df = sum(df)/n is ONE IEEE double
    division of exact integers — engine-exact, no tolerance. Scale shape: the
    distinct-token explode shuffles (token, doc) pairs once to count df and
    once to re-aggregate per doc; the df side is vocabulary-sized. At 100 TB
    the df table is a precomputed corpus artifact — pass it in instead of
    recomputing via the ``df_table`` argument."""
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens_col(text_col))).alias("__t")
    )
    dfreq = toks.groupBy("__t").agg(F.count("*").alias("__df"))
    return (
        toks.join(dfreq, "__t")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_distinct"),
            (F.sum("__df").cast("double") / F.count("*")).alias("mean_df"),
        )
    )


def normalize_text_udf():
    """Arrow-vectorized Unicode NFC normalization (``unicodedata.normalize``
    per batch). Spark has no NFC builtin; NFC is the standard first step of
    canonicalization-before-dedup (composed vs decomposed accents must not
    defeat exact-hash dedup). DuckDB's ``nfc_normalize`` is the oracle twin —
    both implement Unicode normalization, so results match byte-for-byte."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(lambda x: unicodedata.normalize("NFC", x) if x is not None else None)

    return nfc


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    """Canonicalize text for dedup/fingerprinting: Unicode NFC, lowercase,
    strip control characters, collapse runs of whitespace, trim. Adds
    ``out_col`` next to the original (never destructive — downstream ops
    choose which form to hash). One scan; the only Python is the NFC batch
    map, the rest is codegen regex/lower."""
    nfc = normalize_text_udf()
    c = nfc(F.col(text_col))
    c = F.lower(c)
    c = F.regexp_replace(c, r"[\x00-\x1f\x7f]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return df.withColumn(out_col, F.trim(c))


def unigram_cross_entropy(
    df: DataFrame,
    freq_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool | None = None,
    broadcast_vocab_limit: int = 2_000_000,
) -> DataFrame:
    """Per-document cross-entropy against a corpus unigram language model —
    the shape of CCNet/KenLM perplexity filtering with the LM swapped for
    the in-corpus unigram distribution (dependency-free and deterministic;
    a real deployment broadcasts KenLM scores through the same plan).
    Lower = more typical of the corpus; extreme values flag boilerplate,
    gibberish, and wrong-language text.

    Scale shape: the model build is ONE token-keyed aggregate whose result
    is vocabulary-sized (usually tiny vs the corpus) and broadcasts back
    onto the exploded token stream, so scoring is map-side; the per-doc
    average is a partial agg on the id. Pass ``freq_df`` (token, cnt) to
    score against a frozen reference model instead of the in-corpus one.

    Broadcast gate (VERDICT r5 #3): an open-vocabulary 100 TB web corpus
    can push the unigram vocabulary past broadcast limits, so the model is
    only broadcast when its row count is at or below
    ``broadcast_vocab_limit`` (~2M entries ≈ tens of MB, well inside a
    typical executor broadcast budget); above it the score falls back to a
    token-keyed shuffle join (still partial-agg friendly: the model side is
    vocabulary-sized, the stream side carries only (id, token)). The gate
    costs one count over the vocabulary-sized aggregate; force the choice
    with ``broadcast_model=True/False`` to skip it."""
    toks = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("__t"))
    if freq_df is None:
        freq_df = toks.groupBy("__t").agg(F.count("*").alias("__c"))
    else:
        freq_df = freq_df.select(F.col("token").alias("__t"), F.col("cnt").alias("__c"))
    if broadcast_model is None:
        # limit+1 bounds the probe: it answers "over the limit?" without
        # counting a huge vocabulary to the end
        probe = freq_df.limit(broadcast_vocab_limit + 1).count()
        broadcast_model = probe <= broadcast_vocab_limit
    # the vocab table feeds BOTH the scalar total and the model projection;
    # materialize it once (lazy local checkpoint, vocabulary-sized) so the
    # total does not re-run the corpus token aggregate (r11 plan audit)
    freq_df = freq_df.localCheckpoint(eager=False)
    total = freq_df.agg(F.sum("__c").alias("__s"))
    model = freq_df.crossJoin(F.broadcast(total)).select(
        "__t", F.log(F.col("__c") / F.col("__s")).alias("__logp")
    )
    scored = toks.join(F.broadcast(model) if broadcast_model else model, "__t")
    return scored.groupBy(id_col).agg((-F.avg("__logp")).alias("cross_entropy"))


def bigram_cross_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool | None = None,
    broadcast_vocab_limit: int = 2_000_000,
) -> DataFrame:
    """Per-document cross-entropy against an in-corpus BIGRAM language model
    with add-one smoothing — one order up from t14's unigram scorer and much
    closer to the KenLM-style perplexity filters real pipelines run:
    P(w2|w1) = (c(w1,w2) + 1) / (c(w1,.) + V), V = distinct continuation
    types. Documents with fewer than two tokens yield no bigrams and are
    absent from the output (same contract as the oracle).

    Scale shape: the model is ONE aggregate over the bigram stream (the
    left-context totals c(w1,.) re-aggregate the MODEL, never the corpus);
    V is a scalar that broadcasts. A bigram vocabulary grows far faster
    than a unigram one, so the t14 broadcast gate matters more here: the
    model broadcasts only at or below ``broadcast_vocab_limit`` rows,
    falling back to a (w1, w2)-keyed shuffle join above it."""
    # hoist the token array into a column FIRST: referencing tokens_col()
    # directly inside the transform lambda re-evaluates split() per bigram
    # INDEX (Catalyst does not CSE it), turning construction O(n^2) per
    # document — measured 4x end-to-end on this query (the repetition_stats
    # lesson). A spread_narrow_scan here measured NET-NEGATIVE at this
    # corpus size (the round-robin exchange of text costs more than the
    # parallelism saves, and the bigram stream is consumed twice); at
    # 100 TB the scan has real input splits and needs no spread.
    hoisted = df.select(F.col(id_col), tokens_col(text_col).alias("__tk"))
    toks = F.col("__tk")
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("w1"),
                F.element_at(toks, i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = hoisted.select(F.col(id_col), F.explode(pairs).alias("__b")).select(
        id_col, F.col("__b.w1").alias("__w1"), F.col("__b.w2").alias("__w2")
    )
    c12 = bg.groupBy("__w1", "__w2").agg(F.count("*").alias("__c12"))
    if broadcast_model is None:
        probe = c12.limit(broadcast_vocab_limit + 1).count()
        broadcast_model = probe <= broadcast_vocab_limit
    # the bigram-type table feeds c1, V and the model join; materialize it
    # once (lazy local checkpoint, model-sized) — unchecked, the r11 plan
    # audit showed the corpus bigram explode evaluated 4x in one query
    c12 = c12.localCheckpoint(eager=False)
    c1 = c12.groupBy("__w1").agg(F.sum("__c12").alias("__c1"))
    # V = distinct continuation types; every __w2 in the bigram stream is a
    # key of c12, so counting over the TYPE table is identical to counting
    # over the stream — and model-sized instead of corpus-sized
    v = c12.agg(F.count_distinct("__w2").alias("__v"))
    model = (
        c12.join(c1, "__w1")
        .crossJoin(F.broadcast(v))
        .select(
            "__w1",
            "__w2",
            F.log(
                (F.col("__c12") + 1).cast("double")
                / (F.col("__c1") + F.col("__v")).cast("double")
            ).alias("__logp"),
        )
    )
    scored = bg.join(
        F.broadcast(model) if broadcast_model else model, ["__w1", "__w2"]
    )
    return scored.groupBy(id_col).agg((-F.avg("__logp")).alias("cross_entropy"))


def vocab_growth_stats(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-group vocabulary statistics (the Heaps-law corpus diagnostics a
    training-data pipeline tracks per source/domain): total tokens, distinct
    types, type-token ratio, hapax legomena (types seen once) and hapax
    ratio. High hapax ratio flags OCR noise / boilerplate IDs; abnormal TTR
    flags templated or degenerate sources.

    Determinism: counts are int64; each ratio is ONE IEEE division of exact
    integers (t11's mean_df discipline) — engine-exact, no tolerance. Scale
    shape: two-phase — (group, token) partial counts, then a group-keyed
    re-aggregation of the type table; the corpus shuffles once on fixed-width
    (group, token) keys."""
    toks = df.select(F.col(group_col), F.explode(tokens_col(text_col)).alias("__t"))
    per_type = toks.groupBy(group_col, "__t").agg(F.count("*").alias("__c"))
    return per_type.groupBy(group_col).agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        (F.count("*").cast("double") / F.sum("__c")).alias("type_token_ratio"),
        F.sum(F.when(F.col("__c") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
        (
            F.sum(F.when(F.col("__c") == 1, 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("hapax_ratio"),
    )


def token_heavy_hitters(
    df: DataFrame,
    threshold_frac: float = 0.005,
    text_col: str = "text",
    summary_size: int | None = None,
) -> DataFrame:
    """EXACT corpus heavy hitters (tokens with frequency >= threshold_frac
    of all tokens) computed with a Misra-Gries candidate pass — the
    mergeable-summary pattern that makes heavy hitters feasible when the
    full (token, count) table is too big to materialize cheaply.

    Two stages:
    1. candidates: each partition folds its token stream through a
       Misra-Gries summary capped at ``summary_size`` counters
       (``mapInPandas``, Arrow-batched). MG guarantees any token with
       global count > n/summary_size survives in at least one partition's
       summary, so with summary_size = ceil(2/threshold_frac) the candidate
       union is a guaranteed SUPERSET of the true heavy set — recall 1 by
       construction, whatever the partitioning.
    2. exact confirm: the tiny candidate set broadcasts back onto the token
       stream as a map-side semi-join filter; only candidate tokens reach
       the exact count shuffle, and the final filter applies the exact
       threshold. Output is therefore EXACT (hash-oracle-able) while the
       corpus-wide shuffle carries only candidate tokens — the d15
       prefilter-then-confirm shape applied to frequency.

    At 100 TB: the per-partition summaries are KB-sized regardless of data
    volume; the confirm shuffle is bounded by candidates x partitions."""
    import pandas as pd  # noqa: F811 (Arrow batch iterator)

    if summary_size is None:
        summary_size = int(2.0 / threshold_frac) + 1
    if summary_size * threshold_frac < 1.0:
        # the recall guarantee needs threshold count > n/(cap+1), i.e.
        # cap >= 1/frac; a smaller cap can silently MISS heavy hitters —
        # refuse rather than return an unsound candidate set
        raise ValueError(
            f"summary_size={summary_size} cannot guarantee recall at "
            f"threshold_frac={threshold_frac}; need >= {int(1 / threshold_frac) + 1}"
        )
    toks = df.select(F.explode(tokens_col(text_col)).alias("__t"))

    def mg_partition(batches):
        # Mergeable-summaries formulation (Agarwal et al., PODS'12): each
        # Arrow batch contributes an EXACT value_counts (vectorized, C
        # speed — no per-row Python); merging then trimming to the cap by
        # subtracting the (cap+1)-th largest count and dropping non-positive
        # counters is the MG merge, preserving the additive n/(cap+1)
        # undercount bound. Python touches summary-sized dicts, never rows.
        counters: dict[str, int] = {}
        for pdf in batches:
            for t, c in pdf["__t"].value_counts().items():
                counters[t] = counters.get(t, 0) + int(c)
            if len(counters) > summary_size:
                cut = sorted(counters.values(), reverse=True)[summary_size]
                counters = {k: v - cut for k, v in counters.items() if v > cut}
        if counters:
            yield pd.DataFrame({"token": list(counters.keys())})

    candidates = toks.mapInPandas(mg_partition, "token string").distinct()
    total = toks.agg(F.count("*").alias("__total"))
    return (
        toks.join(F.broadcast(candidates), toks["__t"] == candidates["token"], "left_semi")
        .groupBy("__t")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= F.col("__total") * F.lit(threshold_frac))
        .select(F.col("__t").alias("token"), F.col("cnt").cast("long").alias("cnt"))
    )


def char_entropy(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document Shannon entropy of the CHARACTER distribution (bits per
    char) — the compressibility proxy classic quality filters use:
    near-zero flags degenerate repetition, ~4.x is typical English, high
    values flag random/binary-ish noise. Complements the token-level
    signals (t7 repetition, t14/t15 LM scores) with a tokenizer-free one.

    Per-row computation (the repetition_stats discipline): sort the char
    array, fold a (prev, run, sum_clogc) accumulator over the sorted runs —
    H = log2(n) - sum(c_i*log2(c_i))/n in one pass, no explode/groupBy of
    corpus characters. The fold is CPU-dense (higher-order functions
    evaluate interpreted) and consumed ONCE, so a narrow single-file scan
    is spread first — measured 3.6 s -> sub-second at sf0.1 (contrast
    t15, where the double-consumed stream made spreading net-negative).
    Rounded to 4dp: the only engine-order difference vs an oracle is the
    run-sum association, ~1e-13 relative."""
    from guardian_for_apache_kafka_spark.operators.layout import spread_narrow_scan

    df = spread_narrow_scan(df)
    chars = F.split(F.col(text_col), "")
    n = F.size(chars)
    scan = F.aggregate(
        F.array_sort(chars),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0.0).alias("run"),
            F.lit(0.0).alias("acc"),
        ),
        lambda a, c: F.struct(
            c.alias("prev"),
            F.when(c == a["prev"], a["run"] + 1).otherwise(F.lit(1.0)).alias("run"),
            F.when(
                c == a["prev"], a["acc"]
            ).otherwise(
                a["acc"]
                + F.when(a["run"] > 0, a["run"] * F.log2(a["run"])).otherwise(F.lit(0.0))
            ).alias("acc"),
        ),
        lambda a: a["acc"] + F.when(a["run"] > 0, a["run"] * F.log2(a["run"])).otherwise(F.lit(0.0)),
    )
    h = F.when(
        n > 0, F.log2(n.cast("double")) - scan / n.cast("double")
    ).otherwise(F.lit(0.0))
    return df.select(F.col(id_col), F.round(h, 4).alias("char_entropy"))


def bpe_merge_rules(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 4,
    batch_k: int = 1,
) -> list[tuple[int, str, str, str, int]]:
    """Learn byte-pair-encoding merges from a corpus — distributed
    tokenizer training, the step every LLM data pipeline runs before
    tokenization. Returns [(rule_idx, lhs, rhs, merged, pair_count)]; up to
    ``rounds * batch_k`` rules, indexed 1.. in learn order.

    BPE's classic scale shape is preserved: the corpus collapses ONCE into
    the (word, count) vocabulary table (one shuffle on the word — at 100 TB
    the vocab is millions of rows, not billions of tokens), and every merge
    round runs over that table: adjacent-pair counts weighted by word
    frequency (one pair-keyed aggregation), rule selection (driver scalar,
    bounded — <= 16*batch_k rows), then a map-only greedy re-segmentation
    fold. Round state is localCheckpointed (the hierarchy.py discipline)
    so plans stay flat across rounds.

    ``batch_k`` (round-7; r6 verdict blemish #2) amortizes the
    one-Spark-job-per-merge cost: each round selects up to ``batch_k``
    MUTUALLY SYMBOL-DISJOINT pairs and applies them in ONE re-segmentation
    pass, so a 32k-merge tokenizer run is ~32k/batch_k jobs instead of
    32k. Selection is the deterministic *dominance* rule — rank all pairs
    by (cnt DESC, lhs, rhs); within the top ``16*batch_k`` candidate
    window, a pair is selected iff NO higher-ranked candidate shares a
    symbol with it (hence any two selected pairs are disjoint and their
    applications commute; counts of disjoint pairs are invariant under
    each other's merges, so each rule's recorded pair_count is exact for
    its round) — which a SQL oracle replays as a window rank + NOT EXISTS
    anti-join, no greedy chain needed. ``batch_k=1`` degenerates to
    textbook sequential BPE (rank-1 has no higher-ranked candidates).

    Determinism: ties on pair_count break by (lhs, rhs) ascending; counts
    are int64 sums — engine-exact, so a SQL oracle can replay every round.
    The greedy fold merges non-overlapping occurrences LEFT TO RIGHT over
    the round's INPUT symbols ('aaa' + rule (a,a) -> [aa, a]; a symbol
    produced by a merge is not re-merged within the same pass), the
    reference BPE semantics; symbols are identified by surface string (two
    merge paths reaching the same string unify, as in standard BPE)."""
    rules, _ = _bpe_train(df, text_col, rounds, batch_k)
    return rules


def bpe_segmentation(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 4,
    batch_k: int = 1,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """BPE training that ALSO returns the final vocabulary segmentation —
    (rules, words) where ``words`` is (word, c, sy: array<string>) after
    every learned merge has been applied. This is the tokenizer-APPLY
    surface (t29): token counts per document come from joining the token
    stream against this vocab-sized table, never from re-folding the
    corpus text. Same training loop as :func:`bpe_merge_rules` (the word
    column rides along through the per-round folds)."""
    return _bpe_train(df, text_col, rounds, batch_k)


def _bpe_train(
    df: DataFrame,
    text_col: str,
    rounds: int,
    batch_k: int,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("c"))
        .select(F.col("word"), F.col("c"), F.split("word", "").alias("sy"))
        .localCheckpoint()
    )
    rules: list[tuple[int, str, str, str, int]] = []
    empty = F.expr("array()").cast("array<string>")
    for _ in range(rounds):
        pairs = (
            words.where(F.size("sy") >= 2)
            .select(
                F.col("c"),
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(sy) - 1), "
                        "i -> struct(element_at(sy, i) AS l, element_at(sy, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("c").alias("cnt"))
        )
        # TakeOrdered (no global sort); candidate window mirrored by oracles
        top = pairs.orderBy(F.desc("cnt"), "l", "r").limit(16 * batch_k).collect()
        if not top:
            break  # every word is a single symbol — nothing left to merge
        sel: list[tuple[str, str, str, int]] = []
        used: set[str] = set()
        for row in top:
            if len(sel) == batch_k:
                break
            if row.l not in used and row.r not in used:
                sel.append((row.l, row.r, row.l + row.r, int(row.cnt)))
            used.add(row.l)
            used.add(row.r)
        for lhs, rhs, merged, cnt in sel:
            rules.append((len(rules) + 1, lhs, rhs, merged, cnt))

        def make_step(batch: list[tuple[str, str, str, int]]):
            def matched(carry, s):
                m = F.lit(None).cast("string")
                for _l, _r, _m, _ in batch:
                    m = F.when((carry == F.lit(_l)) & (s == F.lit(_r)), F.lit(_m)).otherwise(m)
                return m

            def step(acc, s):
                carry, out = acc["carry"], acc["out"]
                m = matched(carry, s)
                return F.struct(
                    # merged -> both input symbols consumed, carry clears;
                    # otherwise the new symbol becomes the pending carry
                    F.when(m.isNotNull(), F.lit(None).cast("string"))
                    .otherwise(s)
                    .alias("carry"),
                    F.when(m.isNotNull(), F.concat(out, F.array(m)))
                    .when(carry.isNull(), out)
                    .otherwise(F.concat(out, F.array(carry)))
                    .alias("out"),
                )

            return step

        step = make_step(sel)
        init = F.struct(
            F.lit(None).cast("string").alias("carry"),
            empty.alias("out"),
        )
        finish = lambda acc: F.when(  # noqa: E731
            acc["carry"].isNotNull(), F.concat(acc["out"], F.array(acc["carry"]))
        ).otherwise(acc["out"])

        words = words.select(
            "word", "c", F.aggregate("sy", init, step, finish).alias("sy")
        ).localCheckpoint()
    return rules, words


def bm25_scores(
    df: DataFrame,
    query_terms: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1_pct: int = 120,
    b_pct: int = 75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a query-term set —
    the lexical-retrieval complement of the embedding ANN family
    (similarity.py): idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*|D|/avgdl))
    summed over matching terms. ``query_terms`` is a one-column ('term')
    frame; k1/b arrive as integer percents so the float expression is
    identical on every engine.

    Scale shape: the token stream is semi-joined against the BROADCAST
    query terms at map side — only matching tokens ever shuffle (queries
    are a handful of terms; the corpus is the 100 TB side). Per-(doc,term)
    tf is one aggregation; df/N/avgdl are term-count- and scalar-sized
    aggregates that broadcast back. Per-term scores are converted to
    integer MICROS before the per-doc sum, so addition order — which Spark
    does not define across shuffle partitions — cannot move the result
    (the q42/q59 integer-sum discipline). Returns (id, score_micros) for
    documents matching >= 1 term."""
    k1 = k1_pct / 100.0
    b = b_pct / 100.0
    toks = df.select(
        F.col(id_col),
        F.explode(tokens_col(text_col)).alias("term"),
    ).where(F.col("term") != "")
    dlen = (
        df.select(
            F.col(id_col),
            F.size(F.filter(tokens_col(text_col), lambda t: t != "")).alias("dl"),
        )
    )
    stats = dlen.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    matched = toks.join(F.broadcast(query_terms), "term")
    tf = matched.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dlen, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "__ts",
            F.col("__idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .withColumn("__tsm", F.round(F.col("__ts") * 1000000).cast("long"))
    )
    return scored.groupBy(id_col).agg(F.sum("__tsm").alias("score_micros"))


def shingle_duplication_profile(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-n-gram coverage: for each document, the
    fraction of its DISTINCT word n-grams that also occur in at least one
    other document — the fine-grained 'how much of this doc is recycled
    text' signal (the chunk-level t13 boilerplate inventory's n-gram
    sibling; the Gopher/C4 pipelines gate on exactly this family).

    Plan (VERDICT r7 #3 de-skew): shingle (map-only) -> explode to an
    int64-hashed inverted stream -> (doc, shingle) rollup -> per-shingle
    totals -> doc-keyed join. The r6 formulation computed document
    frequency as ``COUNT(*) OVER (PARTITION BY shingle)``; a window gets
    NO map-side combine, so at 100x a stopword-trigram hot key puts
    billions of identical hashes into one task's sort. Every aggregation
    here is a groupBy (partial-agg combines the hot shingle on the map
    side: each reducer key receives at most n_map_partitions rows), and
    the skew-prone join-back BY SHINGLE is avoided entirely via the
    uniqueness identity: an occurrence is "shared" iff its shingle's
    stream count df >= 2, so ``n_shared = n_shingles - #occurrences whose
    shingle is globally unique`` — and a globally-unique shingle (df == 1)
    belongs to exactly ONE document (its max(__id) IS that document), so
    unique counts roll up BY DOC ID and the final join is doc-keyed.
    The (id, shingle) rollup is consumed by BOTH downstream aggregates, so
    it is localCheckpointed (eager, executor-local blocks): the expensive
    interpreted-HOF shingle stream is generated exactly once — measured,
    because ReuseExchange deduplicates the shared exchange on some inputs
    but not others (parquet scan: reused; RDD-backed: regenerated, 2x
    wall at 1M docs) and a silent 2x is worse than a rollup-sized
    materialization. All shuffled/checkpointed rows are (int64, int64,
    int64); document text never shuffles. At sf0.1 this formulation costs
    ~8% over the window one (2.2 s vs 2.1 s); the planted hot-shingle
    stress (scripts/stress_round8.py, SCALE.md r8) is the scale
    justification — with one stopword shingle at 89% of the stream the
    window forms a single reducer task carrying the whole corpus, while
    every reducer key here receives at most n_map_partitions combined
    rows, independent of document frequency.
    Returns (id, n_shingles, n_shared, shared_ratio)."""
    from guardian_for_apache_kafka_spark.functions.columns import (
        ngram_shingles,
        tokens_col,
    )
    from guardian_for_apache_kafka_spark.operators.layout import spread_narrow_scan

    # shingle building is CPU-dense and single-consumed: spread a narrow
    # scan so one small input file cannot serialize it onto one task (the
    # t17 discipline: single-partition generation measured 3.9 s vs 2.4 s
    # spread at sf0.1), and HOIST the token array into its own projection
    # so ngram_shingles' transform lambda can't re-evaluate split() per
    # element (the t15 lesson)
    tok = spread_narrow_scan(df).select(
        F.col(id_col).alias("__id"), tokens_col(content_col).alias("__tk")
    )
    sh = tok.select(
        "__id", ngram_shingles(F.col("__tk"), n).alias("__shingles")
    ).where(F.size("__shingles") > 0)
    inv = sh.select(
        "__id",
        F.explode(F.transform("__shingles", lambda c: F.xxhash64(c))).alias("__s"),
    )
    # lazy barrier (r11 bench honesty): the rollup feeds uniq AND doc_tot;
    # eager would materialize the corpus-scale explode at plan-build time,
    # outside any timed action
    pairs = (
        inv.groupBy("__id", "__s")
        .agg(F.count("*").alias("__k"))
        .localCheckpoint(eager=False)
    )
    # df == 1  =>  exactly one (doc, shingle) row with __k == 1, so
    # max(__id) is THE owning document of a globally-unique shingle
    uniq = (
        pairs.groupBy("__s")
        .agg(F.sum("__k").alias("__df"), F.max("__id").alias("__owner"))
        .where(F.col("__df") == 1)
        .groupBy(F.col("__owner").alias("__id"))
        .agg(F.count("*").alias("__n_unique"))
    )
    doc_tot = pairs.groupBy("__id").agg(F.sum("__k").alias("n_shingles"))
    return (
        doc_tot.join(uniq, "__id", "left")
        .withColumn(
            "n_shared",
            F.col("n_shingles") - F.coalesce(F.col("__n_unique"), F.lit(0)),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_shingles",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double") / F.col("n_shingles"), 4
            ).alias("shared_ratio"),
        )
    )


#: The Gopher quality-rule stopword list (Rae et al. 2021, "Scaling Language
#: Models: Methods, Analysis & Insights from Training Gopher", App. A1.1):
#: a document must contain at least 2 of these to pass the stop-word rule.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The published Gopher/C4 quality-rule battery as per-rule boolean
    flags — the standard pre-training document filter (Rae et al. 2021
    App. A1.1; Raffel et al. 2020 §2.2), kept rule-by-rule inspectable so
    curation can report WHY a document was dropped, not just that it was:

    - ``word_count_ok``:    min_words <= #words <= max_words;
    - ``mean_word_len_ok``: mean word length in [3, 10] characters;
    - ``symbol_ratio_ok``:  words containing '#' or '...' are <= 10%;
    - ``bullet_ok``:        <= 90% of lines start with a bullet marker;
    - ``ellipsis_ok``:      <= 30% of lines end with '...';
    - ``alpha_ok``:         >= 80% of words contain an alphabetic char;
    - ``stopword_ok``:      >= 2 distinct Gopher stopwords present;
    - ``passes_gopher``:    AND of all seven.

    Every rule is a per-row JVM higher-order expression over the hoisted
    token/line arrays — map-only, ZERO shuffles, whole-stage-codegen
    friendly; at 100 TB this runs at scan speed as the first stage of the
    filter funnel (cheap rules first, the t8/t14 model scoring after).
    Ratios are rounded to 6 places for cross-engine hash stability.
    """
    df, toks = _with_tokens_scratch(df, text_col)
    t = F.col(toks)
    n_words = F.size(t)
    mean_len = F.round(
        F.aggregate(t, F.lit(0), lambda a, x: a + F.length(x)).cast("double")
        / n_words,
        6,
    )
    n_alpha = F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]")))
    n_symbol = F.size(
        F.filter(t, lambda x: x.contains("#") | x.contains("..."))
    )
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).rlike("^[-*•]"),
        )
    )
    n_ellipsis = F.size(F.filter(lines, lambda l: l.endswith("...")))
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(t, s),
        )
    )
    frac = lambda num, den: F.round(num.cast("double") / den, 6)  # noqa: E731
    out = df.select(
        id_col,
        n_words.cast("bigint").alias("n_words"),
        mean_len.alias("mean_word_len"),
        frac(n_alpha, n_words).alias("alpha_word_frac"),
        frac(n_symbol, n_words).alias("symbol_ratio"),
        frac(n_bullet, n_lines).alias("bullet_line_frac"),
        frac(n_ellipsis, n_lines).alias("ellipsis_line_frac"),
        n_stop.cast("bigint").alias("n_stopwords"),
    )
    flags = {
        "word_count_ok": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "mean_word_len_ok": (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0),
        "symbol_ratio_ok": F.col("symbol_ratio") <= 0.1,
        "bullet_ok": F.col("bullet_line_frac") <= 0.9,
        "ellipsis_ok": F.col("ellipsis_line_frac") <= 0.3,
        "alpha_ok": F.col("alpha_word_frac") >= 0.8,
        "stopword_ok": F.col("n_stopwords") >= 2,
    }
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
    passes = None
    for name in flags:
        passes = F.col(name) if passes is None else passes & F.col(name)
    return out.withColumn("passes_gopher", passes)


def gopher_quality_flags_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    mean_len_lo: int = 3,
    mean_len_hi: int = 10,
    alpha_num: int = 4,
    alpha_den: int = 5,
) -> DataFrame:
    """INTEGER-EXACT variant of the three yield-deciding Gopher rules
    (word count, mean word length, alpha-word fraction) — the subset the
    p13 curation funnel composes. Same semantics as
    :func:`gopher_quality_flags` for those three flags, but every
    threshold is decided by integer cross-multiplication instead of a
    rounded float ratio:

    - ``mean_word_len_ok``: lo <= sum_len/n <= hi becomes
      ``lo*n <= sum_len AND sum_len <= hi*n``;
    - ``alpha_ok``: n_alpha/n >= num/den becomes
      ``den*n_alpha >= num*n``.

    Zero float operations means the verdicts are bit-identical across
    engines, libm builds, and rounding modes — the property an externally
    hash-diffed funnel needs. The float-ratio battery above keeps its
    published inspectable-ratio API; this variant exists for queries whose
    OUTPUT is hash-attested cross-engine. Same plan shape: per-row JVM
    higher-order expressions over the hoisted token array, map-only, zero
    shuffles.

    Degenerate docs (r10 advisor): at ``n_words == 0`` the two ratio flags
    are NULL — matching the float battery, whose divisions are NULL there —
    instead of the vacuous cross-multiplied ``0 <= 0`` pass; a caller
    composing only ``alpha_ok`` therefore cannot admit empty documents.
    (p13 was never affected: ``word_count_ok`` gates the composition, and
    NULL & false = false.)"""
    df, toks = _with_tokens_scratch(df, text_col)
    t = F.col(toks)
    n_words = F.size(t).cast("bigint")
    sum_len = F.aggregate(
        t, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    )
    n_alpha = F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]"))).cast("bigint")
    return df.select(
        id_col,
        n_words.alias("n_words"),
        sum_len.alias("sum_word_len"),
        n_alpha.alias("n_alpha_words"),
    ).select(
        id_col,
        "n_words",
        "sum_word_len",
        "n_alpha_words",
        (
            (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        ).alias("word_count_ok"),
        F.when(
            F.col("n_words") > 0,
            (F.lit(mean_len_lo) * F.col("n_words") <= F.col("sum_word_len"))
            & (F.col("sum_word_len") <= F.lit(mean_len_hi) * F.col("n_words")),
        ).alias("mean_word_len_ok"),
        F.when(
            F.col("n_words") > 0,
            F.lit(alpha_den) * F.col("n_alpha_words")
            >= F.lit(alpha_num) * F.col("n_words"),
        ).alias("alpha_ok"),
    )


def kneser_ney_cross_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    broadcast_model: bool | None = None,
    broadcast_vocab_limit: int = 2_000_000,
) -> DataFrame:
    """Per-document cross-entropy against an interpolated Kneser-Ney bigram
    model — the standard n-gram smoothing (Kneser & Ney 1995; Chen & Goodman
    1999) and the scoring KenLM-based quality filters actually apply, one
    step past t15's add-one smoothing:

        P(w2|w1) = max(c(w1,w2) - D, 0) / c(w1)
                 + D * N1+(w1,*) / c(w1) * N1+(*,w2) / N1+(*,*)

    where N1+(w1,*) counts distinct continuations of w1, N1+(*,w2) counts
    distinct left contexts of w2 (the "how many contexts has this word
    completed" continuation probability that distinguishes KN from plain
    backoff), and D is the absolute discount.

    Scale shape mirrors bigram_cross_entropy: ALL model statistics are
    re-aggregations of the one bigram-type table c(w1,w2) — never a second
    pass over the corpus — and the continuation total N1+(*,*) is a scalar
    broadcast. The assembled model is bigram-vocabulary-sized and joins the
    token stream broadcast below ``broadcast_vocab_limit`` rows, shuffling
    on (w1, w2) above it."""
    hoisted = df.select(F.col(id_col), tokens_col(text_col).alias("__tk"))
    toks = F.col("__tk")
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("w1"),
                F.element_at(toks, i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = hoisted.select(F.col(id_col), F.explode(pairs).alias("__b")).select(
        id_col, F.col("__b.w1").alias("__w1"), F.col("__b.w2").alias("__w2")
    )
    c12 = bg.groupBy("__w1", "__w2").agg(F.count("*").alias("__c12"))
    if broadcast_model is None:
        probe = c12.limit(broadcast_vocab_limit + 1).count()
        broadcast_model = probe <= broadcast_vocab_limit
    # every model statistic below re-aggregates c12 (model-sized), not bg —
    # and c12 itself is materialized once (lazy local checkpoint) so its
    # four consumers (left, cont, total, the model join) do not each re-run
    # the corpus bigram explode (r11 plan audit: 5 Generate subtrees)
    c12 = c12.localCheckpoint(eager=False)
    left = c12.groupBy("__w1").agg(
        F.sum("__c12").alias("__c1"), F.count("*").alias("__n1p")
    )
    cont = c12.groupBy("__w2").agg(F.count("*").alias("__nc"))
    total = c12.agg(F.count("*").alias("__t"))
    d = F.lit(float(discount))
    model = (
        c12.join(left, "__w1")
        .join(cont, "__w2")
        .crossJoin(F.broadcast(total))
        .select(
            "__w1",
            "__w2",
            F.log(
                F.greatest(F.col("__c12") - d, F.lit(0.0)) / F.col("__c1")
                + d * F.col("__n1p") / F.col("__c1")
                * F.col("__nc") / F.col("__t")
            ).alias("__logp"),
        )
    )
    scored = bg.join(
        F.broadcast(model) if broadcast_model else model, ["__w1", "__w2"]
    )
    return scored.groupBy(id_col).agg((-F.avg("__logp")).alias("kn_cross_entropy"))


def _cdc_chunk_list(text: str | None) -> list[str] | None:
    """Pure-Python twin of the CDC state machine (one linear pass; see
    :func:`cdc_chunks` for the boundary rule). Replicates the Catalyst
    fold's semantics exactly, INCLUDING the empty-token quirk: ``cur == ""``
    means "chunk has no non-empty prefix yet", so a chunk-leading empty
    token contributes no separator — the invariant the d29 oracle's
    ``string_agg`` replay depends on."""
    if text is None:
        return None
    import hashlib

    md5 = hashlib.md5
    chunks: list[str] = []
    cur = ""
    p1 = ""
    p2 = ""
    for pos, t in enumerate(text.split(" ")):
        cur = t if cur == "" else cur + " " + t
        if (
            pos >= 2
            and md5((p2 + " " + p1 + " " + t).encode("utf-8")).hexdigest()[0]
            == "0"
        ):
            chunks.append(cur)
            cur = ""
        p2 = p1
        p1 = t
    if cur != "":
        chunks.append(cur)
    return chunks


def _cdc_chunks_fold(tk: Column) -> Column:
    """Pure-JVM reference twin of :func:`_cdc_chunk_list` over a token
    array: the original Catalyst ``aggregate`` fold (state = built chunks +
    current chunk + last two tokens + position). Kept for the parity test —
    higher-order functions are interpreted (no codegen) and the
    copy-on-append chunk array makes this ~4x the Arrow kernel's cost, so
    the hot path uses the kernel."""
    init = F.struct(
        F.array().cast("array<string>").alias("chunks"),
        F.lit("").alias("cur"),
        F.lit("").alias("p1"),
        F.lit("").alias("p2"),
        F.lit(0).alias("pos"),
    )

    def step(acc, t):
        gram = F.concat(acc["p2"], F.lit(" "), acc["p1"], F.lit(" "), t)
        is_b = (acc["pos"] >= 2) & (
            F.substring(F.md5(gram.cast("binary")), 1, 1) == "0"
        )
        cur2 = F.when(acc["cur"] == "", t).otherwise(
            F.concat(acc["cur"], F.lit(" "), t)
        )
        return F.struct(
            F.when(is_b, F.concat(acc["chunks"], F.array(cur2)))
            .otherwise(acc["chunks"])
            .alias("chunks"),
            F.when(is_b, F.lit("")).otherwise(cur2).alias("cur"),
            t.alias("p1"),
            acc["p1"].alias("p2"),
            (acc["pos"] + 1).alias("pos"),
        )

    return F.aggregate(
        tk,
        init,
        step,
        lambda acc: F.when(acc["cur"] == "", acc["chunks"]).otherwise(
            F.concat(acc["chunks"], F.array(acc["cur"]))
        ),
    )


def cdc_chunks(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content-defined chunking (rolling-hash boundaries, the
    rsync/LBFS/dedup-storage trick): a chunk boundary falls after any token
    whose trailing 3-gram's md5 starts with hex '0' (P = 1/16, expected
    chunk ~16 tokens). Unlike t9's fixed windows, boundaries are
    CONTENT-ANCHORED — inserting one token early in a document shifts every
    fixed window but leaves all later CDC chunks byte-identical, which is
    what makes chunk-level dedup robust to edits.

    Map-only: one Arrow-batched kernel pass per document builds the chunk
    array in O(tokens) (:func:`_cdc_chunk_list` — the segmentation is pure
    string/hash logic, no float association, so the Python twin is
    bit-identical to the Catalyst fold kept in :func:`_cdc_chunks_fold` and
    parity-tested against it), then explodes — zero shuffles until the
    caller aggregates chunk hashes. The interpreted-HOF fold this replaces
    copied the accumulated chunk array on every boundary (r11 tier-4: 3.4 s
    of the d29 plan's 3.4 s noop at sf0.1). The boundary hash is
    md5-derived, so DuckDB replays the identical segmentation with lag
    windows (the d29 oracle)."""
    from pyspark.sql.functions import pandas_udf

    from guardian_for_apache_kafka_spark.operators.layout import spread_narrow_scan

    @pandas_udf("array<string>")
    def _cdc_udf(texts: pd.Series) -> pd.Series:
        return texts.map(_cdc_chunk_list)

    # asNondeterministic: the downstream posexplode makes the optimizer infer
    # a size(__chunks) > 0 filter and PUSH IT BELOW the spread exchange —
    # duplicating the chunker so every document is segmented twice (guide
    # §4.4). The kernel is in fact deterministic; the marker only forbids the
    # optimizer from copying/reordering it.
    _cdc_once = _cdc_udf.asNondeterministic()

    folded = spread_narrow_scan(df).select(
        F.col(id_col), _cdc_once(F.col(text_col)).alias("__chunks")
    )
    return folded.select(
        F.col(id_col),
        F.posexplode("__chunks").alias("chunk_index", "chunk"),
    )


def shingle_novelty_profile(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a document's distinct
    n-grams whose globally FIRST occurrence (minimum doc id) is this
    document — the forward-looking complement of
    shingle_duplication_profile (t20 asks "how much of me is recycled";
    this asks "how much did I contribute first"), the signal dedup
    ordering and data-valuation weigh.

    Same de-skewed shape as t20 (r8): distinct (doc, shingle-hash) rollup
    (localCheckpointed — consumed by both downstream aggregates),
    per-shingle min-owner aggregation (map-side combined, so a stopword
    shingle's reducer key receives at most n_map_partitions rows), and
    novelty attribution rolls up BY OWNER DOC ID — no shingle-keyed join
    exists. Returns (id, n_shingles, n_novel, novelty_ratio)."""
    from guardian_for_apache_kafka_spark.functions.columns import (
        ngram_shingles,
        tokens_col,
    )
    from guardian_for_apache_kafka_spark.operators.layout import spread_narrow_scan

    tok = spread_narrow_scan(df).select(
        F.col(id_col).alias("__id"), tokens_col(content_col).alias("__tk")
    )
    sh = tok.select(
        "__id", ngram_shingles(F.col("__tk"), n).alias("__shingles")
    ).where(F.size("__shingles") > 0)
    # ngram_shingles dedups within the doc, so this IS the (doc, shingle)
    # rollup — one row per distinct pair
    pairs = sh.select(
        "__id",
        F.explode(F.transform("__shingles", lambda c: F.xxhash64(c))).alias("__s"),
    ).localCheckpoint(eager=False)  # lazy: keep the explode inside the timed action (r11)
    return novelty_from_pairs(pairs, id_col)


def novelty_from_pairs(pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Novelty attribution from a distinct (__id, __s) pair frame — the
    shared core of shingle_novelty_profile (batch) and the streaming
    novelty rollup (streaming/pipeline.novelty_rollup), so the
    stream==batch equivalence rides on one implementation (the
    weighted-median/cusum twin discipline)."""
    novel = (
        pairs.groupBy("__s")
        .agg(F.min("__id").alias("__owner"))
        .groupBy(F.col("__owner").alias("__id"))
        .agg(F.count("*").alias("n_novel"))
    )
    doc_tot = pairs.groupBy("__id").agg(F.count("*").alias("n_shingles"))
    return (
        doc_tot.join(novel, "__id", "left")
        .withColumn("n_novel", F.coalesce(F.col("n_novel"), F.lit(0)))
        .select(
            F.col("__id").alias(id_col),
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_shingles"), 4
            ).alias("novelty_ratio"),
        )
    )


def dsir_importance_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant_scale: int = 1_000_000,
    broadcast_model: bool | None = None,
    broadcast_vocab_limit: int = 2_000_000,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    the mean log-likelihood ratio of its tokens under a TARGET unigram
    model vs the RAW-corpus unigram model (DSIR proper uses hashed n-gram
    features; the unigram special case keeps the oracle exact). High
    weight = raw-pool document that looks like the target distribution —
    the selection signal for "find me more data like my target set".

    Both models are add-one smoothed over the SHARED raw vocabulary, so
    every raw token has a finite ratio (target-absent tokens score
    ln(1/(n_t+V)) - ln((c_r+1)/(n_r+V)) < 0). Determinism: each token
    type's ratio is quantized to integer micro-nats once (vocab-sized
    arithmetic), per-doc accumulation is an INTEGER sum — exact in any
    partitioning/order — and the single division happens at the end.

    Scale shape: two token-keyed aggregates (map-side combined, results
    vocabulary-sized), the scored map joins back onto the token stream,
    per-doc rollup is a partial agg on the id.

    Broadcast gate (ADVICE r8): a web-scale open vocabulary can exceed any
    executor broadcast budget, so the ratio frame is broadcast only when
    its row count is at or below ``broadcast_vocab_limit`` (~2M entries,
    the unigram_cross_entropy gate); above it the score falls back to a
    token-keyed shuffle join — the model side stays vocabulary-sized, the
    stream side carries only (id, token, rq). The vocab frame is PERSISTED
    around the probe (r9 advisor fix: LIMIT over an aggregate bounds rows
    returned, not the aggregation work — unpersisted, the probe would pay
    a full extra vocabulary-building pass and the ratio join a second
    one), so the probe's count, the scalar totals, and the ratio join all
    share one materialization; force the choice with ``broadcast_model``.

    Returns (id, n_tokens, weight_q: long micro-nat total, log_ratio:
    double mean nats)."""
    toks = df.select(
        F.col(id_col), target.alias("__tgt"), F.explode(tokens_col(text_col)).alias("__t")
    )
    raw = toks.groupBy("__t").agg(F.count("*").alias("__cr"))
    tgt = toks.where(F.col("__tgt")).groupBy("__t").agg(F.count("*").alias("__ct"))
    # vocab feeds the scalar totals, the ratio projection, AND the
    # broadcast-gate probe — three consumers of two token-keyed
    # aggregations plus a join. Materialize it once with a LAZY LOCAL
    # CHECKPOINT (r11, replacing the r10 one-slot persist cache): checkpoint
    # blocks are instance-scoped and GC'd with the frame, so repeated calls
    # leak nothing (the r10 advisor finding), and — unlike ``persist()`` —
    # nothing lands in Spark's logical-plan-keyed cache manager, so a later
    # identical call can never silently serve the previous call's
    # materialization (each call recomputes from its own inputs).
    vocab = raw.join(tgt, "__t", "left").select(
        "__t", "__cr", F.coalesce("__ct", F.lit(0)).alias("__ct")
    ).localCheckpoint(eager=False)
    scalars = vocab.agg(
        F.sum("__cr").alias("__nr"),
        F.sum("__ct").alias("__nt"),
        F.count("*").alias("__v"),
    )
    ratio = vocab.crossJoin(F.broadcast(scalars)).select(
        "__t",
        F.round(
            (
                F.log((F.col("__ct") + 1.0) / (F.col("__nt") + F.col("__v")))
                - F.log((F.col("__cr") + 1.0) / (F.col("__nr") + F.col("__v")))
            )
            * F.lit(float(quant_scale))
        )
        .cast("long")
        .alias("__rq"),
    )
    if broadcast_model is None:
        # limit+1 bounds the probe: "over the limit?" without a full count
        probe = vocab.limit(broadcast_vocab_limit + 1).count()
        broadcast_model = probe <= broadcast_vocab_limit
    scored = toks.join(F.broadcast(ratio) if broadcast_model else ratio, "__t")
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("__rq").cast("long").alias("weight_q"),
        (
            F.sum("__rq") / F.count("*") / F.lit(float(quant_scale))
        ).alias("log_ratio"),
    )


def ngram_diversity_profile(
    df: DataFrame,
    orders: tuple[int, ...] = (1, 2, 3),
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group n-gram diversity (generalized type-token ratio): for each
    n, distinct n-grams / total n-grams within the group — the standard
    self-repetition / memorization-risk profile of a corpus slice (a
    low-diversity source is template spam; Self-BLEU's cheap cousin).

    The exploded stream carries (group, n, digest) — an int64 n-gram
    identity (xxhash64 over the n-token-hash window, the d3/d4 discipline),
    never the n-gram text, and the count-distinct runs on the digest so the
    distinct exchange compares 8-byte longs (the old md5-hex form shuffled a
    32-char string per gram and built the gram string first; collision
    budget is the registry-standard ~n_grams^2/2^64, differentially
    attested per scale). ONE scan, ONE per-row expansion covering every
    order (the old shape unioned |orders| full scan+tokenize branches), one
    grouped aggregate (map-side combined). Built with the column DSL over
    the shared ``tokens_col`` tokenizer (ADVICE r8: the old raw-SQL string
    broke on column names needing quoting and could drift from the other
    text operators' tokenization), with the token-hash array hoisted once
    per row rather than re-derived per order."""
    from guardian_for_apache_kafka_spark.operators.layout import spread_narrow_scan

    # one scan feeds ALL orders now, so the per-row expansion work that the
    # old 3-branch union spread over 3 concurrent scan stages lands in one
    # stage — spread it across the cores (no-op when the scan already has
    # parallelism)
    df, scratch = _with_tokens_scratch(spread_narrow_scan(df), text_col)
    hoisted = df.select(
        F.col(group_col).alias("grp"),
        F.transform(F.col(scratch), lambda t: F.xxhash64(t)).alias("__th"),
    )
    th = F.col("__th")

    def gram_structs(n: int) -> Column:
        # NB: the inner lambda must stay UNARY — PySpark dispatches on the
        # lambda's arity, and a second parameter (even a defaulted `n=n`
        # binding) silently selects the (element, index) binary transform
        # form, turning the bound constant into the array index.
        # The window digest is MULTI-ARG xxhash64 over the n element_at
        # lookups, not xxhash64(slice(...)): the slice form allocates an
        # n-element array per gram inside the interpreted transform, and
        # that allocation churn was the flat-across-cores bottleneck of the
        # 10x expansion stage (r12 core-scaling check: the stage was
        # GC-bound, 1.94 -> 1.14 s median at 10x with identical counts).
        # Only gram-identity distinctness matters downstream (the output is
        # counts), so the digest function is free to differ from the array
        # form; collision budget is unchanged (~n_grams^2/2^64).
        return F.when(
            F.size(th) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(th) - n),
                lambda i: F.struct(
                    F.lit(n).cast("int").alias("n"),
                    F.xxhash64(
                        *[F.element_at(th, i + F.lit(k + 1)) for k in range(n)]
                    ).alias("h"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,h:bigint>>"))

    allg = hoisted.select(
        "grp",
        F.explode(F.concat(*[gram_structs(n) for n in orders])).alias("__s"),
    ).select("grp", F.col("__s.n").alias("n"), F.col("__s.h").alias("__g"))
    return (
        allg.groupBy("grp", "n")
        .agg(
            F.count("*").cast("long").alias("total_ngrams"),
            F.countDistinct("__g").cast("long").alias("distinct_ngrams"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            "total_ngrams",
            "distinct_ngrams",
            F.round(F.col("distinct_ngrams") * 1.0 / F.col("total_ngrams"), 4).alias(
                "diversity"
            ),
        )
    )
