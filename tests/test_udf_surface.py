"""The declared UDF surface (SURVEY.md §2.3): Python scalar UDF, pandas scalar
UDF, pandas grouped-agg UDAF, applyInPandas grouped-map, and table-function via
explode of an array-returning expression — each validated against the
equivalent built-in so the UDF path is provably semantics-preserving (built-ins
stay the hot path; UDFs exist for what Spark lacks)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from guardian_for_apache_kafka_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")


def test_python_scalar_udf_matches_builtin(spark, events):
    @F.udf("double")
    def py_halve(v):
        return v / 2.0 if v is not None else None

    got = events.select(py_halve("value").alias("h"), (F.col("value") / 2).alias("b"))
    assert got.where(F.abs(F.col("h") - F.col("b")) > 1e-12).count() == 0


def test_pandas_scalar_udf_matches_builtin(spark, events):
    @F.pandas_udf("double")
    def pd_halve(v: pd.Series) -> pd.Series:
        return v / 2.0

    got = events.select(pd_halve("value").alias("h"), (F.col("value") / 2).alias("b"))
    assert got.where(F.abs(F.col("h") - F.col("b")) > 1e-12).count() == 0


def test_pandas_grouped_agg_udaf_matches_builtin(spark, events):
    @F.pandas_udf("double")
    def pd_mean(v: pd.Series) -> float:
        return float(v.mean())

    # pandas UDAFs cannot mix with JVM aggregates in one agg() — separate plans
    udaf = {r.event_type: r.u for r in
            events.groupBy("event_type").agg(pd_mean("value").alias("u")).collect()}
    builtin = {r.event_type: r.b for r in
               events.groupBy("event_type").agg(F.avg("value").alias("b")).collect()}
    assert udaf.keys() == builtin.keys()
    for k in udaf:
        assert abs(udaf[k] - builtin[k]) < 1e-9


def test_apply_in_pandas_grouped_map_matches_window(spark, events):
    """Grouped-map: per-user z-score of value — equals the window-function
    formulation (the built-in path an engine user should normally take)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["value"].std(ddof=1)
        pdf = pdf.copy()
        pdf["z"] = 0.0 if (pd.isna(sd) or sd == 0) else (pdf["value"] - pdf["value"].mean()) / sd
        return pdf

    small = events.where(F.col("user_id") < 20)
    got = (
        small.groupBy("user_id")
        .applyInPandas(zscore, "user_id LONG, event_type STRING, value DOUBLE, z DOUBLE")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    expected = small.withColumn(
        "z",
        F.when(
            F.stddev_samp("value").over(w) == 0, F.lit(0.0)
        ).otherwise((F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)),
    )
    g = {(r.user_id, r.value): r.z for r in got.collect()}
    e = {(r.user_id, r.value): r.z for r in expected.collect()}
    assert g.keys() == e.keys()
    assert all(abs(g[k] - e[k]) < 1e-9 for k in g)


def test_table_function_via_array_udf_explode(spark):
    """UDTF shape: an array-returning UDF exploded into rows — n-gram
    generation, verified against the pure-JVM ngram_shingles expression."""
    from guardian_for_apache_kafka_spark.functions.columns import ngram_shingles, tokens_col

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, "p q r")], "doc_id INT, text STRING"
    )

    @F.udf("array<string>")
    def bigrams(text):
        toks = text.split(" ")
        return [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]

    via_udf = docs.select("doc_id", F.explode(bigrams("text")).alias("s"))
    via_builtin = docs.select(
        "doc_id", F.explode(ngram_shingles(tokens_col("text"), 2)).alias("s")
    )
    assert {tuple(r) for r in via_udf.collect()} == {tuple(r) for r in via_builtin.collect()}


def test_native_python_udtf_expected_slices(spark):
    """Real Python UDTF (Spark 4 @udtf API, not the array-UDF+explode
    shape): enumerate the expected hourly archive slice keys between two
    bounds — the missing-slice detection helper — verified against the
    pure-JVM sequence() expression. UDTFs are API-surface coverage; hot
    paths keep the JVM/Arrow formulations."""
    import datetime as dt

    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="slice_start timestamp")
    class ExpectedSlices:
        def eval(self, start: dt.datetime, end: dt.datetime):
            cur = start.replace(minute=0, second=0, microsecond=0)
            while cur <= end:
                yield (cur,)
                cur += dt.timedelta(hours=1)

    s = dt.datetime(2024, 1, 1, 3, 30)
    e = dt.datetime(2024, 1, 1, 9, 10)
    got = [r.slice_start for r in ExpectedSlices(lit(s), lit(e)).collect()]
    want = [
        r.t
        for r in spark.sql(
            "SELECT explode(sequence(timestamp'2024-01-01 03:00:00', "
            "timestamp'2024-01-01 09:00:00', interval 1 hour)) AS t"
        ).collect()
    ]
    assert got == want and len(got) == 7
