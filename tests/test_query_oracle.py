"""DuckDB-oracle differential gate over every registered query (sf0.001 smoke;
the driver repeats this at sf0.01). Mirrors the driver's correctness check."""

import pytest

from guardian_for_apache_kafka_spark.plans import REGISTRY
from guardian_for_apache_kafka_spark.plans.differential import duckdb_connection, run_one


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    res = run_one(spark, sf_dir, name, duck)
    assert res.ok, res.detail


def test_rotation_window_composition():
    """The attestation rotation invariants (plans/__init__._reorder_registry):
    at most _VERY_STALE_SLOTS veterans may sort AHEAD of the never-attested
    pool; every never-attested query that fits is in the head window; any
    remaining head slots go to overflow very-stale veterans BEFORE any
    fresher veteran; within each tier registration order is preserved.

    (r10 fix: the old form asserted <= _VERY_STALE_SLOTS very-stale
    veterans in the WHOLE window, which only holds while the never-attested
    pool saturates it — with the backlog drained to 32, the 13 free tail
    slots are correctly filled by overflow very-stale veterans, which is
    the rotation working as designed, not a cap violation.)"""
    from guardian_for_apache_kafka_spark import plans as p

    head = list(p.REGISTRY)[:50]
    n_never = sum(1 for n in p.REGISTRY if n not in p._LAST_ATTESTED)
    head_never = [n for n in head if n not in p._LAST_ATTESTED]
    # veterans sorted AHEAD of the first never-attested entry = the
    # guaranteed slots; those are what the cap bounds
    first_never_pos = min(
        (i for i, n in enumerate(head) if n not in p._LAST_ATTESTED),
        default=len(head),
    )
    assert first_never_pos <= p._VERY_STALE_SLOTS
    # every never-attested query that fits is in the window
    assert len(head_never) == min(n_never, 50 - first_never_pos)
    # a fresher-than-very-stale veteran may hold a head slot only if BOTH
    # backlogs (never-attested, very-stale) are fully inside the window
    fresh_in_head = [
        n
        for n in head
        if n in p._LAST_ATTESTED
        and p._LAST_ATTESTED[n] > p._VERY_STALE_ROUND
    ]
    if fresh_in_head:
        outside = set(p.REGISTRY) - set(head)
        assert not any(n not in p._LAST_ATTESTED for n in outside)
        assert not any(
            p._LAST_ATTESTED[n] <= p._VERY_STALE_ROUND for n in outside
        )


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
    # column names are sort-stable identifiers on both sides
    for name, sql in e.oracle_sql().items():
        assert sql.strip(), name


def test_q24_approx_tracks_exact(spark, sf_dir):
    """q24 computes the sketches AND their exact twins in-query and emits
    bound verdicts (the bounded-assertion oracle contract): every group must
    report both bounds held, with exact row counts anchoring the groups."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.plans import all_queries
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    rows = all_queries()["q24_approx_aggregates"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    exact_n = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    assert {r.l_returnflag for r in rows} == set(exact_n)
    for r in rows:
        assert r.ndv_within_5pct, f"HLL++ out of band for {r.l_returnflag}"
        assert r.median_within_2pct, f"approx_percentile out of band for {r.l_returnflag}"
        assert r.n == exact_n[r.l_returnflag]


def test_salted_join_equals_unsalted(spark, sf_dir):
    """Replicate-and-salt join == plain join, for inner and left, including
    unmatched preserved rows."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.functions.skew import salted_join, top_keys
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    cust_k = cust.withColumnRenamed("c_custkey", "o_custkey")
    # make some orders unmatched to exercise the left-join preserved path
    cust_half = cust_k.where(F.col("o_custkey") % 2 == 0)

    def key_set(df):
        return sorted(tuple(r) for r in df.collect())

    plain_inner = orders.join(cust_half, "o_custkey")
    salted_inner = salted_join(orders, cust_half, "o_custkey", buckets=8)
    assert key_set(salted_inner) == key_set(plain_inner)

    plain_left = orders.join(cust_half, "o_custkey", "left")
    salted_left = salted_join(orders, cust_half, "o_custkey", buckets=8, how="left")
    assert key_set(salted_left) == key_set(plain_left)

    hot = top_keys(orders, "o_custkey", n=5).collect()
    assert len(hot) == 5 and hot[0].cnt >= hot[-1].cnt


def test_asof_join_directions_and_tolerance(spark):
    from guardian_for_apache_kafka_spark.operators.asof import asof_join

    def ts(s):
        import datetime as dt
        return dt.datetime.fromisoformat(s)

    left = spark.createDataFrame(
        [(1, "a", ts("2024-01-01 10:00:00")), (2, "a", ts("2024-01-01 12:00:00")),
         (3, "b", ts("2024-01-01 10:30:00")), (4, "c", ts("2024-01-01 09:00:00"))],
        "lid INT, k STRING, t TIMESTAMP")
    right = spark.createDataFrame(
        [("a", ts("2024-01-01 09:30:00"), 100), ("a", ts("2024-01-01 11:00:00"), 200),
         ("b", ts("2024-01-01 11:00:00"), 300)],
        "k STRING, t TIMESTAMP, v INT")

    back = {r.lid: (r.v, r.t_r) for r in
            asof_join(left, right, on="t", by=("k",)).collect()}
    assert back[1][0] == 100       # 10:00 -> 09:30
    assert back[2][0] == 200       # 12:00 -> 11:00
    assert back[3] == (None, None)  # b's only right row is later
    assert back[4] == (None, None)  # no right rows for c

    fwd = {r.lid: r.v for r in
           asof_join(left, right, on="t", by=("k",), direction="forward").collect()}
    assert fwd[1] == 200 and fwd[2] is None and fwd[3] == 300

    tol = {r.lid: r.v for r in
           asof_join(left, right, on="t", by=("k",), tolerance_seconds=1800).collect()}
    assert tol[1] == 100 and tol[2] is None  # 12:00-11:00 = 1h > 30min


def test_asof_join_equal_time_and_tie_break(spark):
    from guardian_for_apache_kafka_spark.operators.asof import asof_join

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    left = spark.createDataFrame([(1, "a", t0)], "lid INT, k STRING, t TIMESTAMP")
    right = spark.createDataFrame(
        [("a", t0, 7, 70), ("a", t0, 9, 90), ("a", t0 - dt.timedelta(hours=1), 1, 10)],
        "k STRING, t TIMESTAMP, o INT, v INT")
    got = asof_join(left, right, on="t", by=("k",), right_order="o").collect()[0]
    assert got.t_r == t0      # <= matches equal time
    assert got.v == 90        # ties resolve to max right_order


from hypothesis import given, settings, strategies as st  # noqa: E402

_key = st.sampled_from(["a", "b", "c"])
_t = st.integers(min_value=0, max_value=500)


@settings(max_examples=12, deadline=None)
@given(
    left=st.lists(st.tuples(_key, _t), min_size=1, max_size=25),
    right=st.dictionaries(st.tuples(_key, _t), st.integers(0, 1000), min_size=1, max_size=25),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """Property: distributed asof_join == pandas merge_asof (backward,
    exact matches allowed) on arbitrary key/time layouts. Right rows are
    unique per (key, time) so neither engine's tie-break is exercised."""
    import datetime as dt

    import pandas as pd

    base = dt.datetime(2024, 1, 1)

    lpdf = pd.DataFrame(
        {"k": [k for k, _ in left],
         "t": [base + dt.timedelta(seconds=s) for _, s in left],
         "lid": range(len(left))}
    )
    rpdf = pd.DataFrame(
        {"k": [k for k, _ in right],
         "t": [base + dt.timedelta(seconds=s) for _, s in right],
         "v": list(right.values())}
    )
    ldf = spark.createDataFrame(lpdf.astype({"lid": "int64"}))
    rdf = spark.createDataFrame(rpdf.astype({"v": "int64"}))

    from guardian_for_apache_kafka_spark.operators.asof import asof_join

    got = {r.lid: r.v for r in asof_join(ldf, rdf, on="t", by=("k",)).collect()}

    exp_pdf = pd.merge_asof(
        lpdf.sort_values(["t", "lid"]), rpdf.sort_values("t"),
        on="t", by="k", direction="backward", allow_exact_matches=True,
    )
    exp = {int(r.lid): (None if pd.isna(r.v) else int(r.v)) for r in exp_pdf.itertuples()}
    assert got == exp


@settings(max_examples=10, deadline=None)
@given(
    left=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=20),
    right=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=20),
    buckets=st.sampled_from([1, 3, 8]),
)
def test_salted_join_property(spark, left, right, buckets):
    """Property: salted inner/left join == plain join for arbitrary key
    layouts including duplicate rows and unmatched keys."""
    from guardian_for_apache_kafka_spark.functions.skew import salted_join

    ldf = spark.createDataFrame(
        [(k, v) for k, v in left] or [(None, None)], "k INT, lv INT"
    ).where("k IS NOT NULL" if not left else "1=1")
    rdf = spark.createDataFrame(
        [(k, v) for k, v in right] or [(None, None)], "k INT, rv INT"
    ).where("k IS NOT NULL" if not right else "1=1")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(salted_join(ldf, rdf, "k", buckets)) == rows(ldf.join(rdf, "k"))
    assert rows(salted_join(ldf, rdf, "k", buckets, how="left")) == rows(
        ldf.join(rdf, "k", "left")
    )


def test_tz_typed_oracle_fails_inrepo_gate(spark, sf_dir):
    """A TIMESTAMPTZ oracle column must FAIL the in-repo differential check
    even when its rendered UTC values agree with Spark's naive TIMESTAMP —
    mirrors the driver's schema check (the q40 regression the renderer
    previously normalized away)."""
    from guardian_for_apache_kafka_spark.plans.differential import run_one
    from guardian_for_apache_kafka_spark.plans.registry import REGISTRY, EngineQuery

    def builder(spark, sf_dir):
        return spark.sql("SELECT CAST('1970-01-01 00:05:00' AS TIMESTAMP_NTZ) AS w_start, 1 AS n")

    bad = "SELECT to_timestamp(300) AS w_start, 1 AS n"  # TIMESTAMPTZ in DuckDB
    good = "SELECT CAST(to_timestamp(300) AS TIMESTAMP) AS w_start, 1 AS n"
    name = "_tz_probe"
    REGISTRY[name] = EngineQuery(name=name, builder=builder, oracle=bad)
    try:
        res = run_one(spark, sf_dir, name)
        assert not res.ok and "dtype" in res.detail, res.detail
        REGISTRY[name] = EngineQuery(name=name, builder=builder, oracle=good)
        res = run_one(spark, sf_dir, name)
        assert res.ok, res.detail
    finally:
        del REGISTRY[name]


def test_activity_correlation_first_principles(spark, sf_dir):
    """correlated_pairs must agree with numpy's Pearson on the same dense
    profiles (rounded to tolerance), be symmetric-free (id_a < id_b), and
    exclude zero-variance profiles."""
    import numpy as np
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.operators.timeseries import (
        activity_profile,
        correlated_pairs,
    )
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    prof = activity_profile(ev, "user_id", "ts", buckets=24)
    vecs = {}
    for r in prof.collect():
        vecs.setdefault(r["__id"], [0] * 24)[r["__b"]] = r["__c"]
    pairs = correlated_pairs(prof, min_corr=-1.1, buckets=24).collect()
    assert all(r.id_a < r.id_b for r in pairs)
    by_pair = {(r.id_a, r.id_b): r.corr for r in pairs}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            va, vb = np.array(vecs[a], float), np.array(vecs[b], float)
            if va.std() == 0 or vb.std() == 0:
                assert (a, b) not in by_pair  # zero-variance excluded
                continue
            expected = float(np.corrcoef(va, vb)[0, 1])
            assert abs(by_pair[(a, b)] - expected) < 1e-9, (a, b)


def test_profile_vectors_feed_ann(spark, sf_dir):
    """The profile->vector bridge must produce arrays the ANN operators
    accept, in bucket order, one row per entity."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.operators.similarity import cosine_topk
    from guardian_for_apache_kafka_spark.operators.timeseries import (
        activity_profile,
        profile_vectors,
    )
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    vecs = profile_vectors(activity_profile(ev, "user_id", "ts"))
    assert vecs.count() == ev.select("user_id").distinct().count()
    assert dict(vecs.dtypes)["embedding"] == "array<double>"
    q = vecs.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    top = cosine_topk(vecs, q, k=2)
    assert top.count() == 3 * 2


def test_funnel_steps_first_principles(spark):
    """funnel_steps on a hand-built event log: out-of-order steps don't
    count, ties break by event_id, steps_completed is the furthest QUALIFIED
    prefix, keys without step 1 are absent."""
    import datetime as dt

    from guardian_for_apache_kafka_spark.operators.timeseries import funnel_steps

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # u1: full funnel in order
        (1, t(1), 1, "view"), (2, t(2), 1, "click"), (3, t(3), 1, "purchase"),
        # u2: click BEFORE any view -> never qualifies; later click does
        (4, t(1), 2, "click"), (5, t(2), 2, "view"), (6, t(3), 2, "click"),
        # u3: purchase before qualified click -> stuck at step 2
        (7, t(1), 3, "view"), (8, t(2), 3, "purchase"), (9, t(3), 3, "click"),
        # u4: no view at all -> absent from output
        (10, t(1), 4, "click"), (11, t(2), 4, "purchase"),
        # u5: same-ts view+click: click id > view id counts (strictly-before
        # is by (ts, id) order)
        (12, t(5), 5, "view"), (13, t(5), 5, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r.user_id: r for r in funnel_steps(df, ["view", "click", "purchase"]).collect()}
    assert got[1].steps_completed == 3
    assert got[2].steps_completed == 2 and got[2].step2_ts == t(3)
    assert got[3].steps_completed == 2  # purchase at t2 precedes qualified click
    assert 4 not in got
    assert got[5].steps_completed == 2  # same-ts click after view by id order


def test_pointer_doubling_exact_depths_on_path_graph(spark):
    """Worst case for doubling (a single path 1<-2<-...<-N): depths must be
    exact and converge in EXACTLY ceil(log2(N)) rounds — max_iter=6 at N=64
    pins the budget boundary (a per-level BFS would need 64; an off-by-one
    in the convergence check would raise one round early)."""
    from guardian_for_apache_kafka_spark.operators.hierarchy import ancestor_depths

    n = 64
    edges = spark.createDataFrame(
        [(i, i - 1) for i in range(1, n + 1)], "node long, parent long"
    )
    out = {r.node: r.depth for r in ancestor_depths(edges, max_iter=6).collect()}
    assert out == {i: i for i in range(1, n + 1)}


def test_pointer_doubling_cycle_raises(spark):
    """A cycle must raise, never return silently wrong depths."""
    import pytest

    from guardian_for_apache_kafka_spark.operators.hierarchy import ancestor_depths

    edges = spark.createDataFrame([(1, 2), (2, 1)], "node long, parent long")
    with pytest.raises(RuntimeError, match="converge"):
        ancestor_depths(edges, max_iter=6)


def test_pointer_doubling_forest_semantics(spark):
    """A multi-tree forest with a dangling parent id: depth counts edges to
    the nearest ancestor with no edge row (that tree's root) — verified
    against a driver-side reference walk."""
    from guardian_for_apache_kafka_spark.operators.hierarchy import ancestor_depths

    edges = {10: 0, 11: 10, 12: 11, 20: 99, 21: 20, 22: 21, 23: 22}
    # 99 has no edge row: it is the root of the second tree
    df = spark.createDataFrame(list(edges.items()), "node long, parent long")

    def ref_depth(n):
        d = 0
        while n in edges:
            n = edges[n]
            d += 1
        return d

    got = {r.node: r.depth for r in ancestor_depths(df).collect()}
    assert got == {n: ref_depth(n) for n in edges}


@settings(max_examples=10, deadline=None)
@given(
    n_tokens=st.integers(min_value=1, max_value=120),
    window=st.integers(min_value=1, max_value=40),
    stride_frac=st.integers(min_value=1, max_value=40),
)
def test_chunk_documents_coverage_property(spark, n_tokens, window, stride_frac):
    """Property over arbitrary (doc length, window, stride<=window): chunk
    ids are dense from 0, every chunk is non-empty and at most window
    tokens, the FINAL chunk always reaches the document's end, and with
    stride == window the chunks partition the token sequence exactly."""
    from guardian_for_apache_kafka_spark.operators.text import chunk_documents

    stride = min(stride_frac, window)
    toks = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, window=window, stride=stride).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_id for r in rows] == list(range(len(rows)))
    assert all(1 <= r.n_tokens <= window for r in rows)
    last = rows[-1]
    assert last.chunk_id * stride + last.n_tokens == n_tokens
    if stride == window:
        assert sum(r.n_tokens for r in rows) == n_tokens


def test_merge_into_corner_semantics(spark):
    """MERGE corner cases implementations disagree on: delete-of-missing is
    a no-op (not an insert); inserted rows have NULL for non-updated base
    columns; matched update replaces only update_cols; missing update
    columns raise."""
    import pytest

    from guardian_for_apache_kafka_spark.operators.merge import merge_into

    base = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, "y")], "k long, v double, tag string"
    )
    updates = spark.createDataFrame(
        [
            (2, 99.0, False),   # matched update
            (3, 30.0, False),   # insert
            (4, 0.0, True),     # delete-of-missing -> no-op
            (1, 0.0, True),     # matched delete
        ],
        "k long, v double, deleted boolean",
    )
    out = {
        r.k: r
        for r in merge_into(
            base, updates, "k", ["v"], "deleted", allow_partial_inserts=True
        ).collect()
    }
    assert set(out) == {2, 3}
    assert out[2].v == 99.0 and out[2].tag == "y"
    assert out[3].v == 30.0 and out[3].tag is None
    with pytest.raises(ValueError, match="lacks columns"):
        merge_into(base, updates.drop("v"), "k", ["v"], "deleted")
    # partial update_cols without the explicit opt-in must raise, not
    # silently NULL-pad inserted rows (VERDICT r5 §wrong #4)
    with pytest.raises(ValueError, match="does not cover base columns"):
        merge_into(base, updates, "k", ["v"], "deleted")
    # an update that explicitly sets NULL must CLEAR the base value
    # (Delta/Iceberg UPDATE SET v = source.v semantics) — a coalesce-based
    # resolution would silently keep 20.0
    nulling = spark.createDataFrame([(2, None, False)], "k long, v double, deleted boolean")
    cleared = {
        r.k: r
        for r in merge_into(
            base, nulling, "k", ["v"], "deleted", allow_partial_inserts=True
        ).collect()
    }
    assert cleared[2].v is None and cleared[2].tag == "y"
    assert cleared[1].v == 10.0
    # duplicate source keys: silent fan-out without the flag, loud with it
    # (Delta's "multiple source rows matched"; ADVICE r5)
    dup = updates.unionByName(updates.where("k = 2"))
    with pytest.raises(ValueError, match="not key-unique"):
        merge_into(
            base, dup, "k", ["v"], "deleted",
            allow_partial_inserts=True, validate_unique=True,
        )


def test_pack_sequences_non_string_group(spark):
    """The packing schema must follow the input types: an INT group column
    and the declared generic API work together (previously hardcoded
    'string'/'long' and crashed in Arrow casting)."""
    from guardian_for_apache_kafka_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, 100, "a b c"), (1, 101, "d e"), (2, 200, "f g h i")],
        "grp int, doc_id long, text string",
    )
    rows = pack_sequences(df, budget=4, group_col="grp").collect()
    assert {r.grp for r in rows} == {1, 2}
    assert all(isinstance(r.grp, int) for r in rows)


def test_ivm_group_changing_update(spark):
    """update = delete(before)+insert(after): a row moving BETWEEN groups
    must decrement its old group and increment the new one; a group whose
    count reaches zero disappears; inserts create new groups."""
    from guardian_for_apache_kafka_spark.operators.ivm import (
        apply_agg_delta,
        cdc_agg_delta,
    )
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5)], "g string, v long"
    )
    old = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n"), F.sum("v").alias("s")
    )
    cdc = spark.createDataFrame(
        [
            ("a", 10, "c", 11),   # group-changing update a -> c
            ("b", 5, None, None), # delete empties group b
            (None, None, "d", 7), # insert creates group d
        ],
        "before_g string, before_v long, after_g string, after_v long",
    )
    got = {
        r.g: (r.n, r.s)
        for r in apply_agg_delta(old, cdc_agg_delta(cdc), "g", "n", "s").collect()
    }
    # recompute from scratch on the post-change data
    assert got == {"a": (1, 20), "c": (1, 11), "d": (1, 7)}


def test_snapshot_asof_versions_and_reinsert(spark):
    """Time travel visibility: as-of each version, including a key deleted
    then re-inserted later (delete hides it at v2, the v3 re-insert brings
    it back with the new value)."""
    from guardian_for_apache_kafka_spark.operators.merge import snapshot_asof

    base = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    log = spark.createDataFrame(
        [
            (1, 11, 1, False),  # v1: update k=1
            (2, 0, 2, True),    # v2: delete k=2
            (2, 22, 3, False),  # v3: re-insert k=2
            (3, 30, 3, False),  # v3: insert k=3
        ],
        "k long, v long, ver long, deleted boolean",
    )

    def snap(version):
        return {
            r.k: r.v
            for r in snapshot_asof(base, log, "k", "ver", version).collect()
        }

    assert snap(0) == {1: 10, 2: 20}
    assert snap(1) == {1: 11, 2: 20}
    assert snap(2) == {1: 11}
    assert snap(3) == {1: 11, 2: 22, 3: 30}


@settings(max_examples=10, deadline=None)
@given(
    base=st.dictionaries(st.integers(0, 20), st.tuples(st.sampled_from("abc"), st.integers(0, 100)), min_size=1, max_size=15),
    data=st.data(),
)
def test_ivm_property_matches_recompute(spark, base, data):
    """Property: old_agg (+) cdc_agg_delta == from-scratch aggregation of the
    post-change state, for arbitrary consistent CDC batches (updates with
    group moves, deletes, inserts)."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.operators.ivm import (
        apply_agg_delta,
        cdc_agg_delta,
    )

    keys = sorted(base)
    touched = data.draw(st.sets(st.sampled_from(keys), max_size=len(keys)))
    ops = []
    state = dict(base)
    for k in sorted(touched):
        op = data.draw(st.sampled_from(["update", "delete"]))
        g0, v0 = base[k]
        if op == "delete":
            ops.append((g0, v0, None, None))
            del state[k]
        else:
            g1 = data.draw(st.sampled_from("abcd"))
            v1 = data.draw(st.integers(0, 100))
            ops.append((g0, v0, g1, v1))
            state[k] = (g1, v1)
    inserts = data.draw(
        st.dictionaries(st.integers(100, 110), st.tuples(st.sampled_from("abcd"), st.integers(0, 100)), max_size=5)
    )
    for k, (g, v) in inserts.items():
        ops.append((None, None, g, v))
        state[k] = (g, v)

    base_df = spark.createDataFrame(
        [(k, g, v) for k, (g, v) in base.items()], "k long, g string, v long"
    )
    old = base_df.groupBy("g").agg(
        F.count("*").cast("long").alias("n"), F.sum("v").alias("s")
    )
    if not ops:
        ops = [(None, None, None, None)]  # no-op batch; delta legs both empty
    cdc = spark.createDataFrame(
        ops, "before_g string, before_v long, after_g string, after_v long"
    )
    got = {
        r.g: (r.n, r.s)
        for r in apply_agg_delta(old, cdc_agg_delta(cdc), "g", "n", "s").collect()
    }
    want = {}
    for g, v in state.values():
        n, s = want.get(g, (0, 0))
        want[g] = (n + 1, s + v)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    base=st.dictionaries(st.integers(0, 10), st.integers(0, 100), min_size=1, max_size=8),
    log=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 100), st.booleans()),
        max_size=12,
    ),
)
def test_snapshot_asof_property_matches_replay(spark, base, log):
    """Property: snapshot_asof at every version == a sequential Python
    replay of the log (one op per version, deletes included)."""
    from guardian_for_apache_kafka_spark.operators.merge import snapshot_asof

    base_df = spark.createDataFrame(list(base.items()), "k long, v long")
    log_rows = [
        (k, v, i + 1, deleted) for i, (k, v, deleted) in enumerate(log)
    ]
    log_df = spark.createDataFrame(
        log_rows or [(0, 0, 99, False)], "k long, v long, ver long, deleted boolean"
    )
    state = dict(base)
    # check version 0 plus each applied prefix
    for upto in range(len(log_rows) + 1):
        if upto > 0:
            k, v, _, deleted = log_rows[upto - 1]
            if deleted:
                state.pop(k, None)
            else:
                state[k] = v
        got = {
            r.k: r.v for r in snapshot_asof(base_df, log_df, "k", "ver", upto).collect()
        }
        assert got == state, f"asof v={upto}"


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=20
    ),
    iters=st.integers(1, 3),
)
def test_pagerank_property_matches_python_replay(spark, edges, iters):
    """Property: distributed integer fixed-point PageRank == a sequential
    Python replay on arbitrary small multigraphs (self-loops, parallel
    edges, dangling nodes)."""
    from guardian_for_apache_kafka_spark.operators.hierarchy import (
        pagerank_fixed_point,
    )

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )
    got = {
        r.node: r.rank for r in pagerank_fixed_point(df, iterations=iters).collect()
    }
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    deg = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        incoming = {n: 0 for n in nodes}
        for a, b in edges:
            incoming[b] += (rank[a] * 85) // (100 * deg[a])
        rank = {n: 150_000 + incoming[n] for n in nodes}
    assert got == rank


def test_snapshot_asof_validate_rejects_version_collisions(spark):
    """validate=True: duplicate (key, version) pairs and version <= 0 (the
    base row's slot) fail loudly instead of returning an arbitrary winner."""
    import pytest

    from guardian_for_apache_kafka_spark.operators.merge import snapshot_asof

    base = spark.createDataFrame([(1, 10)], "k long, v long")
    dup = spark.createDataFrame(
        [(1, 5, 2, False), (1, 7, 2, False)],
        "k long, v long, ver long, deleted boolean",
    )
    with pytest.raises(ValueError, match="version contract"):
        snapshot_asof(base, dup, "k", "ver", 5, validate=True)
    zero = spark.createDataFrame(
        [(1, 5, 0, False)], "k long, v long, ver long, deleted boolean"
    )
    with pytest.raises(ValueError, match="version contract"):
        snapshot_asof(base, zero, "k", "ver", 5, validate=True)
    # clean log passes under validation
    ok = spark.createDataFrame(
        [(1, 5, 1, False)], "k long, v long, ver long, deleted boolean"
    )
    assert {r.v for r in snapshot_asof(base, ok, "k", "ver", 1, validate=True).collect()} == {5}


def test_scd2_corner_semantics(spark):
    """SCD-2 history corners: update chains produce adjacent intervals,
    delete closes without opening, re-insert after delete opens a new
    interval, current rows carry NULL valid_to, never-touched keys have one
    open interval from version 0."""
    from guardian_for_apache_kafka_spark.operators.merge import scd2_from_log

    base = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    log = spark.createDataFrame(
        [
            (1, 11, 1, False),  # update
            (1, 12, 4, False),  # later update
            (2, 0, 2, True),    # delete
            (2, 22, 5, False),  # re-insert
        ],
        "k long, v long, ver long, deleted boolean",
    )
    rows = {
        (r.k, r.valid_from): (r.v, r.valid_to)
        for r in scd2_from_log(base, log, "k", "ver").collect()
    }
    assert rows == {
        (1, 0): (10, 1),
        (1, 1): (11, 4),
        (1, 4): (12, None),
        (2, 0): (20, 2),   # closed by the delete at v2
        (2, 5): (22, None),
        (3, 0): (30, None),
    }


def test_triangle_counts_known_graph(spark):
    """K4 plus a pendant vertex and a disconnected edge: K4 has C(4,3)=4
    triangles, every K4 corner sits in exactly 3 of them; the pendant and
    the disconnected pair are in none (absent from the output). Input
    deliberately dirty — duplicate rows, both edge directions, a self-loop
    — to pin the canonicalization contract."""
    from guardian_for_apache_kafka_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = k4 + [(b, a) for a, b in k4] + k4[:2]  # reversed + duplicates
    edges += [(5, 1), (10, 11), (3, 3)]  # pendant, far edge, self-loop
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_hub_orientation_bound(spark):
    """Star hub + one rim edge (the skew shape): exactly one triangle, and
    the ORIENTATION must leave the hub with zero oriented out-edges (every
    rim node has degree 1 or 2 < hub degree), so the two-path fan-out at
    the hub is structurally zero — the property that makes the kernel safe
    at 100 TB. Checked both semantically (counts) and structurally (the
    oriented edge list has no row with lo = hub)."""
    from guardian_for_apache_kafka_spark.operators.graph import (
        orient_edges,
        triangle_counts,
    )

    hub = 0
    rim = list(range(1, 41))
    edges = [(hub, r) for r in rim] + [(1, 2)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {0: 1, 1: 1, 2: 1}
    oriented = orient_edges(df).collect()
    assert all(r.lo != hub for r in oriented)
    assert len(oriented) == len(edges)


def test_snapshot_diff_classification_and_null_safety(spark):
    """insert/delete/update classification on a toy pair, including the
    digest null-traps: NULL vs the literal string 'NULL' must differ, and
    a value moving between columns ('a',NULL)->(NULL,'a') must register as
    an update (the concat_ws-drops-nulls bug shape)."""
    from guardian_for_apache_kafka_spark.operators.merge import snapshot_diff

    schema = "k long, a string, b string"
    old = spark.createDataFrame(
        [
            (1, "x", "y"),        # unchanged
            (2, "x", None),       # -> NULL literal trap
            (3, "a", None),       # -> column-move trap
            (4, "gone", "gone"),  # deleted
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            (1, "x", "y"),
            (2, "x", "\x00NULL"),  # the sentinel itself as a real value
            (3, None, "a"),
            (5, "new", None),      # inserted
        ],
        schema,
    )
    got = {r.k: r.change_type for r in snapshot_diff(old, new, "k").collect()}
    assert got == {2: "update", 3: "update", 4: "delete", 5: "insert"}


def test_snapshot_diff_compare_cols_validation(spark):
    import pytest

    from guardian_for_apache_kafka_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, "x")], "k long, a string")
    new = spark.createDataFrame([(1, "x")], "k long, a string")
    with pytest.raises(ValueError, match="missing"):
        snapshot_diff(old, new, "k", compare_cols=["a", "zzz"])


def test_skyline_semantics_ties_and_duplicates(spark):
    """2-D skyline with the tie corners: duplicate points (neither
    dominates — both survive), a point equal on one dim and better on the
    other (dominates), and conservativeness across many tiny partitions
    (phase-1 prune must never drop a true skyline row)."""
    from guardian_for_apache_kafka_spark.operators.skyline import skyline

    rows = [
        (1, 1.0, 10),  # skyline (cheapest)
        (2, 1.0, 10),  # duplicate of 1 -> both survive
        (3, 2.0, 10),  # dominated by 1 (same size, pricier)
        (4, 2.0, 20),  # skyline (bigger)
        (5, 3.0, 20),  # dominated by 4
        (6, 3.0, 30),  # skyline
        (7, 0.5, 5),   # skyline (cheapest of all)
    ]
    df = spark.createDataFrame(rows, "k long, price double, size int").repartition(6)
    got = sorted(
        r.k for r in skyline(df, minimize=["price"], maximize=["size"]).collect()
    )
    assert got == [1, 2, 4, 6, 7]


def test_skyline_three_criteria_matches_bruteforce(spark):
    """3-D frontier vs an exact driver-side brute force over a deterministic
    100-point cloud (md5-derived coordinates)."""
    import hashlib

    from guardian_for_apache_kafka_spark.operators.skyline import skyline

    def h(i, tag):
        return int(hashlib.md5(f"{i}:{tag}".encode()).hexdigest()[:6], 16) % 50

    pts = [(i, float(h(i, "a")), h(i, "b"), h(i, "c")) for i in range(100)]

    def dominated(p, q):  # q dominates p? minimize a, maximize b and c
        return (
            q[1] <= p[1] and q[2] >= p[2] and q[3] >= p[3]
            and (q[1] < p[1] or q[2] > p[2] or q[3] > p[3])
        )

    expect = sorted(p[0] for p in pts if not any(dominated(p, q) for q in pts))
    df = spark.createDataFrame(pts, "k long, a double, b int, c int").repartition(8)
    got = sorted(r.k for r in skyline(df, minimize=["a"], maximize=["b", "c"]).collect())
    assert got == expect


def test_interval_overlap_join_exactness_and_dedup(spark):
    """Grid-bucketed overlap join vs a driver-side brute force over
    intervals engineered to span MULTIPLE grid cells (the anchor-cell
    dedup must emit each overlapping pair exactly once), plus closed-end
    touching intervals and disjoint ones."""
    import datetime as dt

    from guardian_for_apache_kafka_spark.operators.timeseries import (
        interval_overlap_join,
    )

    t0 = dt.datetime(2024, 1, 1)

    def t(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # grid = 600s = 10 min; intervals span up to 4 cells
    a_rows = [(1, t(0), t(35)), (2, t(50), t(55)), (3, t(90), t(95))]
    b_rows = [
        (10, t(30), t(60)),   # overlaps a1 (5 min) and a2 (5 min)
        (11, t(35), t(40)),   # touches a1 at exactly t35 (closed ends -> 0 s)
        (12, t(70), t(80)),   # disjoint from all
        (13, t(0), t(100)),   # spans everything -> overlaps all three
    ]
    a = spark.createDataFrame(a_rows, "a_id long, a_s timestamp, a_e timestamp")
    b = spark.createDataFrame(b_rows, "b_id long, b_s timestamp, b_e timestamp")
    got = {
        (r.a_id, r.b_id): r.overlap_seconds
        for r in interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e").collect()
    }
    expect = {}
    for ai, as_, ae in a_rows:
        for bi, bs, be in b_rows:
            if as_ <= be and bs <= ae:
                expect[(ai, bi)] = int(
                    (min(ae, be) - max(as_, bs)).total_seconds()
                )
    assert got == expect
    assert got[(1, 11)] == 0  # the touching pair, kept with zero overlap


def test_interval_overlap_join_rejects_column_collision(spark):
    import pytest
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.operators.timeseries import (
        interval_overlap_join,
    )

    a = spark.createDataFrame([(1,)], "x long").withColumn("s", F.current_timestamp()).withColumn("e", F.current_timestamp())
    with pytest.raises(ValueError, match="collision"):
        interval_overlap_join(a, a, "s", "e", "s", "e")


def test_zorder_value_known_bits_and_locality(spark):
    """Morton key spot-checks ((1,0)->1, (0,1)->2, (3,3)->15, max->2^32-1)
    and the locality claim the layout rests on: over a deterministic point
    cloud, every top-4-bit z-bucket's bounding box is at most a quarter of
    the range in BOTH dimensions — while lexicographic x-buckets leave the
    y-span unbounded."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.operators.layout import zorder_value

    pts = [(0, 0), (1, 0), (0, 1), (3, 3), (65535, 65535)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {tuple(r[:2]): r.z for r in df.select("x", "y", zorder_value(F.col("x"), F.col("y")).alias("z")).collect()}
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 3)] == 15
    assert got[(65535, 65535)] == 2**32 - 1

    import hashlib

    def h(i, tag):
        return int(hashlib.md5(f"{i}:{tag}".encode()).hexdigest()[:8], 16) % 65536

    cloud = [(h(i, "x"), h(i, "y")) for i in range(2000)]
    cdf = spark.createDataFrame(cloud, "x long, y long")
    spans = (
        cdf.select("x", "y", F.shiftright(zorder_value(F.col("x"), F.col("y")), 28).alias("b"))
        .groupBy("b")
        .agg((F.max("x") - F.min("x")).alias("xs"), (F.max("y") - F.min("y")).alias("ys"))
        .collect()
    )
    assert len(spans) == 16
    for r in spans:
        assert r.xs <= 16384 and r.ys <= 16384, (r.b, r.xs, r.ys)


def test_frequent_pairs_pruning_cap_and_duplicates(spark):
    """A-priori semantics on a hand basket set: duplicate (basket, item)
    rows count once; items below min_item_support never reach a pair even
    when the pair itself would pass; a mega-basket over the cap contributes
    NO pairs (declared drop, not truncation)."""
    from guardian_for_apache_kafka_spark.operators.itemsets import frequent_pairs

    rows = [
        # pair (1,2) in baskets 10, 11, 12 -> support 3
        (10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 2), (12, 2),
        # item 99 appears once only -> pruned, so (1,99) never counted
        (10, 99),
        # two mega-baskets sharing items 3..51 (so those items are frequent
        # and survive pruning): both exceed the 10-item cap AFTER pruning
        # and are dropped — incl. basket 13's copy of the (1, 2) pair
        *[(13, i) for i in range(1, 52)],
        *[(14, i) for i in range(3, 52)],
    ]
    df = spark.createDataFrame(rows, "bk long, it long")
    got = {
        (r.item_a, r.item_b): r.support
        for r in frequent_pairs(
            df, "bk", "it", min_item_support=2, min_pair_support=2, max_basket=10
        ).collect()
    }
    assert got == {(1, 2): 3}


def test_label_propagation_two_cliques_and_bridge(spark):
    """Two 4-cliques joined by one bridge edge: after 3 synchronous rounds
    every member of each clique carries its clique's minimum id (the
    deterministic tie-break pulls labels downward), and the bridge does
    not merge the communities; reversed/duplicate edges are tolerated. An
    isolated PAIR exhibits the textbook synchronous-LPA oscillation (each
    node adopts the other's label every round — after an odd round count
    they are swapped), pinned here so the behavior is a documented
    contract, not a surprise."""
    from guardian_for_apache_kafka_spark.operators.graph import label_propagation

    def clique(ids):
        return [(x, y) for x in ids for y in ids if x < y]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10), (20, 21)]
    edges += [(b, a) for a, b in edges[:3]]  # reversed duplicates
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}
    assert {got[n] for n in (1, 2, 3, 4)} == {1}
    assert {got[n] for n in (11, 12, 13)} == {10}
    assert got[20] == 21 and got[21] == 20  # odd-round bipartite swap


def test_label_propagation_matches_python_replay(spark):
    """3 rounds over a seeded random graph vs a driver-side synchronous
    replay with the same (count desc, label asc) argmax."""
    import hashlib

    from guardian_for_apache_kafka_spark.operators.graph import label_propagation

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16)

    edges = [(h(i) % 30, h(i + 1000) % 30) for i in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}

    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for n, nb in adj.items():
            counts: dict = {}
            for m in nb:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            new[n] = min(counts, key=lambda l: (-counts[l], l))
        labels = new
    assert got == labels


def test_association_rules_hand_computed(spark):
    """Rules on a 4-basket toy set match hand computation, including the
    direction asymmetry of confidence and the shared lift."""
    from guardian_for_apache_kafka_spark.operators.itemsets import association_rules

    # baskets: {1:a,b} {2:a,b} {3:a} {4:b,c}
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "b"), (4, "c")]
    df = spark.createDataFrame(rows, "bk BIGINT, it STRING")
    got = {
        (r.antecedent, r.consequent): (r.support, r.confidence, r.lift)
        for r in association_rules(
            df, "bk", "it", min_item_support=1, min_pair_support=1, max_basket=10
        ).collect()
    }
    # supports: a=3, b=3, c=1, n=4; pair {a,b}=2, {b,c}=1
    assert got[("a", "b")] == (2, 2 / 3, (2 / 3) / (3 / 4))
    assert got[("b", "a")] == (2, 2 / 3, (2 / 3) / (3 / 4))
    assert got[("b", "c")] == (1, 1 / 3, (1 / 3) / (1 / 4))
    assert got[("c", "b")] == (1, 1 / 1, 1.0 / (3 / 4))
    assert set(got) == {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")}


def test_merge_schema_evolution_semantics(spark):
    """evolve_schema adds novel update columns typed from the updates side;
    untouched base rows get NULL; without the flag a novel column raises."""
    import pytest as _pytest

    from guardian_for_apache_kafka_spark.operators.merge import merge_into

    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k BIGINT, v DOUBLE")
    upd = spark.createDataFrame(
        [(2, 21.0, "x"), (3, 30.0, "y")], "k BIGINT, v DOUBLE, tag STRING"
    )
    with _pytest.raises(ValueError, match="evolve_schema"):
        merge_into(base, upd, "k", ["v", "tag"])
    out = {
        r.k: (r.v, r.tag)
        for r in merge_into(
            base, upd, "k", ["v", "tag"], evolve_schema=True
        ).collect()
    }
    assert out == {1: (10.0, None), 2: (21.0, "x"), 3: (30.0, "y")}
    # evolved column adopts the updates-side type
    df = merge_into(base, upd, "k", ["v", "tag"], evolve_schema=True)
    assert dict(df.dtypes)["tag"] == "string"


def test_bitemporal_asof_late_correction(spark):
    """A late-arriving correction (higher txn, older valid time) wins only
    for valid-as-of points its validity covers; deletes erase the key."""
    from datetime import datetime

    from guardian_for_apache_kafka_spark.operators.merge import bitemporal_asof

    T = lambda d: datetime(2024, 1, d)  # noqa: E731
    rows = [
        # k=1: v=10 effective day 1 (txn 1); correction v=99 effective day 1
        # arrives later (txn 3); v=20 effective day 5 (txn 2)
        (1, 10.0, T(1), 1, False),
        (1, 20.0, T(5), 2, False),
        (1, 99.0, T(1), 3, False),
        # k=2: created then deleted
        (2, 7.0, T(2), 1, False),
        (2, 7.0, T(3), 2, True),
    ]
    log = spark.createDataFrame(
        rows, "k BIGINT, v DOUBLE, valid_ts TIMESTAMP, txn BIGINT, deleted BOOLEAN"
    )

    def state(valid_day, txn):
        return {
            r.k: r.v
            for r in bitemporal_asof(
                log, "k", "valid_ts", "txn", T(valid_day), txn, delete_col="deleted"
            ).collect()
        }

    # as known at txn 2, effective day 3: original v=10 (correction not yet
    # known); k=2's delete (valid day 3, txn 2) is already effective
    assert state(3, 2) == {1: 10.0}
    # one day earlier the k=2 create still stands
    assert state(2, 2) == {1: 10.0, 2: 7.0}
    # as known at txn 3, effective day 3: correction v=99 wins
    assert state(3, 3)[1] == 99.0
    # effective day 6: the day-5 state wins regardless of the day-1 correction
    assert state(6, 3)[1] == 20.0
    # k=2 erased once the delete is known and effective
    assert 2 not in state(3, 3) or state(3, 3).get(2) is None or 2 not in state(3, 3)
    assert 2 not in state(4, 2) or True  # delete at valid day 3, txn 2
    got = state(4, 2)
    assert 2 not in got


def test_guarded_sequence_crafted_timeline(spark, sf_dir):
    """q89 semantics on a crafted timeline: view->purchase inside 1h counts;
    error between them disqualifies; view older than 1h disqualifies;
    error BEFORE the view does not."""
    from datetime import datetime

    from pyspark.sql import functions as F, Window

    from datetime import timedelta

    T = lambda m: datetime(2024, 1, 1) + timedelta(minutes=m)  # noqa: E731
    rows = [
        # u1: clean conversion (view 0, purchase 30)
        (1, 1, T(0), "view", 0.0), (1, 2, T(30), "purchase", 5.0),
        # u2: error between view and purchase -> dirty
        (2, 3, T(0), "view", 0.0), (2, 4, T(10), "error", 0.0),
        (2, 5, T(30), "purchase", 7.0),
        # u3: view too old (purchase at minute 70)
        (3, 6, T(0), "view", 0.0), (3, 7, T(70), "purchase", 9.0),
        # u4: error BEFORE the view -> still clean
        (4, 8, T(0), "error", 0.0), (4, 9, T(5), "view", 0.0),
        (4, 10, T(40), "purchase", 11.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
    ).over(w)
    last_error = F.last(
        F.when(F.col("event_type") == "error", F.col("ts")), ignorenulls=True
    ).over(w)
    t = ev.select("user_id", "ts", "event_type", "value",
                  last_view.alias("lv"), last_error.alias("le"))
    clean = t.where(
        (F.col("event_type") == "purchase")
        & F.col("lv").isNotNull()
        & (F.unix_timestamp("ts") - F.unix_timestamp("lv") <= 3600)
        & (F.col("le").isNull() | (F.col("le") < F.col("lv")))
    )
    assert {r.user_id for r in clean.collect()} == {1, 4}


def test_zorder_value_n_matches_2d_and_interleaves_3d(spark):
    """k=2 must agree bit-for-bit with zorder_value; k=3 must place bit i
    of column j at position 3i+j (checked against a Python reference)."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.operators.layout import (
        zorder_value,
        zorder_value_n,
    )

    df = spark.createDataFrame(
        [(x, y, z) for x, y, z in [(0, 0, 0), (1, 2, 4), (65535, 0, 255),
                                   (12345, 54321, 999), (255, 255, 255)]],
        "x long, y long, z long",
    )
    two = df.select(
        (zorder_value(F.col("x"), F.col("y"))
         == zorder_value_n(["x", "y"])).alias("eq")
    ).collect()
    assert all(r.eq for r in two)

    def ref3(x, y, z, bits=16):
        out = 0
        for j, v in enumerate((x, y, z)):
            for i in range(bits):
                out |= ((v >> i) & 1) << (i * 3 + j)
        return out

    got = df.select("x", "y", "z", zorder_value_n(["x", "y", "z"]).alias("m")).collect()
    for r in got:
        assert r.m == ref3(r.x, r.y, r.z), (r.x, r.y, r.z)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        zorder_value_n(["x", "y", "z", "z"], bits=16)


def test_ancestor_closure_raises_on_cycle(spark):
    """A cyclic edge set must raise, not silently return self-ancestor rows
    that double-count in subtree rollups (review r6)."""
    import pytest

    from guardian_for_apache_kafka_spark.operators.hierarchy import ancestor_closure

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 0)], "node long, parent long"
    )
    with pytest.raises(ValueError, match="cycle"):
        ancestor_closure(edges).collect()
