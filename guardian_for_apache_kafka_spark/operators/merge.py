"""MERGE INTO / CDC-upsert semantics on plain parquet frames.

Spark SQL only ships MERGE for table formats with transaction logs (Delta/
Iceberg); the relational semantics themselves are a single FULL OUTER join
on the key plus row-wise resolution — matched -> update, unmatched-source ->
insert, matched + delete flag -> delete. This module implements exactly
that, so a CDC batch can be applied to a snapshot without any table-format
dependency. (The durability story — atomic swap of the rewritten snapshot —
is the two-rename discipline operators/maintenance.py already uses.)

At 100 TB: the join is key-equi and benefits from the bucketed layout in
operators/bucketing.py (snapshot and CDC batch bucketed on the key join
with zero exchange); CDC batches are typically small enough that Catalyst
broadcasts them, making an apply a map-side pass over the snapshot.

Semantics notes (the corner cases MERGE implementations disagree on):
- a key appearing in ``updates`` but flagged deleted and absent from base
  is a no-op (delete-of-missing does not insert);
- ``updates`` must be key-unique — enforce upstream (e.g. latest-per-key
  compaction, operators/compaction.py) exactly like Delta's
  "multiple source rows matched" error; pass ``validate_unique=True`` to pay
  one aggregation and fail loudly instead of silently fanning out the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_into(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    update_cols: list[str],
    delete_col: str | None = None,
    allow_partial_inserts: bool = False,
    validate_unique: bool = False,
    evolve_schema: bool = False,
) -> DataFrame:
    """Apply a CDC batch to a snapshot: per key — update ``update_cols``
    from ``updates`` when matched, insert unmatched update rows, drop base
    rows whose update is flagged in ``delete_col`` (boolean). Returns the
    new snapshot with base's schema.

    Because unmatched-source rows INSERT, any base column outside
    ``update_cols`` would be silently NULL on inserted rows; that is almost
    always a caller bug, so ``update_cols`` must cover every non-key base
    column unless ``allow_partial_inserts=True`` explicitly opts into
    NULL-padded inserts.

    ``evolve_schema=True`` is Delta's ``mergeSchema`` twin: columns in
    ``update_cols`` that don't exist on base yet are ADDED to the output
    schema (typed from the updates side); pre-existing base rows that the
    batch doesn't touch carry NULL there — exactly the add-column
    backfill contract. Without the flag, a novel column raises."""
    if evolve_schema:
        new_cols = [c for c in update_cols if c not in base.columns]
        for c in new_cols:
            base = base.withColumn(
                c, F.lit(None).cast(dict(updates.dtypes)[c])
            )
    else:
        novel = set(update_cols) - set(base.columns)
        if novel:
            raise ValueError(
                f"update_cols not on base: {sorted(novel)}; pass "
                "evolve_schema=True to add them (Delta mergeSchema semantics)"
            )
    u_cols = set(updates.columns)
    required = {key, *update_cols} | ({delete_col} if delete_col else set())
    missing = required - u_cols
    if missing:
        raise ValueError(f"updates side lacks columns: {sorted(missing)}")
    uncovered = set(base.columns) - {key} - set(update_cols)
    if uncovered and not allow_partial_inserts:
        raise ValueError(
            "update_cols does not cover base columns "
            f"{sorted(uncovered)}; inserted rows would get NULLs there. "
            "Pass allow_partial_inserts=True to accept NULL-padded inserts."
        )
    if validate_unique:
        # one count aggregation over the (small) CDC batch; mirrors Delta's
        # "multiple source rows matched" failure mode
        dup = updates.groupBy(key).count().where(F.col("count") > 1).limit(1).collect()
        if dup:
            raise ValueError(
                f"updates side is not key-unique on {key!r} "
                f"(e.g. {dup[0][key]!r} appears {dup[0]['count']} times); "
                "compact to latest-per-key first (operators/compaction.py)"
            )
    delete_flag = F.col(delete_col) if delete_col else F.lit(False)
    u = updates.select(
        F.col(key),
        *[F.col(c).alias(f"__u_{c}") for c in update_cols],
        delete_flag.alias("__u_delete"),
    )
    joined = base.withColumn("__in_base", F.lit(True)).join(
        u.withColumn("__in_upd", F.lit(True)), key, "full_outer"
    )
    survived = joined.where(
        ~F.coalesce("__u_delete", F.lit(False))  # matched deletes drop out
        # delete-of-missing (upd-only + delete flag) is also excluded here
    )
    matched_or_insert = F.coalesce("__in_upd", F.lit(False))
    out_cols = []
    for c in base.columns:
        if c == key:
            out_cols.append(F.col(key))
        elif c in update_cols:
            # branch on the row marker, NOT coalesce of the value: an update
            # row that explicitly sets NULL must clear the base value
            # (Delta/Iceberg MERGE semantics), which coalesce would mask
            out_cols.append(
                F.when(matched_or_insert, F.col(f"__u_{c}")).otherwise(F.col(c)).alias(c)
            )
        else:
            # insert rows have no base values: non-updated cols are NULL
            out_cols.append(F.col(c))
    return survived.select(*out_cols)


def snapshot_asof(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str,
    version,
    delete_col: str = "deleted",
    validate: bool = False,
) -> DataFrame:
    """Time travel over a CDC log without a table format: reconstruct the
    snapshot as of ``version`` (inclusive) from the base table plus the
    update log — base rows enter at version 0, log rows at their own
    version, latest-per-key wins, flagged deletes drop out.

    ONE window over ONE hash exchange on the key (the g6 latest-per-key
    discipline); the version predicate prunes the log scan before the
    exchange. At 100 TB the log side is normally a small fraction of the
    snapshot, and a version-partitioned log directory makes the predicate a
    partition-pruning filter (q49). Complements ``merge_into`` (which
    materializes the latest snapshot) and streaming's versioned
    ``stream_cdc_apply`` snapshots (which persist coarse per-batch
    versions; this reconstructs ANY point between them).

    Determinism contract: log versions must be >= 1 (version 0 is the base
    row's slot) and UNIQUE per key — two ops for one key at the same
    version have no defined winner, and the window's shuffle order would
    pick one arbitrarily. ``validate=True`` pays one aggregation over the
    (pruned) log to enforce both and fail loudly instead (the merge_into
    validate_unique discipline)."""
    from pyspark.sql.window import Window

    if validate:
        pruned = updates.where(F.col(version_col) <= version)
        bad = (
            pruned.groupBy(key, version_col)
            .count()
            .where((F.col("count") > 1) | (F.col(version_col) <= 0))
            .limit(1)
            .collect()
        )
        if bad:
            r = bad[0]
            raise ValueError(
                f"CDC log violates the version contract at key={r[key]!r} "
                f"version={r[version_col]!r} (count={r['count']}): versions "
                "must be >= 1 and unique per key"
            )

    value_cols = [c for c in base.columns if c != key]
    b = base.select(
        F.col(key),
        *[F.col(c) for c in value_cols],
        F.lit(0).cast("long").alias("__v"),
        F.lit(False).alias("__del"),
    )
    u = updates.where(F.col(version_col) <= version).select(
        F.col(key),
        *[F.col(c) for c in value_cols],
        F.col(version_col).cast("long").alias("__v"),
        F.coalesce(F.col(delete_col), F.lit(False)).alias("__del"),
    )
    w = Window.partitionBy(key).orderBy(F.col("__v").desc())
    return (
        b.unionByName(u)
        .withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & ~F.col("__del"))
        .select(key, *value_cols)
    )


def scd2_from_log(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str,
    delete_col: str = "deleted",
) -> DataFrame:
    """Build the full SCD Type-2 history table from a CDC log — the third
    leg of the CDC family next to ``merge_into`` (latest snapshot) and
    ``snapshot_asof`` (one point in time): every non-deleted state of every
    key becomes a row with its validity interval [valid_from, valid_to) in
    version space; the current state has valid_to NULL; a delete closes the
    previous interval without opening one.

    ONE latest-per-key-ordering window (lead over the version within each
    key — the same single key exchange as g6/q57); base rows enter at
    version 0. Same version contract as snapshot_asof: log versions >= 1,
    unique per key."""
    from pyspark.sql.window import Window

    value_cols = [c for c in base.columns if c != key]
    b = base.select(
        F.col(key),
        *[F.col(c) for c in value_cols],
        F.lit(0).cast("long").alias("__v"),
        F.lit(False).alias("__del"),
    )
    u = updates.select(
        F.col(key),
        *[F.col(c) for c in value_cols],
        F.col(version_col).cast("long").alias("__v"),
        F.coalesce(F.col(delete_col), F.lit(False)).alias("__del"),
    )
    w = Window.partitionBy(key).orderBy("__v")
    return (
        b.unionByName(u)
        .withColumn("__next", F.lead("__v").over(w))
        .where(~F.col("__del"))
        .select(
            key,
            *value_cols,
            F.col("__v").alias("valid_from"),
            F.col("__next").alias("valid_to"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Reconcile two snapshots of a keyed table: returns one row per
    DIFFERING key — (key, change_type) with change_type in
    'insert' (key only in ``new``), 'delete' (key only in ``old``),
    'update' (both, but compared columns differ). Unchanged keys are not
    returned (at scale they are almost the whole table).

    This is the digest discipline: each side is reduced MAP-SIDE to
    (key, md5 digest of the compared columns) before the join, so the
    full-outer exchange carries a fixed 32-hex payload per row no matter
    how wide the rows are — reconciling two 100 TB snapshots shuffles only
    keys+digests, and with both sides bucketed on the key
    (operators/bucketing.py) it runs with zero exchange. Digest rendering is
    injective: every value is length-prefixed ('<len>:<value>') and NULL is
    the bare token 'n', so no value — including separator characters or any
    would-be NULL sentinel string — can collide with another row's encoding.

    Collision honesty: md5 collisions would mask an update (never a
    spurious one); at 2^-64+ probability per pair this is the standard
    reconciliation trade (rsync/Delta checksums make it too).
    """
    cmp_cols = compare_cols or sorted(
        (set(old.columns) & set(new.columns)) - {key}
    )
    missing = [c for c in cmp_cols if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare columns missing from a side: {missing}")

    def digest(df: DataFrame, out: str) -> DataFrame:
        parts = []
        for c in cmp_cols:
            s = F.col(c).cast("string")
            parts.append(
                F.when(s.isNull(), F.lit("n")).otherwise(
                    F.concat(F.length(s).cast("string"), F.lit(":"), s)
                )
            )
        return df.select(F.col(key), F.md5(F.concat_ws("|", *parts)).alias(out))

    o = digest(old, "__do").withColumn("__in_o", F.lit(True))
    n = digest(new, "__dn").withColumn("__in_n", F.lit(True))
    j = o.join(n, key, "full_outer")
    return (
        j.select(
            F.col(key),
            F.when(F.col("__in_o").isNull(), F.lit("insert"))
            .when(F.col("__in_n").isNull(), F.lit("delete"))
            .when(F.col("__do") != F.col("__dn"), F.lit("update"))
            .alias("change_type"),
        )
        .where(F.col("change_type").isNotNull())
    )


def bitemporal_asof(
    log: DataFrame,
    key: str,
    valid_col: str,
    txn_col: str,
    valid_as_of,
    txn_as_of,
    delete_col: str | None = None,
) -> DataFrame:
    """Bitemporal point lookup: the state of every key as KNOWN at
    transaction time ``txn_as_of``, EFFECTIVE at valid time
    ``valid_as_of`` — the two-axis completion of the CDC family
    (``merge_into`` = latest/latest, ``snapshot_asof`` = one txn point,
    ``scd2_from_log`` = full valid history). Row chosen per key: among log
    entries with txn <= txn_as_of and valid <= valid_as_of, the one with
    the greatest (valid, txn) — i.e. the most recent effective state the
    system knew about then; a delete entry chosen this way erases the key.

    ONE key-partitioned window (max_by via row_number over (valid, txn)
    DESC) on one key exchange; both as-of predicates push into the scan.
    Late-arriving corrections (txn newer, valid older) resolve exactly as
    a bitemporal table should: they only win for valid_as_of points their
    validity covers."""
    from pyspark.sql.window import Window

    filtered = log.where(
        (F.col(txn_col) <= F.lit(txn_as_of))
        & (F.col(valid_col) <= F.lit(valid_as_of))
    )
    w = Window.partitionBy(key).orderBy(
        F.desc(valid_col), F.desc(txn_col)
    )
    picked = filtered.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") == 1
    ).drop("__rn")
    if delete_col is not None:
        picked = picked.where(~F.coalesce(F.col(delete_col), F.lit(False)))
    return picked
