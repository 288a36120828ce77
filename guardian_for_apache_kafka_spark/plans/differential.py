"""DuckDB-oracle differential harness (SURVEY.md §5, added layer).

Approximates the driver's correctness gate: run a registered query's Spark
builder and its DuckDB oracle over the same parquet tables, canonicalize both
result sets (sort columns by name, render values, sort rows), and diff.

Canonicalization (FIXTURES.md §C): NULL -> ``\\N``; floats -> full
round-trip repr by DEFAULT (r10 ratchet: an audit showed all 302 queries
are bit-identical Spark vs DuckDB at every sf, so the gate now demands it
— the determinism disciplines in FIXTURES.md §D make cross-engine floats
exact, and a future query that only matches at 2dp should have to say so
explicitly via ``precise=False`` / ``--tolerant``); timestamps ->
``YYYY-MM-DD HH:MM:SS`` (UTC); bools -> true/false.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import SparkSession

from guardian_for_apache_kafka_spark.plans.registry import REGISTRY
from guardian_for_apache_kafka_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _render(v, precise: bool = False) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # precise=True (self-diff mode): full round-trip repr — a self-vs-self
        # diff must see ~1e-12 run-order float drift, which is exactly what
        # the 2dp cross-engine tolerance hides (r9 advisor finding: the gate
        # claimed "bit-identical" while canonicalizing at 2dp).
        return repr(v) if precise else f"{v:.2f}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc)
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_render(x, precise) for x in v) + "]"
    return str(v)


def _canon(
    columns: list[str], rows: list[tuple], precise: bool = False
) -> tuple[list[str], list[str]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    rendered = sorted(
        "|".join(_render(r[i], precise) for i in order) for r in rows
    )
    return cols, rendered


def _tz_kinds(columns: list[str], rows: list[tuple]) -> dict[str, str]:
    """Per-column timestamp flavor: 'tz' (aware) or 'naive'.

    The external gate's schema check distinguishes TIMESTAMP from TIMESTAMP
    WITH TIME ZONE; rendering alone would normalize that away (the q40 oracle
    regression), so the in-repo gate must flag the dtype difference too.
    """
    kinds: dict[str, str] = {}
    for r in rows:
        for i, v in enumerate(r):
            if isinstance(v, _dt.datetime) and columns[i] not in kinds:
                kinds[columns[i]] = "tz" if v.tzinfo is not None else "naive"
        if len(kinds) == len(columns):
            break
    return kinds


@dataclass
class DiffResult:
    name: str
    ok: bool
    detail: str = ""


def run_one(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    con=None,
    precise: bool = True,
) -> DiffResult:
    q = REGISTRY[name]
    sdf = q.builder(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)
    if q.oracle is None:
        ok = len(spark_rows) >= 0
        return DiffResult(name, ok, f"rows-only check: {len(spark_rows)} rows")
    own_con = con is None
    if own_con:
        con = duckdb_connection(sf_dir)
    try:
        res = con.execute(q.oracle)
        duck_cols = [d[0] for d in res.description]
        duck_rows = [tuple(r) for r in res.fetchall()]
    finally:
        if own_con:
            con.close()
    sc, sr = _canon(spark_cols, spark_rows, precise=precise)
    dc, dr = _canon(duck_cols, duck_rows, precise=precise)
    if sc != dc:
        return DiffResult(name, False, f"column mismatch: spark={sc} duckdb={dc}")
    stz = _tz_kinds(spark_cols, spark_rows)
    dtz = _tz_kinds(duck_cols, duck_rows)
    if stz != dtz:
        return DiffResult(name, False, f"timestamp dtype mismatch: spark={stz} duckdb={dtz}")
    if len(sr) != len(dr):
        return DiffResult(name, False, f"row count: spark={len(sr)} duckdb={len(dr)}")
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            return DiffResult(name, False, f"row {i}: spark={a!r} duckdb={b!r}")
    return DiffResult(name, True, f"{len(sr)} rows match")


def run_all(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    precise: bool = True,
) -> list[DiffResult]:
    con = duckdb_connection(sf_dir)
    out = []
    try:
        for name in names or list(REGISTRY):
            try:
                out.append(run_one(spark, sf_dir, name, con, precise=precise))
            except Exception as e:  # surface, don't abort the sweep
                out.append(DiffResult(name, False, f"EXCEPTION: {type(e).__name__}: {e}"))
    finally:
        con.close()
    return out


def run_selfdiff(
    spark: SparkSession, sf_dir: str, name: str, repeats: int = 2
) -> DiffResult:
    """Run ONE query's Spark builder ``repeats`` times in-session and diff the
    canonicalized result sets against each other — no oracle involved.

    This catches run-order nondeterminism (cache-eviction recomputes, unstable
    tie-breaks, shuffle-order-sensitive floats) that the oracle diff cannot:
    a query can agree with DuckDB on run 1 and disagree with ITSELF on run 2,
    which is exactly the failure shape of a driver-red row that never
    reproduces in single-execution harnesses. Each repeat rebuilds the
    DataFrame from the registry builder, so per-run barriers
    (persist/localCheckpoint) are re-established rather than reused.

    Floats are rendered at FULL round-trip precision here (repr, 17
    significant digits) — unlike the cross-engine oracle diff's 2dp
    canonicalization, a self-vs-self diff must see ~1e-12 run-order
    drift, one of the three failure classes this mode exists to catch
    (r9 advisor fix)."""
    baseline: list[str] | None = None
    base_cols: list[str] | None = None
    for i in range(repeats):
        sdf = REGISTRY[name].builder(spark, sf_dir)
        cols, rows = _canon(
            list(sdf.columns), [tuple(r) for r in sdf.collect()], precise=True
        )
        if baseline is None:
            baseline, base_cols = rows, cols
            continue
        if cols != base_cols:
            return DiffResult(name, False, f"selfdiff run {i}: columns {cols} != {base_cols}")
        if rows != baseline:
            bad = next(
                (f"row {j}: {a!r} != {b!r}" for j, (a, b) in enumerate(zip(rows, baseline)) if a != b),
                f"row count {len(rows)} != {len(baseline)}",
            )
            return DiffResult(name, False, f"selfdiff run {i} diverged: {bad}")
    return DiffResult(name, True, f"{repeats} runs bit-identical ({len(baseline or [])} rows)")


def run_selfdiff_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None, repeats: int = 2
) -> list[DiffResult]:
    out = []
    for name in names or list(REGISTRY):
        try:
            out.append(run_selfdiff(spark, sf_dir, name, repeats))
        except Exception as e:  # surface, don't abort the sweep
            out.append(DiffResult(name, False, f"EXCEPTION: {type(e).__name__}: {e}"))
    return out


def _main() -> int:
    """CLI: ``python -m guardian_for_apache_kafka_spark.plans.differential
    [--selfdiff] [--sf-dir DIR] [--repeats N] [name ...]``."""
    import argparse
    import os

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--selfdiff", action="store_true",
                    help="diff each query against itself across repeated runs "
                         "instead of against the DuckDB oracle")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--tolerant", action="store_true",
                    help="render floats at 2dp in the oracle diff (legacy "
                         "tolerance) instead of the default full-precision "
                         "repr; self-diff mode is always full-precision")
    ap.add_argument("names", nargs="*", help="query names (default: whole registry)")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .appName("guardian-differential")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    try:
        if args.selfdiff:
            results = run_selfdiff_all(spark, args.sf_dir, args.names or None, args.repeats)
        else:
            results = run_all(
                spark, args.sf_dir, args.names or None, precise=not args.tolerant
            )
    finally:
        spark.stop()
    bad = [r for r in results if not r.ok]
    for r in results:
        print(f"{'ok ' if r.ok else 'RED'} {r.name}: {r.detail}")
    print(f"{len(results) - len(bad)}/{len(results)} green")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(_main())
