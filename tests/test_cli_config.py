"""CLI config-file/env fallback layer (VERDICT r4 gap 2): flags > env >
config file > built-in defaults, mirroring the reference's precedence
(cli-backup/.../Main.scala:75-79 flag-set-or-PureConfig;
core-backup/src/main/resources/reference.conf:37-47 ${?ENV} overrides).
No Spark needed: resolution happens before any session starts."""

import json

import pytest

from guardian_for_apache_kafka_spark.cli import (
    _resolved_config,
    apply_config_fallbacks,
    build_parser,
)


def _resolve(argv, env=None):
    return _resolved_config(apply_config_fallbacks(build_parser().parse_args(argv), env=env or {}))


def test_env_fallback_matches_flag_equivalent_backup():
    by_flags = _resolve([
        "backup", "--source", "in", "--dest", "out",
        "--period-from-first", "PT15M",
        "--kafka-topics", "a", "--kafka-topics", "b",
        "--kafka-group-id", "g1",
    ])
    by_env = _resolve(
        ["backup", "--source", "in", "--dest", "out"],
        env={
            "BACKUP_TIME_CONFIGURATION_TYPE": "period-from-first",
            "BACKUP_TIME_CONFIGURATION_DURATION": "15 minutes",  # HOCON form
            "KAFKA_CLUSTER_TOPICS": "a,b",
            "BACKUP_KAFKA_GROUP_ID": "g1",
        },
    )
    # the same PeriodFromFirst regardless of how the duration was spelled
    assert by_env["time_configuration"] == by_flags["time_configuration"]
    assert by_env["kafka_topics"] == by_flags["kafka_topics"]
    assert by_env["kafka_group_id"] == by_flags["kafka_group_id"]


def test_env_fallback_matches_flag_equivalent_restore():
    by_flags = _resolve([
        "restore", "--source", "arch", "--target", "out",
        "--from-when", "2024-01-15T00:00:00Z",
        "--override-topics", "click:tap", "--override-topics", "view:seen",
    ])
    by_env = _resolve(
        ["restore", "--source", "arch", "--target", "out"],
        env={
            "RESTORE_FROM_WHEN": "2024-01-15T00:00:00Z",
            "RESTORE_OVERRIDE_TOPICS": "click:tap,view:seen",
        },
    )
    assert by_env["from_when"] == by_flags["from_when"]
    assert by_env["override_topics"] == by_flags["override_topics"] == {
        "click": "tap", "view": "seen"
    }


@pytest.mark.parametrize("fmt", ["json", "toml"])
def test_config_file_matches_flag_equivalent(tmp_path, fmt):
    if fmt == "json":
        path = tmp_path / "guardian.json"
        path.write_text(json.dumps({
            "kafka-cluster": {"topics": ["a", "b"]},
            "backup": {
                "time-configuration": {"type": "chrono-unit-slice", "chrono-unit": "days"},
                "compression": "gzip",
                "compression-level": 9,
            },
        }))
    else:
        path = tmp_path / "guardian.toml"
        path.write_text(
            '[kafka-cluster]\ntopics = ["a", "b"]\n'
            '[backup]\ncompression = "gzip"\ncompression-level = 9\n'
            '[backup.time-configuration]\ntype = "chrono-unit-slice"\nchrono-unit = "days"\n'
        )
    by_flags = _resolve([
        "backup", "--source", "in", "--dest", "out", "--chrono-unit-slice", "days",
        "--kafka-topics", "a", "--kafka-topics", "b",
        "--compression", "gzip", "--compression-level", "9",
    ])
    by_file = _resolve(
        ["backup", "--source", "in", "--dest", "out", "--config", str(path)])
    for k in ("time_configuration", "kafka_topics", "compression", "compression_level"):
        assert by_file[k] == by_flags[k], k


def test_guardian_config_env_var_points_at_file(tmp_path):
    path = tmp_path / "g.json"
    path.write_text(json.dumps({"restore": {"from-when": "2024-02-01T00:00:00Z"}}))
    cfg = _resolve(["restore", "--source", "arch", "--target", "out"],
                   env={"GUARDIAN_CONFIG": str(path)})
    assert "2024-02-01" in str(cfg["from_when"])


def test_precedence_flags_beat_env_beat_file(tmp_path):
    path = tmp_path / "g.json"
    path.write_text(json.dumps({
        "backup": {"kafka-group-id": "from-file"},
        "kafka-cluster": {"topics": ["file-topic"]},
    }))
    env = {
        "BACKUP_KAFKA_GROUP_ID": "from-env",
        "GUARDIAN_CONFIG": str(path),
    }
    flag_wins = _resolve(
        ["backup", "--source", "in", "--dest", "out", "--kafka-group-id", "from-flag"], env=env)
    assert flag_wins["kafka_group_id"] == "from-flag"
    env_wins = _resolve(["backup", "--source", "in", "--dest", "out"], env=env)
    assert env_wins["kafka_group_id"] == "from-env"
    # keys with no env var fall through to the file
    assert env_wins["kafka_topics"] == ["file-topic"]
    file_wins = _resolve(["backup", "--source", "in", "--dest", "out"],
                         env={"GUARDIAN_CONFIG": str(path)})
    assert file_wins["kafka_group_id"] == "from-file"


def test_built_in_defaults_without_env_or_file():
    cfg = _resolve(["backup", "--source", "in", "--dest", "out"])
    assert cfg["format"] == "guardian"
    assert cfg["commit_timeout_buffer_window"] == "PT10S"
    assert "ChronoUnitSlice" in cfg["time_configuration"]  # hours default
    audit = _resolve(["audit", "--records", "r", "--archive", "a"])
    assert audit["format"] == "json"


def test_cli_profile_verb(capsys):
    import json as _json

    from guardian_for_apache_kafka_spark.cli import main

    rc = main([
        "profile", "--input", "/root/testdata/sf0.001/lineitem.parquet",
        "--columns", "l_quantity,l_discount",
    ])
    assert rc == 0
    rows = [_json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert [r["col_name"] for r in rows] == ["l_discount", "l_quantity"]
    assert all(r["n"] > 0 and r["n_null"] == 0 for r in rows)


def test_cluster_defaults_consistency():
    """The cluster conf helper scales with its inputs and never fights the
    engine's own session policies (UTC, AQE, skew join)."""
    from guardian_for_apache_kafka_spark.session import cluster_defaults

    d = cluster_defaults(total_cores=800, executor_cores=8, executor_mem_gb=40)
    assert d["spark.sql.shuffle.partitions"] == "1600"
    assert d["spark.dynamicAllocation.maxExecutors"] == "100"
    assert d["spark.executor.memoryOverhead"] == "4g"
    assert d["spark.sql.session.timeZone"] == "UTC"
    assert d["spark.sql.adaptive.enabled"] == "true"


def test_profile_mixed_column_types(spark, sf_dir):
    """Profiling must handle INT/BIGINT/DOUBLE columns in one stack() —
    caught by the CLI smoke: min/max/avg normalize to DOUBLE."""
    from guardian_for_apache_kafka_spark.operators.profiling import profile_table
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = {r.col_name: r for r in profile_table(
        li, ["l_linenumber", "l_orderkey", "l_quantity"]).collect()}
    assert set(rows) == {"l_linenumber", "l_orderkey", "l_quantity"}
    assert all(isinstance(r.min_v, float) for r in rows.values())


def test_explicit_zero_flag_survives_fallbacks():
    """--minhash-threshold 0.0 is an explicit value, not 'unset': the
    fallback chain must NOT replace it with the 0.7 post-default
    (0.0 == False in Python; the unset test needs identity, not ==)."""
    from guardian_for_apache_kafka_spark.cli import apply_config_fallbacks, build_parser

    args = build_parser().parse_args(
        ["prepare", "--documents", "d", "--output", "o", "--minhash-threshold", "0.0"]
    )
    out = apply_config_fallbacks(args, env={})
    assert out.minhash_threshold == 0.0


def test_config_file_typed_coercion(tmp_path):
    """Config-file values for args outside the env-fallback map must be
    coerced like their flag twins: maintain's 'before' arrives as a
    datetime, not a raw string."""
    import datetime as dt
    import json as _json

    from guardian_for_apache_kafka_spark.cli import apply_config_fallbacks, build_parser

    cfg = tmp_path / "g.json"
    cfg.write_text(_json.dumps({"maintain": {"before": "2024-01-02T00:00:00Z"}}))
    args = build_parser().parse_args(["maintain", "--dest", "x", "--config", str(cfg)])
    out = apply_config_fallbacks(args, env={})
    assert isinstance(out.before, dt.datetime) and out.before.year == 2024


def test_cli_e2e_file_uri_config_env_roundtrip(spark, sf_dir, tmp_path, capsys, monkeypatch):
    """VERDICT r5 #7 — the first thing a real operator hits: drive
    backup -> describe -> compact -> restore through cli.main against a
    ``file://`` URI (the pyarrow-FS guardian-format writer path), with the
    destination/format coming from a config file discovered via
    $GUARDIAN_CONFIG and the topic filter from a reference env var.
    The restore must round-trip the filtered source byte-exactly."""
    import json as _json

    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.cli import main
    from guardian_for_apache_kafka_spark.core import normalize_events_to_records
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 300)
    records = normalize_events_to_records(ev).withColumn(
        "timestamp", F.timestamp_millis(F.unix_millis("timestamp"))
    )
    src = str(tmp_path / "records")
    records.write.parquet(src)
    dest_uri = f"file://{tmp_path}/archive"  # object-store-style URI

    cfg = tmp_path / "guardian.json"
    cfg.write_text(_json.dumps({
        "backup": {
            "source": src,
            "dest": dest_uri,
            "format": "guardian",
            "time-configuration": {"type": "chrono-unit-slice", "chrono-unit": "hours"},
        },
        "describe": {"dest": dest_uri},
        "compact": {"source": dest_uri, "target": str(tmp_path / "compacted")},
        "restore": {"source": dest_uri, "target": str(tmp_path / "restored")},
    }))
    monkeypatch.setenv("GUARDIAN_CONFIG", str(cfg))
    # reference env var layer: restrict the backup to two topics — proves
    # env and file compose in one real run (precedence unit tests above)
    monkeypatch.setenv("KAFKA_CLUSTER_TOPICS", "click,view")

    want = records.where(F.col("topic").isin("click", "view"))
    n_want = want.count()
    assert 0 < n_want < records.count()  # the env filter actually bites

    assert main(["backup"]) == 0
    capsys.readouterr()
    assert main(["describe"]) == 0
    lines = [_json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert sum(r["n_records"] for r in lines) == n_want
    assert all(r["n_files"] == 1 for r in lines)

    monkeypatch.delenv("KAFKA_CLUSTER_TOPICS")  # restore/compact: all archived topics
    assert main(["compact"]) == 0
    compacted = spark.read.parquet(str(tmp_path / "compacted"))
    latest = {
        (r.topic, bytes(r.key)) for r in
        want.orderBy("timestamp").groupBy("topic", "key").agg(F.max("offset")).collect()
    }
    assert compacted.count() == len(latest)

    assert main(["restore"]) == 0
    restored = spark.read.parquet(str(tmp_path / "restored"))
    got = {
        (r.topic, bytes(r.key), bytes(r.value), r.timestamp)
        for r in restored.collect()
    }
    src_set = {
        (r.topic, bytes(r.key), bytes(r.value), r.timestamp)
        for r in want.collect()
    }
    assert got == src_set  # byte-identical round-trip through the file:// URI


def test_cli_compact_as_of_point_in_time(spark, sf_dir, tmp_path, monkeypatch):
    """compact --as-of yields the latest-per-key snapshot AS OF the given
    time: later updates to the same key are invisible, keys whose first
    record is after the cutoff are absent."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.cli import main
    from guardian_for_apache_kafka_spark.core import normalize_events_to_records
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    monkeypatch.delenv("GUARDIAN_CONFIG", raising=False)
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 300)
    records = normalize_events_to_records(ev).withColumn(
        "timestamp", F.timestamp_millis(F.unix_millis("timestamp"))
    )
    src = str(tmp_path / "records")
    records.write.parquet(src)
    dest = str(tmp_path / "arch")
    assert main(["backup", "--source", src, "--dest", dest,
                 "--chrono-unit-slice", "hours"]) == 0

    cutoff = records.selectExpr("percentile(unix_micros(timestamp), 0.5D) p").collect()[0].p
    import datetime as dtm
    asof = dtm.datetime.fromtimestamp(int(cutoff) / 1e6, dtm.timezone.utc)
    target = str(tmp_path / "compacted")
    assert main(["compact", "--source", dest, "--target", target,
                 "--as-of", asof.strftime("%Y-%m-%dT%H:%M:%SZ")]) == 0

    got = spark.read.parquet(target)
    bounded = records.where(
        F.col("timestamp") <= F.lit(asof.replace(tzinfo=None))
    )
    # latest = greater (timestamp, offset), matching compact_latest_by_key
    from pyspark.sql.window import Window

    w = Window.partitionBy("topic", "partition", "key").orderBy(
        F.col("timestamp").desc(), F.col("offset").desc()
    )
    want = {
        (r.topic, bytes(r.key)): (r.offset, r.timestamp)
        for r in bounded.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .collect()
    }
    got_keys = {(r.topic, bytes(r.key)): (r.offset, r.timestamp) for r in got.collect()}
    assert got_keys == want
    assert 0 < got.count() < bounded.count()


def test_cli_forget_verb(spark, sf_dir, tmp_path, capsys, monkeypatch):
    """The forget CLI verb erases the given raw keys and reports the
    rewritten slices."""
    import json as _json

    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.cli import main
    from guardian_for_apache_kafka_spark.core import normalize_events_to_records
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    monkeypatch.delenv("GUARDIAN_CONFIG", raising=False)
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 200)
    records = normalize_events_to_records(ev).withColumn(
        "timestamp", F.timestamp_millis(F.unix_millis("timestamp"))
    )
    src = str(tmp_path / "records")
    records.write.parquet(src)
    dest = str(tmp_path / "arch")
    assert main(["backup", "--source", src, "--dest", dest, "--format", "json",
                 "--chrono-unit-slice", "days"]) == 0
    raw_key = bytes(records.select("key").first().key).decode()
    capsys.readouterr()
    assert main(["forget", "--dest", dest, "--key", raw_key]) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out["forgotten_keys"] == 1 and out["rewritten_slices"]
    assert main(["restore", "--source", dest, "--format", "json",
                 "--target", str(tmp_path / "restored")]) == 0
    restored = spark.read.parquet(str(tmp_path / "restored"))
    assert restored.where(F.col("key") == raw_key.encode()).count() == 0


def test_cli_check_verb_reports_corruption(spark, sf_dir, tmp_path, capsys, monkeypatch):
    """check: clean archive -> exit 0 with slice inventory; a corrupted
    object -> exit 4 with the file listed (the reference would abort the
    restore; check makes the damage visible first)."""
    import json as _json

    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.cli import main
    from guardian_for_apache_kafka_spark.core import normalize_events_to_records
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    monkeypatch.delenv("GUARDIAN_CONFIG", raising=False)
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 120)
    records = normalize_events_to_records(ev).withColumn(
        "timestamp", F.timestamp_millis(F.unix_millis("timestamp"))
    )
    src = str(tmp_path / "records")
    records.write.parquet(src)
    dest = str(tmp_path / "arch")
    assert main(["backup", "--source", src, "--dest", dest,
                 "--chrono-unit-slice", "days"]) == 0
    capsys.readouterr()
    assert main(["check", "--dest", dest]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["corrupt_files"] == [] and rep["n_records"] == records.count()

    # corrupt one object in place
    import os

    victim = next(
        os.path.join(dest, f) for f in sorted(os.listdir(dest)) if f.endswith(".json")
    )
    with open(victim, "w", encoding="utf-8") as fh:
        fh.write('{"broken": true, "not": "an array"' * 3)
    assert main(["check", "--dest", dest]) == 4
    rep = _json.loads(capsys.readouterr().out.strip())
    assert len(rep["corrupt_files"]) == 1
    assert rep["corrupt_files"][0]["parsed_records"] == 0


def test_cli_check_json_archive_corruption(spark, sf_dir, tmp_path, capsys, monkeypatch):
    """check --format json detects per-line damage the restore path would
    silently drop: clean archive exits 0; a garbage line flips it to 4."""
    import glob
    import json as _json
    import os

    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.cli import main
    from guardian_for_apache_kafka_spark.core import normalize_events_to_records
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    monkeypatch.delenv("GUARDIAN_CONFIG", raising=False)
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 120)
    records = normalize_events_to_records(ev).withColumn(
        "timestamp", F.timestamp_millis(F.unix_millis("timestamp"))
    )
    src = str(tmp_path / "records")
    records.write.parquet(src)
    dest = str(tmp_path / "arch")
    assert main(["backup", "--source", src, "--dest", dest, "--format", "json",
                 "--chrono-unit-slice", "days"]) == 0
    capsys.readouterr()
    assert main(["check", "--dest", dest, "--format", "json"]) == 0
    assert _json.loads(capsys.readouterr().out.strip())["corrupt_files"] == []

    # a damaged object arrives as a new part file (appending in place would
    # only trip the local FS's CRC sidecar, a different failure)
    slice_dir = os.path.dirname(glob.glob(f"{dest}/slice=*/part-*")[0])
    with open(os.path.join(slice_dir, "part-junk.txt"), "w", encoding="utf-8") as fh:
        fh.write("this is not json\n")
    # the long-lived test session caches file listings; a fresh CLI session
    # (the real deployment) lists anew
    spark.catalog.refreshByPath(dest)
    assert main(["check", "--dest", dest, "--format", "json"]) == 4
    rep = _json.loads(capsys.readouterr().out.strip())
    assert len(rep["corrupt_files"]) == 1
    assert rep["corrupt_files"][0]["corrupt_lines"] == 1


@pytest.mark.parametrize("fmt", ["json", "parquet"])
def test_cli_audit_matrix_detects_slice_loss(spark, sf_dir, tmp_path, capsys, monkeypatch, fmt):
    """audit across archive formats: complete archive -> exit 0 / missing 0;
    after deleting one slice directory -> exit 3 and the missing count
    equals the lost slice's records."""
    import glob
    import json as _json
    import shutil

    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.cli import main
    from guardian_for_apache_kafka_spark.core import normalize_events_to_records
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    monkeypatch.delenv("GUARDIAN_CONFIG", raising=False)
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 200)
    records = normalize_events_to_records(ev).withColumn(
        "timestamp", F.timestamp_millis(F.unix_millis("timestamp"))
    )
    src = str(tmp_path / "records")
    records.write.parquet(src)
    dest = str(tmp_path / "arch")
    assert main(["backup", "--source", src, "--dest", dest, "--format", fmt,
                 "--chrono-unit-slice", "hours"]) == 0
    capsys.readouterr()
    assert main(["audit", "--records", src, "--archive", dest, "--format", fmt]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["missing"] == 0

    victim = sorted(glob.glob(f"{dest}/slice=*"))[0]
    lost = spark.read.format("parquet" if fmt == "parquet" else "text").load(victim).count()
    shutil.rmtree(victim)
    spark.catalog.refreshByPath(dest)
    assert main(["audit", "--records", src, "--archive", dest, "--format", fmt]) == 3
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["missing"] == lost > 0


def test_cli_retention_verb(spark, tmp_path, capsys):
    """The retention verb prints one JSON plan row per slice with an expire
    verdict; slices strictly before the cutoff expire."""
    import json as _json

    from guardian_for_apache_kafka_spark.cli import main as cli_main
    from guardian_for_apache_kafka_spark.core import normalize_events_to_records
    from guardian_for_apache_kafka_spark.core.timeslice import ChronoUnitSlice
    from guardian_for_apache_kafka_spark.operators import backup_batch
    from guardian_for_apache_kafka_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, "/root/testdata/sf0.001", "events").where(
        F.col("event_id") < 200
    )
    rec = normalize_events_to_records(ev)
    dest = str(tmp_path / "arch")
    backup_batch(rec, dest, ChronoUnitSlice("HOURS"))

    rc = cli_main(
        ["retention", "--dest", dest, "--before", "2024-01-01T06:00:00"]
    )
    assert rc == 0
    rows = [
        _json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert rows
    for r in rows:
        assert r["expire"] == (r["slice_ts"] < "2024-01-01T06:00:00")


def test_cli_query_verb(capsys):
    """The query verb lists registry names and runs one, printing JSON rows."""
    import json as _json

    from guardian_for_apache_kafka_spark.cli import main as cli_main

    rc = cli_main(["query", "--list"])
    assert rc == 0
    names = [ln.split("\t")[0] for ln in capsys.readouterr().out.splitlines()]
    assert "q02_hash_aggregate_tpch_q1" in names

    rc = cli_main(
        ["query", "--name", "g2_time_slice_hourly",
         "--sf-dir", "/root/testdata/sf0.001", "--limit", "5"]
    )
    assert rc == 0
    rows = [
        _json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert len(rows) == 5
    assert {"slice", "cnt"} <= set(rows[0])


def test_cli_manifest_verb(spark, sf_dir, tmp_path, capsys, monkeypatch):
    """manifest prints the per-slice fixity rows for a guardian archive and
    the checksums match a direct archive_manifest() call — the operator the
    verb wraps."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.cli import main
    from guardian_for_apache_kafka_spark.core import normalize_events_to_records
    from guardian_for_apache_kafka_spark.operators.maintenance import archive_manifest
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    monkeypatch.delenv("GUARDIAN_CONFIG", raising=False)
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 200)
    records = normalize_events_to_records(ev).withColumn(
        "timestamp", F.timestamp_millis(F.unix_millis("timestamp"))
    )
    src = str(tmp_path / "records")
    records.write.parquet(src)
    dest = str(tmp_path / "arch")
    assert main(["backup", "--source", src, "--dest", dest,
                 "--chrono-unit-slice", "hours"]) == 0
    capsys.readouterr()

    assert main(["manifest", "--dest", dest]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    want = {
        r.slice: (r.n_records, r.checksum)
        for r in archive_manifest(spark, dest).collect()
    }
    assert out["n_slices"] == len(want) > 0
    got = {r["slice"]: (r["n_records"], r["checksum"]) for r in out["slices"]}
    assert got == want


def test_cli_diff_verb(spark, sf_dir, tmp_path, capsys, monkeypatch):
    """diff reports per-slice sync status between two archives and exits 5
    when they drift, 0 when identical."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.cli import main
    from guardian_for_apache_kafka_spark.core import normalize_events_to_records
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    monkeypatch.delenv("GUARDIAN_CONFIG", raising=False)
    ev = load_table(spark, sf_dir, "events")
    recs = normalize_events_to_records(ev.where(F.col("event_id") < 200)).withColumn(
        "timestamp", F.timestamp_millis(F.unix_millis("timestamp"))
    )
    src_a, src_b = str(tmp_path / "ra"), str(tmp_path / "rb")
    recs.write.parquet(src_a)
    # replica lags: missing the latest records
    normalize_events_to_records(ev.where(F.col("event_id") < 150)).withColumn(
        "timestamp", F.timestamp_millis(F.unix_millis("timestamp"))
    ).write.parquet(src_b)
    da, db = str(tmp_path / "archa"), str(tmp_path / "archb")
    assert main(["backup", "--source", src_a, "--dest", da,
                 "--chrono-unit-slice", "hours"]) == 0
    assert main(["backup", "--source", src_b, "--dest", db,
                 "--chrono-unit-slice", "hours"]) == 0
    capsys.readouterr()

    assert main(["diff", "--dest-a", da, "--dest-b", db]) == 5
    out = json.loads(capsys.readouterr().out.strip())
    assert out["n_out_of_sync"] > 0
    assert {r["status"] for r in out["slices"]} <= {
        "in_sync", "divergent", "missing_b", "missing_a"
    }

    # identical archives: exit 0, everything in_sync
    assert main(["diff", "--dest-a", da, "--dest-b", da]) == 0
    out2 = json.loads(capsys.readouterr().out.strip())
    assert out2["n_out_of_sync"] == 0


def test_cli_e2e_scheme_alias_backup_manifest_diff_restore(spark, sf_dir, tmp_path, capsys, monkeypatch):
    """VERDICT r6 #9 — a NON-file scheme alias end-to-end: with
    SPARK_GRAFT_SCHEME_ALIASES=s3a=file (the local-FS shim for an
    object-store-style scheme), drive backup -> manifest -> diff -> restore
    through cli.main using ``s3a://`` URIs everywhere. The CLI boundary
    rewrites the scheme for Hadoop-side consumers; the SESSIONLESS pyarrow
    lister must honor the same alias un-rewritten (resolve_fs), which is
    asserted directly against the raw s3a:// URI."""
    import json as _json

    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.cli import main
    from guardian_for_apache_kafka_spark.core import normalize_events_to_records
    from guardian_for_apache_kafka_spark.operators.restore import list_backup_keys
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    monkeypatch.setenv("SPARK_GRAFT_SCHEME_ALIASES", "s3a=file")
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 200)
    records = normalize_events_to_records(ev).withColumn(
        "timestamp", F.timestamp_millis(F.unix_millis("timestamp"))
    )
    src = str(tmp_path / "records")
    records.write.parquet(src)
    dest_a = f"s3a://{tmp_path}/archive_a"
    dest_b = f"s3a://{tmp_path}/archive_b"

    for dest in (dest_a, dest_b):
        assert main([
            "backup", "--source", src, "--dest", dest, "--format", "guardian",
            "--chrono-unit", "hours",
        ]) == 0
    capsys.readouterr()

    # the sessionless pyarrow lister accepts the RAW aliased URI
    keys = list_backup_keys(dest_a)
    assert keys and all(k.endswith(".json") for k in keys)

    assert main(["manifest", "--dest", dest_a]) == 0
    man = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert man["n_slices"] == len(keys)
    assert sum(s["n_records"] for s in man["slices"]) == records.count()

    assert main(["diff", "--dest-a", dest_a, "--dest-b", dest_b]) == 0
    d = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["n_out_of_sync"] == 0 and d["n_slices"] == len(keys)

    restored_dir = str(tmp_path / "restored")
    assert main([
        "restore", "--source", dest_a, "--target", restored_dir,
        "--format", "guardian",
    ]) == 0
    restored = spark.read.parquet(restored_dir)
    # restore emits PRODUCER records (no partition/offset, like a Kafka
    # produce) — compare the produced payload identity
    got = {
        (r.topic, None if r.key is None else bytes(r.key), bytes(r.value), r.timestamp)
        for r in restored.collect()
    }
    want = {
        (r.topic, None if r.key is None else bytes(r.key), bytes(r.value), r.timestamp)
        for r in records.collect()
    }
    assert got == want


def test_cli_query_explain_prints_physical_plan(capsys):
    """`query --explain` prints the formatted physical plan (the audit
    surface SCALE.md's per-operator reviews read) instead of rows, and
    restores the AQE setting afterwards."""
    from guardian_for_apache_kafka_spark import get_spark
    from guardian_for_apache_kafka_spark.cli import main

    rc = main([
        "query", "--name", "q12_topk",
        "--sf-dir", "/root/testdata/sf0.001", "--explain",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "== Physical Plan ==" in out
    assert "Scan parquet" in out
    assert get_spark().conf.get("spark.sql.adaptive.enabled") == "true"


def test_cli_zonemap_writes_and_reports(spark, sf_dir, tmp_path, capsys):
    """`zonemap --dest` writes _guardian_zonemap.json and prints the map;
    --no-write prints without writing."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.cli import main
    from guardian_for_apache_kafka_spark.core import normalize_events_to_records
    from guardian_for_apache_kafka_spark.core.timeslice import ChronoUnitSlice
    from guardian_for_apache_kafka_spark.operators import write_guardian_format
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 200)
    recs = normalize_events_to_records(ev).withColumn(
        "timestamp", F.timestamp_millis(F.unix_millis("timestamp"))
    )
    dest = str(tmp_path / "arch")
    write_guardian_format(recs, dest, ChronoUnitSlice("HOURS"))

    assert main(["zonemap", "--dest", dest, "--no-write"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["written"] is None and out["n_slices"] > 0
    assert not os.path.exists(os.path.join(dest, "_guardian_zonemap.json"))

    assert main(["zonemap", "--dest", dest]) == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["written"].endswith("_guardian_zonemap.json")
    zm = _json.loads(open(os.path.join(dest, "_guardian_zonemap.json")).read())
    assert zm["n_slices"] == out2["n_slices"]
    assert all(isinstance(v, list) and v for v in zm["slices"].values())
