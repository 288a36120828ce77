"""Gate: no registered oracle ships a SQL construct with zero driver-green
precedent (scripts/oracle_lint.py — the r10 judge's p13/p15 construct-diff
analysis, automated). No Spark needed: pure registry + DuckDB introspection."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.oracle_lint import ALLOWLIST, constructs, run_lint  # noqa: E402


def test_no_unprecedented_constructs_beyond_allowlist():
    flags = run_lint()
    bad = {
        n: sorted(cs - ALLOWLIST.get(n, set()))
        for n, cs in flags.items()
        if cs - ALLOWLIST.get(n, set())
    }
    assert not bad, (
        "never-driver-green queries use constructs no driver-green oracle "
        f"exercises: {bad} — rewrite with attested constructs (the p13/p15 "
        "r10 lesson) or add an ALLOWLIST entry with a justification"
    )


def test_allowlist_carries_no_dead_entries():
    """Every allowlist entry must still be needed — stale entries would mute
    a future regression of the same construct."""
    flags = run_lint()
    dead = {
        n: sorted(cs - flags.get(n, set()))
        for n, cs in ALLOWLIST.items()
        if cs - flags.get(n, set())
    }
    assert not dead, f"ALLOWLIST entries no longer flagged by the lint: {dead}"


def test_construct_extraction_levels():
    """Pin the three extraction levels on the r10 motivating shapes."""
    vocab = {"anti", "join", "not", "exists", "floor", "sqrt", "sum", "len",
             "cast", "select", "from", "where", "as", "distinct"}
    kw = {"anti", "join", "not", "exists", "select", "from", "where", "as",
          "distinct"}
    fn = {"floor", "sqrt", "sum", "len", "cast"}
    cs = constructs(
        "SELECT a.* FROM a ANTI JOIN b USING (id) "
        "WHERE NOT EXISTS (SELECT 1) AND x = floor(sqrt(t)) "
        "AND y = CAST(sum(len(tk)) AS BIGINT) AND z = 'anti join literal'",
        vocab, kw, fn,
    )
    assert "anti join" in cs and "not exists" in cs
    # overlapping nested chains: cast(sum(len( yields BOTH pairs
    assert {"floor∘sqrt", "cast∘sum", "sum∘len"} <= cs
    # string literals are stripped before tokenization
    assert "literal" not in cs
