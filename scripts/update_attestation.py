"""Regenerate plans/__init__.py's _LAST_ATTESTED map from CORRECTNESS_r*.json.

Run from the repo root after the driver writes a new CORRECTNESS_r{N}.json:

    python scripts/update_attestation.py

Prints the generated dict body; paste it between the ``begin/end generated``
markers in guardian_for_apache_kafka_spark/plans/__init__.py. A driver row
counts as attested only when rows+schema match, the hash check did not fail,
and there was no error.
"""

from __future__ import annotations

import glob
import json
import re


def main() -> None:
    last: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    for rnd in sorted(set(last.values())):
        for name in [n for n, r in last.items() if r == rnd]:
            print(f'    "{name}": {rnd},')
    latest = max(last.values(), default=0)
    print(
        f"# also set: _VERY_STALE_ROUND = {max(1, latest - 2)}  "
        f"(latest round {latest} - 2; guarantees no attestation ages past ~3 rounds)"
    )
    print(
        "# note: at most _VERY_STALE_SLOTS very-stale veterans get guaranteed head"
        " slots per round; the rest queue just behind the never-attested pool."
    )
    print(
        "# also refresh _NEW_THIS_ROUND with the names REGISTERED this round:"
        " they queue behind the older never-attested backlog until it drains."
    )


if __name__ == "__main__":
    main()
