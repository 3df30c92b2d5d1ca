"""Snapshot every catalog entry's content hash into CATALOG_HASHES.json.

The staleness rotation (queries.catalog) demotes an entry to
never-verified when its content hash differs from the snapshot taken for
the round of its last green CORRECTNESS row — so modified operators
re-enter the driver's bounded gate prefix immediately (r05 verdict #2).

Run as the LAST step before the end-of-round commit, labeling the round
the driver's gate is about to verify against this code state:

    python tools/update_catalog_hashes.py r06

(If forgotten, running it at the very START of the next round — before any
code edit — records the same hashes; tests/test_plans.py's snapshot test
fails loudly until one of the two happens.)
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from vectorchord_spark.queries import _catalog_canonical, _entry_hash

    if len(sys.argv) != 2 or not re.fullmatch(r"r\d+", sys.argv[1]):
        sys.exit("usage: update_catalog_hashes.py rNN  (e.g. r06)")
    label = "r%02d" % int(sys.argv[1][1:])

    entries = _catalog_canonical()
    snap = {name: _entry_hash(name, q) for name, q in entries.items()}

    path = os.path.join(ROOT, "CATALOG_HASHES.json")
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        data = {}
    data.setdefault("snapshots", {})[label] = snap
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{path}: snapshot {label} = {len(snap)} entry hashes")


if __name__ == "__main__":
    main()
