"""Index integrity audit (run after copy/restore/compaction):

    python scripts/verify_index.py --index /data/index

Exit code 0 iff every partition's segment file matches its sidecar and
the wave/part totals agree with stats.json. No Ray session needed."""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True)
    args = ap.parse_args(argv)
    from vfs_index_ray.build import verify_index
    try:
        rep = verify_index(args.index)
    except FileNotFoundError as e:
        rep = {"ok": False,
               "errors": [f"not a committed index dir: {e.filename}"]}
    print(json.dumps(rep))
    return 0 if rep["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
