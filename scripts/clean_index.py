"""Space-reclamation CLI (reference ``clean``, cmd/vfs-index/main.go:145
+ column.go:586-602 deleteMergedFiles/cleanDirs): delete a merged
index's constituent source indexes once the merge is fully committed.

    python scripts/clean_index.py --merged /data/idx_merged
    python scripts/clean_index.py --merged /data/idx_merged \
        --src /data/idx_a /data/idx_b        # override recorded lineage
    python scripts/clean_index.py --merged /data/idx_merged --dry-run

Refuses to remove anything unless verify_index() passes on the merged
index (every partition sidecar + segment file + doc/token sums), so a
crash between merge commit and clean loses nothing: re-run this script
to finish. Pure filesystem tool — no Ray session needed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--merged", required=True,
                    help="the committed merged index dir")
    ap.add_argument("--src", nargs="*", default=None,
                    help="source index dirs (default: the merge lineage "
                         "recorded in the merged index's wave sidecars)")
    ap.add_argument("--dry-run", action="store_true",
                    help="report what would be removed, remove nothing")
    args = ap.parse_args(argv)

    from vfs_index_ray.build import verify_index
    from vfs_index_ray.merge import clean_merged_sources, merged_sources

    srcs = args.src if args.src else merged_sources(args.merged)
    if not srcs:
        print(json.dumps({"error": "no sources recorded or given"}))
        return 1
    if args.dry_run:
        rep = verify_index(args.merged)
        out = {"would_remove": [s for s in srcs if os.path.isdir(s)],
               "already_missing": [s for s in srcs if not os.path.isdir(s)],
               "merged_ok": rep["ok"], "errors": rep["errors"]}
        print(json.dumps(out))
        return 0 if rep["ok"] else 1
    report = clean_merged_sources(args.merged, srcs)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
