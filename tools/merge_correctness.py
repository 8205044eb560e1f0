#!/usr/bin/env python3
"""Merge per-query hash_check/components_check JSON records into one
correctness artifact, with optional documented per-query notes (e.g.
measured-infeasible oracles). Usage:
  python3 tools/merge_correctness.py OUT.json IN1.json IN2.json ... \
      [--note name=TEXT ...]
Later inputs override earlier ones on key collision. --note entries add
an explicit {"err": "unchecked", "note": TEXT} record for queries whose
oracle could not run — absence must never read as pass (ADVICE r8).
"""
import json
import sys


def main():
    out, rest = sys.argv[1], sys.argv[2:]
    merged = {}
    notes = []
    i = 0
    while i < len(rest):
        if rest[i] == "--note":
            notes.append(rest[i + 1]); i += 2
        else:
            with open(rest[i]) as f:
                merged.update(json.load(f))
            i += 1
    for n in notes:
        name, text = n.split("=", 1)
        merged[name] = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "err": "unchecked", "note": text}
    with open(out, "w") as f:
        json.dump(dict(sorted(merged.items())), f, indent=1)
    print(f"wrote {out} ({len(merged)} entries)")


if __name__ == "__main__":
    main()
