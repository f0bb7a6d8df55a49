#!/usr/bin/env python3
"""Backfill the `parsed` field of a BENCH_r{N}.json driver capture.

The driver stores a bounded tail of the bench process output in the
`tail` field and tries to parse one JSON metrics line out of it; at
296 queries the FULL per-query line (~4 KB) overflows the window and
its head is truncated, so naive parsing yields `parsed: null`
(BENCH_r03/r04/r07/r11). Since round 11, Bench prints a COMPACT
summary line (< 1 KB: total_steady, top-10 queries, loadavg) LAST,
guaranteed to survive the tail capture. This tool extracts it:

  - strips sbt's `[info] ` / `[error] ` line prefixes,
  - scans lines in REVERSE for the last complete `{...}` JSON object
    that carries a "metric" key,
  - writes it into the file's `parsed` field (idempotent; refuses to
    overwrite a non-null `parsed` unless --force).

Usage:  python3 tools/parse_bench.py BENCH_r11.json [--force] [--dry-run]
"""
import json
import re
import sys

PREFIX = re.compile(r"^\[(?:info|error|warn|success)\]\s?")


def extract_last_metric_line(tail: str):
    """Last complete JSON object line (with a \"metric\" key) in `tail`."""
    for raw in reversed(tail.splitlines()):
        line = PREFIX.sub("", raw.strip())
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "metric" in obj:
            return obj
    return None


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    force = "--force" in argv
    dry = "--dry-run" in argv
    if len(args) != 1:
        sys.exit(__doc__)
    path = args[0]
    with open(path) as f:
        doc = json.load(f)
    parsed = extract_last_metric_line(doc.get("tail", "") or "")
    if parsed is None:
        print(f"{path}: no complete metric line in tail — left unchanged")
        return 1
    if doc.get("parsed") is not None and not force:
        print(f"{path}: parsed already present — use --force to overwrite")
        return 1
    if dry:
        print(json.dumps(parsed, indent=1))
        return 0
    doc["parsed"] = parsed
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"{path}: parsed backfilled (metric={parsed['metric']}, "
          f"value={parsed.get('value')})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
