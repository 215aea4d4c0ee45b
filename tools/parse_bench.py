#!/usr/bin/env python3
"""Extract the per-query timing table embedded in a driver BENCH_r*.json.

The driver's bench artifact wraps raw sbt output: the one-line JSON that
graft.Bench prints is buried in the "tail" field behind an "[info] " prefix
(and may be truncated if the tail window was too small). This recovers it so
cross-round ratios are recomputable from committed artifacts (ADVICE r7 #4).

Usage:
    tools/parse_bench.py BENCH_r01.json            # print parsed JSON
    tools/parse_bench.py BENCH_r01.json out.json   # write it

Exits 1 (with a partial-table warning on stderr) if the embedded line is
truncated — the partial table is still printed, with "_truncated": true.
"""
import json
import re
import sys


def extract(path):
    doc = json.load(open(path))
    tail = doc.get("tail") or ""
    m = re.search(r'\{"metric":"total".*', tail, re.DOTALL)
    if m:
        line = m.group(0).split("\n")[0]
        try:
            return json.loads(line), False
        except json.JSONDecodeError:
            pass  # fall through to pair scraping (tail cut the line's end)
    else:
        # tail may be cut at the START (r7's was): scrape the whole tail
        line = tail
    if '":' not in line:
        raise SystemExit(f"{path}: no embedded bench JSON line in tail")
    # recover every complete "name":secs pair from the partial line
    queries = dict(
        (k, float(v))
        for k, v in re.findall(r'"(q\d+[a-z0-9_]*)":([0-9.]+)', line))
    if not queries:
        raise SystemExit(f"{path}: no query timings recoverable from tail")
    return {"queries": queries, "_truncated": True}, True


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    parsed, truncated = extract(sys.argv[1])
    out = json.dumps(parsed, indent=1, sort_keys=True)
    if len(sys.argv) > 2:
        open(sys.argv[2], "w").write(out + "\n")
    else:
        print(out)
    if truncated:
        print(f"warning: {sys.argv[1]} tail truncated — "
              f"recovered {len(parsed['queries'])} complete query entries",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
