#!/usr/bin/env python
"""Compare two bench JSON artifacts query by query.

Makes the bench-noise adjudication mechanical (round-6 verdict #6): the
driver's per-round BENCH_r{N}.json and the repo's idle-box
BENCH_LOCAL_r{N}.json can be diffed in one line instead of SCALING.md
archaeology.

Usage:
    python scripts/bench_compare.py OLD.json NEW.json [--key queries]

Accepts either a raw bench line (the JSON ``bench.py`` prints) or the
driver's wrapper ({"tail": "...json line...", ...}). Prints per-query
NEW/OLD ratios (sorted worst first), the geometric-mean ratio over the
common set, and the CDC/streaming headline deltas when both sides have
them.
"""

from __future__ import annotations

import argparse
import json
import math
import sys


def load_bench(path: str) -> dict:
    """Parse a bench artifact: a bare bench JSON line, a driver wrapper
    with the line embedded in ``tail``, or a file whose last non-empty
    line is the JSON."""
    with open(path) as f:
        text = f.read()
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        obj = None
    if isinstance(obj, dict) and "queries" in obj:
        return obj
    if isinstance(obj, dict) and "tail" in obj:
        # driver wrapper: the bench line lives in tail, but tail keeps
        # only the LAST N bytes of stdout — the line is usually
        # truncated mid-"queries". Try a clean parse first, then
        # reconstruct per-query timings from the surviving fragment.
        tail = obj["tail"]
        start = tail.rfind('{"metric"')
        if start != -1:
            try:
                return json.loads(tail[start:].strip())
            except json.JSONDecodeError:
                pass
        return _from_fragment(tail)
    # fall back: last non-empty line of the file
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise ValueError(f"no bench JSON found in {path}")


def _from_fragment(tail: str) -> dict:
    """Best-effort parse of a truncated bench line: every
    '"name": seconds' pair before the '"sf":' marker is a query timing
    (queries whose pairs were cut off are simply absent — the compare
    runs on the common set); the scalar metrics after it parse
    normally."""
    import re

    cut = tail.rfind('"sf":')
    head = tail[:cut] if cut != -1 else tail
    queries = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"(\w+)":\s*([0-9.]+)', head)
        if m.group(1) not in ("sf", "value", "n", "rc", "cpus")
    }
    out: dict = {"queries": queries}
    for scalar in ("sf", "cdc_rows_per_sec"):
        m = re.search(rf'"{scalar}":\s*([0-9.]+)', tail[cut:] if cut != -1 else tail)
        if m:
            out[scalar] = float(m.group(1))
    m = re.search(r'"streaming":\s*(\{[^}]*\})', tail)
    if m:
        try:
            out["streaming"] = json.loads(m.group(1).replace("'", '"'))
        except json.JSONDecodeError:
            pass
    return out


def compare(old: dict, new: dict, key: str = "queries") -> dict:
    qo, qn = old.get(key, {}), new.get(key, {})
    common = sorted(
        k for k in qo.keys() & qn.keys() if qo[k] > 0 and qn[k] > 0
    )
    ratios = {k: qn[k] / qo[k] for k in common}
    geo = (
        math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
        if ratios
        else float("nan")
    )
    return {
        "common": common,
        "ratios": ratios,
        "geomean": geo,
        "only_old": sorted(qo.keys() - qn.keys()),
        "only_new": sorted(qn.keys() - qo.keys()),
        "sum_old": round(sum(qo[k] for k in common), 3),
        "sum_new": round(sum(qn[k] for k in common), 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--key",
        default="queries",
        choices=["queries", "queries_median"],
        help="which timing map to compare (min-of-N vs median). NB: "
        "r9+ bench artifacts no longer carry queries_median in the "
        "one-line JSON (it moved to a stderr comment so driver-side "
        "tail truncation cannot eat the per-query map again) — "
        "median comparisons only work between pre-r9 artifacts or "
        "JSONs assembled by hand from the stderr line.",
    )
    ap.add_argument(
        "--threshold",
        type=float,
        default=1.2,
        help="only print per-query rows whose ratio exceeds this (or its inverse)",
    )
    args = ap.parse_args()

    old, new = load_bench(args.old), load_bench(args.new)
    for side, artifact in (("old", old), ("new", new)):
        if args.key not in artifact:
            print(
                f"{side} artifact has no '{args.key}' map "
                "(r9+ artifacts carry medians on stderr only — see --help)",
                file=sys.stderr,
            )
            sys.exit(2)
    c = compare(old, new, args.key)
    if not c["common"]:
        print("no common queries", file=sys.stderr)
        sys.exit(2)

    print(f"common queries: {len(c['common'])}")
    print(f"sum {args.key}: {c['sum_old']}s -> {c['sum_new']}s")
    print(f"geomean ratio (new/old): {c['geomean']:.3f}")
    flagged = [
        (k, r)
        for k, r in sorted(c["ratios"].items(), key=lambda kv: -kv[1])
        if r > args.threshold or r < 1 / args.threshold
    ]
    for k, r in flagged:
        print(f"  {r:6.2f}x  {k}  ({old[args.key][k]}s -> {new[args.key][k]}s)")
    if not flagged:
        print(f"  (no query moved beyond {args.threshold}x)")
    if c["only_new"]:
        print(f"new-only: {', '.join(c['only_new'])}")
    if c["only_old"]:
        print(f"dropped: {', '.join(c['only_old'])}")
    for metric in ("cdc_rows_per_sec",):
        if metric in old and metric in new:
            print(f"{metric}: {old[metric]} -> {new[metric]}")
    so, sn = old.get("streaming"), new.get("streaming")
    if so and sn:
        keys = sorted(set(so) & set(sn))
        print("streaming:", {k: (so[k], sn[k]) for k in keys})


if __name__ == "__main__":
    main()
