#!/usr/bin/env python3
"""One-off backfill of BENCH_HISTORY.jsonl from BENCH_r*.json artifacts.

The Bench main appends per-query rows for the round it just ran
(Bench.scala appendHistory), so the trend file started life with only
round 8. This script parses each BENCH_rNN.json's captured stdout tail
for the driver-contract line `{"metric":"total",...}` and rewrites the
round's rows. Idempotent: each round's rows are replaced, never
duplicated, and rounds already present from a newer source (the live
appendHistory) are left alone unless --force.
"""
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LINE_RE = re.compile(r'\{"metric":"total".*')


def parsed_line(artifact: Path):
    doc = json.loads(artifact.read_text())
    # the driver stores the scraped stdout tail; the contract line is the
    # LAST metric line in it (children print partial lines first)
    tail = doc.get("tail", "")
    matches = LINE_RE.findall(tail)
    if matches:
        # the line may be embedded in a log line; cut trailing log noise
        # by parsing the first complete JSON object
        obj, _ = json.JSONDecoder().raw_decode(matches[-1])
        return obj
    # rounds 2-4 shipped a 2000-char tail whose head (and the line's
    # "metric" prefix) is cut off; salvage the per-query pairs that ARE
    # visible, dropping the first pair since it may be clipped mid-name
    # or mid-number. A partial trend beats a missing round, and these
    # rows are marked partial so a consumer can tell.
    pairs = re.findall(r'"(q\d+[a-z_0-9]*)":(-?[0-9.]+)', tail)
    if len(pairs) < 10:
        return None
    return {"queries": dict(pairs[1:]), "partial": True}


def short_id(name: str) -> str:
    return name.split("_", 1)[0]


def main():
    force = "--force" in sys.argv
    hist = REPO / "BENCH_HISTORY.jsonl"
    rows = []
    if hist.exists():
        rows = [json.loads(l) for l in hist.read_text().splitlines() if l.strip()]
    have = {r["round"] for r in rows}
    for artifact in sorted(REPO.glob("BENCH_r*.json")):
        rnd = int(re.search(r"r(\d+)", artifact.name).group(1))
        if rnd in have and not force:
            continue
        obj = parsed_line(artifact)
        if obj is None:
            print(f"skip round {rnd}: no contract line in {artifact.name}")
            continue
        rows = [r for r in rows if r["round"] != rnd]
        for name, sec in obj["queries"].items():
            rows.append({"round": rnd, "query": short_id(name), "sec": round(float(sec), 2)})
        print(f"backfilled round {rnd}: {len(obj['queries'])} queries")
    rows.sort(key=lambda r: (r["round"], r["query"]))
    hist.write_text(
        "".join(json.dumps(r, separators=(",", ":")) + "\n" for r in rows))
    counts = {}
    for r in rows:
        counts[r["round"]] = counts.get(r["round"], 0) + 1
    print("rounds now present:", counts)


if __name__ == "__main__":
    main()
