#!/usr/bin/env python3
"""Regenerate bench_floors.json: per-query historical floor seconds.

The floor is the MIN over every recorded full-sweep measurement
(BENCH_r*.json + bench_latest.json) and every isolated adjudication
(bench_partial.json + the "adjudicated" isolated numbers inside full
sweeps). graft.Bench reads it to auto-adjudicate in-sweep drift: any
query whose sweep min exceeds 1.3x its floor (with an absolute slack,
see Bench.scala) is re-run isolated in the same JVM after the sweep,
and both numbers land in the output JSON — the round-7 ABA protocol,
mechanized (VERDICT r15 tasks 3+7).

Only measurements at the driver's sweep SF (sf0.1) count — a floor
recorded at another SF would misfire the drift detector.

Run from the repo root after a round closes: tools/make_floors.py
"""
import glob
import json
import os
import re
import sys

SWEEP_SF = "sf0.1"
# Queries REDEFINED mid-history: the registered plan changed in the
# named round, so sweeps from EARLIER rounds measured a different
# query and their times must not fold into this one's floor (a stale
# floor triggers a pointless adjudication rerun every sweep and reads
# as a standing 6x "offender" in floor audits). Value = first round
# whose BENCH file reflects the current definition.
REDEFINED_SINCE = {
    "rel_approx_distinct": 9,  # f2e6fe6: in-plan tolerance booleans
    "rel_hll_distinct": 9,     # f2e6fe6: same commit
    "rel_batch_slice": 2,      # 4155ec0: scalable range-partitioned ordinal
}
ROUND_RE = re.compile(r"BENCH_r0*(\d+)\.json$")
# driver BENCH_r*.json keep only a truncated "tail" of the bench line;
# harvest whatever "name":seconds pairs survived truncation
PAIR_RE = re.compile(r'"([a-z][a-z0-9_]+)":([0-9]+\.[0-9]+)')
# the truncated tail can include the "adjudicated" block and the
# top-level metrics — their numeric pairs are not query names
NON_QUERY_KEYS = {"value", "sf", "in_sweep", "isolated",
                  "total_normalized"}


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    floors: dict[str, float] = {}

    def feed(name: str, sec: float, rnd: int | None = None) -> None:
        if sec <= 0:
            return
        # a measurement from before the query's current definition
        # landed describes a different plan — not floor evidence
        if rnd is not None and rnd < REDEFINED_SINCE.get(name, 0):
            return
        floors[name] = min(floors.get(name, sec), sec)

    paths = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    paths += [os.path.join(root, p)
              for p in ("bench_latest.json", "bench_partial.json")]
    used = []
    for p in paths:
        if not os.path.exists(p):
            continue
        try:
            with open(p) as f:
                d = json.load(f)
        except (json.JSONDecodeError, OSError) as e:
            print(f"skip {p}: {e}", file=sys.stderr)
            continue
        # the sf field is either a bare ratio ("0.1") or a directory
        # path; match the trailing path COMPONENT exactly — substring
        # containment would let sf0.15 (or any path prefixed sf0.1*)
        # silently lower the sf0.1 floors (ADVICE r16)
        sf = str(d.get("sf", ""))
        if os.path.basename(sf.rstrip("/")) != SWEEP_SF and sf != "0.1":
            continue
        m = ROUND_RE.search(os.path.basename(p))
        rnd = int(m.group(1)) if m else None
        failed = set(d.get("failed", []))
        for q, sec in d.get("queries", {}).items():
            if q not in failed:
                feed(q, float(sec), rnd)
        for q, pair in d.get("adjudicated", {}).items():
            # "isolated": null marks a flagged-but-unverifiable rerun
            # (both isolated attempts threw) — no floor evidence, skip
            iso = pair.get("isolated")
            if iso is not None:
                feed(q, float(iso), rnd)
        for q, sec in PAIR_RE.findall(d.get("tail", "")):
            if q not in failed and q not in NON_QUERY_KEYS:
                feed(q, float(sec), rnd)
        used.append(os.path.basename(p))

    out = os.path.join(root, "bench_floors.json")
    with open(out, "w") as f:
        json.dump({"sf": SWEEP_SF, "sources": used,
                   "floors": dict(sorted(floors.items()))}, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(floors)} floors from {len(used)} files")


if __name__ == "__main__":
    main()
