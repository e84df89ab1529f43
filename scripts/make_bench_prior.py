#!/usr/bin/env python3
"""Refresh the bench's stall-detection prior (VERDICT r6 #1).

Writes src/main/resources/graft/bench_prior.json — the per-query times and
calibration constant of a reference bench run — from either a driver-side
BENCH_r{N}.json (reads its "parsed" field) or a file holding a raw bench
JSON line. graft.Bench divides each stored time by the stored cal to get
host-normalized priors; a first-pass measurement over ~3x its prior
triggers one tail re-run (min taken), so a mid-run host stall can no
longer publish phantom regressions.

Usage: python3 scripts/make_bench_prior.py BENCH_r06.json
Run each round after the official bench line lands.
"""
import json
import sys


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "BENCH_latest.json"
    with open(src) as f:
        d = json.load(f)
    line = d.get("parsed") or d  # driver wrapper or raw line
    if not isinstance(line, dict) or "cal_cs" not in line:
        sys.exit(f"{src}: no parsed bench line with cal_cs")
    qs = line.get("queries")
    if qs is None:  # the centisecond ladder rung
        qs = {k: v / 100.0 for k, v in line.get("queries_cs", {}).items()}
    # r12: past ~210 queries the stdout ladder degrades to whole-second
    # resolution (most sub-second queries read 0). Bench now writes a
    # full-precision bench_detail.json every run — prefer it whenever
    # the line's per-query values look degraded or are missing.
    degraded = not qs or all(float(v).is_integer() for v in qs.values())
    if degraded:
        try:
            with open("bench_detail.json") as f:
                det = json.load(f)
            qs = {k: v / 100.0 for k, v in det["queries_cs"].items()}
            line = {"cal_cs": det["cal_cs"]}
            print("using bench_detail.json (stdout line was degraded)")
        except OSError:
            if not qs:
                sys.exit(f"{src}: no per-query data and no detail file")
    out = {"cal_cs": line["cal_cs"], "queries": qs}
    path = "src/main/resources/graft/bench_prior.json"
    # Carry forward the documented swing bands (VERDICT r11 #1): the
    # io_bound protocol queries (s10/d6/m7/d12/j3) legitimately swing
    # with host I/O — a reading inside its band is NOT a regression and
    # should not consume an A/B slot. Bands are hand-maintained from
    # measured history (SCALE.md), not regenerated per round.
    try:
        with open(path) as f:
            prev = json.load(f)
        for k in ("bands_sec", "bands_note"):
            if k in prev:
                out[k] = prev[k]
    except (OSError, json.JSONDecodeError):
        pass
    with open(path, "w") as f:
        json.dump(out, f, separators=(",", ":"))
    print(f"wrote {path}: {len(qs)} queries, cal_cs={out['cal_cs']}, "
          f"bands={len(out.get('bands_sec', {}))}")


if __name__ == "__main__":
    main()
