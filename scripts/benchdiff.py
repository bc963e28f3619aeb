#!/usr/bin/env python3
"""Per-query timing diff between two bench records — the regression
radar behind BENCHNOTES' round-over-round tables (VERDICT r12 #8:
"caught by diff, not anecdote").

Accepts, for each side, either
  - a BENCH_r{N}.json / graft_bench_full.json file (the {"queries":{...}}
    line, raw or under a "parsed" key), or
  - a stress-table text file / BENCHNOTES code block with lines like
    `q_name   12.3s  rows=42`.

Usage: benchdiff.py OLD NEW [--threshold 1.3]
Prints regressions (new/old >= threshold) and improvements (<= 1/th),
then totals. Exit 1 if any regression (so sweeps can gate on it).

The ±5-10 % box-noise band means sub-1.3× deltas are not signal here
(BENCHNOTES r11 heartbeat lesson); the default threshold reflects that.
"""
import json
import re
import sys


def load(path):
    """Returns (times, shuffle_bytes, calib_ms): shuffle_bytes maps
    query -> read_b + write_b (r15+ records; empty for older rounds);
    calib_ms is the record's fixed-work CPU calibration (r19+ records;
    None for older)."""
    text = open(path).read()
    try:
        d = json.loads(text)
        if isinstance(d, dict):
            p = d.get("parsed") or d
            qs = p.get("queries")
            if isinstance(qs, dict):
                sh = {k: float(v.get("read_b", 0)) + float(v.get("write_b", 0))
                      for k, v in (p.get("shuffle") or {}).items()
                      if isinstance(v, dict)}
                calib = p.get("calib_ms")
                return ({k: float(v) for k, v in qs.items()}, sh,
                        float(calib) if calib else None)
    except (json.JSONDecodeError, AttributeError):
        pass
    qs = {}
    for m in re.finditer(r"^\s*(q_[a-z0-9_]+)\s+([0-9.]+)s\b", text, re.M):
        qs[m.group(1)] = float(m.group(2))
    if not qs:
        sys.exit(f"benchdiff: no per-query timings found in {path}")
    return qs, {}, None


def main():
    args, th, it = [], 1.3, iter(sys.argv[1:])
    for a in it:
        if a.startswith("--threshold"):
            # accept both --threshold=1.3 and --threshold 1.3
            th = float(a.split("=", 1)[1] if "=" in a else next(it))
        else:
            args.append(a)
    if len(args) != 2:
        sys.exit(__doc__)
    (old, osh, ocal), (new, nsh, ncal) = load(args[0]), load(args[1])
    # calibration gate (VERDICT r18 missing #3): the fixed-work CPU
    # probe moves only with box contention, so >10% drift means the two
    # records measured different machine-states — say so up front
    # rather than letting uniform environment drift read as code
    # regressions (the r16->r18 ~1.19x lesson).
    # calib normalization (VERDICT r19 missing #3): when BOTH records
    # carry the fixed-work probe, scale wall-clock ratios by
    # calib_old/calib_new — the probe moves only with box contention,
    # so the normalized column is the code's share of a delta and the
    # time gate fires on IT, not on environment drift (the recurring
    # ~1.2x box-drift signature adjudicated r16..r19 by hand).
    cfac = 1.0
    if ocal and ncal:
        drift = ncal / ocal
        cfac = ocal / ncal
        if abs(drift - 1.0) > 0.10:
            print(f"CALIBRATION-DRIFT: fixed-work CPU probe "
                  f"{ocal:.0f}ms -> {ncal:.0f}ms ({drift:.2f}x) — the box "
                  f"state differs; ratios below gate on the calib-normalized "
                  f"column (raw x {cfac:.2f})")
    elif ocal or ncal:
        print("calibration: only one record carries calib_ms "
              "(pre-r19 vintage on the other side) — ratios are raw")
    shared = sorted(set(old) & set(new))
    gone, added = sorted(set(old) - set(new)), sorted(set(new) - set(old))
    regress, improve = [], []
    for q in shared:
        o, n = old[q], new[q]
        if o <= 0 or n <= 0:
            continue
        r = n / o
        rn = r * cfac
        # sub-100ms pairs are pure noise at any ratio
        if rn >= th and n >= 0.1:
            regress.append((rn, r, q, o, n))
        elif rn <= 1 / th and o >= 0.1:
            improve.append((rn, r, q, o, n))
    def fmt(r, rn):
        return (f"({r:.2f}x)" if cfac == 1.0
                else f"(raw {r:.2f}x, norm {rn:.2f}x)")
    for rn, r, q, o, n in sorted(regress, reverse=True):
        print(f"REGRESS  {q:36s} {o:8.2f}s -> {n:8.2f}s  {fmt(r, rn)}")
    for rn, r, q, o, n in sorted(improve):
        print(f"improve  {q:36s} {o:8.2f}s -> {n:8.2f}s  {fmt(r, rn)}")
    # shuffle-bytes column (VERDICT r14 #5): bytes are deterministic, so
    # inflation is signal even when wall-time hides it in box noise.
    # Floor at 16 MB — small-query byte jitter (AQE coalescing) is not.
    bregress = []
    for q in sorted(set(osh) & set(nsh)):
        ob, nb = osh[q], nsh[q]
        if nb >= ob * th and nb - ob >= 16 * 1024 * 1024:
            bregress.append((nb / ob if ob > 0 else float("inf"), q, ob, nb))
    for r, q, ob, nb in sorted(bregress, reverse=True):
        print(f"BYTES-REGRESS {q:31s} {ob / 1e6:8.1f}MB -> {nb / 1e6:8.1f}MB  ({r:.2f}x)")
    if gone:
        print(f"removed: {', '.join(gone)}")
    if added:
        print(f"added:   {', '.join(added)}")
    to, tn = sum(old[q] for q in shared), sum(new[q] for q in shared)
    ratio = f"{tn / to:.2f}x" if to > 0 else "n/a"
    norm = (f", calib-norm {tn / to * cfac:.2f}x" if to > 0 and cfac != 1.0
            else "")
    print(f"totals over {len(shared)} shared queries: "
          f"{to:.1f}s -> {tn:.1f}s ({ratio}{norm}); "
          f"{len(regress)} regressions >= {th}x (normalized), "
          f"{len(improve)} improvements")
    if osh and nsh:
        tob = sum(osh.values()) / 1e6
        tnb = sum(nsh.values()) / 1e6
        print(f"shuffle bytes over {len(set(osh) & set(nsh))} shared queries: "
              f"{tob:.0f}MB -> {tnb:.0f}MB; {len(bregress)} byte regressions")
    sys.exit(1 if regress or bregress else 0)


if __name__ == "__main__":
    main()
