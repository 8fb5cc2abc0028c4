"""Diff two bench detail maps the way the round verdicts do by hand.

Compares the working-tree BENCH_DETAIL.json (or a given file) against a
committed revision of it and prints the movers — per-query deltas above
BOTH a relative and an absolute threshold, in each direction — plus
added/removed lines and the suite/overlap totals. This mechanizes the
per-round "movers >15% and >0.3s" analysis so round-over-round noise
adjudication starts from the same numbers every time.

Usage:
    python tools/bench_compare.py                  # HEAD vs working tree
    python tools/bench_compare.py <git-rev>        # e.g. c755f30 (r10 tree)
    python tools/bench_compare.py <old.json> <new.json>
    python tools/bench_compare.py --rel 0.15 --abs 0.3 [...]
"""
from __future__ import annotations

import json
import subprocess
import sys


def load_rev(rev: str) -> dict:
    out = subprocess.run(
        ["git", "show", f"{rev}:BENCH_DETAIL.json"],
        capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out)


def detail(d: dict) -> dict[str, float]:
    for k in ("queries", "detail"):
        if isinstance(d.get(k), dict):
            return d[k]
    return d


def main() -> None:
    # consume flag VALUES while collecting positionals — `--rel 0.15` must
    # not leak '0.15' into the file/rev args (ADVICE r11)
    args: list[str] = []
    rel, abs_ = 0.15, 0.3
    it = iter(sys.argv[1:])
    for tok in it:
        if tok in ("--rel", "--abs"):
            val = next(it, None)
            if val is None:
                raise SystemExit(f"flag {tok} requires a value")
            if tok == "--rel":
                rel = float(val)
            else:
                abs_ = float(val)
        elif tok.startswith("--"):
            raise SystemExit(f"unknown flag {tok!r} (known: --rel --abs)")
        else:
            args.append(tok)

    if len(args) == 2:
        old = json.load(open(args[0]))
        new = json.load(open(args[1]))
        old_name, new_name = args[0], args[1]
    else:
        rev = args[0] if args else "HEAD"
        old = load_rev(rev)
        new = json.load(open("BENCH_DETAIL.json"))
        old_name, new_name = f"{rev}:BENCH_DETAIL.json", "BENCH_DETAIL.json"

    a, b = detail(old), detail(new)
    overlap = sorted(set(a) & set(b))
    added = sorted(set(b) - set(a))
    removed = sorted(set(a) - set(b))

    movers = []
    for n in overlap:
        d = b[n] - a[n]
        if abs(d) >= abs_ and abs(d) >= rel * a[n]:
            movers.append((d, n))
    movers.sort(reverse=True)

    print(f"old: {old_name} ({len(a)} queries)  new: {new_name} ({len(b)} queries)")
    print(
        f"overlap {len(overlap)}: {sum(a[n] for n in overlap):.1f}s -> "
        f"{sum(b[n] for n in overlap):.1f}s "
        f"({sum(b[n] for n in overlap) / max(sum(a[n] for n in overlap), 1e-9):.2f}x)"
    )
    if added:
        print(f"added ({len(added)}): "
              + " ".join(f"{n}={b[n]:.2f}" for n in added))
    if removed:
        print(f"removed ({len(removed)}): "
              + " ".join(f"{n}={a[n]:.2f}" for n in removed))
    slower = [(d, n) for d, n in movers if d > 0]
    faster = [(d, n) for d, n in movers if d < 0]
    print(f"slower by >={rel:.0%} and >={abs_}s ({len(slower)}):")
    for d, n in slower:
        print(f"  {n}: {a[n]:.2f} -> {b[n]:.2f} (+{d:.2f}s)")
    print(f"faster by >={rel:.0%} and >={abs_}s ({len(faster)}):")
    for d, n in sorted(faster):
        print(f"  {n}: {a[n]:.2f} -> {b[n]:.2f} ({d:.2f}s)")


if __name__ == "__main__":
    main()
