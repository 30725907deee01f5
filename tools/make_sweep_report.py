#!/usr/bin/env python3
"""Assemble the full-registry scaling sweep report (SWEEP_rN.md body).

Inputs: two graft.Verify stderr logs (each line `[verify] NAME ok in Xs`
or `[verify] NAME failed: ...`) from a small-SF and a 10x-SF run, plus
the 10x dump dir for (rows, order-independent hash) via dump_hashes.

Flags: ratio > 20x on a 10x data scale-up = super-linear (investigate);
queries under 1s at both SFs are noise-dominated and never flagged.

Usage: make_sweep_report.py <sf01.log> <sf10.log> <sw10Dir>
"""
import re, subprocess, sys


def times(path):
    ok, fail = {}, []
    for line in open(path):
        m = re.match(r"\[verify\] (\S+) ok in ([0-9.]+)s", line)
        if m:
            ok[m.group(1)] = float(m.group(2))
        m = re.match(r"\[verify\] (\S+) failed", line)
        if m:
            fail.append(m.group(1))
    return ok, fail


def main(log01, log10, dir10):
    t01, f01 = times(log01)
    t10, f10 = times(log10)
    hashes = {}
    out = subprocess.run(
        [sys.executable, "tools/dump_hashes.py", dir10],
        capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        name, rows, h = line.split("\t")
        hashes[name] = (rows, h)
    names = sorted(set(t01) | set(t10) | set(f01) | set(f10))
    flagged = []
    print("| query | sf0.1 s | sf1.0 s | ratio | sf1.0 rows | sf1.0 hash | note |")
    print("|---|---|---|---|---|---|---|")
    for n in names:
        a = t01.get(n)
        b = t10.get(n)
        rows, h = hashes.get(n, ("-", "-"))
        if n in f10:
            print(f"| {n} | {a if a is not None else 'FAIL'} | FAIL | - | - | - | **FAILED at sf1.0** |")
            flagged.append(n)
            continue
        ratio = (b / a) if (a and b and a > 0) else None
        rs = f"{ratio:.1f}x" if ratio is not None else "-"
        note = ""
        if ratio is not None and ratio > 20 and b >= 1.0:
            note = "**super-linear**"
            flagged.append(n)
        print(f"| {n} | {a:.2f} | {b:.2f} | {rs} | {rows} | {h} | {note} |")
    tot01 = sum(t01.values())
    tot10 = sum(t10.values())
    print()
    print(f"Totals: sf0.1 {tot01:.1f}s ({len(t01)} queries), "
          f"sf1.0 {tot10:.1f}s ({len(t10)} queries), "
          f"aggregate ratio {tot10 / tot01:.1f}x on 10x data.")
    print(f"Flagged: {flagged if flagged else 'none'}.")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
