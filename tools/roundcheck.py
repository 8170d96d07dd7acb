"""One-command round-end verification: the four-config driver_sim sweep
plus the matched bench-pair protocol, mechanized (round-9 verdict item
8 — the evidence discipline was bespoke each round; now it is a tool).

Usage::

    python tools/roundcheck.py sweep [entry ...]   # 4-config driver_sim
    python tools/roundcheck.py pair                # one matched bench pair
    python tools/roundcheck.py all [entry ...]     # sweep, then pair

``sweep`` runs tools/driver_sim.py over {default, --ansi} x {sf0.001,
sf0.01} for the given entries (or the FULL registry when none are given
— the final-HEAD form the verify skill calls for) and fails loudly on
any non-PASS row. ``pair`` snapshots load average, runs bench.py then
tools/oracle_bench.py back-to-back (the matched-pair rule: one stray
bench run overwrites the committed pair, so they always travel
together), and prints the ratio with the ambient-load caveat when the
1-minute load was above AMBIENT_OK at either end. Nothing here commits;
inspect, then `git add BENCH.local.json ORACLE_BENCH.local.json`.

Exit status: 0 = every sweep row PASS (and pair recorded, for modes
that run it); 1 otherwise.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
AMBIENT_OK = 4.0  # 1-min load above this = loaded window, re-record
SF_SMALL = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


def _load1() -> float:
    return os.getloadavg()[0]


def sweep(entries: list[str]) -> bool:
    ok = True
    for ansi in (False, True):
        for sf in (SF_SMALL, SF_GATE):
            cmd = [sys.executable, os.path.join(HERE, "driver_sim.py")]
            if ansi:
                cmd.append("--ansi")
            cmd.append(sf)
            cmd += entries
            label = f"{'--ansi ' if ansi else ''}{sf}"
            print(f"== sweep {label} ({'full registry' if not entries else len(entries)})",
                  flush=True)
            res = subprocess.run(
                cmd, cwd=REPO, capture_output=True, text=True, timeout=3600
            )
            out = res.stdout + res.stderr
            passes = out.count(": PASS")
            fails = [
                line.strip()
                for line in out.splitlines()
                if (": SPARK ERR" in line or ": ORACLE ERR" in line
                    or ": FAIL" in line
                    or re.match(r"[1-9]\d* failures:", line))
            ]
            print(f"   PASS={passes}" + (f" PROBLEMS: {fails}" if fails else ""))
            if fails or res.returncode != 0:
                ok = False
    return ok


def pair() -> bool:
    l0 = _load1()
    print(f"== bench pair (load {l0:.2f})", flush=True)
    b = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    if b.returncode != 0:
        print(b.stderr[-2000:])
        return False
    o = subprocess.run(
        [sys.executable, os.path.join(HERE, "oracle_bench.py")],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    if o.returncode != 0:
        print(o.stderr[-2000:])
        return False
    with open(os.path.join(REPO, "BENCH.local.json")) as fh:
        spark_s = json.load(fh)["value"]
    with open(os.path.join(REPO, "ORACLE_BENCH.local.json")) as fh:
        duck_s = json.load(fh)["value"]
    ratio = spark_s / duck_s if duck_s else float("inf")
    # only the START load is a valid ambient probe: right after the run
    # the 1-minute average reflects the benchmark's own 32-thread
    # footprint, not external contention (first-use false positive)
    loaded = l0 > AMBIENT_OK
    print(
        f"   spark={spark_s:.1f}s duckdb={duck_s:.1f}s ratio={ratio:.2f}x "
        f"(start load {l0:.2f}"
        + (", LOADED WINDOW — re-record before committing)" if loaded else ")")
    )
    return not loaded


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    entries = sys.argv[2:]
    if mode not in ("sweep", "pair", "all"):
        print(__doc__)
        return 1
    ok = True
    if mode in ("sweep", "all"):
        ok = sweep(entries) and ok
    if mode in ("pair", "all"):
        ok = pair() and ok
    print("ROUNDCHECK", "OK" if ok else "ATTENTION")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
