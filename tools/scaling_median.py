#!/usr/bin/env python
"""Median-of-N tight-window scaling certification (VERDICT r5 #1).

Round 5's single tight windows were statistically indistinguishable
from round 4 because the HOST's own N->4N scaling cap swung 0.477-0.821
between hours. This protocol makes the claim robust:

* >= N consecutive tight windows (default 5), each ~13 min:
  raw-mp cap legs + engine pair legs back-to-back inside one window;
* leg order ALTERNATES between windows (even: mp8 -> 1x8 -> mp32 -> 4x8;
  odd: mp32 -> 4x8 -> mp8 -> 1x8) so monotone host drift inside a
  window biases half the windows up and half down instead of all one
  way;
* report per-window rows + the MEDIAN pair efficiency, median hardware
  cap, and median engine-to-cap (the host-invariant code-level number).

Acceptance (r5 verdict): median engine-to-cap >= 0.80 and median pair
>= 0.60, or a diagnosed engine-side reason.

Usage: python tools/scaling_median.py [n_windows]
Emits one JSON line per window (prefix WINDOW) and a final MEDIAN line.
Requires an otherwise-idle box — any concurrent load poisons both the
cap and the pair in the same direction only if it is steady; bursty
load poisons them differently, which the alternation cannot fix.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def leg(nexec: int) -> tuple[float, float]:
    cores = nexec * 8
    code = bench._SCALE_JOB.format(
        repo=REPO, cores=cores, nexec=nexec,
        corpus=bench.SCALE_CORPUS, buckets=bench.BUCKETS,
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    r = json.loads(out.stdout.strip().splitlines()[-1])
    return r["urls"] / r["sec"], r["sec"]


def mp(workers: int) -> float:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "mp_baseline.py"),
         bench.SCALE_CORPUS, str(workers)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["pps"]


def window(i: int) -> dict:
    t0 = time.monotonic()
    if i % 2 == 0:  # small-first
        mp8 = mp(8)
        e8, t8 = leg(1)
        mp32 = mp(32)
        e32, t32 = leg(4)
        order = "mp8,1x8,mp32,4x8"
    else:  # big-first
        mp32 = mp(32)
        e32, t32 = leg(4)
        mp8 = mp(8)
        e8, t8 = leg(1)
        order = "mp32,4x8,mp8,1x8"
    cap = (mp32 / mp8) / 4
    pair = (e32 / e8) / 4
    row = {
        "window": i, "order": order,
        "mp8_pps": mp8, "mp32_pps": mp32, "hardware_cap": round(cap, 3),
        "engine_1x8_ups": round(e8, 1), "engine_1x8_sec": round(t8, 1),
        "engine_4x8_ups": round(e32, 1), "engine_4x8_sec": round(t32, 1),
        "pair_efficiency": round(pair, 3),
        "engine_to_cap": round(pair / cap, 3),
        "window_min": round((time.monotonic() - t0) / 60, 1),
    }
    print("WINDOW " + json.dumps(row), flush=True)
    return row


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    bench.build_scaling_corpus()
    rows = [window(i) for i in range(n)]
    med = lambda k: round(statistics.median(r[k] for r in rows), 3)  # noqa: E731
    print("MEDIAN " + json.dumps({
        "n_windows": n,
        "median_pair_efficiency": med("pair_efficiency"),
        "median_hardware_cap": med("hardware_cap"),
        "median_engine_to_cap": med("engine_to_cap"),
        "min_engine_to_cap": round(min(r["engine_to_cap"] for r in rows), 3),
        "max_engine_to_cap": round(max(r["engine_to_cap"] for r in rows), 3),
        "pass_median_cap_0.80": med("engine_to_cap") >= 0.80,
        "pass_median_pair_0.60": med("pair_efficiency") >= 0.60,
    }), flush=True)


if __name__ == "__main__":
    main()
