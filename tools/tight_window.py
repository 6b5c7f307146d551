"""One-window scaling measurement: raw-mp cap + engine pair, back-to-back.

The host's throughput (and its OWN N->4N scaling cap) drifts far more
than the quantity being measured — r5 observed the raw-multiprocessing
cap swing 0.477-0.821 within a day and engine 4x8 legs vary +-10%
back-to-back on an idle box. The only defensible reading is therefore
cap and pair from ONE tight window (~15 min): mp8 -> engine 1x8 ->
mp32 -> engine 4x8, reporting pair efficiency, same-window hardware
cap, and their ratio (engine-to-cap — the host-invariant code-level
number, ~0.78 across rounds 3-5).

Usage: python tools/tight_window.py
"""

from __future__ import annotations

import json
import os
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


def main() -> None:
    bench.build_scaling_corpus()
    t0 = time.monotonic()
    mp8 = mp(8)
    e8, t8 = leg(1)
    mp32 = mp(32)
    e32, t32 = leg(4)
    cap = (mp32 / mp8) / 4
    pair = (e32 / e8) / 4
    print(
        "TIGHT "
        + json.dumps(
            {
                "mp8_pps": mp8, "mp32_pps": mp32,
                "hardware_cap": round(cap, 3),
                "engine_1x8_ups": round(e8, 1), "engine_1x8_sec": round(t8, 1),
                "engine_4x8_ups": round(e32, 1), "engine_4x8_sec": round(t32, 1),
                "pair_efficiency": round(pair, 3),
                "engine_to_cap": round(pair / cap, 3),
                "window_min": round((time.monotonic() - t0) / 60, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
