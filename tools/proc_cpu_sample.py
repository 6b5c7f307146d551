"""Run a command while sampling cumulative CPU (utime+stime) of every
java/python process on the box once per second; print totals by kind.

The r7 scaling decomposition instrument: rusage(RUSAGE_CHILDREN) misses
the Spark JVM tree (py4j kills the gateway instead of reaping it), so
this samples /proc/<pid>/stat and keeps the last-seen cumulative value
per pid (undercounts at most the final <1 s of each exited pid).

Usage: python tools/proc_cpu_sample.py <cmd> [args...]
Prints the child's own output, then one line:
  PROCACCT wall=..s java=..s(..x) python=..s(..x)

Caveat: counts EVERY java/python process on the box — only meaningful
on an otherwise-idle machine (BENCH/BASELINE.md protocol rules apply).
"""
import os
import subprocess
import sys
import time

HZ = os.sysconf("SC_CLK_TCK")


def scan(acc: dict) -> None:
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                raw = f.read()
            # comm may contain spaces/parens; fields are defined from the
            # LAST ')' (stat(5)'s documented comm delimiter)
            head, _, rest = raw.rpartition(")")
            comm = head.split("(", 1)[1] if "(" in head else head
            st = rest.split()
            # rest starts at field 3 (state); utime/stime are fields 14/15
            cpu = (int(st[11]) + int(st[12])) / HZ
        except OSError:
            continue
        kind = (
            "java"
            if "java" in comm
            else ("python" if "python" in comm else None)
        )
        if kind:
            acc[pid] = (kind, max(cpu, acc.get(pid, (kind, 0.0))[1]))


def main() -> None:
    acc: dict = {}
    self_pid = str(os.getpid())
    t0 = time.monotonic()
    p = subprocess.Popen(sys.argv[1:])
    while p.poll() is None:
        scan(acc)
        time.sleep(1)
    scan(acc)
    dt = time.monotonic() - t0
    acc.pop(self_pid, None)
    tot: dict = {}
    for _pid, (kind, cpu) in acc.items():
        tot[kind] = tot.get(kind, 0.0) + cpu
    print(
        f"PROCACCT wall={dt:.1f}s "
        + " ".join(
            f"{k}={v:.1f}s({v / dt:.1f}x)" for k, v in sorted(tot.items())
        ),
        flush=True,
    )
    sys.exit(p.returncode)


if __name__ == "__main__":
    main()
