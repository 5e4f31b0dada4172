"""Per-second /proc/stat timeline logger (the r14 host-noise protocol).

Run alongside any bench window:

    python tools/cpu_timeline.py /tmp/timeline.tsv &

and afterwards judge the window with --check:

    python tools/cpu_timeline.py --check /tmp/timeline.tsv

A window is CLEAN when no sampled second shows system time > 30% or
steal > 5% of total jiffies across the box. Episodic hypervisor
contention (see OPTIMIZATION_r14.md "Host-noise incident") shows up as
85-89% system-time storms; a window overlapping one is discarded and
re-run rather than compared.
"""

from __future__ import annotations

import sys
import time


def sample() -> tuple[int, ...]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice system idle iowait irq softirq steal
    return tuple(int(x) for x in parts[1:9])


def run(path: str) -> None:
    prev = sample()
    with open(path, "w", buffering=1) as out:
        out.write("ts\tuser\tnice\tsystem\tidle\tiowait\tirq\tsoftirq\tsteal\n")
        while True:
            time.sleep(1.0)
            cur = sample()
            delta = [c - p for c, p in zip(cur, prev)]
            prev = cur
            out.write("%.1f\t%s\n" % (time.time(), "\t".join(map(str, delta))))


def check(path: str) -> int:
    bad = 0
    n = 0
    worst_sys = 0.0
    worst_steal = 0.0
    with open(path) as f:
        next(f)
        for line in f:
            cols = line.split()
            vals = list(map(int, cols[1:9]))
            tot = sum(vals) or 1
            sys_pct = 100.0 * vals[2] / tot
            steal_pct = 100.0 * vals[7] / tot
            worst_sys = max(worst_sys, sys_pct)
            worst_steal = max(worst_steal, steal_pct)
            if sys_pct > 30.0 or steal_pct > 5.0:
                bad += 1
            n += 1
    verdict = "CLEAN" if bad == 0 else "CONTENDED"
    print(
        f"{verdict}: {n} samples, {bad} bad seconds, "
        f"worst system {worst_sys:.1f}%, worst steal {worst_steal:.1f}%"
    )
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    if sys.argv[1] == "--check":
        raise SystemExit(check(sys.argv[2]))
    run(sys.argv[1])
