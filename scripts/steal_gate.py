"""Steal-gated launcher: wait until /proc/stat steal stays below a
threshold for N consecutive minutes, then exec the given command.

The round-12 floor-stamping procedure, factored into a script: ambient
hypervisor contention (steal) inflates every wall-clock number and no
in-VM signal but steal can see it, so quiet-floor sweeps are launched
only after the host has been verifiably quiet for a few minutes.

Usage: python scripts/steal_gate.py [--limit J] [--minutes N] [--max-wait S] -- cmd args...
  limit    max steal jiffies per minute to count as quiet (default 60)
  minutes  consecutive quiet minutes required (default 3)
  max-wait give up and run anyway after this many seconds (default 7200)
"""
import os
import subprocess
import sys
import time


def steal() -> int:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8]) if len(parts) > 8 else 0


def main() -> int:
    args = sys.argv[1:]
    limit, minutes, max_wait = 60, 3, 7200
    while args and args[0] != "--":
        if args[0] == "--limit":
            limit = int(args[1]); args = args[2:]
        elif args[0] == "--minutes":
            minutes = int(args[1]); args = args[2:]
        elif args[0] == "--max-wait":
            max_wait = int(args[1]); args = args[2:]
        else:
            print(__doc__, file=sys.stderr)
            return 2
    if not args or args[0] != "--":
        print(__doc__, file=sys.stderr)
        return 2
    cmd = args[1:]
    t_start = time.time()
    quiet = 0
    while quiet < minutes:
        s0 = steal()
        time.sleep(60)
        d = steal() - s0
        quiet = quiet + 1 if d <= limit else 0
        print(
            f"steal_gate: {d} jiffies/min (quiet {quiet}/{minutes}, "
            f"waited {int(time.time() - t_start)}s)",
            flush=True,
        )
        if time.time() - t_start > max_wait:
            print("steal_gate: max wait reached, launching anyway", flush=True)
            break
    print(f"steal_gate: launching {' '.join(cmd)}", flush=True)
    return subprocess.call(cmd, env=os.environ)


if __name__ == "__main__":
    raise SystemExit(main())
