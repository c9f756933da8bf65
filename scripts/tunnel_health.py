"""Bounded-time TPU-tunnel preflight (docs/operations.md).

The axon tunnel is single-process and can stall indefinitely: BENCH_r03
died at backend init, and a stalled tunnel silently hung a 9m40s dryrun.
Run this BEFORE any TPU job to get a yes/no in bounded time:

    python scripts/tunnel_health.py [--timeout 60] [--attempts 2]

Exit 0 = backend initializes (device line printed); exit 1 = it doesn't,
with diagnostics (error tail + python processes that could be holding the
single-process tunnel). Never touches the backend in THIS process, so it
cannot itself get stuck holding the tunnel.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _python_processes, probe_backend  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=60.0,
                    help="seconds per probe attempt")
    ap.add_argument("--attempts", type=int, default=2)
    ap.add_argument("--json", action="store_true", help="machine-readable")
    args = ap.parse_args()

    ok, detail = probe_backend(timeout_s=args.timeout, attempts=args.attempts)
    if args.json:
        print(json.dumps({
            "ok": ok,
            "detail": detail,
            "python_processes": _python_processes()[:20],
        }))
    elif ok:
        print(f"TUNNEL OK: {detail}")
    else:
        print(f"TUNNEL UNHEALTHY: {detail}")
        procs = _python_processes()
        if procs:
            print("python processes that could hold the single-process tunnel:")
            for p in procs[:20]:
                print(f"  {p}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
