"""CPU load generator for the under-load parity discipline.

The r6 sf0.1 sweep ON A DELIBERATELY BUSY MACHINE is what exposed the
`distributed_cumsum` plan-nondeterminism bug after five rounds of
quiet-machine checks looked green: concurrent load perturbs
shuffle-fetch order, which is exactly the input that load-dependent
plans (boundary sampling, partition-id derivation) are sensitive to.
This tool makes the discipline reproducible instead of hand-rolled:

    # pin 28 workers for 45 minutes, then run the sweep beside it
    python tools/loadgen.py --workers 28 --minutes 45 &
    python tools/dress_rehearsal.py --sf-dir /root/testdata/sf0.1 --bare

The workers busy-spin a trivial LCG (pure CPU, ~zero memory, no IO)
so they contend for cores without skewing disk or page cache. Stop
early with Ctrl-C / SIGTERM — the pool propagates it.
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import time


def _spin(deadline: float) -> int:
    x = int.from_bytes(os.urandom(4), "little")
    while time.time() < deadline:
        # tight integer LCG: keeps one core saturated without memory
        # traffic (we want CPU contention, not cache/IO skew)
        x = (x * 1103515245 + 12345) % (1 << 31)
    return x


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--workers", type=int,
                    default=max(1, (os.cpu_count() or 4) - 4),
                    help="spinning processes (default: n_cpus - 4)")
    ap.add_argument("--minutes", type=float, default=30.0,
                    help="how long to hold the load (default 30)")
    args = ap.parse_args()

    deadline = time.time() + args.minutes * 60
    print(f"loadgen: {args.workers} workers for {args.minutes} min "
          f"(loadavg now {os.getloadavg()})", flush=True)
    with mp.Pool(args.workers) as pool:
        pool.map(_spin, [deadline] * args.workers)
    print(f"loadgen: done (loadavg now {os.getloadavg()})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
