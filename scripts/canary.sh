#!/bin/bash
# Pure-CPU host-weather canary (BASELINE.md §3 caveat): a fixed
# single-thread workload whose wall time depends only on host CPU
# pressure — no I/O, no JVM, no Spark. Bench numbers are only comparable
# when the canary reads in its quiet-window band (~2-3 s on this host);
# a 5-10× canary means external pressure, discard the bench run.
# Usage: scripts/canary.sh   → prints seconds to stdout.
python3 - <<'EOF'
import time
t0 = time.perf_counter()
s = 0
for i in range(20_000_000):
    s += i * i
print(round(time.perf_counter() - t0, 2))
EOF
