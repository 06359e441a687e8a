#!/bin/bash
# Tunnel watchdog: probe the axon TPU tunnel periodically; the moment a
# device claim succeeds, run the on-chip measurement session
# (tpu_session.sh) and exit.  A dead tunnel hangs JAX platform init, so
# every probe runs under timeout.  Logs to /tmp/tunnel_watch.log.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tunnel_watch.log}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-180}
SLEEP=${SLEEP:-600}
MAX_HOURS=${MAX_HOURS:-11}
exec >> "$LOG" 2>&1

deadline=$(( $(date +%s) + MAX_HOURS * 3600 ))
echo "=== tunnel_watch start $(date) (probe every ${SLEEP}s, give up after ${MAX_HOURS}h) ==="
while [ "$(date +%s)" -lt "$deadline" ]; do
  plat=$(timeout "$PROBE_TIMEOUT" python -c \
    "import jax; print(jax.devices()[0].platform)" 2>/dev/null | tail -1)
  if [ -n "$plat" ] && [ "$plat" != "cpu" ]; then
    echo "=== tunnel ALIVE ($plat) $(date); launching tpu_session ==="
    bash benchmarks/tpu_session.sh
    echo "=== tunnel_watch done $(date) ==="
    exit 0
  fi
  echo "probe $(date): dead (got '${plat:-nothing}')"
  sleep "$SLEEP"
done
echo "=== tunnel_watch gave up $(date) ==="
exit 1
