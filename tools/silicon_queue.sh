#!/bin/bash
# Relay-return job queue: watch for the axon loopback relay
# (127.0.0.1:8083 — see NEXT_ROUND.md "TPU tunnel outage diagnosis") and,
# when it comes back, run the queued silicon measurements SEQUENTIALLY
# (one device client at a time — the pool session is exclusive).
#
#   nohup bash tools/silicon_queue.sh > /tmp/probe/r3/queue.log 2>&1 &
#
# Each step has a hard timeout; a failing step logs and continues so a
# single flaky compile can't wedge the queue.  Outputs land next to the
# queue log.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/probe/r3
mkdir -p "$OUT"

# Hard deadline (epoch seconds): never start a device job after this —
# the driver's end-of-round bench needs the (exclusive) tunnel session,
# and a second client risks re-wedging it.  Default ~10:00 UTC Aug 18;
# override with QUEUE_DEADLINE.
DEADLINE=${QUEUE_DEADLINE:-1787047200}

log() { echo "[queue $(date -u +%H:%M:%S)] $*"; }

past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }

log "waiting for relay listener on :8083/:8082"
for i in $(seq 1 8640); do  # up to 24 h, 10 s cadence
  if ss -tln 2>/dev/null | grep -qE ':(8082|8083) '; then
    log "relay is back (iteration $i)"
    break
  fi
  past_deadline && { log "deadline while waiting; exiting"; exit 0; }
  sleep 10
done
ss -tln 2>/dev/null | grep -qE ':(8082|8083) ' || { log "relay never returned; exiting"; exit 1; }
past_deadline && { log "past deadline; leaving the device to the driver"; exit 0; }

# 0. sanity probe (fast fail if the relay is up but the pool is not)
log "step 0: sanity probe"
timeout 600 python - <<'EOF' > "$OUT/q0_probe.log" 2>&1
import time, jax, numpy as np
t0 = time.time()
print(jax.devices(), flush=True)
print("TUNNEL OK", np.asarray(jax.numpy.arange(8.0) * 2)[-1],
      f"{time.time()-t0:.1f}s", flush=True)
EOF
grep -q "TUNNEL OK" "$OUT/q0_probe.log" || { log "probe failed; exiting"; cat "$OUT/q0_probe.log"; exit 1; }
log "probe OK"

# 1. headline bench, twice (the >=1.5x-twice discipline needs two runs)
for r in 1 2; do
  past_deadline && { log "deadline"; exit 0; }
  log "step 1.$r: bench.py"
  timeout 3600 python bench.py > "$OUT/q1_bench$r.log" 2>&1
  tail -1 "$OUT/q1_bench$r.log"
done

# 2. MXU intersect bench at production shapes (NEXT_ROUND item 2)
past_deadline && { log "deadline"; exit 0; }
log "step 2: mxu_intersect_bench"
timeout 5400 python tools/mxu_intersect_bench.py --reps 5 > "$OUT/q2_mxu.log" 2>&1
tail -3 "$OUT/q2_mxu.log"

log "queue done; remaining (manual): group-merge ablation, scale100k rerun, acceptance --full"
