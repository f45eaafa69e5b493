#!/usr/bin/env bash
# Straggler/speculation capability run — the reference reassigns Working
# tasks after 10 s (src/mr/coordinator.go:12-14,122-128); Spark's analog
# is speculative execution. Two constraints force the topology below:
#   * local[*] never starts the speculation thread (cluster scheduler
#     required), and
#   * a speculative copy may only launch on a DIFFERENT host than the
#     running attempt — local-cluster registers every worker as
#     "localhost", so the copy never schedules there.
# So: a throwaway standalone master + two workers bound to distinct
# loopback hostnames (127.0.0.1 / 127.0.0.2), separate executor JVMs,
# then graft.SpeculationProbe asserts the straggler's copy completes the
# job far under the straggler's sleep and the result is exactly-once.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch package >/dev/null
JAR=$(ls -t target/scala-2.13/*.jar | head -1)

export SPARK_LOG_DIR=$(mktemp -d /tmp/spec-logs.XXXXXX)
PIDS=()
# Kill whole process groups: with SPARK_NO_DAEMONIZE the start-*.sh
# wrappers spawn the Master/Worker JVMs as children, and killing only the
# wrapper PID leaves the JVMs running (observed: two leaked workers
# stealing 4 cores from later benchmarks). setsid gives each its own
# group; kill -- -PID takes the group down.
# Processes in THIS run's process groups only: setsid gave each start-*.sh
# wrapper its own PGID, and the Master/Worker JVMs it spawns inherit it —
# so PGID membership exactly identifies this run's JVMs. (A bare
# `pkill -f <class name>` would also hit standalone clusters other jobs on
# a shared host own — the round-6 form had that hazard; and port-suffixed
# -f patterns never match at all: pkill only examines a bounded cmdline
# prefix and the ~2 kB of JVM flags push the port args past the window.)
own_pids() {
  ps -eo pid=,pgid= | awk -v pgids="${PIDS[*]}" '
    BEGIN { split(pgids, a); for (i in a) keep[a[i]] = 1 }
    keep[$2] { print $1 }'
}
cleanup() {
  for p in "${PIDS[@]}"; do kill -- "-$p" 2>/dev/null || kill "$p" 2>/dev/null || true; done
  wait 2>/dev/null || true
  # Group kill above should take the JVMs down with the wrappers; sweep
  # survivors by PGID (TERM, then -9) — never by class name.
  for _ in 1 2 3 4 5; do
    LEFT=$(own_pids)
    [ -z "$LEFT" ] && return 0
    kill $LEFT 2>/dev/null || true
    sleep 1
  done
  LEFT=$(own_pids)
  [ -n "$LEFT" ] && kill -9 $LEFT 2>/dev/null || true
}
trap cleanup EXIT

setsid env SPARK_NO_DAEMONIZE=1 /opt/spark/sbin/start-master.sh \
  -h 127.0.0.1 -p 7177 --webui-port 8091 >"$SPARK_LOG_DIR/master.out" 2>&1 &
PIDS+=($!)
sleep 5
setsid env SPARK_NO_DAEMONIZE=1 SPARK_WORKER_DIR=$SPARK_LOG_DIR/w1 /opt/spark/sbin/start-worker.sh \
  -h 127.0.0.1 -c 2 -m 1g --webui-port 8092 spark://127.0.0.1:7177 \
  >"$SPARK_LOG_DIR/w1.out" 2>&1 &
PIDS+=($!)
setsid env SPARK_NO_DAEMONIZE=1 SPARK_WORKER_DIR=$SPARK_LOG_DIR/w2 /opt/spark/sbin/start-worker.sh \
  -h 127.0.0.2 -c 2 -m 1g --webui-port 8093 spark://127.0.0.1:7177 \
  >"$SPARK_LOG_DIR/w2.out" 2>&1 &
PIDS+=($!)
sleep 6

PROBE_OUT=$SPARK_LOG_DIR/probe.out
/opt/spark/bin/spark-submit --master spark://127.0.0.1:7177 \
  --conf spark.speculation=true \
  --conf spark.speculation.interval=100ms \
  --conf spark.speculation.multiplier=2 \
  --conf spark.speculation.quantile=0.75 \
  --conf spark.executor.memory=768m \
  --class graft.SpeculationProbe "$JAR" >"$PROBE_OUT" 2>&1 || true
grep -E '\[speculation-probe\]|speculatable|Starting task 7\.|Killing attempt' "$PROBE_OUT" || true

# Record the run as a committed artifact (SPECULATION.json) so the
# straggler-reassignment capability is evidenced per-round like
# CORRECTNESS/BENCH, not just as an in-terminal PASS.
LINE=$(grep -oE '\[speculation-probe\] sum=[0-9]+ elapsed=[0-9.]+s (PASS|FAIL)' "$PROBE_OUT" | tail -1 || true)
RESULT=${LINE##* }; [ -n "$RESULT" ] || RESULT=FAIL
SUM=$(echo "$LINE" | grep -oE 'sum=[0-9]+' | cut -d= -f2); SUM=${SUM:-0}
ELAPSED=$(echo "$LINE" | grep -oE 'elapsed=[0-9.]+' | cut -d= -f2); ELAPSED=${ELAPSED:-0}
SPEC_EVENTS=$(grep -c 'speculatable' "$PROBE_OUT" || true)
KILLED=$(grep -c 'Killing attempt' "$PROBE_OUT" || true)
cat > SPECULATION.json <<EOF
{"result":"$RESULT","sum":$SUM,"elapsed_sec":$ELAPSED,
 "speculatable_events":$SPEC_EVENTS,"killed_attempts":$KILLED,
 "straggler_sleep_sec":120,
 "topology":"standalone master + 2 workers on 127.0.0.1/127.0.0.2, spark.speculation=true",
 "run_utc":"$(date -u +%Y-%m-%dT%H:%M:%SZ)"}
EOF
echo "[speculation-run] wrote SPECULATION.json: result=$RESULT elapsed=${ELAPSED}s speculatable_events=$SPEC_EVENTS"
[ "$RESULT" = PASS ]
