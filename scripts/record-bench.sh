#!/usr/bin/env bash
# Recorded-bench protocol, in one place (BASELINE.md "Recorded engine
# BENCH" sections are produced exactly this way):
#
#   scripts/record-bench.sh [sf_dir] [out.json]
#
# - refuses to start until the 1-min load average is quiet (< 1.5), so
#   the pre-flight gate never has to convert a busy host;
# - forces the min-of-3 re-time pass (SPARK_GRAFT_RETIME=force): the
#   load gate samples one instant, and background work resuming mid-run
#   showed up as +12% totals on a "quiet" start (round 12);
# - leaves the JVM prewarm ON (cold numbers profile data work only);
# - writes the single JSON line to the output file and refuses to keep
#   an artifact that self-flags "contended":true.
set -euo pipefail
cd "$(dirname "$0")/.."
sf=${1:-/root/testdata/sf0.1}
out=${2:-/tmp/bench_recorded.json}
# optional query names after sf/out are passed through to graft.Bench
# (subset recordings — e.g. the sf10 scale-path subset in BASELINE.md;
# the artifact's "queries" object shows exactly what ran)
shift $(( $# > 2 ? 2 : $# ))
extra="$*"
for i in $(seq 1 60); do
  load=$(cut -d' ' -f1 /proc/loadavg)
  awk "BEGIN{exit !($load < 1.5)}" && break
  echo "[record-bench] load $load >= 1.5 — waiting ($i/60)" >&2
  sleep 10
done
load=$(cut -d' ' -f1 /proc/loadavg)
awk "BEGIN{exit !($load < 1.5)}" || {
  echo "[record-bench] host never went quiet (load $load) — aborting" >&2
  exit 1
}
# The run writes to a TEMP file and only moves into place after every
# check passes: a failed re-run must never truncate or replace a
# previously recorded artifact at $out (the bare `> "$out"` redirection
# did exactly that before sbt even started), and a failure keeps its
# partial output as $out.failed with the sbt stderr log for diagnosis.
# Diagnostics land in /tmp, not next to a repo-root artifact (a recorded
# run would otherwise leave a half-megabyte sbt log in the repo).
log="/tmp/$(basename "${out%.json}").stderr.log"
tmp="$out.tmp.$$"
on_err() {
  if [ -s "$tmp" ]; then
    mv "$tmp" "$out.failed"
    echo "[record-bench] bench FAILED — partial output kept at $out.failed; diagnostics in $log" >&2
  else
    rm -f "$tmp"
    echo "[record-bench] bench FAILED before emitting a metric line — nothing recorded ($out untouched); diagnostics in $log" >&2
  fi
}
trap on_err ERR
SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_RETIME=force \
  sbt -batch "runMain graft.Bench $extra" 2>"$log" |
  grep -o '{"metric".*}' > "$tmp"
trap - ERR
# The artifact must be EXACTLY one parseable JSON line: a run that ever
# emitted two metric lines (or a mangled one) would otherwise be mv'd
# into place as malformed JSON and only the post-record summary below
# would fail — leaving a recorded but unparseable artifact at $out.
if ! python3 - "$tmp" <<'PY'
import json, sys
lines = [l for l in open(sys.argv[1]) if l.strip()]
if len(lines) != 1:
    sys.exit(f"expected exactly 1 metric line, got {len(lines)}")
json.loads(lines[0])
PY
then
  mv "$tmp" "$out.failed"
  echo "[record-bench] metric output malformed — NOT recorded (kept at $out.failed)" >&2
  exit 1
fi
if grep -q '"contended":true' "$tmp"; then
  mv "$tmp" "$out.failed"
  echo "[record-bench] run self-flagged contended — NOT recorded (kept at $out.failed)" >&2
  exit 1
fi
mv "$tmp" "$out"
echo "[record-bench] recorded $(python3 -c "
import json,sys; d=json.load(open('$out'))
print(f\"warm {d['value']:.1f}s / cold {d.get('cold_total',-1):.1f}s / {len(d['queries'])} queries\")")" >&2
echo "$out"
