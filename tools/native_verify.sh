#!/usr/bin/env bash
# Standing native-dir correctness evidence (round-16 verdict task #7):
# CORRECTNESS_rN rows all come from driver-replicated testdata, and the
# 83/83 native-dir run was a one-time committed result. This wrapper makes
# it per-round evidence: re-grow the ScaleGen tables at ratio 1.0
# (sf0.1-equivalent cardinalities, ~11 s generation), dump every
# SparkEntry query against the NATIVE dir, compare in DuckDB, and write
# CORRECTNESS_NATIVE.json at the repo root for the round commit.
#
# Since round 18 graft.Verify runs this whole flow ITSELF at the end of
# every un-filtered dump (GRAFT_NATIVE_VERIFY=0 disables), so the driver's
# per-round Verify refreshes the artifact automatically; this script stays
# as the explicit standalone entry point (and pins ratio/base per-run).
#
# Usage: tools/native_verify.sh [ratio] [baseDir] [jsonOut]
set -euo pipefail
cd "$(dirname "$0")/.."
RATIO=${1:-1.0}
BASE=${2:-/root/testdata/sf0.1}
JSON_OUT=${3:-CORRECTNESS_NATIVE.json}
GEN=$(mktemp -d /tmp/graft-native-gen-XXXX)
OUT=$(mktemp -d /tmp/graft-native-out-XXXX)
trap 'rm -rf "$GEN" "$OUT"' EXIT
# sbt output goes to a log and the EXIT STATUS is checked explicitly — a
# `sbt | grep || true` pipeline masked compile/run failures despite
# pipefail, leaving $GEN empty and dying later in check_oracle.py with a
# misleading missing-file error after the trap removed the evidence
SBT_LOG=$(mktemp /tmp/graft-native-sbt-XXXX.log)
run_sbt() {
  echo "[native-verify] $1"
  if ! sbt -batch "$2" >"$SBT_LOG" 2>&1; then
    echo "[native-verify] FAILED: sbt -batch \"$2\" (log tail below)" >&2
    tail -n 40 "$SBT_LOG" >&2
    exit 1
  fi
  grep -E "$3" "$SBT_LOG" || true
}
run_sbt "generating ratio=$RATIO from $BASE into $GEN" \
  "runMain graft.ScaleGen $GEN $RATIO $BASE" '\[scalegen\]'
# GRAFT_NATIVE_VERIFY=0: this Verify call must not recurse into Verify's
# own embedded native pass (this script IS the native pass)
export GRAFT_NATIVE_VERIFY=0
run_sbt "dumping queries against the native dir" \
  "runMain graft.Verify $GEN $OUT" '\[verify\]'
rm -f "$SBT_LOG"
echo "[native-verify] DuckDB compare"
python3 tools/check_oracle.py "$GEN" "$OUT" "$JSON_OUT.tmp"
python3 - "$JSON_OUT" "$RATIO" "$BASE" <<'EOF'
import json, sys, datetime
out, ratio, base = sys.argv[1], sys.argv[2], sys.argv[3]
d = json.load(open(out + ".tmp"))
d["generator"] = "ScaleGen"
d["sf_ratio_vs_sf01"] = float(ratio)
d["base_dir"] = base
d["generated_utc"] = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
json.dump(d, open(out, "w"), indent=1, sort_keys=True)
print(f"[native-verify] wrote {out}: {d['pass']} pass, {d['fail']} fail")
EOF
rm -f "$JSON_OUT.tmp"
