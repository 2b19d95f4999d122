#!/usr/bin/env bash
# Adversarial execution-regime battery: the full Verify + DuckDB oracle
# compare must be EXACT under every regime — the determinism contract
# (fixed-point kernels, UTF8String-parity lowercasing, session-tz-pinned
# event time) is checked by execution, not code review.
#
# Usage: scripts/adversarial_battery.sh [sfDir] [outBase]
# Writes per-regime logs to $outBase/<regime>.log and prints one
# PASS/FAIL line per regime; exits nonzero if any regime fails.
set -u
SF=${1:-/root/testdata/sf0.01}
BASE=${2:-/tmp/graft_battery}
mkdir -p "$BASE"
cd "$(dirname "$0")/.."

declare -A REGIMES=(
  [ansi_off]="spark.sql.ansi.enabled=false"
  [legacy_size]="spark.sql.ansi.enabled=false;spark.sql.legacy.sizeOfNull=true"
  [no_codegen]="spark.sql.codegen.wholeStage=false;spark.sql.codegen.factoryMode=NO_CODEGEN"
  [sort_agg]="spark.sql.execution.useObjectHashAggregateExec=false"
  [shuffle1]="spark.sql.shuffle.partitions=1"
  [shuffle997]="spark.sql.shuffle.partitions=997"
  [no_reuse]="spark.sql.optimizer.excludedRules=org.apache.spark.sql.execution.reuse.ReuseExchangeAndSubquery;spark.sql.adaptive.enabled=false"
  [tiny_splits]="spark.sql.files.maxPartitionBytes=65536"
  # The judge's hand-composed COMBINED leg (r15/r16 verdicts), now a
  # standing battery member: odd 7-way parallelism + broadcast joins
  # disabled + AQE disabled, all in one session.
  [combined7]="spark.sql.autoBroadcastJoinThreshold=-1;spark.sql.adaptive.autoBroadcastJoinThreshold=-1;spark.sql.adaptive.enabled=false"
)
# Per-regime executor-thread override (default 32 below).
declare -A REGIME_CPUS=(
  [combined7]=7
)
# JVM-level regimes (default locale / default timezone, NOT session tz):
declare -A JVM_REGIMES=(
  [locale_tr]="-Duser.language=tr -Duser.country=TR"
  [tz_ny]="-Duser.timezone=America/New_York"
)

fail=0
run_regime() {
  local tag="$1" conf="$2" jvm="$3"
  local out="$BASE/$tag"
  local cpus="${REGIME_CPUS[$tag]:-32}"
  rm -rf "$out"
  env ${conf:+SPARK_GRAFT_CONF="$conf"} \
      ${jvm:+JAVA_TOOL_OPTIONS="$jvm"} \
      SPARK_GRAFT_CPUS="$cpus" \
      sbt -batch "runMain graft.Verify $SF $out" > "$BASE/$tag.log" 2>&1
  local verdict
  verdict=$(python3 scripts/check_oracle.py "$SF" "$out" 2>&1 | tail -1)
  echo "$tag: $verdict"
  [[ "$verdict" == ALL\ PASS* ]] || fail=1
}

for tag in "${!REGIMES[@]}"; do run_regime "$tag" "${REGIMES[$tag]}" ""; done
for tag in "${!JVM_REGIMES[@]}"; do run_regime "$tag" "" "${JVM_REGIMES[$tag]}"; done
exit $fail
