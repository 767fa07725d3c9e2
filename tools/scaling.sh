#!/bin/bash
# North-rule scaling evidence: the IDENTICAL pipeline job at two parallelism
# levels (N=8, 4N=32 cores) on the same input. Each level is an honest
# emulation of an N-core cluster slice: task slots (local[N]), JVM-visible
# processors (-XX:ActiveProcessorCount=N) and heap (1 GiB/core) all scale
# with N — exactly what "N executors vs 4N executors" provides on a real
# cluster. Repeats each level REPS times and reports the best (least-noise)
# run. Usage: tools/scaling.sh [pages] [reps]
set -euo pipefail
cd "$(dirname "$0")/.."
PAGES=${1:-600000}
REPS=${2:-2}

run_level () { # cores
  local C=$1 best=""
  for _ in $(seq "$REPS"); do
    local out
    out=$(SPARK_GRAFT_PROC_COUNT=$C SPARK_DRIVER_MEM=${C}g \
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=$C \
      SPARK_GRAFT_BENCH_PAGES=$PAGES SPARK_GRAFT_QUERIES=off \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric.*}')
    local t
    t=$(echo "$out" | python3 -c 'import sys,json; print(json.load(sys.stdin)["queries"]["pipeline_e2e"])')
    echo "  cores=$C pipeline_e2e=${t}s  $out" >&2
    if [ -z "$best" ] || python3 -c "import sys; sys.exit(0 if $t < $best else 1)"; then best=$t; fi
  done
  echo "$best"
}

T8=$(run_level 8)
T32=$(run_level 32)
python3 - "$PAGES" "$T8" "$T32" <<'EOF'
import sys
pages, t8, t32 = int(sys.argv[1]), float(sys.argv[2]), float(sys.argv[3])
sp = t8 / t32
print(f'{{"metric":"scaling","pages":{pages},"t_local8_sec":{t8:.2f},"t_local32_sec":{t32:.2f},'
      f'"docs_per_sec_8":{pages/t8:.1f},"docs_per_sec_32":{pages/t32:.1f},'
      f'"speedup":{sp:.2f},"efficiency":{sp/4:.3f}}}')
EOF
