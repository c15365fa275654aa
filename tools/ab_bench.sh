#!/bin/bash
# Controlled A/B of the r4 tree (git worktree at bbab0a8, .ab_r4/) vs
# HEAD, per VERDICT r5 #1: same session-series, interleaved runs so
# machine drift hits both arms equally. Both arms run the IDENTICAL
# bench.py harness (HEAD's, copied into the worktree) — only the
# ecollector_spark library differs. Scale probe off (not part of the
# timing signal). Output: one JSON line per run appended to
# AB_BENCH.jsonl with an "arm" field.
set -u
cd "$(dirname "$0")/.."
OUT=AB_BENCH.jsonl
: > "$OUT"
N=${1:-5}
export SPARK_GRAFT_SCALE_PROBE=0
export SPARK_GRAFT_BENCH_RUNS=3
for i in $(seq 1 "$N"); do
  for arm in head r4; do
    if [ "$arm" = head ]; then dir=.; else dir=.ab_r4; fi
    line=$(cd "$dir" && SPARK_GRAFT_BENCH_DETAIL=/tmp/ab_detail.json \
        python bench.py 2>/dev/null | tail -1)
    echo "{\"arm\": \"$arm\", \"iter\": $i, \"run\": $line}" >> "$OUT"
    echo "done arm=$arm iter=$i" >&2
  done
done
echo "A/B complete: $N interleaved iterations" >&2
