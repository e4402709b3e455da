#!/bin/bash
# Paired interleaved A/B bench at sf5 (r14 VERDICT item 1): the r14
# sf5 total moved 62.1 -> 80.6 s (+30%) on a regenerated tier, with
# `agg_group` 1.79 -> 3.44 s at tight MADs — attribute it to code,
# layout, or environment with the same paired protocol that settled
# the r13 drift. A/B/A/B pairs in ONE session, warm page cache:
# environment drift cancels out of the pairwise delta; a code
# regression shows up as a one-sided paired delta.
#
# Usage: tools/ab_sf5.sh [pairs] [sf-dir] [refA] [refB]
set -euo pipefail
REPO=/root/repo
AB=$REPO/.ab5
SF=${2:-$REPO/testdata-local5/sf5}
PAIRS=${1:-4}
REF_A=${3:-72cd8f6}   # r13 HEAD
REF_B=${4:-2ad34ce}   # r14 HEAD

mkdir -p "$AB"
[ -d "$AB/ra" ] || git -C "$REPO" worktree add "$AB/ra" "$REF_A"
[ -d "$AB/rb" ] || git -C "$REPO" worktree add "$AB/rb" "$REF_B"

for d in ra rb; do
  echo "[ab5] compiling $d ..."
  (cd "$AB/$d" && sbt -batch compile >"/tmp/ab5_compile_$d.log" 2>&1)
done

# warm the page cache once for both sides
find "$SF" -type f -exec cat {} + >/dev/null || true

rm -f /tmp/ab5_ra.jsonl /tmp/ab5_rb.jsonl
for i in $(seq 1 "$PAIRS"); do
  for d in ra rb; do
    echo "[ab5] pair $i side $d $(date +%H:%M:%S)"
    (cd "$AB/$d" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
       sbt -batch "runMain graft.Bench" 2>/dev/null \
       | grep '"metric"' >>"/tmp/ab5_$d.jsonl")
    cp "$AB/$d/BENCH_DETAIL.json" "/tmp/ab5_detail_${d}_$i.json"
  done
done
echo "[ab5] done: /tmp/ab5_ra.jsonl /tmp/ab5_rb.jsonl + per-pair details"
python3 "$REPO/tools/ab_analyze.py" /tmp/ab5_ra.jsonl /tmp/ab5_rb.jsonl \
  "$REPO/AB_SF5_r15.json" \
  "interleaved A/B/A/B at sf5, one session, warm cache, r13 HEAD ($REF_A) vs r14 HEAD ($REF_B), current (r14-regenerated) tier"
