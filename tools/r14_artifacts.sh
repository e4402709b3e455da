#!/bin/bash
# Round-14 artifact pipeline: run AFTER the test suite is green.
# Sequential on purpose — each stage is timing-sensitive or CPU-bound.
set -euo pipefail
cd /root/repo

echo "=== [1/7] chaos duel artifact ==="
sbt -batch "runMain graft.streaming.ChaosDuel 3 9 14 CHAOS_r14.json" 2>&1 | grep chaos_fence_duel || true

echo "=== [2/7] ANN build soak w/ serve breakdown (5M vectors) ==="
SPARK_GRAFT_ANNSOAK_OUT=BENCH_r14_annsoak.json SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.AnnBuildSoak 5000000" 2>&1 | grep ann_build_soak || true

echo "=== [3/7] unified recall corpora + recall artifact ==="
sbt -batch "runMain graft.RecallGen" 2>&1 | grep recallgen || true
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Recall RECALL_r14.json /root/testdata/sf0.01 /root/testdata/sf0.1 testdata-local/sf1 recall-local/u0.01 recall-local/u0.1 recall-local/u1" 2>&1 | tail -3

echo "=== [4/7] verify gate at sf0.01 (164 queries) ==="
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v14_sf001" 2>&1 | grep -E '\[verify\]' || true
python3 tools/check.py /tmp/v14_sf001 /root/testdata/sf0.01 --cache --json=CORRECTNESS_r14_sf0.01.json | tail -3

echo "=== [5/7] verify gate at local[5] ==="
SPARK_GRAFT_CPUS=5 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v14_local5" 2>&1 | grep -E '\[verify\]' || true
python3 tools/check.py /tmp/v14_local5 /root/testdata/sf0.01 --cache --json=CORRECTNESS_r14_local5.json | tail -3

echo "=== [6/7] verify gate at sf0.1 ==="
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v14_sf01" 2>&1 | grep -E '\[verify\]' || true
python3 tools/check.py /tmp/v14_sf01 /root/testdata/sf0.1 --cache --json=CORRECTNESS_r14_sf0.1.json | tail -3

echo "=== [7/7] verify gate at sf1 ==="
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify testdata-local/sf1 /tmp/v14_sf1" 2>&1 | grep -E '\[verify\]' || true
python3 tools/check.py /tmp/v14_sf1 testdata-local/sf1 --cache --timeout-sec=3000 --json=CORRECTNESS_r14_sf1.json | tail -3

echo "=== r14 artifact pipeline DONE ==="
