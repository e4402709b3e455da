#!/bin/bash
# Targeted sf5 verification of everything round 14 BEHAVIORALLY touched:
# the 9 new SQL-surface entries plus every query riding PartitionedTable
# commits or writer leases (the schema-union fix and the released-
# tombstone lease change). The r13 full sf5 sweep (155/155, zero
# exclusions) covers the untouched kernels; re-paying its ~2h DuckDB
# ground-truth for unchanged code is what the oracle cache exists to
# avoid — the cache is keyed on (name, SQL, input fingerprint), so the
# NEXT full sweep over this same testdata-local5 generation is warm.
set -uo pipefail
cd /root/repo
Q="sql_readme_1,sql_readme_2,sql_readme_3,sql_readme_4,sql_map_contains,sql_lookup_like,sql_envelope_join,sql_area_filter,sql_bbox_auto,\
sink_insert,sink_upsert,sink_time_travel,sink_change_feed,\
stream_single_writer,stream_failure_isolation,stream_microbatch,stream_source_v2,stream_table_txn,stream_upsert_sink,stream_change_feed,\
dedup_incremental,dedup_incremental_bucketed,stream_dedup_admission,stream_dedup_maintain,\
stream_ann_serve,stream_ann_maintain,stream_bm25_serve,stream_bm25_maintain,\
dedup_substring_incremental,dedup_substring_bucketed,text_bm25_bucketed,\
sim_ivf_int8_bucketed,sim_ivf_pq_bucketed,dedup_minhash_lsh_bucketed,join_bucketed"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify testdata-local5/sf5 /tmp/v14_sf5c $Q" 2>&1 | grep -E '\[verify\]' || true
python3 tools/check.py /tmp/v14_sf5c testdata-local5/sf5 --cache --timeout-sec=3000 --json=CORRECTNESS_r14_sf5_changed.json | tail -4
