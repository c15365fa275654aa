#!/bin/bash
# r6 (VERDICT r5 #7): push the three most expensive headliners to the
# 1000x rung — 100M events for the transform, 58M plain-replicated docs
# for curation, 58M salted docs for the pair-emitting minhash dedup.
# Each probe measures 100x AND 1000x in one session so the top-decade
# exponent is same-session, then merges into HEADLINE_SCALE.json.
set -ue
cd "$(dirname "$0")/.."
python tools/ts_scale_probe.py --headline --merge --runs 1 --mults 100,1000 \
    --tables events documents \
    --queries fimp_transform_pipeline datapipe_curation 2>&1 \
  | grep -v "WARN\|^26/" || true
# the pair-emitting minhash at 1000x needs heap proportional to the
# 32-way task parallelism (8g died in a GCLocker spiral in stage 77 —
# 32 concurrent shingle/minhash builds on one heap); a real cluster
# scales aggregate memory with cores, so the probe does too
SPARK_GRAFT_DRIVER_MEM=48g \
python tools/ts_scale_probe.py --headline --salt-docs --merge --runs 1 --mults 100,1000 \
    --out HEADLINE_SCALE_SALTED_1000X.json \
    --queries dedup_minhash_lsh 2>&1 \
  | grep -v "WARN\|^26/" || true
echo "1000x probes done"
