"""Property pin for dedup_incremental: a pure-Python reference model
(same md5 shingle/slice/band construction, naive loops) must agree with
the distributed plan on random corpora — covering the edge shapes the
planted gate corpus can't (empty texts, single-token docs, batches that
are all duplicates, near-collisions between batch and history)."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ecollector_spark.datapipe import dedup

K = 3
NUM_HASHES = 8
BANDS = 4


def _tokens(text):
    return [t for t in text.split() if t]


def _shingles(text):
    toks = _tokens(text)
    return {" ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)}


def _sig(text):
    sh = _shingles(text)
    if not sh:
        return None
    hs = [hashlib.md5(s.encode()).hexdigest() for s in sh]
    return tuple(min(h[4 * i : 4 * i + 4] for h in hs) for i in range(NUM_HASHES))


def _bands(sig):
    rows = NUM_HASHES // BANDS
    return {(b, "".join(sig[b * rows + r] for r in range(rows))) for b in range(BANDS)}


def _model(old_docs, new_docs):
    seen_hashes = {hashlib.md5(t.encode()).hexdigest() for _, t in old_docs}
    old_sigs = {i: _sig(t) for i, t in old_docs}
    new_sigs = {i: _sig(t) for i, t in new_docs}
    expected = {}
    hash_keeper = {}
    for i, t in sorted(new_docs):
        h = hashlib.md5(t.encode()).hexdigest()
        hash_keeper.setdefault(h, i)
    for i, t in new_docs:
        h = hashlib.md5(t.encode()).hexdigest()
        if h in seen_hashes:
            expected[i] = ("dup_exact_seen", None)
            continue
        if hash_keeper[h] != i:
            expected[i] = ("dup_exact_batch", None)
            continue
        sig = _sig(t)
        match = None
        batch_match = None
        if sig is not None:
            bs = _bands(sig)
            for j, osig in sorted(old_sigs.items()):
                if osig is None or not (bs & _bands(osig)):
                    continue
                agree = sum(a == b for a, b in zip(sig, osig))
                if agree >= NUM_HASHES // 2 and (match is None or j < match):
                    match = j
            # in-batch: any SMALLER-id partner that band-collides and
            # agrees drops this doc (pairwise min keeper — the model of
            # the dup_near_batch status added with the r5 advice fix)
            for j, nsig in sorted(new_sigs.items()):
                if j >= i or nsig is None or not (bs & _bands(nsig)):
                    continue
                agree = sum(a == b for a, b in zip(sig, nsig))
                if agree >= NUM_HASHES // 2:
                    batch_match = j
                    break
        if match is not None:
            expected[i] = ("dup_near_seen", match)
        elif batch_match is not None:
            expected[i] = ("dup_near_batch", None)
        else:
            expected[i] = ("kept", None)
    return expected


_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@pytest.mark.slow
@settings(max_examples=12, deadline=None)
@given(
    old=st.lists(_text, min_size=1, max_size=6),
    new=st.lists(_text, min_size=1, max_size=8),
)
def test_incremental_matches_model(spark, old, new):
    old_docs = [(i, t) for i, t in enumerate(old)]
    new_docs = [(100 + i, t) for i, t in enumerate(new)]
    old_df = spark.createDataFrame(old_docs, "doc_id long, text string")
    new_df = spark.createDataFrame(new_docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["status"], r["matched_seen"])
        for r in dedup.dedup_incremental(
            new_df, dedup.exact_manifest(old_df), dedup.minhash_signatures(old_df)
        ).collect()
    }
    assert got == _model(old_docs, new_docs)
