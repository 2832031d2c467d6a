"""Round-11 operators and lifecycle fixes: result-tied setsim
checkpoint lifetime, perceptual image near-dup (dHash + banded
Hamming), and the longest-repeat length profile."""

from pyspark.sql import functions as F

from smile_spark.tables import table
from smile_spark.testing import assert_matches_oracle

SF001 = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# setsim checkpoint lifetime is tied to the returned frame
# ---------------------------------------------------------------------------


def test_setsim_two_live_frames_are_safe(spark, sf_dir):
    """Two setsim frames built BEFORE either is consumed must both
    evaluate correctly: under the r10 released-at-next-call design the
    second construction freed the first frame's localCheckpoint blocks
    (lineage truncated — unrecoverable), so this ordering failed with
    missing-block errors (ADVICE r10 medium).  Lifetime is now a
    weakref finalizer on each returned frame."""
    from smile_spark.operators.dedup import setsim_join_frame

    docs = table(spark, sf_dir, "documents")
    first = setsim_join_frame(docs, hash_tokens=True)
    second = setsim_join_frame(docs, hash_tokens=False)
    # consume in construction order (first's blocks must have survived
    # second's construction), then re-read first AFTER second's full
    # evaluation — both directions of the old hazard.
    n1 = first.count()
    n2 = second.count()
    assert n1 == n2 > 0
    assert first.count() == n1


def test_setsim_finalizer_releases_blocks(spark, sf_dir):
    """Dropping the last reference to a setsim frame must release its
    checkpointed RDD blocks (the bench-blowup guard: 5-7 back-to-back
    runs leaked gigabytes before the hand-off existed)."""
    import gc

    from smile_spark.operators.dedup import setsim_join_frame

    jsc = spark.sparkContext._jsc.sc()

    def n_persistent() -> int:
        return jsc.getPersistentRDDs().size()

    docs = table(spark, sf_dir, "documents")
    frame = setsim_join_frame(docs, hash_tokens=True)
    frame.count()
    during = n_persistent()
    assert during > 0  # the checkpoint stages are registered
    del frame
    gc.collect()
    assert n_persistent() < during
