"""Round-12 lock for the localCheckpoint block release (ADVICE r11): the
old ``df.rdd.unpersist(False)`` acted on a freshly derived javaToPython
RDD at storage level NONE — a silent no-op that let superseded
rank-cut / fixpoint-label generations accumulate in executor storage
until JVM ContextCleaner GC.  ``free_ckpt_blocks`` releases the
LogicalRDD's actual backing RDD; these tests pin both facts so a
regression to the no-op form fails loudly."""


def _storage_ids(spark) -> set:
    sc = spark.sparkContext._jsc.sc()
    return {r.id() for r in sc.getRDDStorageInfo()}


class TestFreeCkptBlocks:
    def test_derived_rdd_unpersist_is_a_noop(self, spark):
        """The failure mode the fix replaces, locked as documentation:
        unpersisting df.rdd leaves the checkpoint blocks pinned."""
        before = _storage_ids(spark)
        cut = (spark.range(2000).selectExpr("id", "id * 2 as x")
               .localCheckpoint(eager=True))
        pinned = _storage_ids(spark) - before
        assert pinned, "eager localCheckpoint pinned no blocks"
        cut.rdd.unpersist(False)
        assert pinned <= _storage_ids(spark), \
            "df.rdd.unpersist freed the blocks — drop free_ckpt_blocks"

    def test_free_ckpt_blocks_frees_direct_checkpoint(self, spark):
        from waimak_spark.functions.util import free_ckpt_blocks

        before = _storage_ids(spark)
        cut = (spark.range(2000).selectExpr("id", "id * 3 as x")
               .localCheckpoint(eager=True))
        pinned = _storage_ids(spark) - before
        assert pinned
        free_ckpt_blocks(cut)
        assert not pinned & _storage_ids(spark)

    def test_free_ckpt_blocks_frees_through_narrow_op(self, spark):
        """The fixpoint loop frees a checkpointed edge frame AFTER a
        coalesce() — the walk must find the LogicalRDD under the
        narrow op."""
        from waimak_spark.functions.util import free_ckpt_blocks

        before = _storage_ids(spark)
        cut = (spark.range(2000).selectExpr("id", "id * 5 as x")
               .localCheckpoint(eager=True).coalesce(2))
        pinned = _storage_ids(spark) - before
        assert pinned
        free_ckpt_blocks(cut)
        assert not pinned & _storage_ids(spark)
