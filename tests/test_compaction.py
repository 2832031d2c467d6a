"""Compaction: many small files → few target-sized files, losslessly."""

from smile_spark.sources.compaction import compact, dir_bytes
from smile_spark.tables import table


def _parquet_files(path):
    import glob

    return [f for f in glob.glob(f"{path}/*.parquet") if "_" not in f.rsplit("/", 1)[1][:1]]


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "lineitem")
    fragmented = str(tmp_path / "fragmented")
    compacted = str(tmp_path / "compacted")

    # simulate streaming debris: 64 tiny files
    src.repartition(64).write.parquet(fragmented)
    assert len(_parquet_files(fragmented)) == 64

    total = dir_bytes(spark, fragmented)
    # pick a target that should land on ~4 files for this fixture
    n = compact(spark, fragmented, compacted, target_file_bytes=total // 4 + 1)
    assert n == 4
    assert len(_parquet_files(compacted)) == 4

    # lossless
    back = spark.read.parquet(compacted)
    assert back.exceptAll(src).isEmpty()
    assert src.exceptAll(back).isEmpty()
