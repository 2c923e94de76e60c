package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class LoadTableSpec extends SparkSpec {

  test("compact shrinks a many-file table without changing its contents") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft_compact").toString + "/t"
    val df = (1L to 10000L).map(i => (i, s"v$i", i * 1.5)).toDF("id", "v", "w")
    df.repartition(50).write.parquet(base)
    def parquetFiles = new java.io.File(base).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles == 50)
    val before = spark.read.parquet(base)
      .agg(count(lit(1)), sum(col("id")), sum(col("w"))).collect()(0)

    LoadTable.compact(spark, base, df.schema, targetRowsPerFile = 4000L)

    assert(parquetFiles == 3, s"expected ceil(10000/4000)=3 files, got $parquetFiles")
    val after = spark.read.parquet(base)
      .agg(count(lit(1)), sum(col("id")), sum(col("w"))).collect()(0)
    assert(after == before)
    // staging/old trees are gone
    assert(!new java.io.File(base + "_compact_staging").exists())
    assert(!new java.io.File(base + "_compact_old").exists())
  }
}
