package graft

import graft.functions.{Geom, ZOrder}
import org.apache.spark.sql.functions._

/** Z-order clustering is a LAYOUT optimization: writing the table
  * range-partitioned + sorted by the Morton code must shrink every file's
  * spatial bounding box, which is exactly what lets parquet min/max stats
  * prune a bbox scan. The spec measures the per-file extent directly.
  */
class ZOrderSpec extends SparkSpec {

  test("morton code interleaves bits (known values)") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L), (3L, 5L))
      .toDF("x", "y")
      .select(ZOrder.morton(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave(x even bits, y odd bits): (3,5) = x:11, y:101 -> 100111 = 39
    assert(got == Seq(0L, 1L, 2L, 1431655765L, 2863311530L, 39L))
  }

  test("graft_morton SQL function matches the Column composition") {
    val r = spark.sql(
      "SELECT graft_morton(3L, 5L), graft_morton(65535L, 0L), graft_morton(0L, 65535L)")
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((39L, 1431655765L, 2863311530L)))
  }

  test("z-sorted layout shrinks per-file spatial extent vs key order") {
    val pts = Tables.lineitem(spark, sf("sf0.01"))
      .select(Geom.e1.as("e"), Geom.n1.as("n"))
      .withColumn("z", ZOrder.morton(expr("e div 16"), expr("n div 16")))

    def meanFileExtent(writeDir: String): Double = {
      val perFile = spark.read.parquet(writeDir)
        .groupBy(input_file_name())
        .agg(((max(col("e")) - min(col("e"))).cast("double") *
          (max(col("n")) - min(col("n"))).cast("double")).as("area"))
      val r = perFile.agg(avg(col("area")), count(lit(1))).head()
      assert(r.getLong(1) >= 4, s"need >=4 files to compare layouts, got ${r.getLong(1)}")
      r.getDouble(0)
    }

    val base = Files.tmp("zorder")
    // key-ordered layout: spatially random within every file
    pts.repartition(16).write.parquet(s"$base/plain")
    // z-clustered layout: range-partition + sort by the morton code
    pts.repartitionByRange(16, col("z")).sortWithinPartitions("z")
      .write.parquet(s"$base/zsorted")

    val plain = meanFileExtent(s"$base/plain")
    val zsorted = meanFileExtent(s"$base/zsorted")
    // the curve has seams, so per-file shrinkage is below the 1/files ideal;
    // 3x mean-extent reduction is the conservative locality bar
    assert(zsorted * 3 < plain,
      f"z-layout must shrink mean per-file bbox area >=3x: plain=$plain%.3g z=$zsorted%.3g")
  }
}

private object Files {
  def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
