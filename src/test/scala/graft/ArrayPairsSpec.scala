package graft

import org.apache.spark.sql.functions._

/** Pins `graft_pairs` (plans/ArrayPairs.scala) to the higher-order-function
  * pair generation it replaces in the basket/overlap queries: identical rows
  * in identical order for the strict-upper-triangle form and the
  * diagonal-inclusive form, over long and string element types, empty and
  * one-element arrays, and a null array — evaluated through real plans under
  * codegen (SparkSpec forbids the interpreted fallback).
  */
class ArrayPairsSpec extends SparkSpec {
  import spark.implicits._

  // the exact expressions the queries used before the native form
  private val hofStrict =
    "flatten(transform(a, (x, i) -> transform(slice(a, i + 2, size(a)), y -> struct(x AS u, y AS v))))"
  private val hofDiag =
    "flatten(transform(a, (x, i) -> transform(slice(a, i + 1, size(a)), y -> struct(x AS u, y AS v))))"

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    val native = df.select(col("id"), expr("graft_pairs(a)").as("p")).collect()
    val hof = df.select(col("id"), expr(hofStrict).as("p")).collect()
    assert(native.map(_.toString).toSeq == hof.map(_.toString).toSeq)
    val nativeD = df.select(col("id"), expr("graft_pairs(a, true)").as("p")).collect()
    val hofD = df.select(col("id"), expr(hofDiag).as("p")).collect()
    assert(nativeD.map(_.toString).toSeq == hofD.map(_.toString).toSeq)
  }

  test("long arrays: all sizes 0..8 match the higher-order form, both variants") {
    val rng = new scala.util.Random(7)
    val rows = (0 to 8).map(n => (n.toLong, (1 to n).map(_ => rng.nextLong(100)).toArray))
    check(rows.toDF("id", "a"))
  }

  test("string arrays match the higher-order form, both variants") {
    val rows = Seq(
      (1L, Array("src0", "src1", "src3")),
      (2L, Array("b")),
      (3L, Array.empty[String]),
      (4L, Array("x", "y")))
    check(rows.toDF("id", "a"))
  }

  test("null array yields null, like the higher-order form") {
    val df = Seq((1L, Some(Array(1L, 2L)), 0), (2L, None, 0))
      .toDF("id", "ao", "z")
      .select(col("id"), when(col("ao").isNotNull, col("ao")).as("a"))
    check(df)
  }

  test("field names and types are u, v of the element type") {
    val df = Seq((1L, Array(3L, 5L, 9L))).toDF("id", "a")
      .select(explode(expr("graft_pairs(a)")).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("u", "bigint"), ("v", "bigint")))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((3L, 5L), (3L, 9L), (5L, 9L)))
  }
}
