package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink format coverage beyond parquet + the GeoJSON connector: ORC,
  * JSON-lines and CSV round-trips must preserve the documents relation
  * row-for-row. Each format goes through its own writer AND reader (not a
  * copy), so schema mapping, quoting/escaping (CSV), and nested encoding
  * (JSON) are all exercised. CSV needs explicit quoting options and a
  * re-applied schema — string-typed by nature; the spec pins that the
  * library's recommended option set survives embedded delimiters.
  */
class FormatsSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"fmt_$name").toString + "/out"

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().toSeq

  test("ORC round-trip preserves the documents relation exactly") {
    val docs = Tables.documents(spark, sf())
    val path = tmp("orc")
    docs.write.orc(path)
    assert(canon(spark.read.orc(path)) == canon(docs))
  }

  test("JSON-lines round-trip preserves rows (schema re-applied on read)") {
    val docs = Tables.documents(spark, sf())
    val path = tmp("json")
    docs.write.json(path)
    val back = spark.read.schema(docs.schema).json(path)
    assert(canon(back) == canon(docs))
  }

  test("CSV round-trip survives embedded delimiters and quotes") {
    val docs = Tables.documents(spark, sf())
      // make the escaping path load-bearing: inject delimiters + quotes
      .withColumn("text", concat(col("text"), lit(""", "quoted,comma" end""")))
    val path = tmp("csv")
    docs.write.option("header", "true").option("quoteAll", "true").csv(path)
    val back = spark.read.option("header", "true").schema(docs.schema).csv(path)
    assert(canon(back) == canon(docs))
  }
}
