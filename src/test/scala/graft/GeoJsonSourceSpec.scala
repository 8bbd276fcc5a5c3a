package graft

import graft.sources.GeoJson
import java.nio.file.Files

class GeoJsonSourceSpec extends SparkSpec {

  private def tmpFile(name: String, content: String): String = {
    val dir = Files.createTempDirectory("geojson").toFile
    val f = new java.io.File(dir, name)
    Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }

  private val feature =
    """{"type": "Feature",
      | "properties": {"route_id": "R1", "local_authority": "Edinburgh", "route_type": "Cycle Lane"},
      | "geometry": {"type": "LineString", "coordinates": [[325000.0, 673000.0], [325300.0, 673400.0]]}}""".stripMargin

  test("reads a FeatureCollection") {
    val path = tmpFile("fc.json", s"""{"type": "FeatureCollection", "features": [$feature, $feature]}""")
    val df = GeoJson.read(spark, path)
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("route_id", "local_authority", "route_type", "geometry_type", "coordinates"))
    assert(df.select("geometry_type").distinct().collect().map(_.getString(0)).toSeq == Seq("LineString"))
  }

  test("reads a single Feature") {
    val path = tmpFile("single.json", feature)
    assert(GeoJson.read(spark, path).count() == 1)
  }

  test("reads a bare feature list") {
    val path = tmpFile("list.json", s"[$feature, $feature, $feature]")
    assert(GeoJson.read(spark, path).count() == 3)
  }

  test("ingest derives route length and lineage") {
    val path = tmpFile("fc2.json", s"""{"type": "FeatureCollection", "features": [$feature]}""")
    val row = GeoJson.ingest(spark, path).collect().head
    // segment (300, 400) → length 500 (3-4-5 triangle)
    assert(math.abs(row.getAs[Double]("route_length_m") - 500.0) < 1e-9)
    assert(row.getAs[String]("source_file") == "fc2.json")
  }

  private val multiFeature =
    """{"type": "Feature",
      | "properties": {"route_id": "R2", "local_authority": "Glasgow", "route_type": "Segregated"},
      | "geometry": {"type": "MultiLineString", "coordinates":
      |   [[[0.0, 0.0], [300.0, 400.0]], [[1000.0, 1000.0], [1000.0, 1600.0]]]}}""".stripMargin

  test("format(geojson) reads all three shapes via the DSv2 connector") {
    val fc = tmpFile("fc3.json", s"""{"type": "FeatureCollection", "features": [$feature, $multiFeature]}""")
    val single = tmpFile("single3.json", feature)
    val bare = tmpFile("bare3.json", s"[$feature, $feature, $feature]")
    assert(spark.read.format("geojson").load(fc).count() == 2)
    assert(spark.read.format("geojson").load(single).count() == 1)
    val df = spark.read.format("geojson").load(bare)
    assert(df.count() == 3)
    assert(df.schema.fieldNames.toSeq ==
      Seq("feature_idx", "geometry_type", "parts", "properties", "source_file"))
    val first = df.orderBy("feature_idx").collect().head
    assert(first.getAs[Map[String, String]]("properties")("local_authority") == "Edinburgh")
    assert(first.getAs[String]("source_file") == "bare3.json")
  }

  test("connector normalizes MultiLineString to parts; multiPartLength sums parts") {
    val fc = tmpFile("fc4.json", s"""{"type": "FeatureCollection", "features": [$feature, $multiFeature]}""")
    val df = GeoJson.multiPartLength(spark.read.format("geojson").load(fc))
    val byType = df.select("geometry_type", "route_length_m").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(byType("LineString") - 500.0) < 1e-9)
    // parts: 3-4-5 triangle (500) + vertical segment (600)
    assert(math.abs(byType("MultiLineString") - 1100.0) < 1e-9)
  }

  test("connector write path round-trips through the connector read path") {
    val fc = tmpFile("fc6.json", s"""{"type": "FeatureCollection", "features": [$feature, $multiFeature]}""")
    val outDir = java.nio.file.Files.createTempDirectory("gjw").toString + "/out"
    val df = spark.read.format("geojson").load(fc)
    df.write.format("geojson").mode("overwrite").save(outDir)
    // newline-delimited Feature files, no temp dir left behind
    assert(!new java.io.File(outDir, "_tmp").exists())
    val back = spark.read.format("geojson")
      .load(new java.io.File(outDir).listFiles().filter(_.getName.startsWith("part-"))
        .map(_.getAbsolutePath): _*)
    assert(back.count() == 2)
    val byType = back.collect().map(r =>
      r.getAs[String]("geometry_type") -> r.getAs[Map[String, String]]("properties")("route_id")).toMap
    assert(byType == Map("LineString" -> "R1", "MultiLineString" -> "R2"))
    // geometry survives structurally: multi-part lengths unchanged
    val len = graft.sources.GeoJson.multiPartLength(back)
      .select("geometry_type", "route_length_m").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(len("MultiLineString") - 1100.0) < 1e-9)
  }

  test("connector prunes columns and reads via a url option; http fails fast") {
    val fc = tmpFile("fc5.json", s"""{"type": "FeatureCollection", "features": [$feature]}""")
    val pruned = spark.read.format("geojson").load(fc).select("geometry_type")
    assert(pruned.collect().map(_.getString(0)).toSeq == Seq("LineString"))
    val viaUrl = spark.read.format("geojson").option("url", s"file://$fc").load()
    assert(viaUrl.count() == 1)
    val ex = intercept[Exception] {
      spark.read.format("geojson").option("url", "https://example.org/x.json").load().count()
    }
    assert(ex.getMessage.contains("no network egress") ||
      Option(ex.getCause).exists(_.getMessage.contains("no network egress")))
  }
}
