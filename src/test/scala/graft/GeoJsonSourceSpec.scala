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
}
