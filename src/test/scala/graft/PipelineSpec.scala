package graft

import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  test("full reference ETL: GeoJSON in, enriched GeoJSON + CSV out") {
    val dir = Files.createTempDirectory("pipeline").toString
    // Edinburgh-ish BNG coordinates
    val feature =
      """{"type": "Feature",
        | "properties": {"route_id": "R1", "local_authority": "Edinburgh", "route_type": "Cycle Lane"},
        | "geometry": {"type": "LineString", "coordinates": [[325940.0, 673060.0], [326240.0, 673460.0]]}}""".stripMargin
    val in = s"$dir/in.json"
    Files.writeString(java.nio.file.Paths.get(in),
      s"""{"type": "FeatureCollection", "features": [$feature]}""")

    val routes = Pipeline.processRoutes(spark, in)
    val row = routes.collect().head
    assert(math.abs(row.getAs[Double]("route_length_m") - 500.0) < 1e-9)
    assert(row.getAs[String]("os_gridref") == "NT 25940 73060")
    // NT 25940 73060 is central Edinburgh — sanity-band the WGS84 output
    // (exactness is proven against the OS worked example in the oracle gate)
    assert(math.abs(row.getAs[Double]("lat") - 55.95) < 0.05, row.getAs[Double]("lat"))
    assert(math.abs(row.getAs[Double]("lon") - -3.19) < 0.05, row.getAs[Double]("lon"))

    val (gj, csv) = Pipeline.run(spark, in, dir, "20240601_000000")
    val back = graft.sources.GeoJson.read(spark, gj)
    assert(back.count() == 1)
    assert(back.columns.contains("os_gridref"))
    val csvBack = spark.read.option("header", "true").csv(csv)
    assert(csvBack.count() == 1)
    assert(csvBack.columns.contains("geometry_wkt"))

    // the native-surface pipeline (DSv2 connector + graft_osgb expression +
    // multi-part length) must agree with the shared-SQL path exactly
    val native = Pipeline.processRoutesNative(spark, in).collect().head
    assert(math.abs(native.getAs[Double]("route_length_m") - 500.0) < 1e-9)
    assert(native.getAs[String]("os_gridref") == row.getAs[String]("os_gridref"))
    assert(native.getAs[Double]("lat") == row.getAs[Double]("lat"))
    assert(native.getAs[Double]("lon") == row.getAs[Double]("lon"))
  }
}
