package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The reference's three sinks, as DataFrameWriter plans.
  *
  * All of them are distributed writes (per-partition part files); none of them
  * collect. Timestamped filenames mirror process_cycle_networks.py:139-153 but
  * the timestamp is an explicit argument — deterministic pipelines should not
  * read the clock inside the plan.
  */
object Sinks {

  /** GeoJSON sink (newline-delimited Features — the distributed-friendly
    * GeoJSON form) with a timestamped directory name, mirroring
    * process_cycle_networks.py:139-144. Expects `geometry_type`,
    * `coordinates`, and the property columns to keep.
    */
  def writeGeoJson(df: DataFrame, outDir: String, baseName: String, timestamp: String,
                   propCols: Seq[String]): String = {
    val path = s"$outDir/${baseName}_$timestamp.geojson"
    val feature = to_json(struct(
      lit("Feature").as("type"),
      struct(col("geometry_type").as("type"), col("coordinates")).as("geometry"),
      struct(propCols.map(col): _*).as("properties")))
    df.select(feature.as("value")).write.mode(SaveMode.Overwrite).text(path)
    path
  }

  /** CSV sink with a WKT geometry column, mirroring
    * process_cycle_networks.py:146-153 (geometry dropped, `geometry_wkt`
    * kept). Caller provides the WKT column (see functions/Wkt.scala).
    */
  def writeCsvWkt(df: DataFrame, outDir: String, baseName: String, timestamp: String,
                  wkt: Column): String = {
    val path = s"$outDir/${baseName}_$timestamp.csv"
    df.withColumn("geometry_wkt", wkt)
      .drop("coordinates", "geometry_type")
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    path
  }

  /** Batched relational-style sink — db_helpers.py:140-210's
    * batch_size=64000 + drop/create/append table modes, re-expressed as
    * writer options: `maxRecordsPerFile` is the batch, SaveMode is the table
    * mode. On a real warehouse target the same shape feeds a JDBC writer with
    * `batchsize`; parquet keeps the harness hermetic.
    */
  def writeBatched(df: DataFrame, path: String, mode: String,
                   batchSize: Int = 64000): Unit = {
    val saveMode = mode match {
      case "drop"   => SaveMode.Overwrite
      case "create" => SaveMode.ErrorIfExists
      case "append" => SaveMode.Append
      case m        => throw new IllegalArgumentException(s"unknown mode: $m")
    }
    df.write.option("maxRecordsPerFile", batchSize.toLong).mode(saveMode).parquet(path)
  }
}
