package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}

object SparkSpec {
  lazy val session: SparkSession = SparkEntry.tune(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // a Janino compile failure in generated code must FAIL the suite, not
      // silently fall back to the interpreted path — otherwise a broken
      // doGenCode/doConsume ships while every plan-string assertion stays
      // green against the fallback execution
      .config("spark.sql.codegen.fallback", "false")
      .appName("graft-test")
      .getOrCreate())
}
