ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "transitscrapespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32 concurrent local tasks over 60+ registered queries accumulate
  // broadcast/checkpoint blocks faster than an 8g heap turns them over;
  // the box has 128 GiB, so size the single-JVM "cluster" like one.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++
  // dev A/B knob for JVM/GC experiments (the driver never sets it): e.g.
  // SPARK_GRAFT_JVM_OPTS="-XX:+UseParallelGC" sbt "runMain graft.Bench"
  sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
    .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)

// graft.Bench runs forked, so sbt re-logs its stdout with an "[info] "
// prefix and prints its own "[success] Total time …" footer LAST — a
// harness that parses the final stdout line for the bench's compact JSON
// never sees it. Bench persists that line to BENCH_SELF.json; this hook in
// the SBT JVM re-prints it un-prefixed at JVM exit — i.e. after the footer
// — so the last line of the whole process's stdout is the bare JSON record.
// Freshness-gated to this sbt invocation so compile/test runs stay silent,
// and property-gated so `reload` doesn't stack duplicate hooks.
Global / onLoad := {
  val prev = (Global / onLoad).value
  if (System.getProperty("graft.benchTailHook") == null) {
    System.setProperty("graft.benchTailHook", "1")
    val t0 = System.currentTimeMillis()
    java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val f = new java.io.File("BENCH_SELF.json")
      if (f.exists && f.lastModified >= t0) {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try { System.out.println(src.mkString.trim); System.out.flush() }
        finally src.close()
        // consume the record: a later dev-subset/NOAQE run in the SAME sbt
        // session deliberately skips the write, and without this delete the
        // hook would re-print the EARLIER full run's line as the process's
        // final stdout — attributing stale numbers to the wrong run.
        f.delete()
      }
    }))
  }
  prev
}
