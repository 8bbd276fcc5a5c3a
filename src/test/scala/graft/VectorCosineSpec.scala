package graft

import graft.functions.VecFns
import org.apache.spark.sql.functions._

class VectorCosineSpec extends SparkSpec {

  test("graft_cosine is registered by the session extension") {
    assert(spark.catalog.functionExists("graft_cosine"))
  }

  test("native expression is bit-identical to the HOF formulation") {
    val e = Tables.embeddings(spark, sf())
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(e.limit(3).select(col("vec_id").as("b_id"), col("embedding").as("ce"))))
    val both = pairs.select(
      expr("graft_cosine(qe, ce)").as("native"),
      (VecFns.dot(col("qe"), col("ce")) / (VecFns.norm(col("qe")) * VecFns.norm(col("ce")))).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("native expression survives codegen on self-similarity") {
    val e = Tables.embeddings(spark, sf())
    val selfSim = e.select(expr("graft_cosine(embedding, embedding)").as("s"))
      .agg(min("s"), max("s")).head()
    assert(math.abs(selfSim.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(selfSim.getDouble(1) - 1.0) < 1e-12)
  }
}
