package graft.llm

import org.apache.spark.sql.functions._

/** Product-quantization invariants the oracle can't see: code shape
  * (every vector gets exactly M codes drawn from the live codebook) and
  * the Lloyd guarantee (total quantization error is non-increasing across
  * iterations — a wrong mean or a broken argmin both show up here). */
class PqSpec extends graft.SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every vector encodes to 8 codes from the live codebook") {
    val (sub, _, cents, codes) = Similarity.pqParts(spark, sf)
    val nVecs = sub.select("vec_id").distinct().count()
    assert(codes.count() === nVecs * 8)
    // every (m, cid) a vector references exists in the final codebook
    val orphans = codes.join(cents.select("m", "cid"), Seq("m", "cid"), "left_anti")
    assert(orphans.isEmpty, "codes reference centroids not in the codebook")
    // codes stay inside the seeded id range
    val range = codes.agg(min("cid"), max("cid")).head()
    assert(range.getLong(0) >= 0L && range.getLong(1) < 16L)
  }

  test("two Lloyd iterations do not increase total quantization error") {
    val (sub, seed, cents, codes) = Similarity.pqParts(spark, sf)
    def totalErr(assigned: org.apache.spark.sql.DataFrame): Double =
      assigned.agg(sum("dist")).head().getDouble(0)
    val err0 = totalErr(Similarity.pqAssign(sub, seed))
    val err2 = totalErr(codes)
    assert(err2 <= err0 + 1e-9,
      s"Lloyd increased quantization error: $err0 -> $err2")
    // and it strictly improves on this corpus (seeds are arbitrary vecs)
    assert(err2 < err0, s"refinement had no effect: $err0 -> $err2")
  }
}
