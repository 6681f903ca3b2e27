package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The IVF build-once / probe-many contract: writing the index artifacts
  * (centroids + inverted lists) to parquet and probing from the RELOADED
  * tables must reproduce the in-plan sim_ivf output row-for-row, and the
  * probe must touch only the probed lists (cid partition pruning). */
class IvfPersistSpec extends graft.SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("probe from stored artifacts == in-plan sim_ivf, row for row") {
    val dir = Files.createTempDirectory("ivf").toString
    val (cents, inv) = Similarity.ivfArtifacts(spark, sf, nlist = 16)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    inv.write.mode("overwrite").partitionBy("cid").parquet(s"$dir/invlists")

    val queries = graft.Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") < 20)
    val fromDisk = Similarity.ivfProbe(
        queries,
        spark.read.parquet(s"$dir/centroids"),
        spark.read.parquet(s"$dir/invlists"))
      .collect().map(_.toString).toSeq

    val inPlan = graft.SparkEntry.queries("sim_ivf")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(fromDisk.nonEmpty)
    assert(fromDisk === inPlan, "stored-index probe diverged from in-plan IVF")
  }

  test("probing a stored index prunes the inverted-list scan to the probed cids") {
    val dir = Files.createTempDirectory("ivf2").toString
    val (cents, inv) = Similarity.ivfArtifacts(spark, sf, nlist = 16)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    inv.write.mode("overwrite").partitionBy("cid").parquet(s"$dir/invlists")

    // one query vector, nprobe=2 of 16 lists → the scan must carry a
    // partition filter on cid (not read all 16 partitions)
    val one = graft.Tables.t(spark, sf, "embeddings").filter(col("vec_id") === 3)
    val probed = Similarity.ivfProbe(one,
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/invlists"), nprobe = 2)
    probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cid"),
      s"inverted-list scan is not partition-pruned by cid:\n$plan")
  }
}
