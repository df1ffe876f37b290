package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.core.Checkpoints

/** Proves the `spark.graft.cluster-safe` switch (round-13): with the flag
  * on, every lineage truncation in the memos and iterative loops routes
  * through RELIABLE `checkpoint()` (executor-loss-safe blocks in the
  * checkpoint dir) instead of `localCheckpoint()`, and every consumer
  * produces bit-identical results in both modes. The default stays
  * localCheckpoint (correct for local[n] and the bench). */
class ClusterSafeSpec extends AnyFunSuite {
  val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf0001

  private def clearAllMemos(): Unit = {
    Dedup.clearPairCache()
    Resolution.clearMatchCache()
    Classifier.clearModelCache()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  /** Runs `body` with cluster-safe on and a temp checkpoint dir; clears
    * the session memos on both sides so each mode derives from scratch,
    * restores the prior checkpoint dir (the session is suite-shared), and
    * deletes the temp checkpoint files. */
  private def inClusterSafe[T](body: String => T): T = {
    val prior = spark.sparkContext.getCheckpointDir
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Checkpoints.ConfKey, "true")
    clearAllMemos()
    try body(dir)
    finally {
      spark.conf.unset(Checkpoints.ConfKey)
      clearAllMemos()
      prior.foreach(spark.sparkContext.setCheckpointDir)
      deleteRecursively(new java.io.File(dir))
    }
  }

  // NOTE: runs first (declaration order) — later tests set a checkpoint
  // dir on the shared context, after which the require can't fire.
  test("cluster-safe without a checkpoint dir fails loudly, not silently") {
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      spark.conf.set(Checkpoints.ConfKey, "true")
      try {
        val e = intercept[IllegalArgumentException] {
          Checkpoints.truncate(spark.range(3).toDF("id"))
        }
        assert(e.getMessage.contains("setCheckpointDir"))
      } finally spark.conf.unset(Checkpoints.ConfKey)
    } // else: another suite already set one; the routing tests below still run
  }

  test("truncate routes to reliable checkpoint files only when the flag is on") {
    inClusterSafe { dir =>
      val t = Checkpoints.truncate(spark.range(10).toDF("id"))
      assert(t.count() == 10)
      // reliable checkpoints materialize as files under the checkpoint dir
      def files(d: java.io.File): Seq[java.io.File] = {
        val k = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
        k.filter(_.isFile) ++ k.filter(_.isDirectory).flatMap(files)
      }
      assert(files(new java.io.File(dir)).nonEmpty,
        "cluster-safe truncate left no files in the checkpoint dir")
    }
    // default mode: same call leaves the checkpoint dir untouched
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ckpt2").toString
    spark.sparkContext.setCheckpointDir(dir2)
    try {
      val t2 = Checkpoints.truncate(spark.range(10).toDF("id"))
      assert(t2.count() == 10)
      assert(Option(new java.io.File(dir2).listFiles()).forall(
        _.forall(f => Option(f.listFiles()).forall(_.isEmpty))),
        "default-mode truncate wrote reliable checkpoint files")
    } finally deleteRecursively(new java.io.File(dir2))
  }

  test("memo consumers are bit-identical across modes (dd05/er02/cl03)") {
    def snapshot(): Map[String, Set[String]] = Map(
      "dd05" -> Dedup.dupClusters(spark, sf).collect().map(_.toString).toSet,
      "er02" -> Resolution.fuzzyClustersQuery(spark, sf).collect().map(_.toString).toSet,
      "cl03" -> Classifier.knnClassifierQuery(spark, sf).collect().map(_.toString).toSet,
      // gr04's k-core peel truncates its edge frame EVERY round — the
      // loop-heavy consumer of the switch
      "gr04" -> Graph.kcoreQuery(spark, sf).collect().map(_.toString).toSet)
    clearAllMemos()
    val base = snapshot()
    assert(base.values.forall(_.nonEmpty))
    val safe = inClusterSafe { _ => snapshot() }
    assert(safe == base, "cluster-safe mode changed a memo consumer's result")
  }

  test("distributed label/rank loops are mode-identical on a seeded graph") {
    import spark.implicits._
    // two components: a 6-chain (diameter > 1 iteration) and a triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("doc_a", "doc_b")
    val local = Dedup.localLabels(spark, pairs).collect().map(_.toString).toSet
    val safeLabels = inClusterSafe { _ =>
      Dedup.distributedLabels(pairs).collect().map(_.toString).toSet
    }
    assert(safeLabels == local)
    val defaultRanks = Graph.distributedRanks(pairs, iters = 3)
      .collect().map(_.toString).toSet
    val safeRanks = inClusterSafe { _ =>
      Graph.distributedRanks(pairs, iters = 3).collect().map(_.toString).toSet
    }
    assert(safeRanks == defaultRanks && safeRanks.nonEmpty)
  }
}
