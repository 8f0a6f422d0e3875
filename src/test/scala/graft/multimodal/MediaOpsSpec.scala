package graft.multimodal

import graft.ann.Ann
import graft.spark.SparkTestBase
import org.apache.spark.sql.functions._

/** Multimodal plumbing tests: binary schema survives parquet, batched
  * feature extraction is deterministic and partitioning-invariant, frame
  * sampling honors metadata, features feed the ANN operators.
  */
class MediaOpsSpec extends SparkTestBase {

  test("binary media columns roundtrip through parquet with typed metadata") {
    val s = spark
    import s.implicits._
    val docs = MediaOps.syntheticMedia(spark, 50)
    val out = java.nio.file.Files.createTempDirectory("graft_media").toString
    docs.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out).as[MediaOps.MediaDoc]
    assert(back.count() == 50)
    val a = docs.collect().sortBy(_.doc_id)
    val b = back.collect().sortBy(_.doc_id)
    a.zip(b).foreach { case (x, y) =>
      assert(x.mime == y.mime && x.media.sameElements(y.media) && x.width == y.width)
    }
  }

  test("feature extraction is deterministic and partitioning-invariant") {
    val docs = MediaOps.syntheticMedia(spark, 40)
    val f1 = MediaOps.extractFeatures(docs.repartition(1)).collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    val f8 = MediaOps.extractFeatures(docs.repartition(8)).collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(f1 == f8)
    assert(f1.values.forall(_.length == 8))
  }

  test("frame sampling: one frame per cadence step from duration metadata") {
    val s = spark
    import s.implicits._
    val docs = MediaOps.syntheticMedia(spark, 30)
    val frames = MediaOps.sampleFrames(docs, everyMs = 5000)
    val perDoc = frames.groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val durations = docs.collect().map(d => d.doc_id -> d.duration_ms).toMap
    perDoc.foreach { case (id, n) =>
      assert(n == math.max(durations(id) / 5000, 1), s"doc $id")
    }
    assert(frames.agg(sum(length(col("frame")))).head.getLong(0) > 0)
  }

  test("resize updates image metadata only for images") {
    val resized = MediaOps.resizeImages(MediaOps.syntheticMedia(spark, 30), 32, 32).collect()
    resized.foreach { d =>
      if (d.mime.startsWith("image/")) assert(d.width == 32 && d.height == 32)
      else assert(d.height == 64)
    }
  }

  test("media features feed ANN cosine top-k") {
    val emb = MediaOps.toEmbeddings(MediaOps.extractFeatures(MediaOps.syntheticMedia(spark, 60)))
    val top = Ann.bruteForceTopK(emb, emb.where(col("vec_id") < 2), 5)
    assert(top.count() == 10) // 2 queries × top-5
  }
}
