package graft.store

import graft.spark.SparkTestBase
import org.apache.spark.sql.functions._

/** Seeded CONCURRENT content-level fuzz of the store: writer threads append
  * value batches (the streaming micro-batch shape) while a maintenance
  * thread compacts and expires, all racing on one table. The curated
  * concurrency specs pin specific interleavings (commit contention, lost
  * ledger appends, steal races); this asserts the end-to-end CONTENT
  * guarantee those mechanisms exist for: after the dust settles, the table
  * reads back as exactly the multiset union of every append (appends
  * commute — no overwrite/TTL ops here, so the expected final state is
  * deterministic under any interleaving), every lineage id answers
  * hasCommit, and the manifest row counts agree with the data.
  */
class ConcurrentStoreFuzzSpec extends SparkTestBase {

  /** sweep width: 2 by default; widen via `-Dgraft.randFixtures=10` */
  private val N = math.max(1, sys.props.getOrElse("graft.randFixtures", "2").toInt / 2)

  private val Days = (1 to 4).map(d => f"2024-02-$d%02d")

  for (seed <- 0 until N) {
    test(s"seed $seed: concurrent appends + compaction + expiry settle to the exact multiset union") {
      val s = spark
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_store_cfuzz").toString
      val store = new TableStore(base, "t")
      store.write(Seq(("2024-02-01", 0L)).toDF("day", "v"), "day", "init")

      val nWriters = 4
      val appendsPerWriter = 5
      // deterministic per-thread value ranges: the expected union is
      // computable without knowing the interleaving
      def values(w: Int, k: Int): Seq[Long] = {
        val rnd = new scala.util.Random(seed * 7919 + w * 131 + k)
        Vector.fill(1 + rnd.nextInt(3))(w * 100000L + k * 100L + rnd.nextInt(100))
      }
      def daysOf(w: Int, k: Int): Seq[String] = {
        val rnd = new scala.util.Random(seed * 104729 + w * 17 + k)
        rnd.shuffle(Days).take(1 + rnd.nextInt(2))
      }

      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val writers = (0 until nWriters).map { w =>
        new Thread(() =>
          try {
            for (k <- 0 until appendsPerWriter) {
              val rows = daysOf(w, k).flatMap(d => values(w, k).map(d -> _))
              store.write(rows.toDF("day", "v"), "day", s"stream-cf$w-batch-$k", append = true)
            }
          } catch { case t: Throwable => failures.add(t) }
        )
      }
      val maintainer = new Thread(() =>
        try {
          val rnd = new scala.util.Random(seed)
          for (_ <- 0 until 10) {
            // ConcurrentTableModification is the EXPECTED abort when a racing
            // append rewrote the partition under the compaction — skip, like
            // Maintain.run does; anything else is a real failure
            try store.compactPartition(spark, "day", Days(rnd.nextInt(Days.size)))
            catch { case _: ConcurrentTableModification => () }
            store.expireSnapshots(keepLast = 3)
            Thread.sleep(rnd.nextInt(30).toLong)
          }
        } catch { case t: Throwable => failures.add(t) }
      )

      (writers :+ maintainer).foreach(_.start())
      (writers :+ maintainer).foreach(_.join(300000))
      assert(failures.isEmpty, s"seed $seed: concurrent ops failed: ${failures.toArray.toSeq.map(_.toString)}")

      // expected content: init row + the union of every append
      val expected = (Seq("2024-02-01" -> 0L) ++ (for {
        w <- 0 until nWriters; k <- 0 until appendsPerWriter
        d <- daysOf(w, k); v <- values(w, k)
      } yield d -> v)).groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap

      val back = store.read(spark).select(col("day").cast("string"), col("v")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
      assert(back == expected, s"seed $seed: final content diverged\nexpected=${expected.view.mapValues(_.size).toMap}\nback=${back.view.mapValues(_.size).toMap}")

      val manifest = store.currentSnapshot.get.partitions
      for (p <- manifest)
        assert(p.rows == expected(p.partition).size, s"seed $seed: manifest rows for ${p.partition}")
      for (w <- 0 until nWriters; k <- 0 until appendsPerWriter)
        assert(store.hasCommit(s"stream-cf$w-batch-$k"), s"seed $seed: lineage stream-cf$w-batch-$k lost")
    }
  }
}
