package graft.text

import graft.spark.SparkTestBase

/** Frozen golden values for the text operators whose driver queries are
  * rows-only (q17 minhash / q18 simhash / q19 fingerprint use Spark-specific
  * hashes DuckDB lacks, so CORRECTNESS never pins their VALUES). These
  * literals were computed once from the verified implementation and frozen:
  * any accidental change to shingling, hash seeds, permutation constants,
  * bit-vote logic, or the rolling-hash recurrence fails HERE. If a change is
  * intentional, re-pin deliberately.
  */
class FrozenTextGoldensSpec extends SparkTestBase {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "pack my box with five dozen liquor jugs")
    ).toDF("doc_id", "text")
  }

  test("fingerprint: frozen rolling-hash values") {
    val got = TextOps.withFingerprint(docs).select("doc_id", "fingerprint")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 790720842L, 1L -> 280539502L, 2L -> 255226949L), s"got $got")
  }

  test("simhash: frozen 64-bit values; near-dup docs stay hamming-close") {
    val got = TextOps.simHash(docs).select("doc_id", "simhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> -7573889167326994222L, 1L -> -7573326217371541038L, 2L -> 2495353224988115078L), s"got $got")
    // structural sanity the goldens encode: one-word-different docs are close
    assert(java.lang.Long.bitCount(got(0L) ^ got(1L)) <= 16, "near-dups must be hamming-close")
    assert(java.lang.Long.bitCount(got(0L) ^ got(2L)) > 16, "unrelated docs must be far")
  }

  test("minhash: frozen 32-wide signatures; near-dup docs share most slots") {
    val got = TextOps.minHashSignatures(TextOps.shingles(docs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sig0 = Seq(688936938L, 1159463895L, 580766512L, 315679468L, 1905465199L, 656267174L, 366245674L,
      1502352198L, 153083390L, 204900042L, 947038421L, 591291862L, 43554410L, 1421428303L, 558804206L,
      510436395L, 397085178L, 526316550L, 470683205L, 986942313L, 97793199L, 430930015L, 212089300L,
      305244511L, 326385401L, 459250187L, 428853582L, 351423635L, 554977603L, 281665544L, 213403844L, 453354511L)
    val sig1 = Seq(709202345L, 1159463895L, 267051588L, 315679468L, 2087853862L, 656267174L, 629695965L,
      801154781L, 153083390L, 155802596L, 947038421L, 591291862L, 192145858L, 1845240501L, 558804206L,
      510436395L, 44553604L, 526316550L, 470683205L, 986942313L, 97793199L, 430930015L, 212089300L,
      305244511L, 326385401L, 459250187L, 428853582L, 351423635L, 467407805L, 281665544L, 213403844L, 1646863183L)
    val sig2 = Seq(138297433L, 414892316L, 127952441L, 269589550L, 297108702L, 840351450L, 398087058L,
      273549400L, 41150732L, 632827063L, 808768667L, 992104726L, 348083375L, 891326123L, 1434568871L,
      288520333L, 268848250L, 545443133L, 102092891L, 1098632899L, 351891031L, 241397595L, 820648217L,
      2028786292L, 178953608L, 123452213L, 497302494L, 891070148L, 450032721L, 993275469L, 1536518217L, 122804184L)
    assert(got(0L) == sig0, s"doc 0 drifted: ${got(0L)}")
    assert(got(1L) == sig1, s"doc 1 drifted: ${got(1L)}")
    assert(got(2L) == sig2, s"doc 2 drifted: ${got(2L)}")
    // structural sanity: MinHash estimates Jaccard — near-dups agree on most slots
    val agree01 = sig0.zip(sig1).count { case (a, b) => a == b }
    val agree02 = sig0.zip(sig2).count { case (a, b) => a == b }
    assert(agree01 >= 16, s"near-dup signature agreement too low: $agree01/32")
    assert(agree02 == 0, s"disjoint-shingle docs must not agree: $agree02/32")
  }
}
