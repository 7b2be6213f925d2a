package graft.operators

import graft.SparkSpec

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  test("the winnowing guarantee: a shared run of ≥ w+k−1 chars always pairs") {
    // docs 1/2 share a 40-char verbatim run embedded in unrelated text;
    // doc 3 is disjoint noise. k=5, w=4 → guarantee threshold 8 chars.
    val shared = "zqxwvj kpflm ghrtyu bnmasd qwepoi zxcvlk"
    val docs = Seq(
      (1L, s"aaa111 $shared bbb222"),
      (2L, s"ccc333 ddd444 $shared"),
      (3L, "eee555 fff666 ggg777 hhh888 iii999 jjj000")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowingPairs(docs, "text", "doc_id",
      k = 5, window = 4, maxDocFrequency = 3, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), pairs.toString)
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), pairs.toString)
  }

  test("the df noise rule: boilerplate shared by every doc produces no pairs") {
    // every doc carries the same banner; pairwise overlap is ONLY the
    // banner, whose fingerprints exceed maxDocFrequency and get dropped
    val banner = "common banner text repeated in every single document"
    val docs = (1L to 6L).map(i => (i, s"$banner unique${i}a unique${i}b"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowingPairs(docs, "text", "doc_id",
      k = 5, window = 4, maxDocFrequency = 3, minShared = 1)
    assert(pairs.isEmpty, pairs.collect().mkString(","))
  }

  test("fingerprint compression: winnowed set is a small fraction of the gram count") {
    import org.apache.spark.unsafe.types.UTF8String
    val text = ("spark catalyst tungsten dataframe dataset shuffle exchange " * 5).trim
    val nGrams = text.replaceAll("\\s+", " ").length - 5 + 1
    val fps = graft.functions.GraftHashUtil.winnowHashes(
      UTF8String.fromString(text), 5, 4).numElements()
    // expected density ~2/(w+1) = 0.4 on random text; repetition dedups further
    assert(fps > 0 && fps <= nGrams / 2, s"$fps of $nGrams grams kept")
  }

  test("short or empty strings: no fingerprints below k chars, no throw") {
    import org.apache.spark.unsafe.types.UTF8String
    assert(graft.functions.GraftHashUtil.winnowHashes(
      UTF8String.fromString("abcd"), 5, 4).numElements() == 0)
    assert(graft.functions.GraftHashUtil.winnowHashes(
      UTF8String.fromString(""), 5, 4).numElements() == 0)
    // exactly k chars → one gram → one window → one fingerprint
    assert(graft.functions.GraftHashUtil.winnowHashes(
      UTF8String.fromString("abcde"), 5, 4).numElements() == 1)
  }
}
