package graft.operators

import graft.SparkSpec

class FuzzyLinkageSpec extends SparkSpec {
  import spark.implicits._

  private val clean = Seq(
    (1L, "alpha industries"),
    (2L, "beta logistics"),
    (3L, "gamma holdings"),
    (4L, "delta shipping"),
    (5L, "beta logistic")) // near-twin of 2: tie bait
    .toDF("id", "name")

  test("single-edit variants link back; unmatched and over-distance rows drop out") {
    val dirty = Seq(
      (11L, "alpha industris"),  // 1 deletion from id 1
      (12L, "beta logstics"),    // 1 deletion from id 2
      (13L, "gama holdings"),    // 1 deletion from id 3
      (14L, "zzzzz totally else") // nothing within dist 2
    ).toDF("id", "name")
    val got = FuzzyLinkage.bestMatch(clean, dirty, "id", "name", "id", "name",
      neighborhood = 4, maxDist = 2)
      .collect().map(r => r.getAs[Long]("dirty_id") -> r.getAs[Long]("clean_id")).toMap
    assert(got == Map(11L -> 1L, 12L -> 2L, 13L -> 3L), got.toString)
  }

  test("equidistant candidates tie to the smallest clean id") {
    // "beta logistics" (2, one substitution) and "beta logistic" (5, one
    // insertion) are both dist 1 from this probe — the smaller id wins
    val dirty = Seq((21L, "beta logisticz")).toDF("id", "name")
    val row = FuzzyLinkage.bestMatch(clean, dirty, "id", "name", "id", "name",
      neighborhood = 4, maxDist = 2).collect()
    assert(row.length == 1 && row.head.getAs[Long]("clean_id") == 2L,
      row.mkString(","))
  }

  test("neighborhood bound is honored: a far-sorted variant is not considered") {
    // the variant's first letter changed, so it sorts far from its origin —
    // with a tight neighborhood SNM must NOT find it (the documented
    // trade-off), keeping engine and oracle in exact agreement
    val many = (1L to 60L).map(i => (i, f"name$i%03d")).toDF("id", "name")
    val dirty = Seq((99L, "zame001")).toDF("id", "name") // n→z: sorts last
    val got = FuzzyLinkage.bestMatch(many, dirty, "id", "name", "id", "name",
      neighborhood = 2, maxDist = 2)
    assert(got.count() == 0L)
  }
}
