package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpec {

  test("fuzzyLinkParts: every variant recovers its own origin at distance ≤ 1") {
    import spark.implicits._
    val out = RecordLinkage.fuzzyLinkParts(spark, sf).collect()
    assert(out.nonEmpty)
    // self-links: variant_id = name_id + 500000 must appear, dist ≤ 1
    // (dropping one char is ≤ 1 edit; len 2 names degenerate to 0)
    val self = out.filter(r =>
      r.getAs[Long]("variant_id") === r.getAs[Long]("name_id") + 500000L)
    val nNames = Tables.part(spark, sf).select($"p_name").distinct().count()
    assert(self.length.toLong === nNames)
    self.foreach(r => assert(r.getAs[Long]("dist") <= 1L))
    // verification is sound: no reported pair exceeds the threshold
    out.foreach(r => assert(r.getAs[Long]("dist") <= 2L))
  }

  test("fuzzyLinkParts: blocking never pairs across different first words") {
    val out = RecordLinkage.fuzzyLinkParts(spark, sf).collect()
    out.foreach { r =>
      assert(r.getAs[String]("p_name").split(" ").head ===
        r.getAs[String]("vname").split(" ").head)
    }
  }

  test("typoLink: deletion-neighborhood join reproduces the naive all-pairs lev<=1 link") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    }
    val vocab = graft.Tables.documents(spark, sf)
      .select(explode(split(lower($"text"), "\\s+")).as("t"))
      .filter($"t" =!= "").distinct().collect().map(_.getString(0)).toSet
    val typos = vocab.filter(_.length >= 4).map { t =>
      val p = (h32(t) % t.length).toInt
      t.substring(0, p) + t.substring(p + 1)
    }
    val want = (for (ty <- typos; v <- vocab; if lev(ty, v) <= 1)
      yield (ty, v, lev(ty, v).toLong)).toSet
    val out = RecordLinkage.typoLink(spark, sf).collect()
      .map(r => (r.getAs[String]("typo"), r.getAs[String]("matched"),
        r.getAs[Long]("dist"))).toSet
    graft.CacheGuard.release()
    assert(out === want)
    // completeness: every typo resolves to at least its own source word
    val linked = out.map(_._1)
    assert(typos.forall(linked.contains))
  }
}
