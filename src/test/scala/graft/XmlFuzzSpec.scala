package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sources.OsmXml

/** XML robustness round-trip (r8 VERDICT item 5): escaped entities,
  * CDATA sections, and non-ASCII text in tag values / user names /
  * comment bodies must survive generate → dump → scan unchanged, on
  * BOTH scan paths (the generic Spark XML source and the StAX
  * pull-parser). */
class XmlFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def dump(changesets: Seq[(Long, String, Seq[(String, String)], Seq[String])],
      cdataEvery: Int = 0): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<osm version=\"0.6\" generator=\"fuzz\">\n")
    changesets.foreach { case (id, user, tags, texts) =>
      sb.append(s"""<changeset id="$id" created_at="2015-11-15T22:00:01Z" """)
      sb.append(s"""open="false" user="${OsmXml.escapeAttr(user)}" uid="$id">""")
      tags.foreach { case (k, v) =>
        sb.append(s"""<tag k="${OsmXml.escapeAttr(k)}" v="${OsmXml.escapeAttr(v)}"/>""")
      }
      if (texts.nonEmpty) {
        sb.append("<discussion>")
        texts.zipWithIndex.foreach { case (t, i) =>
          val body =
            if (cdataEvery > 0 && i % cdataEvery == 0 && !t.contains("]]>"))
              s"<![CDATA[$t]]>"
            else OsmXml.escapeText(t)
          sb.append(s"""<comment uid="1" user="u" date="2015-11-16T00:00:00Z">""")
          sb.append(s"<text>$body</text></comment>")
        }
        sb.append("</discussion>")
      }
      sb.append("</changeset>\n")
    }
    sb.append("</osm>\n")
    sb.toString
  }

  private def scanBoth(xml: String): (Map[Long, (String, Map[String, String])], Map[Long, Seq[String]],
      Map[Long, (String, Map[String, String])]) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fuzz")
    val p = tmp.resolve("dump.osm")
    OsmXml.writeFixture(p, xml)
    def extract(raw: org.apache.spark.sql.DataFrame) = {
      val cs = OsmXml.changesets(raw)
        .select(col("id"), col("user_name"), col("tags"))
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1),
          Option(r.getMap[String, String](2)).map(_.toMap).getOrElse(Map.empty)))
        .toMap
      cs
    }
    val generic = OsmXml.scan(spark, p.toString)
    val stax = OsmXml.scanStax(spark, p.toString)
    val texts = OsmXml.comments(generic)
      .select(col("comment_changeset_id"), col("comment_text"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getString(1)).toSeq.sorted }
    (extract(generic), texts, extract(stax))
  }

  test("deterministic nasty fixture: entities, quotes, CDATA, non-ASCII, newline in text") {
    val tags = Seq(
      "comment" -> """R&D <fix> "quoted" 'apos' café ü 東京""",
      "source&lt;" -> "a<b>c&d\"e",
      "日本語キー" -> "значение Ω≈ç")
    val texts = Seq(
      "plain ascii",
      "ampersand & angle <brackets> \"quotes\"",
      "line\nbreak\tand tab",
      "CDATA candidate: <not-a-tag/> && entities &amp; kept literal",
      "中文 · русский · عربى · 🌍")
    val cs = Seq(
      (1L, """alice & <bob> "carol"""", tags, texts),
      (2L, "müller_東京", Seq.empty[(String, String)], Seq.empty[String]))
    val (generic, comments, stax) = scanBoth(dump(cs, cdataEvery = 2))
    assert(generic(1L)._1 === """alice & <bob> "carol"""")
    assert(generic(1L)._2 === tags.toMap)
    assert(generic(2L)._1 === "müller_東京")
    assert(comments(1L) === texts.sorted)
    assert(stax === generic, "StAX and generic scans must agree byte-for-byte")
  }

  // XML 1.0 legal, attribute-safe characters (no control chars —
  // illegal even escaped; no \n\t — attribute-value normalization
  // folds them to spaces by spec, which is not a parser bug)
  private val attrChar: Gen[Char] = Gen.frequency(
    (6, Gen.alphaNumChar),
    (3, Gen.oneOf('&', '<', '>', '"', '\'', ' ', '=', '/', ';')),
    (3, Gen.oneOf('é', 'ß', 'Ω', '中', '文', 'я', 'ü', '←', '₿')))
  private val attrString: Gen[String] =
    Gen.chooseNum(1, 24).flatMap(n => Gen.listOfN(n, attrChar)).map(_.mkString)
  // text nodes may also carry line structure; anchor the ends so
  // surrounding-whitespace handling can't blur the comparison
  private val textString: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n,
      Gen.frequency((8, attrChar), (1, Gen.const('\n')), (1, Gen.const('\t')))))
      .map(cs => "x" + cs.mkString + "x")

  private val changesetGen: Gen[(Long, String, Seq[(String, String)], Seq[String])] =
    for {
      id <- Gen.chooseNum(1L, 1000000L)
      user <- attrString
      nTags <- Gen.chooseNum(0, 3)
      tags <- Gen.listOfN(nTags, Gen.zip(attrString, attrString))
      nTexts <- Gen.chooseNum(0, 2)
      texts <- Gen.listOfN(nTexts, textString)
    } yield (id, user, tags.distinctBy(_._1), texts)

  test("property: random attribute/text content round-trips through both scan paths") {
    val fixtureGen = Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, changesetGen))
    (1 to 5).foreach { i =>
      val cs = fixtureGen(Gen.Parameters.default, Seed(1000L + i)).get.distinctBy(_._1)
      val (generic, comments, stax) = scanBoth(dump(cs, cdataEvery = 3))
      cs.foreach { case (id, user, tags, texts) =>
        assert(generic(id)._1 === user, s"seed ${1000 + i} user")
        assert(generic(id)._2 === tags.toMap, s"seed ${1000 + i} tags")
        assert(comments.getOrElse(id, Seq.empty) === texts.sorted, s"seed ${1000 + i} texts")
      }
      assert(stax === generic, s"seed ${1000 + i} stax/generic divergence")
    }
  }
}
