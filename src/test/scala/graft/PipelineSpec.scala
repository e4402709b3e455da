package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pipeline

/** Corpus-assembly contracts: sequence packing reconstructs the exact
  * per-source running offsets regardless of partitioning, and
  * decontamination drops exactly the docs sharing a 5-gram with the
  * eval set. */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("curate_full is a strict refinement of curate, and every drop has a cause") {
    val d = "/root/testdata/sf0.01"
    val curated = Pipeline.pipelineCurate(spark, d)
      .select("doc_id").as[Long].collect().toSet
    val full = Pipeline.pipelineCurateFull(spark, d)
      .select("doc_id").as[Long].collect().toSet
    assert(full.subsetOf(curated))
    assert(full.nonEmpty && full.size < curated.size) // gates actually bind
    // every dropped doc is repetitive, out of the surprisal band,
    // contaminated/eval, or too short for the repetition stats
    val repetitive = graft.operators.TextAnalysis.textRepetition(spark, d)
      .filter(col("is_repetitive")).select("doc_id").as[Long].collect().toSet
    val surpAll = graft.operators.TextAnalysis.textSurprisal(spark, d)
    val med = math.floor(surpAll
      .agg(expr("percentile(bits_per_tok_x100, 0.5)")).head.getDouble(0)).toLong
    val inBand = surpAll
      .filter(col("bits_per_tok_x100").between(med - 1, med + 7))
      .select("doc_id").as[Long].collect().toSet
    val clean = Pipeline.decontaminate(spark, d)
      .select("doc_id").as[Long].collect().toSet
    val softClean = graft.operators.Retrieval
      .decontaminateBm25Of(graft.Tables.documents(spark, d))
      .filter(!col("contaminated")).select("doc_id").as[Long].collect().toSet
    (curated -- full).foreach { id =>
      assert(repetitive.contains(id) || !inBand.contains(id) ||
        !clean.contains(id) || !softClean.contains(id),
        s"doc $id dropped without a cause")
    }
  }

  test("pipeline_pack: offsets equal the single-partition running sum, packs split at the budget") {
    val d = "/root/testdata/sf0.01"
    val got = Pipeline.packSequences(spark, d)
      .as[(Long, String, Int, Long, Long)].collect()

    // independent single-node recomputation of the same semantics
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), size(split(col("text"), " ")).as("n"))
      .as[(Long, String, Int)].collect()
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      val ordered = rows.toSeq.sortBy(_._1)
      val starts = ordered.scanLeft(0L)((acc, r) => acc + r._3).init
      ordered.zip(starts).map { case ((id, _, n), st) =>
        (id, src, n, st, st / Pipeline.PackBudget) }
    }.toSet
    assert(got.toSet === expect)
    assert(got.length === docs.length) // packing drops/duplicates nothing

    // budget binds: some pack holds >1 doc AND some doc straddles packs
    val bySrcPack = got.groupBy(r => (r._2, r._5))
    assert(bySrcPack.values.exists(_.length > 1))
    assert(got.exists(r => r._4 / Pipeline.PackBudget != (r._4 + r._3 - 1) / Pipeline.PackBudget))
  }

  test("pipeline_decontaminate: survivors share no 5-gram with the eval set, and nothing else is dropped") {
    val d = "/root/testdata/sf0.01"
    val survivors = Pipeline.decontaminate(spark, d)
      .as[(Long, String)].collect().map(_._1).toSet

    val grams = Tables.documents(spark, d)
      .select(col("doc_id"),
        graft.operators.Dedup.shingles(col("text"), 5).as("g"))
      .as[(Long, Seq[String])].collect()
    val evalGrams = grams.filter(_._1 % 97 == 0).flatMap(_._2).toSet
    val corpus = grams.filter(_._1 % 97 != 0)
    val contaminated = corpus.filter(_._2.exists(evalGrams)).map(_._1).toSet

    assert(corpus.map(_._1).toSet -- contaminated === survivors)
    // the probe is non-trivial on this tier: something IS dropped
    assert(contaminated.nonEmpty)
    // and eval docs themselves are never in the output
    assert(survivors.forall(_ % 97 != 0))
  }
}
