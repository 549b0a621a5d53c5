package graft.pipeline

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck invariants for the round-9 novelty/boilerplate pair:
  * structural truths on ANY input, not just the hand-built fixtures.
  * Uses the shared test session (graft.SparkSpec). */
object NoveltyProps extends Properties("Novelty") {

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private val keyGen = for {
    a <- Gen.choose(0L, 15L)
    b <- Gen.oneOf("x", "y", "z")
  } yield (a, b)

  private val keysGen = Gen.listOf(keyGen).map(_.take(40))

  property("novelKeys == reference anti-join on any key mix") =
    Prop.forAllNoShrink(keysGen, keysGen) { (batch, corpus) =>
      val b = batch.toDF("k", "t")
      val c = corpus.toDF("k", "t")
      val got = Dedup.novelKeys(b, c, Seq("k", "t"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val want = batch.toSet -- corpus.toSet
      (got == want) :| s"got $got want $want"
    }

  property("novelKeys(batch, batch) is empty; novelKeys(batch, empty) is batch") =
    Prop.forAllNoShrink(keysGen) { batch =>
      val b = batch.toDF("k", "t")
      val e = Seq.empty[(Long, String)].toDF("k", "t")
      val self = Dedup.novelKeys(b, b, Seq("k", "t")).count()
      val all = Dedup.novelKeys(b, e, Seq("k", "t"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      (self == 0L) :| s"self-novelty must be empty, got $self" &&
        (all == batch.toSet) :| "empty corpus keeps every distinct key"
    }

  private val docGen = for {
    id <- Gen.choose(0L, 30L)
    words <- Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd")).map(_.take(8))
  } yield (id, words.mkString(" "))

  private val docsGen =
    Gen.nonEmptyListOf(docGen).map(_.groupBy(_._1).map(_._2.head).toList)

  property("boilerplate removal == in-memory reference on any corpus") =
    Prop.forAllNoShrink(docsGen) { ds =>
      val maxDf = 2
      val chunksOf: Map[Long, Seq[String]] = ds.map { case (id, text) =>
        id -> text.split("\\s+").toSeq.grouped(2).map(_.mkString(" ")).toSeq
      }.toMap
      val dfCount = chunksOf.toSeq
        .flatMap { case (id, cs) => cs.distinct.map(id -> _) }
        .groupBy(_._2).view.mapValues(_.size).toMap
      val want = chunksOf
        .map { case (id, cs) =>
          id -> cs.filter(c => dfCount(c) <= maxDf) }
        .collect { case (id, kept) if kept.nonEmpty =>
          id -> ((kept.size.toLong, kept.mkString(" "))) }
      val got = TextAnalysis
        .boilerplateRemoval(ds.toDF("doc_id", "text"), 2, maxDf)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
        .toMap
      (got == want) :| s"got $got want $want"
    }

  property("boilerplate removal at maxDf >= |docs| is the identity reassembly") =
    Prop.forAllNoShrink(docsGen) { ds =>
      val df = ds.toDF("doc_id", "text")
      val r = TextAnalysis.boilerplateRemoval(df, 2, maxDf = ds.size)
        .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
      Prop.all(ds.map { case (id, text) =>
        (r.get(id).contains(text)) :| s"doc $id: ${r.get(id)} != $text"
      }: _*)
    }
}
