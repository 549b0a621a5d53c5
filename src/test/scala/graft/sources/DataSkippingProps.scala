package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck soundness for the file-skipping evaluator: over RANDOM
  * row sets, RANDOM predicate trees, and RANDOMLY DEGRADED stats
  * (any subset of min/max/nullCount may be unknown, as with real
  * parquet footers), [[DataSkipping.mayMatch]] must NEVER return
  * false for a file that contains a row satisfying the predicate —
  * the one direction that is a correctness bug rather than a missed
  * optimization. Truth is computed by catalyst's own `eval` on the
  * bound predicate, so the property checks the evaluator against
  * Spark's semantics (null three-valued logic included), not against
  * a re-implementation. The string alphabet includes a combining
  * accent and an astral-plane character to stress the unsigned-UTF8
  * order the envelopes compare in.
  */
object DataSkippingProps extends Properties("DataSkipping") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(400).withMaxDiscardRatio(10f)

  private val idAttr = AttributeReference("id", LongType)()
  private val nameAttr = AttributeReference("name", StringType)()
  private val scoreAttr = AttributeReference("score", DoubleType)()
  private val attrs = Seq(idAttr, nameAttr, scoreAttr)

  private case class Row3(id: Option[Long], name: Option[String],
      score: Option[Double])

  private val strGen = Gen.oneOf("", "a", "ab", "b", "text-1", "text-25",
    "café", "𐍈", "zz")
  private val rowGen = for {
    id <- Gen.option(Gen.choose(-3L, 8L))
    name <- Gen.option(strGen)
    score <- Gen.option(Gen.oneOf(-1.5, 0.0, 0.5, 2.25, 7.0))
  } yield Row3(id, name, score)

  private val litLongGen = Gen.choose(-4L, 9L).map(Literal(_, LongType))
  private val litStrGen =
    strGen.map(s => Literal(UTF8String.fromString(s), StringType))
  private val litDblGen =
    Gen.oneOf(-2.0, -1.5, 0.0, 0.5, 2.25, 7.0, 8.5).map(Literal(_, DoubleType))

  private def cmpGen(a: AttributeReference,
      lit: Gen[Literal]): Gen[Expression] = for {
    l <- lit
    flip <- Gen.oneOf(true, false)
    op <- Gen.oneOf[(Expression, Expression) => Expression](
      EqualTo(_, _), EqualNullSafe(_, _), LessThan(_, _),
      LessThanOrEqual(_, _), GreaterThan(_, _), GreaterThanOrEqual(_, _))
  } yield if (flip) op(l, a) else op(a, l)

  private val leafGen: Gen[Expression] = Gen.oneOf(
    cmpGen(idAttr, litLongGen),
    cmpGen(nameAttr, litStrGen),
    cmpGen(scoreAttr, litDblGen),
    Gen.listOfN(3, litLongGen).map(ls => In(idAttr, ls)),
    Gen.oneOf(attrs).map(IsNull(_)),
    Gen.oneOf(attrs).map(IsNotNull(_)),
    litLongGen.map(l => Not(EqualTo(idAttr, l))),
    strGen.map(s =>
      StartsWith(nameAttr, Literal(UTF8String.fromString(s), StringType))))

  private def predGen(depth: Int): Gen[Expression] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      2 -> leafGen,
      1 -> (for {
        l <- predGen(depth - 1); r <- predGen(depth - 1)
      } yield And(l, r)),
      1 -> (for {
        l <- predGen(depth - 1); r <- predGen(depth - 1)
      } yield Or(l, r)))

  /** Exact stats the footer path would produce for these rows, then
    * randomly degraded (unknown min/max/nullCount) — degradation must
    * only ever make the evaluator MORE conservative. */
  private def statsFor(rows: List[Row3], degrade: Int)
      : DataSkipping.FileStats = {
    def col[T](vals: List[Option[T]], toDom: T => Any, keep: Int)
        (implicit ord: Ordering[T]): DataSkipping.ColStats = {
      val present = vals.flatten
      DataSkipping.ColStats(
        min = if ((keep & 1) == 0 || present.isEmpty) None
          else Some(toDom(present.min)),
        max = if ((keep & 2) == 0 || present.isEmpty) None
          else Some(toDom(present.max)),
        nullCount = if ((keep & 4) == 0) None
          else Some(vals.count(_.isEmpty).toLong))
    }
    // unsigned-UTF8 order for string min/max — the order parquet's
    // UTF8 comparator produced them in
    implicit val utf8Ord: Ordering[String] =
      Ordering.comparatorToOrdering(
        (a: String, b: String) =>
          UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
    DataSkipping.FileStats("f", rows.size.toLong, Map(
      "id" -> col[Long](rows.map(_.id), identity, degrade & 7),
      "name" -> col[String](rows.map(_.name), identity, (degrade >> 3) & 7),
      "score" -> col[Double](rows.map(_.score), identity, (degrade >> 6) & 7)))
  }

  private def truth(rows: List[Row3], pred: Expression): Boolean = {
    val bound = BindReferences.bindReference(pred,
      org.apache.spark.sql.catalyst.expressions.AttributeSeq(attrs))
    rows.exists { r =>
      val row = InternalRow.fromSeq(Seq(
        r.id.map(Long.box).orNull,
        r.name.map(UTF8String.fromString).orNull,
        r.score.map(Double.box).orNull))
      bound.eval(row) == true
    }
  }

  property("never prunes a file containing a matching row") =
    Prop.forAll(Gen.listOfN(6, rowGen).map(_.take(6)),
        predGen(2), Gen.choose(0, 511)) {
      (rows, pred, degrade) =>
        val fs = statsFor(rows, degrade)
        val may = DataSkipping.mayMatch(fs, pred)
        !truth(rows, pred) || may :| s"pruned a matching file: " +
          s"rows=$rows pred=$pred stats=$fs"
    }

  property("fully-unknown stats never prune a non-empty file") =
    Prop.forAll(Gen.listOfN(4, rowGen).suchThat(_.nonEmpty), predGen(2)) {
      (rows, pred) =>
        val fs = DataSkipping.FileStats("f", rows.size.toLong, Map.empty)
        DataSkipping.mayMatch(fs, pred)
    }

  property("an empty file is always prunable") =
    Prop.forAll(predGen(2)) { pred =>
      !DataSkipping.mayMatch(
        DataSkipping.FileStats("f", 0L, Map.empty), pred)
    }
}
