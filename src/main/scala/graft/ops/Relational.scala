package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** The relational skeleton of the reference's operator families
  * (SURVEY.md §2.1/§2.2) re-expressed as declarative DataFrame plans.
  *
  * Each query maps to one or more reference ops (cited per method,
  * file:line relative to /root/reference). Design rules, all in
  * service of the 100 TB posture:
  *   - filters/projections live directly on the scan so Catalyst pushes
  *     them into parquet (`PushedFilters`, pruned `ReadSchema`);
  *   - dimension joins are explicitly `broadcast()` (nation/region are
  *     O(10..100) rows at any SF — shuffling the fact side on a join
  *     key for them would be the classic 100 TB mistake);
  *   - aggregates are plain `groupBy().agg()` so Spark runs them
  *     partial (map-side combine) + final, replacing the reference's
  *     hand-rolled side-channel partial aggregation
  *     (src/edu/illinois/ga/MapReduce.java:132-148);
  *   - double sums are routed through DECIMAL(18,2) so the ADDITION is
  *     exact and order-independent across engines, then the final
  *     value is surfaced as DOUBLE: the one cast decimal→double of an
  *     exact value is correctly rounded (identical bits) in both
  *     engines, while DECIMAL *output columns* canonicalize
  *     differently across the two engines' client stacks (round-1
  *     driver gate: every DECIMAL-emitting query hash-mismatched,
  *     every DOUBLE/BIGINT/STRING/TIMESTAMP one matched).
  */
object Relational extends QueryPack {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact (order-independent) decimal sum, emitted as DOUBLE. */
  private def sumDec(c: Column): Column = sum(dec(c)).cast("double")

  /** Q1 — scan + projection + filter (reference ops 3/13: per-row map
    * over a SequenceFile scan, src/edu/illinois/ga/MapReduce.java:114-130).
    * Both predicates and the 3-column projection reach the parquet reader.
    */
  def q1FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_discount") > 0.05 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")

  /** Q2 — hash aggregate, partial+final (reference ops 4-6/17: mapper
    * running max + side-file partial agg + driver final scan,
    * src/edu/illinois/ga/MapReduce.java:87-148,386-426). Spark's
    * HashAggregateExec does the partial/final split natively.
    */
  def q2Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        sumDec(col("l_quantity")).as("qty"),
        min(col("l_extendedprice")).as("minp"),
        max(col("l_extendedprice")).as("maxp"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q3 — argmax per group (reference ops 4/6/18: global-best scan and
    * cGA winner pick, src/edu/illinois/ga/CGA.java:195-260) via the
    * built-in `max_by`, which aggregates partial+final like any other.
    */
  def q3Argmax(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        max_by(col("o_orderkey"), col("o_totalprice")).as("best_order"),
        max(col("o_totalprice")).as("best_price"))
      .orderBy("o_custkey")

  /** Q4 — equi-join chain over broadcast-sized dims (reference op 19's
    * keyed gather, src/edu/illinois/ga/CGA.java:262-309). nation (25)
    * and region (5) are broadcast: the customer side never shuffles.
    */
  def q4JoinChain(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("c"))
      .orderBy("n_name")

  /** Q5 — sliding-frame window max (reference op 9: ring buffer of the
    * last 5 individuals, argmax per arrival,
    * src/edu/illinois/ga/MapReduce.java:203-232). WindowExec over
    * `ROWS BETWEEN 4 PRECEDING AND CURRENT ROW` is the declarative twin.
    */
  def q5SlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in the test data, so the
    // frame order carries a full tiebreak — a ROWS frame over an
    // ambiguous sort is nondeterministic across engines.
    val w = Window.partitionBy("l_orderkey")
      .orderBy("l_linenumber", "l_extendedprice", "l_partkey", "l_suppkey")
      .rowsBetween(-4, Window.currentRow)
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        max(col("l_extendedprice")).over(w).as("win_max"))
      .orderBy("l_orderkey", "l_linenumber", "win_max")
  }

  /** Q6 — ranking window + top-k (reference ops 9/11: tournament winner
    * selection per window). row_number is rank-stable because the
    * ORDER BY carries the tiebreak column.
    */
  def q6TopK(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 2)
      .orderBy("o_custkey", "rn")
  }

  /** Q7 — distinct / dedup (reference op 14: reducer-local HashMap
    * dedup, src/edu/illinois/incr_ga/IncMapReduce.java:302-325).
    * `dropDuplicates` = hash aggregate on the key columns, partial+final.
    */
  def q7Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_linestatus")
      .dropDuplicates()
      .orderBy("l_returnflag", "l_linestatus")

  /** Q8 — 1→N generation / explode (reference ops 2/16: one input row
    * fanning out to `count` individuals / T candidates,
    * src/edu/illinois/ga/CGA.java:95-117). posexplode is the Catalyst
    * Generator form. pos is emitted 1-based to match SQL ordinality.
    */
  def q8Explode(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") <= 5)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "val")))
      .select(col("vec_id"), (col("pos0") + 1).as("pos"), col("val"))
      .filter(col("val") > 0)
      .orderBy("vec_id", "pos")

  /** Q9 — bitwise scalar expressions (reference ops 3/10: popcount
    * fitness and mask-based crossover,
    * src/edu/illinois/ga/MapReduce.java:100-111,174-201). bit_count,
    * AND, XOR are all codegen'd built-ins.
    */
  def q9Bitwise(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"),
        bit_count(col("l_orderkey").bitwiseAND(lit(255L))).as("pc"),
        col("l_orderkey").bitwiseXOR(lit(255L)).as("xr"))
      .orderBy("l_orderkey")

  /** Q10 — tumbling time bucket (reference op 11's per-generation loop
    * as a time dimension; §2.3 streaming skeleton shares this shape).
    */
  def q10TimeBucket(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"), col("event_type"))
      .agg(count(lit(1)).as("c"), sumDec(col("value")).as("v"))
      .orderBy("d", "event_type")

  /** Q11 — anti join (reference op 19's gather discipline: rows with no
    * partner). left_anti keeps the build side small and broadcastable.
    */
  def q11AntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_totalprice") > 480000).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey")
      .orderBy("c_custkey")

  /** Q12 — set intersection (reference op 11: generation union/overlap). */
  def q12Intersect(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(col("o_custkey").as("k"))
      .intersect(Tables.customer(spark, dir).select(col("c_custkey").as("k")))
      .orderBy("k")

  /** Q13 — array-genome fitness (reference op 3 verbatim semantics:
    * fitness(genome: long[]) = Σ popcount(word),
    * src/edu/illinois/ga/MapReduce.java:100-111) over a deterministic
    * genome built from table columns, so the oracle can check it.
    * Uses the native PopCountArray expression: the higher-order
    * `aggregate(transform(...))` spelling computes the same value but
    * lambda-bearing expressions are NOT codegen-supported — they break
    * the WholeStageCodegen span around the scan (caught by
    * PlanAuditSpec); the native expression keeps the whole projection
    * fused.
    */
  def q13GenomeFitness(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.functions.PopCountArray.popcountArray(
          array(col("l_orderkey"), col("l_partkey"), col("l_suppkey")))
          .as("fitness"))
      .orderBy("l_orderkey", "l_linenumber", "fitness")

  /** Q14 — semi-structured props: parse the events JSON `props` column
    * into MapType(string,string) with from_json (SURVEY §1.3's map-type
    * surface) and aggregate a typed field out of it. At scale the parse
    * happens in the scan pipeline (codegen'd JsonToStructs), no
    * separate ETL pass. */
  def q14JsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)).as("m"))
      .select(col("event_type"),
        element_at(col("m"), "k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      .orderBy("event_type")

  /** Q15 — the salted twin of Q2: identical results, skew-resistant
    * two-phase plan (Skew.saltedAgg). l_returnflag/l_linestatus have
    * single-digit cardinality, the real heavy-hitter shape at 100 TB. */
  def q15SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedAgg(Tables.lineitem(spark, dir),
      Seq("l_returnflag", "l_linestatus"), salts = 8, seed = 42L,
      Skew.CountAll("cnt"), Skew.SumDec("l_quantity", "qty"),
      Skew.Min("l_extendedprice", "minp"), Skew.Max("l_extendedprice", "maxp"))
      .withColumn("qty", col("qty").cast("double"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q16 — star join: the lineitem fact against two broadcast dims
    * (part, supplier). The fact side streams through both joins with
    * zero exchanges before the grouped aggregate — the canonical
    * 100 TB star-schema plan. */
  def q16StarJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)
          .filter(col("s_acctbal") > 0)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"),
        sumDec(col("l_extendedprice")).as("revenue"))
      .orderBy("p_brand")

  /** Q17 — set difference (the other half of op 11's generation set
    * algebra next to Q12's INTERSECT). */
  def q17Except(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_custkey").as("k"))
      .except(Tables.orders(spark, dir)
        .filter(col("o_totalprice") > 480000).select(col("o_custkey").as("k")))
      .orderBy("k")

  /** Q18 — hierarchical aggregate (ROLLUP): per-(flag,status), per-flag
    * subtotals, and the grand total in one pass — one shuffle, Spark
    * expands grouping sets map-side. NULL grouping keys are coalesced
    * to a sentinel so Spark/DuckDB null-ordering differences can't
    * touch the sort. */
  def q18Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), sumDec(col("l_quantity")).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("cnt"), col("qty"))
      .orderBy("flag", "status")

  /** Q19 — semi join (the positive half of op 19's gather discipline,
    * next to Q11's anti). left_semi never materializes the probe side's
    * payload: at 100 TB the orders side reduces to a broadcast-able
    * distinct key set. */
  def q19SemiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_totalprice") > 480000).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey")
      .orderBy("c_custkey")

  /** Q20 — full CUBE over (flag, status): all 4 grouping sets in one
    * pass/one shuffle (Spark expands grouping sets map-side, partial
    * aggregation applies per set). Same NULL-sentinel discipline as
    * Q18's ROLLUP. */
  def q20Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), sumDec(col("l_quantity")).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("cnt"), col("qty"))
      .orderBy("flag", "status")

  /** Q21 — lag/lead sequential deltas (op 9's ordered-neighborhood
    * semantics as a time-series primitive): per-user inter-event gap in
    * microseconds. One shuffle on user_id; BIGINT micros end-to-end so
    * both engines do exact integer arithmetic. */
  def q21LagDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Q22 — pivot: event_type rotated into per-type count columns, as
    * conditional aggregates over a DECLARED value list. This is the
    * 100 TB pivot shape: one partial+final hash aggregate, one
    * exchange. (`RelationalGroupedDataset.pivot` — even with declared
    * values — plans a two-level aggregate with a second exchange, and
    * without declared values adds a distinct-values driver job on top;
    * `.explain` on both confirmed the extra exchange.) Absent
    * combinations count 0 in both engines. */
  def q22Pivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        count(when(col("event_type") === types.head, 1)).as(types.head),
        types.tail.map(t =>
          count(when(col("event_type") === t, 1)).as(t)): _*)
      .orderBy("user_id")
  }

  /** Q23 — exact rank-based median per group (ops 4/6/9: argmax family
    * generalized to order statistics). Deterministic across engines
    * because the quantile is picked by rank over a total order — no
    * interpolation arithmetic to disagree on.
    *
    * Scale shape: the raw fact table NEVER enters the window. A
    * partial+final hash aggregate (skew-free — every map task
    * pre-combines) first collapses to (flag, price, count); the window
    * then walks cumulative counts over the distinct-price set and
    * keeps the price whose cumulative range covers rank ⌈n/2⌉. The
    * round-2 spelling ranked RAW rows partitioned by a 3-value flag —
    * the whole fact table funneled through 3 sort tasks, the exact
    * skew shape Skew.scala exists to kill; here the sorted rows are
    * deduplicated AND narrow. The approximate twin at 100 TB remains
    * approx_percentile (stats_quantiles). */
  def q23MedianRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    val c = Window.partitionBy("l_returnflag")
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_extendedprice")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(c))
      .filter(expr("cum - cnt < (n + 1) div 2 AND (n + 1) div 2 <= cum"))
      .select(col("l_returnflag"), col("l_extendedprice").as("median"), col("n"))
      .orderBy("l_returnflag")
  }

  /** Q24 — as-of join (AsOf.asofJoin): each purchase matched to the
    * user's latest click at-or-before it. The click side is pre-reduced
    * to one row per (user, ts) so the as-of match is total-order
    * deterministic; the oracle spells it with DuckDB's native ASOF
    * JOIN — result-level equivalence of two different physical
    * strategies. */
  def q24AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts_us").as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts_us").agg(max(col("event_id")).as("cid"))
    AsOf.asofJoin(purchases, clicks, "user_id", "p_us", "ts_us",
        Seq("cid", "ts_us"))
      .filter(col("cid").isNotNull)
      .select(col("pid"), col("user_id"), col("p_us"), col("cid"),
        (col("p_us") - col("ts_us")).as("gap_us"))
      .orderBy("pid")
  }

  /** Q34 — the FORWARD as-of join (AsOf.asofJoinForward): for each
    * purchase, the NEXT click at-or-after it — the mirror of q24's
    * "latest click before". Same union + one-window plan, ts sort
    * reversed; the oracle spells it with DuckDB's native ASOF on the
    * <= comparison. */
  def q34AsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts_us").as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts_us").agg(max(col("event_id")).as("cid"))
    AsOf.asofJoinForward(purchases, clicks, "user_id", "p_us", "ts_us",
        Seq("cid", "ts_us"))
      .filter(col("cid").isNotNull)
      .select(col("pid"), col("user_id"), col("p_us"), col("cid"),
        (col("ts_us") - col("p_us")).as("gap_us"))
      .orderBy("pid")
  }

  /** Q25 — full outer join: customers×their-order-stats with both
    * unmatched sides surfaced (customers who never ordered AND orders
    * whose cust filter excluded them from the dim — the data-quality
    * join). NULL-sensitive columns are coalesced to sentinels so both
    * engines sort identically. At scale the orders side pre-aggregates
    * BEFORE the join (the build side shrinks from fact- to key-size). */
  def q25OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val custs = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    val stats = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sumDec(col("o_totalprice")).as("spend"))
    custs.join(stats, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), lit(-1L)).as("ck"),
        coalesce(col("o_custkey"), lit(-1L)).as("ok"),
        coalesce(col("c_mktsegment"), lit("NONE")).as("seg"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"))
      .orderBy("ck", "ok")
  }

  /** Q26 — distribution windows (ntile/cume_dist/percent_rank): the
    * rank-statistics family over a total order. cume_dist and
    * percent_rank are single divisions of exact window counts —
    * bit-identical across engines. */
  def q26Ntile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    Tables.lineitem(spark, dir)
      .filter(col("l_linenumber") === 1 && col("l_orderkey") < 300)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"),
        ntile(4).over(w).as("quartile"),
        cume_dist().over(w).as("cd"),
        percent_rank().over(w).as("pr"))
      .orderBy("l_returnflag", "l_extendedprice", "l_orderkey")
  }

  /** Q27 — the AT-SCALE exact grouped median (ops.GroupedMedian): same
    * semantics, same oracle as Q23, different physical strategy —
    * range-partitioned parallel sort + two-pass prefix sums instead of
    * a per-group window. Q23 remains the declarative spelling; this is
    * the one to run when the value column is near-unique (here 594k
    * distinct prices in 600k rows at sf0.1, so Q23's window still
    * funnels the table through 3 sort tasks — Q27's sort splits WITHIN
    * groups across every partition). */
  def q27MedianPrefix(spark: SparkSession, dir: String): DataFrame =
    GroupedMedian.exactMedian(
      Tables.lineitem(spark, dir)
        .select(col("l_returnflag"), col("l_extendedprice")),
      "l_returnflag", "l_extendedprice")
      .orderBy("l_returnflag")

  /** Q28 — the salted SKEWED JOIN (Skew.saltedJoin), completing the
    * skew family: q15 salts the aggregate, this salts the join. The
    * fact table joins a 3-row per-flag dim on l_returnflag — the
    * adversarial heavy-hitter shape (a third of 100 TB behind one key,
    * so an unsalted shuffle join funnels it through ONE task). The dim
    * carries a shuffle_hash hint to pin the shuffle-join regime the
    * operator exists for (a 3-row dim would otherwise broadcast and
    * demonstrate nothing; at real scale the dim is the
    * too-big-to-broadcast middle regime). Salting spreads each flag
    * across 8 tasks; results are exactly the plain join's, which is
    * what the oracle spells. PlanAuditSpec asserts the salt rides the
    * join exchange. */
  def q28SkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val dim = li.groupBy("l_returnflag")
      .agg(max(col("l_extendedprice")).as("maxp"))
      .hint("shuffle_hash")
    Skew.saltedJoin(li, dim, Seq("l_returnflag"), salts = 8, seed = 42L)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("l_extendedprice") > col("maxp") * 0.5, 1L)
          .otherwise(0L)).as("n_above"))
      .orderBy("l_returnflag")
  }

  /** Q29 — binned RANGE join (ops.RangeJoin): customers matched into
    * per-supplier account-balance bands [s_acctbal−50, s_acctbal+50].
    * The naive spelling is a non-equi theta join — Spark plans it as
    * BroadcastNestedLoop (O(n·m) probe work, broadcast-bound build);
    * the binned operator turns it into a plain hash equi-join on the
    * bin key + an exact residual filter, the shape that scales.
    * PlanAuditSpec asserts no nested-loop/cartesian node survives; the
    * oracle spells the plain theta join. */
  def q29RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"))
    val bands = Tables.supplier(spark, dir)
      .select(col("s_suppkey"),
        (col("s_acctbal") - 50.0).as("lo"), (col("s_acctbal") + 50.0).as("hi"))
    RangeJoin.binnedRangeJoin(cust, bands, "c_acctbal", "lo", "hi",
        binWidth = 100.0)
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_cust"), min(col("c_custkey")).as("min_cust"))
      .orderBy("s_suppkey")
  }

  /** Q30 — BUCKETED co-located join (sources.Io.writeBucketed): orders
    * and lineitem are persisted bucketed+sorted on their join key, then
    * joined — the "shuffle once, reuse forever" layout lever. Because
    * both tables are pre-partitioned into the same bucket count on the
    * same key, the sort-merge join consumes bucket files directly: NO
    * exchange on either side (PlanAuditSpec asserts it), which at
    * 100 TB means the dominant fact-fact join cost — reshuffling both
    * tables on every query — is paid once at write time and amortized
    * over every subsequent join/agg on that key. The oracle spells the
    * plain join: layout never changes results. */
  def q30BucketJoin(spark: SparkSession, dir: String): DataFrame = {
    // table build is SETUP, not query: ensureBucketed makes it a
    // once-per-(app, dir) step so repeated runs — and the bench's
    // repeated timings — measure the zero-exchange join itself
    val tag = spark.sparkContext.applicationId + "|" + dir
    graft.sources.Io.ensureBucketed(spark,
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderstatus")),
      "graft_q30_orders", tag, "o_orderkey", 8, Some("o_orderkey"))
    graft.sources.Io.ensureBucketed(spark,
      Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_extendedprice")),
      "graft_q30_lineitem", tag, "l_orderkey", 8, Some("l_orderkey"))
    spark.table("graft_q30_orders")
      .join(spark.table("graft_q30_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sumDec(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderstatus")
  }

  /** Q31 — RANGE-framed window (value-based frame, vs q5's ROWS
    * frame): for each lineitem, how many same-flag rows price within
    * [price − 100, price] — the "neighbors within a value band" shape
    * (price banding, trailing-window counts over a numeric axis).
    * RANGE frames are well-defined under ties (the frame is a set
    * selected by VALUE, so tied rows share one frame — no
    * underspecified-order hazard), and the COUNT output is exact
    * integer, so the row hash-gates cleanly. One partition sort, the
    * same cost shape as any window; bounded to q26's subset for a
    * stable demo cardinality. */
  def q31RangeFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_linenumber") === 1 && col("l_orderkey") < 300)
      .selectExpr("l_returnflag", "l_orderkey", "l_extendedprice",
        """count(*) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
          |RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS n_band""".stripMargin)
      .orderBy("l_returnflag", "l_extendedprice", "l_orderkey")

  /** Q32 — the exact grouped median as a PLANNER-INTEGRATED custom
    * physical operator (plans.GroupedMedianPlan): the third physical
    * strategy for q23/q27's ground truth. Where q27 drops to the RDD
    * API behind a function call, this spelling contributes an
    * `ExactGroupedMedian` LogicalPlan node and lets EnsureRequirements
    * build the layout from the node's declared OrderedDistribution —
    * the range exchange and in-partition sort appear in EXPLAIN like
    * any built-in, and AQE sizes them. Same oracle as q23/q27: one
    * ground truth, three physical strategies. */
  def q32MedianPlan(spark: SparkSession, dir: String): DataFrame =
    graft.plans.GroupedMedianPlan.exactMedian(
      Tables.lineitem(spark, dir)
        .select(col("l_returnflag"), col("l_extendedprice")),
      "l_returnflag", "l_extendedprice")
      .orderBy("l_returnflag")

  /** Q33 — Bloom-pruned semi join (ops.BloomPrune): the selective
    * fact-dim shape with an in-plan sketch prune. The dim (urgent
    * orders, ~1/5 of orders) builds a Bloom filter in one aggregate,
    * shipped to the lineitem scan as a scalar subquery; fact rows
    * failing might_contain never reach the semi-join exchange. The
    * result is identical to the plain semi join — the oracle is the
    * unpruned spelling — and BloomPruneSpec asserts the probe sits
    * below the join on the fact side of the physical plan. */
  def q33BloomSemi(spark: SparkSession, dir: String): DataFrame =
    BloomPrune.prunedSemiJoin(
      Tables.lineitem(spark, dir),
      Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT"),
      "l_orderkey", "o_orderkey")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sumDec(col("l_quantity")).as("qty"))
      .orderBy("l_returnflag")

  /** Q35 — unpivot/melt (the inverse of q22's pivot): wide measure
    * columns become long-form (metric, value) rows. Spark's native
    * unpivot is a per-row Expand — no join, no shuffle beyond the
    * output sort — and the values are copied verbatim (no arithmetic),
    * so the reshape hash-matches the UNION ALL spelling any engine
    * can produce. */
  def q35Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_linenumber") === 1)
      .unpivot(
        Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "value")
      .orderBy("l_orderkey", "metric")

  /** Q36 — GROUPING SETS (the general form q18's ROLLUP and q20's CUBE
    * specialize): two disjoint single-column groupings plus the grand
    * total in ONE pass — Catalyst plans the same Expand + single
    * aggregate the rollup/cube family uses, so three aggregations cost
    * one shuffle. NULL group cells are COALESCEd to 'ALL' so the sort
    * is total and engine-independent. */
  def q36GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .createOrReplaceTempView("graft_q36_lineitem")
    spark.sql(
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS c,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM graft_q36_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_unpivot" -> q35Unpivot _,
    "q36_grouping_sets" -> q36GroupingSets _,
    "q1_filter_project" -> q1FilterProject _,
    "q2_agg" -> q2Agg _,
    "q3_argmax" -> q3Argmax _,
    "q4_join_chain" -> q4JoinChain _,
    "q5_sliding_window" -> q5SlidingWindow _,
    "q6_topk" -> q6TopK _,
    "q7_distinct" -> q7Distinct _,
    "q8_explode" -> q8Explode _,
    "q9_bitwise" -> q9Bitwise _,
    "q10_time_bucket" -> q10TimeBucket _,
    "q11_anti_join" -> q11AntiJoin _,
    "q12_intersect" -> q12Intersect _,
    "q13_genome_fitness" -> q13GenomeFitness _,
    "q14_json_props" -> q14JsonProps _,
    "q15_salted_agg" -> q15SaltedAgg _,
    "q16_star_join" -> q16StarJoin _,
    "q17_except" -> q17Except _,
    "q18_rollup" -> q18Rollup _,
    "q19_semi_join" -> q19SemiJoin _,
    "q20_cube" -> q20Cube _,
    "q21_lag_delta" -> q21LagDelta _,
    "q22_pivot" -> q22Pivot _,
    "q23_median_rank" -> q23MedianRank _,
    "q24_asof_join" -> q24AsofJoin _,
    "q25_outer_join" -> q25OuterJoin _,
    "q26_ntile" -> q26Ntile _,
    "q27_median_prefix" -> q27MedianPrefix _,
    "q28_skew_join" -> q28SkewJoin _,
    "q29_range_join" -> q29RangeJoin _,
    "q30_bucket_join" -> q30BucketJoin _,
    "q31_range_frame" -> q31RangeFrame _,
    "q32_median_plan" -> q32MedianPlan _,
    "q33_bloom_semi" -> q33BloomSemi _,
    "q34_asof_forward" -> q34AsofForward _,
  )

  /** Shared by q23 (declarative window) and q27 (prefix-sum operator):
    * one ground truth, two physical strategies. */
  private val medianOracle: String =
    """WITH r AS (SELECT l_returnflag, l_extendedprice,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem)
      |SELECT l_returnflag, l_extendedprice AS median, n FROM r
      |WHERE rn = (n + 1) // 2 ORDER BY l_returnflag""".stripMargin

  override def oracle: Map[String, String] = Map(
    "q1_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_discount > 0.05 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "q2_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  MIN(l_extendedprice) AS minp, MAX(l_extendedprice) AS maxp
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_argmax" ->
      """SELECT o_custkey, MAX_BY(o_orderkey, o_totalprice) AS best_order,
        |  MAX(o_totalprice) AS best_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q4_join_chain" ->
      """SELECT n_name, COUNT(*) AS c FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q5_sliding_window" ->
      """SELECT l_orderkey, l_linenumber,
        |  MAX(l_extendedprice) OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_extendedprice, l_partkey, l_suppkey
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS win_max
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, win_max""".stripMargin,
    "q6_topk" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,
    "q7_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q8_explode" ->
      """SELECT vec_id, pos, val FROM (
        |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
        |         unnest(embedding) AS val
        |  FROM embeddings WHERE vec_id <= 5) t
        |WHERE val > 0 ORDER BY vec_id, pos""".stripMargin,
    "q9_bitwise" ->
      """SELECT l_orderkey,
        |  CAST(bit_count(l_orderkey & 255) AS INTEGER) AS pc,
        |  xor(l_orderkey, 255) AS xr
        |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin,
    "q10_time_bucket" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS d, event_type, COUNT(*) AS c,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q11_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 480000)
        |ORDER BY c_custkey""".stripMargin,
    "q12_intersect" ->
      """SELECT o_custkey AS k FROM orders
        |INTERSECT SELECT c_custkey FROM customer ORDER BY k""".stripMargin,
    "q13_genome_fitness" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(bit_count(l_orderkey) + bit_count(l_partkey) + bit_count(l_suppkey) AS BIGINT) AS fitness
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, fitness""".stripMargin,
    "q14_json_props" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q15_salted_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  MIN(l_extendedprice) AS minp, MAX(l_extendedprice) AS maxp
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q16_star_join" ->
      """SELECT p_brand, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_acctbal > 0
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q17_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT SELECT o_custkey AS k FROM orders WHERE o_totalprice > 480000
        |ORDER BY k""".stripMargin,
    "q18_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |  COALESCE(l_linestatus, 'ALL') AS status, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q19_semi_join" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 480000)
        |ORDER BY c_custkey""".stripMargin,
    "q20_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |  COALESCE(l_linestatus, 'ALL') AS status, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q21_lag_delta" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id
        |  FROM events)
        |SELECT user_id, ts_us, event_id,
        |  ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS gap_us
        |FROM e ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q22_pivot" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'error') AS error,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q23_median_rank" -> medianOracle,
    // same ground truth, different physical strategy under test
    "q27_median_prefix" -> medianOracle,
    // and a third: the planner-integrated ExactGroupedMedian node
    "q32_median_plan" -> medianOracle,
    // the UNSALTED spelling — the salted join must match it exactly
    "q28_skew_join" ->
      """WITH dim AS (SELECT l_returnflag, MAX(l_extendedprice) AS maxp
        |             FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, COUNT(*) AS cnt,
        |  CAST(SUM(CASE WHEN l.l_extendedprice > maxp * 0.5
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_above
        |FROM lineitem l JOIN dim USING (l_returnflag)
        |GROUP BY l.l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the UNPRUNED spelling — the Bloom prune must never change rows
    "q33_bloom_semi" ->
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q31_range_frame" ->
      """SELECT l_returnflag, l_orderkey, l_extendedprice,
        |  COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
        |    RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS n_band
        |FROM lineitem WHERE l_linenumber = 1 AND l_orderkey < 300
        |ORDER BY l_returnflag, l_extendedprice, l_orderkey""".stripMargin,
    // the plain-join spelling — bucketed layout never changes results
    "q30_bucket_join" ->
      """SELECT o_orderstatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // the plain theta-join spelling of the binned range join
    "q29_range_join" ->
      """SELECT s_suppkey, COUNT(*) AS n_cust, MIN(c_custkey) AS min_cust
        |FROM supplier JOIN customer
        |  ON c_acctbal >= s_acctbal - 50.0 AND c_acctbal <= s_acctbal + 50.0
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,
    "q24_asof_join" ->
      """WITH p AS (SELECT event_id AS pid, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS c_us,
        |    MAX(event_id) AS cid
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT pid, p.user_id, p_us, cid, p_us - c_us AS gap_us
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND c.c_us <= p.p_us
        |ORDER BY pid""".stripMargin,
    "q36_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS c,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,
    "q35_unpivot" ->
      """SELECT l_orderkey, metric, value FROM (
        |  SELECT l_orderkey, 'l_quantity' AS metric, l_quantity AS value
        |  FROM lineitem WHERE l_linenumber = 1
        |  UNION ALL
        |  SELECT l_orderkey, 'l_extendedprice', l_extendedprice
        |  FROM lineitem WHERE l_linenumber = 1
        |  UNION ALL
        |  SELECT l_orderkey, 'l_discount', l_discount
        |  FROM lineitem WHERE l_linenumber = 1)
        |ORDER BY l_orderkey, metric""".stripMargin,
    "q34_asof_forward" ->
      """WITH p AS (SELECT event_id AS pid, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS c_us,
        |    MAX(event_id) AS cid
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT pid, p.user_id, p_us, cid, c_us - p_us AS gap_us
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND c.c_us >= p.p_us
        |ORDER BY pid""".stripMargin,
    "q25_outer_join" ->
      """WITH custs AS (
        |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 0),
        |stats AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT COALESCE(c_custkey, -1) AS ck, COALESCE(o_custkey, -1) AS ok,
        |  COALESCE(c_mktsegment, 'NONE') AS seg,
        |  CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
        |  COALESCE(spend, 0.0) AS spend
        |FROM custs FULL OUTER JOIN stats ON c_custkey = o_custkey
        |ORDER BY ck, ok""".stripMargin,
    "q26_ntile" ->
      """SELECT l_returnflag, l_orderkey, l_extendedprice,
        |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
        |  CUME_DIST() OVER w AS cd,
        |  PERCENT_RANK() OVER w AS pr
        |FROM lineitem
        |WHERE l_linenumber = 1 AND l_orderkey < 300
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |ORDER BY l_returnflag, l_extendedprice, l_orderkey""".stripMargin,
  )
}
