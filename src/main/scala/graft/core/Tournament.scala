package graft.core

import java.util.Random
import scala.collection.mutable.ArrayBuffer

/** One individual: bit-packed genome + cached fitness (0 = unevaluated;
  * offspring are always emitted unevaluated and re-scored next
  * generation, the reference's design —
  * /root/reference/src/edu/illinois/ga/MapReduce.java:240-241). */
case class Individual(genome: Array[Long], fitness: Long)

/** Streaming sliding-window tournament selection + paired uniform
  * crossover — the reference reducer's exact semantics
  * (/root/reference/src/edu/illinois/ga/MapReduce.java:150-275),
  * as a pure Iterator→Iterator function so it runs inside one
  * `mapPartitions` with no shuffle and is unit-testable without Spark.
  *
  * Replicated semantics (see SURVEY.md §2.1 op 9):
  *  - window = last S arrivals in a ring buffer; argmax scans slots in
  *    index order with strict `>`, so slot-order (not arrival-order)
  *    tie-breaking is preserved;
  *  - tournaments start at arrival S (the first S rows only warm the
  *    window up; the reference's "replay" copy into the buffer's second
  *    half is dead code — `tournament(startIndex)` ignores its argument
  *    and always scans slots 0..S-1 — so we do not replicate the copy);
  *  - every second winner is paired with the previous one and uniform
  *    crossover emits both children with fitness 0;
  *  - after input exhausts, S more tournaments run over the (now
  *    frozen) final window — the reference's closeAndWrite
  *    (/root/reference/src/edu/illinois/ga/MapReduce.java:255-275) —
  *    so exactly `rows` winners are produced and the population size
  *    is preserved generation over generation.
  */
object Tournament {

  def selectAndCross(rows: Iterator[Individual], tournamentSize: Int,
      rng: Random): Iterator[Individual] = {
    val S = tournamentSize
    val windowG = new Array[Array[Long]](S)
    val windowF = new Array[Long](S)
    val pair = new Array[Array[Long]](2)
    val out = new ArrayBuffer[Individual]()
    var processed = 0

    // argmax over slots 0..S-1, strict >, slot order — byte-for-byte
    // the reference's tournament() loop (MapReduce.java:203-214).
    def tournamentWinner(): Array[Long] = {
      var best: Array[Long] = null
      var bestF = -1L
      var j = 0
      while (j < S) {
        if (windowF(j) > bestF) { bestF = windowF(j); best = windowG(j) }
        j += 1
      }
      best
    }

    def step(): Unit = {
      pair(processed % 2) = tournamentWinner()
      if ((processed - S) % 2 == 1) {
        val (c1, c2) = Genome.uniformCrossover(pair(0), pair(1), rng)
        out += Individual(c1, 0L)
        out += Individual(c2, 0L)
      }
      processed += 1
    }

    val buffered = new ArrayBuffer[Individual]()
    var warming = true
    while (rows.hasNext && warming) {
      val r = rows.next()
      windowG(processed % S) = r.genome
      windowF(processed % S) = r.fitness
      buffered += r
      processed += 1
      if (processed == S) warming = false
    }
    if (warming) {
      // Partition smaller than the window: no tournament is possible;
      // pass the rows through unchanged (deviation from the reference,
      // which would read uninitialized buffer slots — SURVEY §2.1
      // "semantic decisions").
      return buffered.iterator
    }
    while (rows.hasNext) {
      val r = rows.next()
      windowG(processed % S) = r.genome
      windowF(processed % S) = r.fitness
      step()
    }
    // closeAndWrite: S wrap-up tournaments over the frozen window.
    var k = 0
    while (k < S) { step(); k += 1 }
    // Odd row counts leave the final winner unpaired (children =
    // rows - 1). The reference drifts here too — it assumed exactly
    // `pop` rows per task, which the random partitioner only
    // approximates (SURVEY §2.1 "semantic decisions"). We instead emit
    // one selection-only survivor so the population size is preserved
    // exactly, partition by partition.
    val rowsSeen = processed - S
    if (out.size < rowsSeen) out += Individual(tournamentWinner(), 0L)
    out.iterator
  }
}
