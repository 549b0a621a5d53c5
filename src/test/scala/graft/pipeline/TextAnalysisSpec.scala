package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private lazy val docs = Seq(
    (0L, "The quick brown fox, and the lazy dog!"),
    (1L, "der hund und die katze ist ein tier"),
    (2L, "xyzzy plugh"),
  ).toDF("doc_id", "text")

  test("token counts") {
    val r = TextAnalysis.tokenCounts(docs).collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r(0L) == 8)
    assert(r(1L) == 8)
    assert(r(2L) == 2)
  }

  test("quality: stopword ratio and punct ratio") {
    val r = TextAnalysis.qualityScores(docs, Seq("the", "a", "and")).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(2), x.getDouble(3)))).toMap
    // doc 0: 3 stopword hits of 8 tokens; 2 punct chars of 38 chars
    assert(math.abs(r(0L)._2 - 3.0 / 8) < 1e-6)
    assert(math.abs(r(0L)._1 - 2.0 / 38.0) < 1e-6)
    assert(r(2L)._2 == 0.0)
  }

  test("language id: argmax with declared precedence, und on no hits") {
    val r = TextAnalysis.languageId(docs).collect()
      .map(x => x.getLong(0) -> x.getString(5)).toMap
    assert(r(0L) == "en")
    assert(r(1L) == "de")
    assert(r(2L) == "und")
  }

  test("top bigrams: counted across docs, single-token docs contribute none") {
    val b = Seq((0L, "a b a b"), (1L, "a b c"), (2L, "solo"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.topBigrams(b, topK = 2).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    // "a b" twice in doc0 + once in doc1; ties broken alphabetically
    assert(r == Seq(("a b", 3L), ("b a", 1L)))
  }

  test("token chunking: fixed windows, ragged tail, order preserved") {
    val d = Seq((0L, "a b c d e"), (1L, "x y")).toDF("doc_id", "text")
    val r = TextAnalysis.chunkTokens(d, chunkSize = 2).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getString(3))).toSeq
      .sortBy(x => (x._1, x._2))
    assert(r == Seq(
      (0L, 0, 2, "a b"), (0L, 1, 2, "c d"), (0L, 2, 1, "e"),
      (1L, 0, 2, "x y")))
  }

  test("token chunking reconstructs the token stream exactly (corpus invariant)") {
    val corpus = graft.ops.Tables.documents(spark, sf("sf0.001"))
    val chunks = TextAnalysis.chunkTokens(corpus, chunkSize = 64)
    // collect_list order is not preserved across the aggregation
    // shuffle — sort the (idx, text) structs explicitly
    val rebuilt = chunks
      .groupBy("doc_id")
      .agg(sum(col("n_chunk_tokens")).as("n"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
          s => s.getField("chunk_text")), " ").as("joined"))
    val expected = corpus.select(col("doc_id"),
      size(TextFunctions.tokens(col("text"))).cast("long").as("n"),
      concat_ws(" ", TextFunctions.tokens(col("text"))).as("joined"))
    assert(rebuilt.join(expected, Seq("doc_id", "n", "joined"), "inner").count()
      == corpus.count(), "chunks must partition the token stream losslessly")
  }

  test("repetition stats: distinct ratio and top-token share, hand-computed") {
    val d = Seq(
      (0L, "spam spam spam spam eggs"),          // 5 tokens, 2 distinct, max mult 4
      (1L, "all words here are unique tokens"),  // 6 tokens, all distinct
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(d).collect()
      .map(x => x.getLong(0) -> ((x.getInt(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(r(0L) == ((5, 2.0 / 5, 4.0 / 5)))
    assert(r(1L) == ((6, 1.0, 1.0 / 6)))
  }

  test("fingerprints: md5 normalization and rolling hash") {
    val r = TextAnalysis.fingerprints(docs).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val byId = r.map(x => x._1 -> x).toMap
    // rolling fp of doc 2: tokens "xyzzy"(5) "plugh"(5): ((0*31+5)%M*31+5)%M = 160
    assert(byId(2L)._3 == 160L)
    // md5 is of lowercased whitespace-normalized text
    val dup = Seq((9L, "THE  quick   brown fox, and the lazy dog!"))
      .toDF("doc_id", "text")
    val fp9 = TextAnalysis.fingerprints(dup).collect().head.getString(1)
    assert(fp9 == byId(0L)._2)
  }

  test("redaction: planted emails and IPs are counted and scrubbed") {
    import SparkSpec.session.implicits._
    val d = Seq(
      (0L, "contact alice@example.com or bob.smith+tag@mail.co today"),
      (1L, "server 10.0.0.1 and 192.168.1.255 are up"),
      (2L, "mixed root@10.0.0.1 host"), // email pattern does NOT span the ip
      (3L, "no pii here at all"),
    ).toDF("doc_id", "text")
    val r = TextAnalysis.redactionStats(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(0L)._1 == 2 && r(0L)._2 == 0)
    assert(r(1L)._1 == 0 && r(1L)._2 == 2)
    assert(r(3L) == ((0L, 0L, "no pii here at all".length.toLong)))
    // scrubbed length reflects the replacement tokens, not the PII
    assert(r(1L)._3 == "server <IP> and <IP> are up".length)
  }

  test("postings: df counts docs once, tf counts every occurrence, total-order top-k") {
    import SparkSpec.session.implicits._
    val d = Seq(
      (0L, "a a b c"),
      (1L, "a b b"),
      (2L, "c"),
    ).toDF("doc_id", "text")
    val r = TextAnalysis.postings(d, topK = 10).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    // a: df 2 tf 3; b: df 2 tf 3; c: df 2 tf 2 — ties broken by term
    assert(r.toSeq == Seq(("a", 2L, 3L), ("b", 2L, 3L), ("c", 2L, 2L)))
    // topK boundary is deterministic: k=2 keeps the (df,tf,term) prefix
    val top2 = TextAnalysis.postings(d, topK = 2).collect().map(_.getString(0))
    assert(top2.toSeq == Seq("a", "b"))
  }

  test("multimodal resize: nearest-neighbor byte selection, never upsamples") {
    import SparkSpec.session.implicits._
    val d = Seq((0L, "abcdefgh"), (1L, "xy"), (2L, "")).toDF("doc_id", "text")
    val r = Multimodal.resize(Multimodal.asMedia(d), targetBytes = 4)
      .collect().map(m => m.doc_id -> m).toMap
    // 8 bytes -> 4: indices floor(i*8/4) = 0,2,4,6 -> 'a','c','e','g'
    assert(new String(r(0L).payload, "UTF-8") == "aceg")
    assert(r(0L).meta.nBytes == 4L)
    // shorter than target: passthrough, not upsampled
    assert(new String(r(1L).payload, "UTF-8") == "xy" && r(1L).meta.nBytes == 2L)
    assert(r(2L).payload.isEmpty && r(2L).meta.nBytes == 0L)
  }

  test("multimodal: metadata, batched features, frame sampling") {
    val media = Multimodal.asMedia(docs)
    val meta = media.select("doc_id", "meta.nBytes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(meta(0L) == 38L)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 3)
    assert(feats.forall(_.features.length == Multimodal.FeatureDim))
    assert(feats.forall(_.features.forall(f => f >= 0f && f <= 1f)))
    // determinism: same payload -> same features
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
    val frames = Multimodal.sampleFrames(media, frames = 4).collect()
    assert(frames.length == 12)
    // frame bytes sum to ~payload size (integer division truncation tail)
    val sums = frames.groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(2)).sum)
    assert(sums(0L) <= 38 && sums(0L) >= 36)
  }

  test("perceptual aHash: stable under small payload edits, distinct otherwise") {
    import SparkSpec.session.implicits._
    val base = "A" * 200 + "B" * 56 // 256 bytes, strong block structure
    val d = Seq(
      (0L, base),
      (1L, base.updated(10, 'C').updated(150, 'D')), // 2 bytes edited
      (2L, "z" * 100 + "q" * 156), // different structure
      (3L, "")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(d)
    val hashes = Multimodal.perceptualHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // determinism + empty-payload sentinel
    assert(hashes(3L) == 0L)
    // tiny edits perturb few of the 64 sampled pixels
    assert(java.lang.Long.bitCount(hashes(0L) ^ hashes(1L)) <= 3,
      s"small edit moved hamming too far: ${hashes(0L)} vs ${hashes(1L)}")
    val pairs = Multimodal.perceptualNearDup(media, maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "edited near-copy not found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "empty payloads must not pair")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)),
      "structurally different payloads paired")
  }

  test("perceptual near-dup banding equals brute force at hamming <= 3") {
    import SparkSpec.session.implicits._
    val rng = new scala.util.Random(7)
    // random 128-byte payloads + planted 1-byte-edit near-copies
    val base = (0 until 30).map(i =>
      (i.toLong, Array.fill(128)((rng.nextInt(26) + 'a').toChar).mkString))
    val edited = (0 until 10).map { i =>
      (100L + i, base(i)._2.updated(rng.nextInt(128), '!'))
    }
    val d = (base ++ edited).toDF("doc_id", "text")
    val media = Multimodal.asMedia(d)
    val hashes = Multimodal.perceptualHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 3
    } yield (a, b)).toSet
    val banded = Multimodal.perceptualNearDup(media, maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture must plant hamming<=3 pairs")
    assert(banded == brute,
      s"missing ${brute -- banded}, extra ${banded -- brute}")
  }

  // brute-force winnowing reference: same md5-40bit kgram hash, same
  // h·2^20+pos key, same full-window starts
  private def winnowRef(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val kgs = (0 to toks.size - k)
      .map(i => toks.slice(i, i + k).mkString(" "))
    val keys = kgs.zipWithIndex.map { case (g, idx) =>
      java.lang.Long.parseLong(md5hex(g).take(10), 16) * 1048576L + idx + 1
    }
    val m = keys.size
    if (m == 0) Set.empty
    else (1 to math.max(m - w + 1, 1))
      .map(s => keys.slice(s - 1, math.min(s - 1 + w, m)).min)
      .toSet.map((sel: Long) => (sel % 1048576L, sel / 1048576L))
  }

  test("winnowing fingerprints match the brute-force reference per doc") {
    val fixture = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "repeat repeat repeat repeat repeat repeat"),
      (3L, "short doc"),          // fewer tokens than k -> no kgrams
      (4L, "one two three"),      // exactly one kgram -> one window
      (5L, "   "),                // blank -> no tokens
    ).toDF("doc_id", "text")
    val got = TextAnalysis.winnowingFingerprints(fixture, k = 3, window = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet
      }
    val texts = Map(
      0L -> "the quick brown fox jumps over the lazy dog again and again",
      1L -> "a b c d e f g h i j k l m n o p",
      2L -> "repeat repeat repeat repeat repeat repeat",
      3L -> "short doc", 4L -> "one two three", 5L -> "   ")
    for ((id, text) <- texts) {
      val want = winnowRef(text, 3, 4)
      assert(got.getOrElse(id, Set.empty) === want, s"doc $id")
    }
    assert(got(4L).size === 1, "single kgram -> exactly one fingerprint")
    assert(!got.contains(3L) && !got.contains(5L))
  }

  test("winnowing guarantee: a shared run of window+k-1 tokens shares a fingerprint") {
    // w=4, k=3: any common substring of >= 6 tokens must collide on
    // at least one fingerprint HASH regardless of surrounding context
    val shared = "alpha beta gamma delta epsilon zeta"
    val twoDocs = Seq(
      (0L, s"intro words here $shared trailing stuff"),
      (1L, s"completely different preamble text $shared and another ending"),
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(twoDocs, k = 3, window = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    assert((fps(0L) & fps(1L)).nonEmpty,
      s"no shared fingerprint: ${fps(0L)} vs ${fps(1L)}")
  }

  test("winnowing: a doc past the 2^20 k-gram packing limit fails loudly") {
    // 2^20 + 2 tokens of one word -> 2^20 k-grams at k=3: position
    // packing would wrap silently; the in-lambda guard must raise
    val oversize = Seq((0L, Array.fill(1048578)("x").mkString(" ")))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextAnalysis.winnowingFingerprints(oversize, k = 3, window = 4).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("2^20")), messages(e).toString)
  }

  test("cooccurrence counts skip-gram pairs up to the window distance") {
    val d = Seq((0L, "a b c a")).toDF("doc_id", "text")
    val got = TextAnalysis.cooccurrence(d, window = 2, topK = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // d=1: (a b)(b c)(c a); d=2: (a c)(b a)
    assert(got === Map("a b" -> 1L, "b c" -> 1L, "c a" -> 1L,
      "a c" -> 1L, "b a" -> 1L), got.toString)
  }

  test("vocabOov: per-doc OOV counts against the corpus top-k vocabulary") {
    // corpus counts: "the"x4, "cat"x3, "sat"x2, singles: mat, dog, ran
    val d = Seq(
      (0L, "the cat sat"),
      (1L, "the cat sat the mat"),
      (2L, "the dog ran the cat"),
    ).toDF("doc_id", "text")
    // vocab of 3 = {the, cat, sat} (count desc, token asc on ties)
    val got = TextAnalysis.vocabOov(d, vocabSize = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L) === ((3L, 0L, 0.0)), got.toString)
    assert(got(1L) === ((5L, 1L, 0.2)), got.toString) // mat
    assert(got(2L) === ((5L, 2L, 0.4)), got.toString) // dog ran
  }

  test("cooccurrence at window 1 equals topBigrams") {
    val co = TextAnalysis.cooccurrence(docs, window = 1, topK = 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val bi = TextAnalysis.topBigrams(docs, topK = 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(co === bi)
  }

  test("packSequences == in-memory greedy reference; docs never split") {
    val d = (0L until 200L).map(i => (i, Seq.fill((i % 7 + 1).toInt)("w")
      .mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(d, budget = 10, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // independent reference: same Lehmer hash, per-shard hash-order
    // greedy prefix packing
    val P = Sampling.P; val A = Sampling.A
    def h(id: Long) = id % P * A % P * A % P
    val want = (0L until 200L).map(i => (i, h(i) % 4, h(i), i % 7 + 1))
      .groupBy(_._2).toSeq.flatMap { case (shard, docs0) =>
        var prefix = 0L
        docs0.sortBy(x => (x._3, x._1)).map { case (id, sh, _, n) =>
          val row = (id, sh, prefix / 10, n)
          prefix += n
          row
        }
      }.toSet
    assert(got == want)
    // every doc appears exactly once (packing is a partition)
    assert(got.map(_._1).size == 200)
  }

  test("boilerplate removal: high-df chunks drop everywhere, body order survives") {
    // "hh hh" is the shared header chunk (df 3 > maxDf 2); bodies unique
    val d = Seq(
      (0L, "hh hh aa bb cc dd"),
      (1L, "hh hh ee ff gg kk"),
      (2L, "hh hh mm nn oo pp"),
      (3L, "qq rr ss tt")) // no header at all
      .toDF("doc_id", "text")
    val r = TextAnalysis.boilerplateRemoval(d, chunkSize = 2, maxDf = 2)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2))))
      .toMap
    assert(r(0L) == (2L, "aa bb cc dd"))
    assert(r(1L) == (2L, "ee ff gg kk"))
    assert(r(2L) == (2L, "mm nn oo pp"))
    assert(r(3L) == (2L, "qq rr ss tt"))
  }

  test("boilerplate removal: a fully-boilerplate document drops out") {
    val d = Seq(
      (0L, "spam spam"), (1L, "spam spam"), (2L, "spam spam"),
      (3L, "spam spam real content here"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.boilerplateRemoval(d, chunkSize = 2, maxDf = 3)
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    // the "spam spam" chunk is in 4 docs > 3: docs 0-2 vanish, doc 3
    // keeps only its body chunks
    assert(r == Map(3L -> "real content here"))
  }

  test("boilerplate removal below threshold is an order-preserving identity") {
    val d = Seq((0L, "a b c d e"), (1L, "f g h i")).toDF("doc_id", "text")
    val r = TextAnalysis.boilerplateRemoval(d, chunkSize = 2, maxDf = 1)
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r == Map(0L -> "a b c d e", 1L -> "f g h i"))
  }

  test("boilerplate removal plan: broadcast anti-join, no Window") {
    val d = Seq((0L, "a b"), (1L, "c d")).toDF("doc_id", "text")
    val plan = TextAnalysis.boilerplateRemoval(d, chunkSize = 2, maxDf = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"blocklist filter is not a broadcast anti-join:\n$plan")
    assert(!plan.contains("Window"),
      s"reassembly must not use a per-doc Window funnel:\n$plan")
  }

  // searchConjunctive: d1 has both terms (alpha×2, beta×1 → score 3);
  // d2 has both once each (score 2); d3 has only alpha (conjunction
  // fails); d4 has neither
  private lazy val searchDocs = Seq(
    (1L, "alpha beta alpha gamma"),
    (2L, "beta delta alpha"),
    (3L, "alpha alpha alpha alpha"),
    (4L, "epsilon zeta"),
  ).toDF("doc_id", "text")

  test("searchConjunctive: AND semantics, tf ranking, deterministic ties") {
    val got = TextAnalysis.searchConjunctive(searchDocs,
      Seq("q" -> Seq("alpha", "beta")), k = 10)
      .select("qid", "doc_id", "score", "rank")
      .as[(String, Long, Long, Long)].collect().sortBy(_._4).toSeq
    assert(got === Seq(("q", 1L, 3L, 1L), ("q", 2L, 2L, 2L)), s"got $got")
  }

  test("searchConjunctive: k caps results; duplicate query terms collapse") {
    val got = TextAnalysis.searchConjunctive(searchDocs,
      Seq("q" -> Seq("Alpha", "alpha")), k = 2)
      .select("doc_id", "rank").as[(Long, Long)].collect().sortBy(_._2).toSeq
    // single distinct term "alpha": d3 (tf 4) then d1 (tf 2), k=2 cuts d2
    assert(got === Seq((3L, 1L), (1L, 2L)), s"got $got")
  }

  test("searchConjunctive plan: query terms broadcast, rank pushed to WindowGroupLimit") {
    val plan = TextAnalysis.searchConjunctive(searchDocs,
      Seq("q" -> Seq("alpha", "beta")), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"term probe must be a broadcast join:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k must push into WindowGroupLimit:\n$plan")
  }

  test("lmScore: add-one bigram LM arithmetic by hand — smoothed " +
    "in-vocab probability, OOV fallback, 'short' for bigram-less docs") {
    // ref "a b a c": bigrams (a,b)(b,a)(a,c); contexts a=2 b=1; V=3
    val ref = Seq((100L, "a b a c")).toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "a b"), // (a,b): log2((1+1)/(2+3)) = log2(0.4)
      (1L, "z z"), // OOV:   log2((0+1)/(0+3)) = log2(1/3)
      (2L, "hello"), // one token: nothing to score
    ).toDF("doc_id", "text")
    val r = TextAnalysis.lmScore(corpus, ref, threshold = -1.5)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2),
          Option(x.get(3)).map(_.asInstanceOf[Double]),
          x.getString(4)))).toMap
    val (n0, oov0, s0, v0) = r(0L)
    assert(n0 == 1 && oov0 == 0 && v0 == "keep")
    assert(math.abs(s0.get - math.log(0.4) / math.log(2)) < 1e-12)
    val (n1, oov1, s1, v1) = r(1L)
    assert(n1 == 1 && oov1 == 1 && v1 == "drop")
    assert(math.abs(s1.get - math.log(1.0 / 3) / math.log(2)) < 1e-12)
    val (n2, oov2, s2, v2) = r(2L)
    assert(n2 == 0 && oov2 == 0 && s2.isEmpty && v2 == "short")
  }
}
