package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language/topic profiling, document
  * fingerprinting. All pure Column expressions (whole-stage codegen; no
  * UDFs), so a single scan handles billions of documents, and filters on the
  * derived columns push down to nothing extra.
  *
  * Portability note: token hashing derives from md5 hex (identical across
  * engines) rather than engine-native hash functions.
  */
object TextOps {

  /** Whitespace tokens. Single-space split for cross-engine determinism. */
  def tokens(text: Column): Column = split(text, " ")

  /** GPT-2-style pre-tokenization pattern (the public BPE pre-split regex):
    * contraction suffixes, space-glued letter runs, digit runs, punctuation
    * runs, residual whitespace. */
  val BpeishPattern: String =
    """'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""

  /** BPE-ish token count: the number of pre-tokenization pieces under
    * [[BpeishPattern]] — a deterministic, engine-side stand-in for a real
    * BPE tokenizer's length (every BPE token boundary is inside one piece,
    * so this lower-bounds the true count while needing no vocab file). One
    * codegen'd regexp pass per row. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** 64-bit-ish (60-bit) content fingerprint: first 15 hex chars of md5. */
  def fingerprint64(text: Column): Column =
    conv(substring(md5(text), 1, 15), 16, 10).cast("long")

  /** Portable 32-bit token hash (md5 prefix). */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Token/char statistics + a composite quality score. Mirrors the
    * length/stopword-ratio heuristics used in data-cleaning pipelines. */
  def withTextStats(df: DataFrame, textCol: String = "text",
                    stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val toks = tokens(col(textCol))
    val stopArr = array(stopwords.map(lit): _*)
    df.withColumn("n_chars_calc", length(col(textCol)))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(toks)).cast("long"))
      .withColumn("sum_token_len",
        aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (acc, x) => acc + x))
      .withColumn("n_stopwords",
        size(filter(toks, t => array_contains(stopArr, t))).cast("long"))
      .withColumn("distinct_ratio", col("n_distinct_tokens") / col("n_tokens"))
      .withColumn("avg_token_len", col("sum_token_len") / col("n_tokens"))
      .withColumn("stopword_ratio", col("n_stopwords") / col("n_tokens"))
      .withColumn("quality",
        lit(0.4) * col("distinct_ratio")
          + lit(0.4) * (lit(1.0) - col("stopword_ratio"))
          + lit(0.2) * least(col("n_tokens") / 100.0, lit(1.0)))
  }

  /** Deterministic character-trigram count embedding: `dims`-dimensional
    * vector where v[j] = number of char trigrams whose md5-derived bucket is
    * j. Near-duplicate texts share almost all trigrams, so their cosine
    * similarity approaches 1 — the portable "embedding" feeding
    * [[graft.operators.Similarity.cosineNearDupPairs]] when no learned
    * embedding column exists. Pure Column expressions (explode + one
    * groupBy), reproducible across engines via the md5 bucketing. */
  def trigramVectors(df: DataFrame, idCol: String, textCol: String,
                     dims: Int = 64): DataFrame = {
    // explode a NATIVE int sequence (codegen generator), then one substring
    // per row — not an interpreted per-row array of substrings. Rebalance the
    // raw docs BEFORE the ~|text|-fold explode: the explode multiplies work
    // ~300×, so a one-time shuffle of the (tiny relative to its expansion)
    // doc frame keeps the hash/count stage wide even when the source arrives
    // in a handful of splits.
    val tris = df.filter(length(col(textCol)) >= 3)
      .select(col(idCol).as("vid"), col(textCol).as("_txt"))
      .repartition(col("vid"))
      .select(col("vid"), expr("explode(sequence(1, length(_txt) - 2))").as("_i"), col("_txt"))
      .select(col("vid"), expr("substring(_txt, _i, 3)").as("_tri"))
    val counts = tris
      .withColumn("_b", conv(substring(md5(col("_tri")), 1, 4), 16, 10).cast("long") % dims)
      .groupBy("vid", "_b").agg(count(lit(1)).cast("double").as("_c"))
    counts.groupBy("vid")
      .agg(map_from_entries(collect_list(struct(col("_b"), col("_c")))).as("_m"))
      .select(col("vid"),
        expr(s"transform(sequence(0, ${dims - 1}), j -> coalesce(_m[cast(j AS BIGINT)], 0.0d))")
          .as("vec"))
  }

  /** Profile scores: fraction of tokens belonging to each named marker set —
    * the n-gram-profile language-ID heuristic generalized to arbitrary
    * profiles (language markers, topic lexicons). Adds one `score_<name>`
    * column per profile plus `pred_<best>` label. */
  def withProfileScores(df: DataFrame, profiles: Map[String, Seq[String]],
                        textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = profiles.toSeq.sortBy(_._1).foldLeft(df) { case (f, (name, words)) =>
      val arr = array(words.map(lit): _*)
      f.withColumn(s"score_$name",
        size(filter(toks, t => array_contains(arr, t))).cast("double") / size(toks))
    }
    // argmax with deterministic tie-break on profile name (sorted order)
    val names = profiles.keys.toSeq.sorted
    val best = names.tail.foldLeft((lit(names.head), col(s"score_${names.head}"))) {
      case ((bn, bs), n) =>
        val s = col(s"score_$n")
        (when(s > bs, lit(n)).otherwise(bn), when(s > bs, s).otherwise(bs))
    }
    scored.withColumn("pred_profile", best._1)
  }

  /** TF-IDF weights per (doc, term) — smooth idf `ln((N+1)/(df+1)) + 1`
    * (the sklearn TfidfVectorizer smoothing), the standard representation
    * behind curation-time domain/quality classifiers and keyword
    * extraction. Scale shape: one token explode + two aggregations (term
    * counts keyed by (doc, term); document frequencies keyed by term) +
    * one term-keyed join; the corpus size N rides in as a broadcast
    * one-row aggregate, so the whole op stays plan-only — no driver
    * counts, no vocabulary collected anywhere. */
  def tfidf(df: DataFrame, idCol: String, textCol: String = "text"): DataFrame = {
    val terms = df.select(col(idCol).as("doc"),
      explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") *
          (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)))
      .select(col("doc"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Top-k terms per doc by tf-idf (rounded-weight desc, term asc — the
    * deterministic cross-engine ranking). */
  def topTerms(df: DataFrame, idCol: String, k: Int,
               textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    tfidf(df, idCol, textCol)
      .withColumn("rank", row_number().over(Window.partitionBy("doc")
        .orderBy(round(col("tfidf"), 6).desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col("doc"), col("rank"), col("term"), col("tfidf"))
  }

  /** Corpus-trained bigram perplexity — the CCNet/Gopher-style quality
    * signal: score every document by how predictable its token stream is
    * under a bigram LM fit on the corpus itself (MLE `P(b|a) =
    * C(a,b)/C(a)`; scoring the training corpus means every bigram was
    * counted, so MLE needs no smoothing and stays exactly
    * SQL-expressible). `ppl = exp(−avg ln P(b|a))` over the doc's
    * bigrams; repetitive/templated docs score low, incoherent
    * token-salad docs score near the effective vocabulary size.
    *
    * Scale shape is the [[tfidf]] one: one bigram explode (native
    * sequence generator over the token array, no per-row Scala), two
    * aggregations (bigram counts keyed by (a,b); context counts keyed by
    * a), one bigram-keyed join back to the stream, one per-doc average.
    * No driver-side vocabulary, no broadcast of unbounded state. Docs
    * with fewer than 2 tokens have no bigrams and are absent from the
    * output. */
  def bigramPerplexity(df: DataFrame, idCol: String,
                       textCol: String = "text"): DataFrame = {
    val big = df
      .select(col(idCol).as("doc"), tokens(col(textCol)).as("_t"))
      .select(col("doc"), expr(
        "explode(transform(sequence(1, size(_t) - 1), i -> struct(_t[i-1] AS a, _t[i] AS b)))")
        .as("bg"))
      .select(col("doc"), col("bg.a").as("a"), col("bg.b").as("b"))
    val bigramC = big.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val contextC = big.groupBy("a").agg(count(lit(1)).as("c_a"))
    big.join(bigramC, Seq("a", "b")).join(contextC, Seq("a"))
      .withColumn("_lp", log(col("c_ab").cast("double") / col("c_a").cast("double")))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_bigrams"), exp(-avg(col("_lp"))).as("ppl"))
  }

  /** Interpolated Kneser–Ney n-gram perplexity with a TRAIN/SCORE split —
    * the CCNet-style quality filter [[bigramPerplexity]] approximates: fit
    * the LM on `train`, score every `score` document, so held-out scoring
    * exercises the OOV/backoff path a self-scored MLE model can never
    * reach (every self-scored gram was counted by construction).
    *
    * The estimator (Kneser & Ney 1995; Chen & Goodman 1999, interpolated
    * form, fixed absolute discount D):
    *
    *  - highest order n uses RAW counts:
    *    `P(w|ctx) = max(c(ctx·w) − D, 0)/c(ctx) + D·N1+(ctx·•)/c(ctx) · P_{n−1}`,
    *    with `c(ctx) = Σ_w c(ctx·w)` (prefix mass, so the distribution
    *    normalizes without padding);
    *  - lower orders 1 < m < n use CONTINUATION counts off the DISTINCT
    *    (m+1)-gram types: `cc(g) = N1+(•g)` (distinct left-extensions),
    *    normalizer `N1+(•ctx•) = Σ_w cc(ctx·w)`, recursing identically;
    *    a context with zero continuation mass backs off entirely (λ = 1);
    *  - unigram: `P(w) = max(N1+(•w) − D, 0)/N_bt + D·V_cont/N_bt · 1/(V+1)`
    *    over distinct bigram types N_bt — the 1/(V+1) uniform term
    *    reserves mass for OOV tokens, so an unseen word scores a small
    *    positive probability instead of −∞ and no score row is dropped.
    *
    * Grams are document-internal (no BOS/EOS padding — the
    * [[bigramPerplexity]] convention); docs with fewer than n tokens have
    * no full n-gram and are absent from the output.
    *
    * Scale shape: every model table is a distributed aggregation over a
    * gram explode (native sequence generator, no per-row Scala); scoring
    * is n LEFT equi-joins keyed by gram strings (single-space joined —
    * tokens are whitespace-split so the key is collision-free); the only
    * driver state is three scalar constants (N_bt, V_cont, V). No
    * broadcast of unbounded vocabulary, no driver-side loops — the same
    * plan runs a 10⁹-doc corpus with the gram aggregates sharded on their
    * keys.
    *
    * Width ownership (§2.9.16 #1 promoted from the scale battery into the
    * operator): every exchange this operator creates below the one big
    * gram-count aggregate carries rows bounded by the corpus's gram TYPE
    * space, whose record count saturates while a session width sized for
    * token volume keeps growing — at the 2×10⁷-doc battery decade the
    * rows-rule session width (8,000) put ~121M type rows through
    * map_tasks × reduce_width ≈ 64M zstd segments (~2 records/frame) and
    * per-segment codec init/flush grew reduce CPU 5–7.5× for 1.2×
    * records (wall 1,705 → 366.5 s at a bytes-sized width, identical
    * operator code). Every model/type-table exchange is therefore pinned
    * to ONE operator-owned width `w`
    * ([[graft.core.Widths.ownedForBytes]] over the COUNTED train token
    * volume at the battery's measured ~80 B/gram ≈ 27·n B/row model —
    * the count rides the vocabulary pass for free), independent of the
    * session width. The two big explode aggregates (the n-gram count and
    * the bigram-type distinct) keep their planner exchanges — a
    * rows-rule width is RIGHT for those, and an explicit repartition
    * there would forfeit map-side partial aggregation — but their
    * checkpoints coalesce/repartition to `w` so downstream map counts
    * stop inheriting the session width.
    *
    * Model-table pins exploit the distribution rules' asymmetry:
    * aggregates accept subset-key layouts (`hash(keys, w)` satisfies any
    * grouping over a SUPERSET of `keys` — one shared-suffix exchange
    * feeds both aggregates of each continuation level), while joins
    * require the EXACT key set on both sides (the all-cluster-keys
    * co-partition rule), so each model table's OUTPUT carries its own
    * join-key hash(·, w) layout — the count table via a key-preserving
    * hashed checkpoint, the rest via their aggregates' preserved input
    * pins (plus one bounded output pin for the continuation-count
    * table). EnsureRequirements then leaves every model side in place
    * and sizes the score stream's exchanges at `w` to match. Single-token
    * pin keys (the unigram/bigram levels) ride the same hash spread the
    * session default would: per-key volume is bounded by the
    * vocabulary's continuation sets.
    *
    * Join strategy is deliberately two-tier: when the n-gram count
    * table's own plan estimate fits the session broadcast threshold the
    * score stream takes the planner's broadcast joins (ZERO score-side
    * exchanges — the estimate is the same one the planner gates on, so
    * the tiers can't disagree); past it, the pinned model layouts above
    * keep every SMJ co-partitioned at `w`.
    *
    * Returns `(doc, n_grams, ppl)` — `ppl = exp(−avg ln P)` over the
    * doc's full n-grams. */
  def knPerplexity(train: DataFrame, score: DataFrame, idCol: String,
                   textCol: String = "text", n: Int = 3,
                   discount: Double = 0.75): DataFrame = {
    require(n >= 2 && n <= 5, s"knPerplexity supports n in [2,5], got $n")
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    val D = discount

    /** (doc, w0..w{k-1}) — one row per document-internal k-gram. */
    def grams(df: DataFrame, k: Int): DataFrame = {
      val fields = (0 until k).map(j => s"_t[i+$j] AS w$j").mkString(", ")
      df.select(col(idCol).as("doc"), tokens(col(textCol)).as("_t"))
        .filter(size(col("_t")) >= k) // sequence(0, negative) runs DESCENDING
        .select(col("doc"), expr(
          s"explode(transform(sequence(0, size(_t) - $k), i -> struct($fields)))")
          .as("g"))
        .select(col("doc") +: (0 until k).map(j => col(s"g.w$j")): _*)
    }
    // ---- model tables (train side) ----
    // ONE corpus pass feeds the whole top order: the n-gram COUNT table is
    // the single explode+aggregate, the prefix mass + continuation fan-out
    // are an aggregate OF that table (sum/countDistinct over its rows),
    // and the distinct n-gram TYPE set — the (n−1)-level continuation
    // input — is its key set. Lazy checkpoints dedup the shared subtrees
    // inside the one scoring job (each model table materializes once even
    // with three consumers).
    // DISK_ONLY for every model checkpoint: the count/type tables are
    // O(corpus gram types) — at the 2×10⁷-doc battery point their
    // MEMORY_AND_DISK blocks raced the gram aggregates for the unified
    // pool (93 GB of aggregate mem-spill against the battery's 8 GB
    // heap), the screenApprox `obs` lesson verbatim; each table is
    // re-read a handful of times sequentially, a disk-friendly pattern
    val diskOnly = org.apache.spark.storage.StorageLevel.DISK_ONLY
    val full = (0 until n).map(j => s"w$j")
    val ctx = full.dropRight(1)
    // pre-pass width from the plan estimate — used ONLY to bound the
    // bigram-type checkpoint's block count before any exact count exists
    // (a LOW value is safe there: fewer, fatter blocks; the pinned
    // exchanges below use the COUNTED width w instead)
    val w0 = graft.core.Widths.ownedForExchange(
      train.select(col(idCol), col(textCol)), expansion = 4.5 * n)
    // unigram continuation counts off distinct bigram types + the three
    // scalar constants (the ONLY driver state — bounded)
    val biTypes = grams(train, 2).select(col("w0"), col("w1")).distinct()
      .coalesce(w0)
      .localCheckpoint(true, diskOnly)
    // the two scalar jobs are independent — overlap them (each is one
    // bounded aggregate; serialized they cost two scheduler round trips).
    // The vocabulary pass also counts TOTAL train tokens for free — the
    // exact row model the owned width below is sized from.
    val scalarJobs = graft.eval.Evaluation.fanOut[Int, Array[Double]](
      Seq(0, 1), parallelism = 2) {
      case 0 =>
        val r = biTypes.agg(count(lit(1)), countDistinct(col("w1"))).first()
        Array(math.max(r.getLong(0), 1L).toDouble, r.getLong(1).toDouble)
      case _ =>
        val r = train
          .select(explode(tokens(col(textCol))).as("_w"))
          .agg(countDistinct(col("_w")), count(lit(1))).first()
        Array(r.getLong(0).toDouble, r.getLong(1).toDouble)
    }
    val nBt = scalarJobs(0)(0)
    val vCont = scalarJobs(0)(1)
    val vTrain = scalarJobs(1)(0)
    val trainTokens = scalarJobs(1)(1).toLong
    // the operator-owned width (see scaladoc): one width for every pinned
    // exchange. Train side from the COUNTED token volume at the battery's
    // measured ~80 B/gram (n = 3) ≈ 27·n B row model (grams ≈ tokens;
    // Catalyst's estimate is blind to real string widths, measured ~10×
    // low on the synthetic corpus); score side from the plan estimate —
    // no counted pass exists there, and the declared deployment shapes
    // score a slice of (or the same) corpus. Type tables are strictly
    // smaller than the gram stream, and over-sizing a bounded table by
    // the gram/type ratio is benign — the quadratic segment blowup needs
    // BOTH sides of map_tasks × reduce_width oversized.
    // the COUNTED train-side width is also the score side's DEGENERATE
    // fallback (ADVICE r15): a stat-less score frame (RDD-backed, plain
    // checkpoint) must take the train-side volume model, not the session
    // width — re-inheriting the session width into the pinned model-table
    // exchanges is the exact pathology the pin exists to break
    val trainW = graft.core.Widths.ownedForBytes(train.sparkSession,
      BigInt(trainTokens) * 27L * n)
    val w = math.max(trainW,
      graft.core.Widths.ownedForExchange(
        score.select(col(idCol), col(textCol)), expansion = 4.5 * n,
        degenerateWidth = trainW))
    // rename BEFORE the pinned exchange so the aggregate's group key and
    // the score join's key are the same attribute the partitioning tracks
    val cc1 = biTypes
      .select(col("w0").as("_u"), col("w1").as(s"w${n - 1}"))
      .repartition(w, col(s"w${n - 1}"))
      .groupBy(s"w${n - 1}")
      .agg(countDistinct(col("_u")).as("cc1"))
    // the top-order count aggregates RAW grams over one explicit
    // hash(full, w) exchange — deliberately NO map-side partial
    // aggregation: top-order gram types barely repeat within a map task
    // (measured at the 6.3×10⁶ battery decade: partial output 2.40×10⁸
    // records from 3.0×10⁸ raw grams — a 1.25× reduction — while the
    // partial hash carried ~39 GB of the op's mem-spill and the partials
    // then needed a SECOND exchange to reach the checkpoint layout). Raw
    // rows over the pinned exchange move slightly more bytes once, spill
    // nothing on the map side, and land already in the advertised
    // hash(full, w) layout, so the top-order score join consumes the
    // checkpointed blocks with ZERO further exchanges (and sizes the
    // SCORE side's planner exchange: EnsureRequirements matches the width
    // of the child that already satisfies the join's distribution —
    // Spark's all-cluster-keys co-partition rule means only exact-key
    // layouts do). A plain checkpoint under AQE advertises nothing, so
    // the pre-r15 shape re-exchanged these type rows once per consumer at
    // the SESSION width — the §2.9.16 segment pathology's host. (The
    // bigram-type distinct below keeps its planner partial: LOW-order
    // types saturate fast and its partial dedup measures 12×.)
    val cN = org.apache.spark.sql.GraftCheckpoint.localCheckpointAdvertised(
      grams(train, n).repartition(w, full.map(col): _*)
        .groupBy(full.map(col): _*)
        .agg(count(lit(1)).as("c_full")),
      full, diskOnly, w)
    // one pinned (n−1)-prefix exchange: hash(ctx) satisfies BOTH phases of
    // the mixed sum/countDistinct aggregate (aggregates accept subset-key
    // layouts), and the aggregate's preserved hash(ctx, w) partitioning is
    // exactly its score join's key — that join moves no model rows
    val ctxN = cN.repartition(w, ctx.map(col): _*)
      .groupBy(ctx.map(col): _*)
      .agg(sum("c_full").as("c_ctx"), countDistinct(col(s"w${n - 1}")).as("n1p_n"))
    // continuation tables for orders m = n−1 .. 2, each off the DISTINCT
    // (m+1)-gram types (w0 = the left extension, the rest the m-gram).
    // Level n−1 reads cN's keys for free; lower levels (n ≥ 4) pay their
    // own type scan — document-final grams exist below order n that no
    // n-gram contains, so they are NOT derivable from cN. Type positions
    // are renamed onto the score gram's last-m slots so every probe join
    // is a plain column-name equi-join.
    val contTables: Map[Int, (DataFrame, DataFrame)] =
      (2 until n).map { m =>
        val types =
          if (m + 1 == n) cN.select(full.map(col): _*)
          else grams(train, m + 1)
            .select((0 to m).map(j => col(s"w$j")): _*).distinct()
        val renamed0 = types.select(col("w0").as("_u") +:
          (1 to m).map(j => col(s"w$j").as(s"w${n - m + j - 1}")): _*)
        val lastM = (n - m until n).map(j => s"w$j")
        // each aggregate rides an input pin on its OWN join key set, so
        // its preserved output layout satisfies its score join exactly
        // (the all-cluster-keys rule) and EnsureRequirements exchanges
        // only the score stream, at w. The (n−1)-level table is a narrow
        // projection of cN's already-checkpointed blocks — pinned
        // repartitions, not a second checkpoint, so the O(types) rows are
        // stored once; lower levels (n ≥ 4) pay a real distinct scan
        // (planner distinct kept for its partial dedup) and earn a hashed
        // checkpoint whose blocks the two pins below re-key from.
        val renamed =
          if (m + 1 == n) renamed0
          else org.apache.spark.sql.GraftCheckpoint.localCheckpointHashed(
            renamed0.coalesce(w), lastM.dropRight(1), diskOnly, w)
        val cc = renamed.repartition(w, lastM.map(col): _*)
          .groupBy(lastM.map(col): _*)
          .agg(countDistinct(col("_u")).as(s"cc$m"))
        // the lower levels' checkpoint already advertises the (m−1)-suffix
        // layout ct needs — only the cN-projection level pays the pin
        val ctIn =
          if (m + 1 == n) renamed.repartition(w, lastM.dropRight(1).map(col): _*)
          else renamed
        val ct = ctIn.groupBy(lastM.dropRight(1).map(col): _*)
          .agg(count(lit(1)).as(s"ct$m"),
            countDistinct(col(s"w${n - 1}")).as(s"n1p$m"))
        m -> (cc, ct)
      }.toMap
    // ---- scoring (score side) ----
    // two-tier by the planner's own size gate (scaladoc): model tables
    // whose (checkpoint-preserved) estimates fit the broadcast threshold
    // ride broadcast joins — ZERO score-side exchanges; past it, every
    // model side already carries its exact-join-key hash(·, w) layout
    // from the pins above, so EnsureRequirements leaves the model rows in
    // place and exchanges only the score stream, at w.
    var s = grams(score, n)
      .join(cN, full, "left")
      .join(ctxN, ctx, "left")
      .join(cc1, Seq(s"w${n - 1}"), "left")
    (2 until n).foreach { m =>
      val (cc, ct) = contTables(m)
      val lastM = (n - m until n).map(j => s"w$j")
      s = s.join(cc, lastM, "left").join(ct, lastM.dropRight(1), "left")
    }
    def d(c: Column): Column = coalesce(c, lit(0L)).cast("double")
    // unigram base: OOV tokens take the uniform term only (never null/−∞).
    // max(vCont, 1) keeps the uniform weight positive for a DEGENERATE
    // train corpus with zero bigram types (empty/one-token docs): every
    // score gram then gets the same finite constant instead of ln 0 —
    // for any real corpus vCont ≥ 1 and the term is unchanged.
    var p: Column = greatest(d(col("cc1")) - lit(D), lit(0.0)) / lit(nBt) +
      lit(D * math.max(vCont, 1.0) / nBt) * lit(1.0 / (vTrain + 1.0))
    (2 until n).foreach { m =>
      p = when(d(col(s"ct$m")) <= 0, p).otherwise(
        greatest(d(col(s"cc$m")) - lit(D), lit(0.0)) / d(col(s"ct$m")) +
          lit(D) * d(col(s"n1p$m")) / d(col(s"ct$m")) * p)
    }
    p = when(d(col("c_ctx")) <= 0, p).otherwise(
      greatest(d(col("c_full")) - lit(D), lit(0.0)) / d(col("c_ctx")) +
        lit(D) * d(col("n1p_n")) / d(col("c_ctx")) * p)
    // final per-doc aggregate, two-tier by the SAME planner gate as the
    // joins (VERDICT r15 #2 residual — the last session-width exchange in
    // the score plan). Broadcast tier: the score stream has zero
    // exchanges, docs arrive contiguous per scan split, so the planner's
    // partial aggregate collapses the stream to ~one row per (doc, task)
    // and its post-partial exchange is type-thin — keep it. Past the
    // gate the SMJ layout scatters each doc's grams across the w
    // gram-keyed partitions, the partial barely collapses anything
    // (measured shape: partial output ≈ input rows), and its post-partial
    // exchange inherits the SESSION width — map_tasks × session
    // micro-segments, the §2.9.12 law's host. Pin that exchange to the
    // owned width instead: same bytes move (the partial saved ~nothing),
    // one REPARTITION_BY_NUM the session conf can never resize.
    val scored = s.withColumn("_lp", log(p))
    val bcGate = train.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val cNBytes = cN.queryExecution.optimizedPlan.stats.sizeInBytes
    val aggIn =
      if (bcGate >= 0 && cNBytes <= bcGate) scored
      else scored.repartition(w, col("doc"))
    aggIn.groupBy("doc")
      .agg(count(lit(1)).as("n_grams"), exp(-avg(col("_lp"))).as("ppl"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
    * the MOSS scheme): Karp–Rabin polynomial rolling hash over character
    * `k`-grams (base 31 mod 2^20), then from every window of `w`
    * consecutive gram hashes keep the minimum (rightmost on ties). The
    * selected (position, hash) set is a ~2/(w+1)-density sketch that two
    * documents sharing any sufficiently long substring are guaranteed to
    * overlap on — the copy-detection / provenance fingerprint of curation
    * pipelines.
    *
    * Evaluation is the native [[WinnowSelect]] expression: a rolling
    * Karp–Rabin step per gram + a monotonic-deque window minimum —
    * amortized O(1) per position, O(chars) per document — emitting the
    * ~2/(w+1)-density DISTINCT selected set directly (the previous
    * columnar one-row-per-WINDOW explode computed k·w per-char substring
    * polynomials per position; the round-10 decade table measured that
    * scan DOMINATING the fingerprint tier at 2×10⁷ docs, where coarsening
    * w cut shuffle 40% while the wall went UP — SURVEY §2.9.9). The
    * hash family, tie rule, and values are bit-identical
    * (WinnowParitySpec pins the kernel against an independent per-window
    * brute force; the doc_fingerprints oracles replay the same formula in
    * SQL). No shuffle at all — the old trailing `.distinct()` exchange is
    * gone because the kernel emits each selected (p, h) once; only the
    * pre-explode rebalance (the [[trigramVectors]] shape) moves rows, and
    * the fan-out it spreads is now the selected density, not one row per
    * window.
    *
    * Returns distinct `(doc, p, h)` selected fingerprints. Docs shorter
    * than `k + w − 1` chars have no full window and yield no rows. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String = "text",
                         k: Int = 8, w: Int = 4): DataFrame =
    winnowRaw(df, idCol, textCol, k, w)

  /** [[winnowFingerprints]] body (kept under the historical name: before
    * the [[WinnowSelect]] kernel this was a pre-distinct one-row-per-window
    * stream and consumers deduped to their own granularity — the kernel
    * emits the distinct set directly, so the two entry points coincide). */
  private[graft] def winnowRaw(df: DataFrame, idCol: String, textCol: String,
                               k: Int, w: Int): DataFrame = {
    require(k >= 2 && w >= 2, s"need k>=2 and w>=2, got k=$k w=$w")
    df.filter(length(col(textCol)) >= k + w - 1)
      .select(col(idCol).as("doc"), col(textCol).as("_txt"))
      .repartition(col("doc"))
      .select(col("doc"),
        explode(WinnowSelect.selected(col("_txt"), k, w)).as("_s"))
      .select(col("doc"), col("_s.p").as("p"), col("_s.h").as("h"))
  }

  /** BM25 relevance of every document against a fixed query-term set —
    * the retrieval scoring curation pipelines use to pull domain-relevant
    * documents toward a training mix (Robertson & Zaragoza 2009; standard
    * k1/b parameterization, idf = ln(1 + (N − df + 0.5)/(df + 0.5))).
    * Same plan-only shape as [[tfidf]]: one explode filtered to the query
    * terms (a broadcast literal array), per-(doc, term) counts, term
    * document-frequencies, and N/avgdl as a broadcast one-row aggregate;
    * docs with no query term score 0 via the final left join. */
  def bm25(df: DataFrame, idCol: String, queryTerms: Seq[String],
           textCol: String = "text", k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    val qArr = array(queryTerms.distinct.sorted.map(lit): _*)
    val lens = df.select(col(idCol).as("doc"),
      size(tokens(col(textCol))).cast("double").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val hits = df.select(col(idCol).as("doc"),
        explode(tokens(col(textCol))).as("term"))
      .filter(array_contains(qArr, col("term")))
    val tf = hits.groupBy("doc", "term").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val scored = tf.join(dfreq, Seq("term"))
      .join(lens, Seq("doc"))
      .crossJoin(broadcast(stats))
      .withColumn("_idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("_s",
        col("_idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc").agg(sum("_s").as("bm25"))
    lens.select(col("doc")).join(scored, Seq("doc"), "left")
      .select(col("doc"), coalesce(col("bm25"), lit(0.0)).as("bm25"))
  }
}
