package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.{Components, Dedup, EmbedLsh, MinHashLsh, SimHash128, SimHashDedup}
import graft.functions.TextFunctions.P
import graft.Ckpt._

/** Deduplication queries (SURVEY.md §2D). The MinHash oracle SQL is
  * *generated* from the same band/row/prime constants as the Spark
  * implementation — both engines compute the identical signature, so the
  * candidate pair set matches exactly (determinism, not luck). */
object DedupQ {

  /** Shared oracle CTEs: tokenized shingles and Carter–Wegman base hashes.
    * The shingle source is parameterized so the curation pipeline can run
    * the identical machinery over a filtered subset. */
  private def shingleCteFor(src: String) =
    s"""sh AS (
      |  SELECT doc_id, list_distinct([concat_ws(' ', l[i+1], l[i+2], l[i+3])
      |    for i in range(0, greatest(len(l)-2, 1))]) AS sh
      |  FROM (SELECT doc_id, ${Text.toksSql} AS l FROM $src))""".stripMargin

  private val shingleCte = shingleCteFor("documents")

  private val hpCte =
    s"""hp AS (
       |  SELECT doc_id, [{'h1': ('0x' || substr(md5(s), 1, 15))::BIGINT % $P,
       |                   'h2': ('0x' || substr(md5(s), 16, 15))::BIGINT % $P} for s in sh] AS hp
       |  FROM sh)""".stripMargin

  private val sigsCte = {
    val sigs = (0 until MinHashLsh.NumHashes)
      .map(i => s"list_min([(x.h1 + $i * x.h2) % $P for x in hp]) AS sig_$i").mkString(",\n    ")
    s"sigs AS (\n  SELECT doc_id, $sigs\n  FROM hp)"
  }

  private val bandsCte = {
    val keys = (0 until MinHashLsh.Bands).map { j =>
      val cols = (j * MinHashLsh.Rows until (j + 1) * MinHashLsh.Rows).map(i => s"sig_$i")
      s"concat_ws(',', '$j', ${cols.mkString(", ")})"
    }.mkString(", ")
    s"bands AS (\n  SELECT doc_id, unnest([$keys]) AS bk FROM sigs)"
  }

  /** Bucket-size-adaptive candidates, mirroring MinHashLsh.candidatePairs:
    * buckets ≤ MaxAllPairsBucket emit every pair (full recall for the
    * verified-pair gates), hot buckets emit min-id star edges (linear in
    * bucket size, never an unbounded in-bucket cross join). */
  private val candSelect = {
    val b = MinHashLsh.MaxAllPairsBucket
    s"""SELECT DISTINCT a_id, b_id FROM (
       |  SELECT m AS a_id, doc_id AS b_id
       |  FROM (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY bk) AS m,
       |               COUNT(*) OVER (PARTITION BY bk) AS n FROM bands)
       |  WHERE n > $b AND doc_id <> m
       |  UNION ALL
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
       |  JOIN (SELECT bk, COUNT(*) AS n FROM bands GROUP BY bk) z ON z.bk = a.bk
       |  WHERE z.n <= $b)""".stripMargin
  }

  /** Jaccard cutoff for verified near-dup pairs — ONE constant feeding the
    * Spark filters and every generated oracle (d_jaccard, d_components,
    * d_curate), so the threshold cannot drift between engines or queries. */
  val JaccardThreshold = 0.5

  private val jaccardExprSql =
    """CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
      |    CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)""".stripMargin

  /** Verified pairs CTE (needs cand + sh in scope). */
  private val pairsCte =
    s"""pairs AS (
       |  SELECT a_id, b_id FROM (
       |    SELECT a_id, b_id, $jaccardExprSql AS jaccard
       |    FROM cand JOIN sh sa ON sa.doc_id = a_id JOIN sh sb ON sb.doc_id = b_id)
       |  WHERE jaccard >= $JaccardThreshold)""".stripMargin

  /** Transitive closure over the pair graph → per-vertex component-min
    * label (needs pairs in scope; requires WITH RECURSIVE). */
  private val closureCtes =
    """edges AS (SELECT a_id AS s, b_id AS d FROM pairs
      |          UNION SELECT b_id AS s, a_id AS d FROM pairs),
      |reach(id, r) AS (
      |  SELECT s, s FROM edges
      |  UNION
      |  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.d),
      |lbl AS (SELECT id, MIN(r) AS canonical_id FROM reach GROUP BY id)""".stripMargin

  /** ONE per-document signature pass shared across the dedup gates
    * (VERDICT r7 #2): the normalized content hash (exact dedup + rep
    * collapse), the 24 MinHash signature values (LSH banding), the 64-bit
    * SimHash, and the train/val/test split bucket — all from a single
    * corpus read, lazily localCheckpointed once per (session, dataset).
    * Each gate still states its full pipeline; the stage only removes the
    * REPEATED corpus passes — exactly the materialized signature table a
    * 100 TB pipeline keeps next to the corpus so dedup, decontamination
    * and reporting never re-hash the text. */
  private def stage(s: SparkSession, dir: String): DataFrame =
    graft.StageCache.getOrCompute(s, s"dedup:$dir:sig") {
      graft.functions.VectorExpressions.register(s)
      import graft.functions.TextFunctions
      val docs = Tables.documents(s, dir)
        .withColumn("content_hash", Dedup.contentHash(col("text")))
        .withColumn("split_bucket", Text.splitBucket(col("text")))
        .withColumn("simhash", SimHashDedup.signatureCol("text"))
        // quality features ride the same pass: d_curate's filter then
        // reads two narrow columns instead of re-tokenizing the corpus
        .withColumn("__toks", TextFunctions.tokens(col("text")))
        .withColumn("n_tokens", size(col("__toks")))
        .withColumn("quality", TextFunctions.qualityScore(col("text"), col("__toks")))
        .drop("__toks")
      MinHashLsh.signatures(docs, "doc_id", "text",
        carry = Seq("content_hash", "split_bucket", "simhash", "n_tokens", "quality"))
        .cpLazy
    }

  /** Cached full-corpus LSH candidate pairs and their exact-Jaccard
    * scores, the two downstream stages several gates re-derived from the
    * signature stage: d_minhash_pairs emits the candidates, d_jaccard
    * and d_components the verified pairs, d_containment re-scores the
    * same candidates with its own metric. Same per-(session, dataset)
    * lifecycle as `stage`. */
  private def candidates(s: SparkSession, dir: String): DataFrame =
    graft.StageCache.getOrCompute(s, s"dedup:$dir:cand") {
      MinHashLsh.candidatePairsFromSigs(stage(s, dir), "doc_id").cpLazy
    }

  /** (a_id, b_id, jaccard) for every candidate pair, UNFILTERED — each
    * consumer applies its own threshold. */
  private def jaccardScored(s: SparkSession, dir: String): DataFrame =
    graft.StageCache.getOrCompute(s, s"dedup:$dir:jaccard") {
      Dedup.jaccardOnPairs(candidates(s, dir), Tables.documents(s, dir), "doc_id", "text")
        .cpLazy
    }

  /** The full-corpus canonical assignment (doc_id, canonical_id), the
    * terminal artifact of the dedup run — cached because BOTH the
    * assignment gate (d_components) and the observability gate (d_report)
    * consume the same map, exactly as a pipeline operator reports over
    * the run it just executed rather than re-running it. Derived from the
    * cached verified pairs; label-IDENTICAL to the collapse-first
    * fuzzyCanonical route (d_curate's path over its filtered subset):
    * content-identical docs share every band bucket, so each links to its
    * bucket-min by a Jaccard-1 edge and the clique stays connected
    * without the explicit rep map — verified empirically at sf0.01/sf0.1
    * (diff=0) and by the d_report gate hash against its collapse-route
    * oracle. */
  private def fullCanonical(s: SparkSession, dir: String): DataFrame =
    graft.StageCache.getOrCompute(s, s"dedup:$dir:canonical") {
      Components.canonicalize(Tables.documents(s, dir).select(col("doc_id")), "doc_id",
          jaccardScored(s, dir).filter(col("jaccard") >= JaccardThreshold)
            .select(col("a_id"), col("b_id")))
        .cpLazy
    }

  /** The winnowing fingerprint stage BOTH substring-level consumers read
    * (t_winnowing's per-doc set digest, d_substring_overlap's pair
    * join): one corpus pass — native O(n) Karp–Rabin k-gram hashes,
    * min-of-window selection, distinct — checkpointed per
    * (session, dataset) like the MinHash signature stage; at 100 TB this
    * is the fingerprint table stored beside the corpus. Released with
    * the rest of the dedup family by DedupQ.release. */
  private[queries] def winnowFps(s: SparkSession, dir: String): DataFrame =
    graft.StageCache.getOrCompute(s, s"dedup:$dir:winnow") {
      val k = 8; val w = 8
      graft.functions.VectorExpressions.register(s)
      Tables.documents(s, dir)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .withColumn("hs", expr(s"kgram_hashes(text, $k)"))
        .withColumn("fps", expr(
          s"array_sort(array_distinct(transform(sequence(0, greatest(size(hs) - $w, 0)), j -> array_min(slice(hs, j + 1, $w)))))"))
        .select(col("doc_id"), size(col("hs")).cast("long").as("n_grams"), col("fps"))
        .cpLazy
    }

  /** Return the executor memory of this dataset's cached dedup stages
    * (signatures, candidates, jaccard, canonical): evict + unpersist.
    * A long-lived session iterating many datasets calls this when done
    * with one — without it every checkpoint's blocks stay pinned for the
    * session lifetime. Next gate over the same dir recomputes cleanly. */
  def release(s: SparkSession, dir: String): Int =
    graft.StageCache.release(s, s"dedup:$dir:")

  /** d_exact: exact dedup groups by normalized content hash (off the
    * shared stage — same aggregation as Dedup.exactGroups). */
  def dExact(s: SparkSession, dir: String): DataFrame =
    stage(s, dir).groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
      .orderBy(col("content_hash"))

  val dExactSql: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '[ \t\n\r\f]+', ' ', 'g')) AS content_hash,
      |  COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
      |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin

  /** d_minhash_pairs: LSH banding candidate edges (star expansion per band
    * bucket — linear in bucket size, see MinHashLsh.candidatePairs). */
  def dMinhashPairs(s: SparkSession, dir: String): DataFrame =
    candidates(s, dir).orderBy(col("a_id"), col("b_id"))

  val dMinhashPairsSql: String =
    s"WITH $shingleCte,\n$hpCte,\n$sigsCte,\n$bandsCte\n$candSelect\nORDER BY a_id, b_id"

  /** d_minhash_est: the MinHash JACCARD ESTIMATOR itself — P[sig_i(A) =
    * sig_i(B)] = J(A,B), so the fraction of agreeing signature slots
    * estimates Jaccard in O(k) per pair with NO shingle materialization.
    * At 100 TB this is what replaces exact verification on the long tail
    * (exact intersection only for borderline pairs): per candidate pair,
    * slot-agreement count over the 24 shared-stage signatures, the
    * estimate as one pinned division, the exact Jaccard beside it and
    * the absolute error — the operator's own fidelity report. All off
    * the cached signature/candidate/jaccard stages: zero extra corpus
    * passes; the 24-slot comparison is a codegen'd sum of equality
    * terms (no HOF). */
  def dMinhashEst(s: SparkSession, dir: String): DataFrame = {
    val n = MinHashLsh.NumHashes
    val sigs = stage(s, dir)
    val aS = sigs.select(col("doc_id").as("a_id") +:
      (0 until n).map(i => col(s"sig_$i").as(s"a_sig_$i")): _*)
    val bS = sigs.select(col("doc_id").as("b_id") +:
      (0 until n).map(i => col(s"sig_$i").as(s"b_sig_$i")): _*)
    val nEq = (0 until n)
      .map(i => when(col(s"a_sig_$i") === col(s"b_sig_$i"), 1).otherwise(0))
      .reduce(_ + _)
    candidates(s, dir)
      .join(jaccardScored(s, dir), Seq("a_id", "b_id"))
      .join(aS, "a_id").join(bS, "b_id")
      .withColumn("n_eq", nEq.cast("long"))
      .select(col("a_id"), col("b_id"), col("n_eq"),
        (col("n_eq").cast("double") / lit(n.toDouble)).as("est"),
        col("jaccard"),
        abs(col("n_eq").cast("double") / lit(n.toDouble) - col("jaccard")).as("abs_err"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val dMinhashEstSql: String = {
    val n = MinHashLsh.NumHashes
    val eqTerms = (0 until n)
      .map(i => s"(CASE WHEN sa.sig_$i = sb.sig_$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $shingleCte,\n$hpCte,\n$sigsCte,\n$bandsCte,
       |cand AS ($candSelect),
       |jac AS (SELECT a_id, b_id, $jaccardExprSql AS jaccard
       |        FROM cand JOIN sh sa ON sa.doc_id = a_id JOIN sh sb ON sb.doc_id = b_id),
       |eq AS (SELECT a_id, b_id, CAST($eqTerms AS BIGINT) AS n_eq
       |       FROM cand JOIN sigs sa ON sa.doc_id = a_id JOIN sigs sb ON sb.doc_id = b_id)
       |SELECT e.a_id, e.b_id, n_eq, CAST(n_eq AS DOUBLE) / ${n.toDouble} AS est, jaccard,
       |  abs(CAST(n_eq AS DOUBLE) / ${n.toDouble} - jaccard) AS abs_err
       |FROM eq e JOIN jac j ON j.a_id = e.a_id AND j.b_id = e.b_id
       |ORDER BY e.a_id, e.b_id""".stripMargin
  }

  /** d_jaccard: exact shingle Jaccard, verified on the LSH candidates only. */
  def dJaccard(s: SparkSession, dir: String): DataFrame =
    jaccardScored(s, dir)
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy(col("a_id"), col("b_id"))

  val dJaccardSql: String =
    s"""WITH $shingleCte,\n$hpCte,\n$sigsCte,\n$bandsCte,
       |cand AS ($candSelect)
       |SELECT * FROM (
       |  SELECT a_id, b_id, $jaccardExprSql AS jaccard
       |  FROM cand JOIN sh sa ON sa.doc_id = a_id JOIN sh sb ON sb.doc_id = b_id)
       |WHERE jaccard >= $JaccardThreshold ORDER BY a_id, b_id""".stripMargin

  /** d_components: the dedup endgame — LSH candidates → exact-Jaccard
    * verification → connected components → (doc_id, canonical_id) for every
    * document (cluster members map to the cluster min id, singletons to
    * themselves). This is the assignment a training-data pipeline consumes;
    * the pair list alone is not. */
  def dComponents(s: SparkSession, dir: String): DataFrame =
    fullCanonical(s, dir).orderBy(col("doc_id"))

  /** DuckDB oracle: same pair pipeline, then a recursive transitive-closure
    * CTE labeled by MIN over each closure set — exact ground truth for the
    * iterative min-label propagation. */
  val dComponentsSql: String =
    s"""WITH RECURSIVE $shingleCte,\n$hpCte,\n$sigsCte,\n$bandsCte,
       |cand AS ($candSelect),
       |$pairsCte,
       |$closureCtes
       |SELECT d.doc_id, coalesce(l.canonical_id, d.doc_id) AS canonical_id
       |FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id
       |ORDER BY doc_id""".stripMargin

  /** Curation quality cutoff (keeps ~77% of the synthetic corpus). */
  val CurateQuality = 0.35

  /** d_curate: the training-data curation pipeline END-TO-END — quality
    * scoring → threshold filter → fuzzy dedup with exact-dup collapse
    * (Dedup.fuzzyCanonical: content-hash rep collapse, star-edge LSH
    * candidates, exact Jaccard, connected components) → canonical
    * survivors only. The cheap narrow quality filter runs FIRST so the
    * expensive shingle/signature machinery only ever sees surviving
    * documents, and exact-dup groups contribute ONE signature row — the
    * two orderings that matter at 100 TB. Output: one row per kept doc. */
  def dCurate(s: SparkSession, dir: String): DataFrame = {
    // the quality columns ride the shared signature stage — the filter is
    // a narrow predicate over the already-checkpointed pass, so curation
    // never re-reads or re-tokenizes the corpus
    val goodSigs = stage(s, dir).filter(col("quality") >= CurateQuality)
    val canon = Dedup.fuzzyCanonicalFromSigs(goodSigs,
      Tables.documents(s, dir).select(col("doc_id"), col("text")),
      "doc_id", "text", JaccardThreshold)
    goodSigs.select(col("doc_id"), col("n_tokens"), col("quality"))
      .join(canon, "doc_id")
      .filter(col("canonical_id") === col("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Oracle mirrors the collapse: rm = rep map over quality-kept docs
    * (window min per content hash), the band machinery runs over reps
    * only (qdocs), and the closure label expands back through rm.rep. */
  val dCurateSql: String =
    s"""WITH RECURSIVE tk AS (SELECT doc_id, text, ${Text.toksSql} AS toks FROM documents),
       |q AS (SELECT doc_id, text, len(toks) AS n_tokens,
       |        ${Text.qualitySqlExpr} AS quality
       |      FROM tk),
       |rm AS (SELECT doc_id, text,
       |         MIN(doc_id) OVER (PARTITION BY
       |           md5(regexp_replace(lower(trim(text)), '[ \t\n\r\f]+', ' ', 'g'))) AS rep
       |       FROM q WHERE quality >= $CurateQuality),
       |qdocs AS (SELECT doc_id, text FROM rm WHERE doc_id = rep),
       |${shingleCteFor("qdocs")},
       |$hpCte,
       |$sigsCte,
       |$bandsCte,
       |cand AS ($candSelect),
       |$pairsCte,
       |$closureCtes
       |SELECT q.doc_id, q.n_tokens, q.quality
       |FROM q JOIN rm ON rm.doc_id = q.doc_id
       |     LEFT JOIN lbl ON lbl.id = rm.rep
       |WHERE coalesce(lbl.canonical_id, rm.rep) = q.doc_id
       |ORDER BY q.doc_id""".stripMargin

  /** d_contamination: train/test DECONTAMINATION — find test-split
    * documents that near-duplicate a train-split document (the leakage an
    * eval pipeline must catch). Composes t_split's content-hash assignment
    * with the MinHash band machinery: ONE signature pass over the whole
    * corpus, band self-join for candidates, cross-split filter on the tiny
    * candidate set, exact Jaccard only on survivors. At 100 TB this is the
    * same cost as fuzzy dedup — no extra corpus pass for the split check.
    *
    * Recall contract (the SimHashDedup-style caveat, spelled out because
    * unreported leakage is this query's failure mode): buckets at or
    * below MaxAllPairsBucket emit EVERY cross-split pair — full recall on
    * the tier real contamination lands in. Buckets ABOVE it fall back to
    * the bipartite star, where a test doc's true train near-dup goes
    * unreported iff it is not the bucket's min AND the bucket-min edge
    * fails Jaccard — only possible inside a >16-member band bucket of
    * non-identical texts. Raise MaxAllPairsBucket (bounded all-pairs
    * cost: B(B−1)/2 per bucket) when decontamination must trade compute
    * for the last sliver of hot-bucket recall. */
  /** Scored bipartite (test, train) candidates — cached like
    * jaccardScored/fullCanonical because the decontamination report is a
    * per-run ARTIFACT, not a throwaway: banding + the bucket window + the
    * candidate-doc shingle pass are one-time work per (session, dataset).
    * Before this entered the cache, d_contamination was the one dedup
    * gate re-running its whole derived stage (band window + two eager
    * localCheckpoints + candidate re-shingling) on every invocation —
    * the round-10 ~1.5× bench regression: switching the gate onto the
    * shared signature stage (r10) removed its inline signature pass but
    * left the per-run rebuild, whose cost now included re-reading the
    * widened stage checkpoint. */
  private def bipartiteScored(s: SparkSession, dir: String): DataFrame =
    graft.StageCache.getOrCompute(s, s"dedup:$dir:bipartite") {
      val docs = Tables.documents(s, dir)
      // bipartite candidates off the shared stage: train docs are side 1
      // (left), test docs side 2 (right), the val slice [80,90) is excluded
      // before banding; small buckets emit every cross pair, hot buckets
      // pair each doc with the opposite side's bucket min only — linear in
      // bucket size even when boilerplate straddles splits
      val side = when(col("split_bucket") < 80, 1).when(col("split_bucket") >= 90, 2)
      val sided = stage(s, dir).withColumn("__side", side).filter(col("__side").isNotNull)
      val cands = MinHashLsh.bipartiteCandidatesFromSigs(sided, "doc_id")
        .select(col("right_id").as("a_id"), col("left_id").as("b_id"))
        .cpEager
      Dedup.jaccardOnPairs(cands, docs, "doc_id", "text").cpLazy
    }

  def dContamination(s: SparkSession, dir: String): DataFrame =
    bipartiteScored(s, dir)
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("a_id").as("test_id"), col("b_id").as("train_id"), col("jaccard"))
      .orderBy(col("test_id"), col("train_id"))

  /** Oracle mirrors the bucket-size-adaptive bipartite candidates: small
    * buckets emit every test×train cross pair (full cross-side recall);
    * hot buckets fall back to the bipartite star — every test doc pairs
    * with the bucket's min train doc and vice versa. */
  val dContaminationSql: String =
    s"""WITH $shingleCte,\n$hpCte,\n$sigsCte,\n$bandsCte,
       |tags AS (SELECT doc_id, ${Text.splitBucketSql} AS bucket FROM documents),
       |bt AS (SELECT b.doc_id AS doc_id, t.bucket AS bucket, b.bk AS bk,
       |         MIN(CASE WHEN t.bucket < 80 THEN b.doc_id END) OVER (PARTITION BY b.bk) AS ml,
       |         MIN(CASE WHEN t.bucket >= 90 THEN b.doc_id END) OVER (PARTITION BY b.bk) AS mr,
       |         COUNT(*) OVER (PARTITION BY b.bk) AS n
       |       FROM bands b JOIN tags t ON t.doc_id = b.doc_id
       |       WHERE t.bucket < 80 OR t.bucket >= 90),
       |cross_cand AS (
       |  SELECT doc_id AS test_id, ml AS train_id FROM bt
       |  WHERE n > ${MinHashLsh.MaxAllPairsBucket} AND bucket >= 90 AND ml IS NOT NULL
       |  UNION
       |  SELECT mr AS test_id, doc_id AS train_id FROM bt
       |  WHERE n > ${MinHashLsh.MaxAllPairsBucket} AND bucket < 80 AND mr IS NOT NULL
       |  UNION
       |  SELECT a.doc_id AS test_id, b.doc_id AS train_id
       |  FROM bt a JOIN bt b ON a.bk = b.bk
       |  WHERE a.n <= ${MinHashLsh.MaxAllPairsBucket} AND a.bucket >= 90 AND b.bucket < 80)
       |SELECT test_id, train_id, jaccard FROM (
       |  SELECT test_id, train_id, $jaccardExprSql AS jaccard
       |  FROM cross_cand JOIN sh sa ON sa.doc_id = test_id JOIN sh sb ON sb.doc_id = train_id)
       |WHERE jaccard >= $JaccardThreshold ORDER BY test_id, train_id""".stripMargin

  /** d_containment: asymmetric overlap on the LSH candidates — per pair,
    * the fraction of each side's shingles contained in the other
    * (c_ab = |A∩B|/|A|, c_ba mirrored). The quotation/subset signal:
    * containment stays high when a short doc sits inside a long one while
    * Jaccard collapses with the size gap. Same scale shape as d_jaccard
    * (candidates only, semi-join feature pushdown); emitted unfiltered so
    * callers pick their own cutoff per direction. Recall contract: full
    * within ≤MaxAllPairsBucket band buckets; hot buckets emit star edges
    * only, so a contained pair inside a >16-member bucket surfaces only
    * through the bucket min (see d_contamination's caveat note). */
  def dContainment(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.containmentOnPairs(candidates(s, dir), docs, "doc_id", "text")
      .orderBy(col("a_id"), col("b_id"))
  }

  val dContainmentSql: String =
    s"""WITH $shingleCte,\n$hpCte,\n$sigsCte,\n$bandsCte,
       |cand AS ($candSelect)
       |SELECT a_id, b_id,
       |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / CAST(len(sa.sh) AS DOUBLE) AS c_ab,
       |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / CAST(len(sb.sh) AS DOUBLE) AS c_ba
       |FROM cand JOIN sh sa ON sa.doc_id = a_id JOIN sh sb ON sb.doc_id = b_id
       |ORDER BY a_id, b_id""".stripMargin

  /** Collision-free per-dataset store location (same pid-scoped convention
    * as Similarity.ivfPath: concurrent gate + bench must not clobber each
    * other's store). */
  private def storePath(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"/tmp/graft_dedupstore_${h}_${ProcessHandle.current().pid()}"
  }

  /** d_incremental: incremental dedup through the PERSISTED band-key store
    * — corpus (doc_id % 5 ≠ 0) builds the store once; the new batch
    * (doc_id % 5 = 0) is probed against it with O(|batch|) signature work,
    * then exact Jaccard verifies the candidate pairs only. The ingest-time
    * dedup shape: at 100 TB the corpus text is never re-read per batch. */
  /** Build-once guard for the persisted store: "probe a PERSISTED store"
    * is the operator's semantics — the corpus store is written once per
    * (session, dataset) and every later run probes it, exactly the
    * ingest-time lifecycle (the store outlives batches). buildStore
    * itself is deterministic, so first-build vs reuse cannot differ. */
  private val storeCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def dIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val path = storeCache.computeIfAbsent(s"${System.identityHashCode(s)}:$dir", _ => {
      val p = storePath(dir)
      graft.dedup.IncrementalDedup.buildStore(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", p)
      p
    })
    val cands = graft.dedup.IncrementalDedup.probe(
        s, path, docs.filter(col("doc_id") % 5 === 0), "doc_id", "text")
      .select(col("batch_id").as("a_id"), col("corpus_id").as("b_id"))
      .cpEager // tiny pair set feeds the jaccard three-way join
    Dedup.jaccardOnPairs(cands, docs, "doc_id", "text")
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("a_id").as("batch_id"), col("b_id").as("corpus_id"), col("jaccard"))
      .orderBy(col("batch_id"), col("corpus_id"))
  }

  /** Oracle: identical signatures from the shared CTEs over ALL documents;
    * the store/batch split is the doc_id % 5 predicate on the band join.
    * Mirrors IncrementalDedup.probeBands' bucket-size-adaptive tiers:
    * small store buckets surface every corpus member, hot buckets the MIN
    * corpus witness per (batch doc, band). */
  val dIncrementalSql: String =
    s"""WITH $shingleCte,\n$hpCte,\n$sigsCte,\n$bandsCte,
       |csz AS (SELECT bk, COUNT(*) AS n FROM bands WHERE doc_id % 5 <> 0 GROUP BY bk),
       |jn AS (SELECT b.doc_id AS batch_id, b.bk AS bk, c.doc_id AS corpus_id, csz.n AS n
       |       FROM bands b JOIN bands c ON b.bk = c.bk AND c.doc_id % 5 <> 0
       |       JOIN csz ON csz.bk = b.bk
       |       WHERE b.doc_id % 5 = 0 AND c.doc_id <> b.doc_id),
       |cand AS (SELECT DISTINCT batch_id, corpus_id FROM (
       |           SELECT batch_id, corpus_id FROM jn WHERE n <= ${MinHashLsh.MaxAllPairsBucket}
       |           UNION ALL
       |           SELECT batch_id, MIN(corpus_id) AS corpus_id FROM jn
       |           WHERE n > ${MinHashLsh.MaxAllPairsBucket} GROUP BY batch_id, bk))
       |SELECT batch_id, corpus_id, jaccard FROM (
       |  SELECT batch_id, corpus_id, $jaccardExprSql AS jaccard
       |  FROM cand JOIN sh sa ON sa.doc_id = batch_id JOIN sh sb ON sb.doc_id = corpus_id)
       |WHERE jaccard >= $JaccardThreshold ORDER BY batch_id, corpus_id""".stripMargin

  /** d_simhash: SimHash pairs within Hamming ≤ 3, identical signatures
    * collapsed to min-id rep-star edges (SimHashDedup.pairsFromSignatures
    * — lossless for SimHash: members of a clique share every distance
    * their rep has). Token hashes are md5-derived
    * (SimHashDedup.TokenHashSql), so the oracle recomputes the identical
    * signatures in SQL; the oracle retrieves rep-rep pairs brute-force,
    * which equals the pigeonhole retrieval (provably complete for ≤ 3),
    * plus the same star edges for hamming-0 cliques. */
  def dSimhash(s: SparkSession, dir: String): DataFrame =
    SimHashDedup.pairsFromSignatures(
        stage(s, dir).select(col("doc_id"), col("simhash")), "doc_id")
      .orderBy(col("a_id"), col("b_id"))

  /** DuckDB SimHash: same tie rule as SimHash64 (bit set when
    * 2·count ≥ m); only bits 0-59 can be set (60-bit token hashes). */
  val dSimhashSql: String = {
    val bitTerms = (0 until 60).map { b =>
      s"(CASE WHEN 2 * list_sum([(h >> $b) & 1 for h in hs]) >= len(hs) THEN (1::BIGINT << $b) ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH th AS (
      |  SELECT doc_id,
      |    [('0x' || substr(md5(t), 1, 15))::BIGINT for t in ${Text.toksSql}] AS hs
      |  FROM documents),
      |""".stripMargin +
      s"sim AS (SELECT doc_id, $bitTerms AS simhash FROM th),\n" +
      """reps AS (SELECT simhash, MIN(doc_id) AS rep_id FROM sim GROUP BY simhash),
        |star AS (SELECT r.rep_id AS a_id, s.doc_id AS b_id, 0 AS hamming
        |         FROM sim s JOIN reps r ON s.simhash = r.simhash
        |         WHERE s.doc_id <> r.rep_id),
        |crossp AS (SELECT a_id, b_id, hamming FROM (
        |            SELECT a.rep_id AS a_id, b.rep_id AS b_id,
        |              CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |            FROM reps a JOIN reps b ON a.rep_id < b.rep_id)
        |          WHERE hamming <= 3)
        |SELECT a_id, b_id, hamming FROM (SELECT * FROM star UNION ALL SELECT * FROM crossp)
        |ORDER BY a_id, b_id""".stripMargin
  }

  /** d_simhash128: the documented SimHash scaling rule AS A GATE — the
    * 128-bit signature (two independent 64-bit majority folds over
    * disjoint md5 halves, SimHash128) holds expected bucket loads at
    * ~n/2³² for corpora past ~10⁸ distinct signatures where the 64-bit
    * path's 16-bit chunks go quadratic. Same lossless hamming-0 clique
    * collapse and the same pigeonhole completeness (h ≤ c−1 at c=4
    * 32-bit chunks), pinned by DedupSimilaritySpec against brute force. */
  def dSimhash128(s: SparkSession, dir: String): DataFrame =
    SimHash128.pairs(s, Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("a_id"), col("b_id"))

  /** DuckDB mirror: two per-bit majority folds over the disjoint md5
    * halves, rep collapse on the signature PAIR, all-rep-pairs retrieval
    * (equivalent to the chunk banding, which is complete) with summed
    * Hamming distance. */
  val dSimhash128Sql: String = {
    def bitTerms(hsCol: String) = (0 until 60).map { b =>
      s"(CASE WHEN 2 * list_sum([(h >> $b) & 1 for h in $hsCol]) >= len($hsCol) THEN (1::BIGINT << $b) ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH th AS (
      |  SELECT doc_id,
      |    [('0x' || substr(md5(t), 1, 15))::BIGINT for t in ${Text.toksSql}] AS hs_hi,
      |    [('0x' || substr(md5(t), 17, 15))::BIGINT for t in ${Text.toksSql}] AS hs_lo
      |  FROM documents),
      |""".stripMargin +
      s"sim AS (SELECT doc_id, ${bitTerms("hs_hi")} AS sh_hi, ${bitTerms("hs_lo")} AS sh_lo FROM th),\n" +
      """reps AS (SELECT sh_hi, sh_lo, MIN(doc_id) AS rep_id FROM sim GROUP BY sh_hi, sh_lo),
        |star AS (SELECT r.rep_id AS a_id, s.doc_id AS b_id, 0 AS hamming
        |         FROM sim s JOIN reps r ON s.sh_hi = r.sh_hi AND s.sh_lo = r.sh_lo
        |         WHERE s.doc_id <> r.rep_id),
        |crossp AS (SELECT a_id, b_id, hamming FROM (
        |            SELECT a.rep_id AS a_id, b.rep_id AS b_id,
        |              CAST(bit_count(xor(a.sh_hi, b.sh_hi)) + bit_count(xor(a.sh_lo, b.sh_lo)) AS INT) AS hamming
        |            FROM reps a JOIN reps b ON a.rep_id < b.rep_id)
        |          WHERE hamming <= 3)
        |SELECT a_id, b_id, hamming FROM (SELECT * FROM star UNION ALL SELECT * FROM crossp)
        |ORDER BY a_id, b_id""".stripMargin
  }

  /** d_embed_neardup: embedding near-dups AT THE TUNED OPERATING POINT —
    * random-hyperplane LSH band blocking (EmbedLsh, b=10 bands × r=12
    * bits targeting cos ≥ 0.9), exact cosine only on band-collision
    * candidates. The candidate join is band-key equality, so the
    * in-bucket comparison load is O(n²·b/2^r), never an unblocked O(n²).
    *
    * The raw synthetic embeddings are near-random (max pairwise
    * cos ≈ 0.46) — nothing would ever pass the tuned cutoff — so the
    * corpus is AUGMENTED with deterministic perturbed twins: every 20th
    * vector gains a copy (vec_id + 1,000,000) with each component scaled
    * by 1 ± 0.3 ((vec_id + j) parity picks the sign), landing twins at
    * cos ≈ 0.95-0.97. The LSH must then actually retrieve high-cosine
    * near-duplicates (collision-curve recall ≈ 0.97 per twin); the
    * oracle regenerates the identical twins and banding, so whichever
    * twins the bands retrieve match exactly. EmbedLshRecallSpec asserts
    * measured recall ≥ the collision-curve prediction on ground truth. */
  def dEmbedNeardup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val e = Tables.embeddings(s, dir)
    // same double-cast + perturbation SHAPE as the oracle's aug CTE:
    // every arithmetic step is the identical IEEE op on both engines
    val base = e.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
    val twins = e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("""transform(embedding, (x, j) ->
                 CAST(x AS DOUBLE) * (1.0D + CASE WHEN (vec_id + j) % 2 = 0
                                             THEN 0.3D ELSE -0.3D END))""").as("embedding"))
    val aug = base.unionByName(twins)
    val cands = EmbedLsh.candidatePairs(aug)
    val ea = aug.select(col("vec_id").as("a_id"), col("embedding").as("a_e"))
    val eb = aug.select(col("vec_id").as("b_id"), col("embedding").as("b_e"))
    cands.join(ea, "a_id").join(eb, "b_id")
      .withColumn("cos", expr("cosine_sim(a_e, b_e)"))
      .filter(col("cos") >= EmbedLsh.Threshold)
      .select(col("a_id"), col("b_id"), col("cos"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** DuckDB cosine with the same left-fold summation order as CosineSim. */
  private def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_reduce([CAST($x[i+1] AS DOUBLE) * CAST($y[i+1] AS DOUBLE) for i in range(0, len($x))], (p, q) -> p + q)"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** Oracle: identical twin augmentation (same IEEE double ops, same
    * parity rule), then the shared band CTEs over the augmented set. */
  val dEmbedNeardupSql: String =
    s"""WITH aug AS (
       |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000,
       |    [CAST(embedding[j+1] AS DOUBLE) * (1.0 + CASE WHEN (vec_id + j) % 2 = 0
       |                                              THEN 0.3 ELSE -0.3 END)
       |     for j in range(0, len(embedding))]
       |  FROM embeddings WHERE vec_id % 20 = 0),
       |${graft.dedup.EmbedLsh.bandsCteSql("aug")},
       |cand AS (SELECT DISTINCT a_id, b_id FROM (
       |           SELECT m AS a_id, vec_id AS b_id
       |           FROM (SELECT vec_id, MIN(vec_id) OVER (PARTITION BY bk) AS m,
       |                        COUNT(*) OVER (PARTITION BY bk) AS n FROM bk)
       |           WHERE n > ${MinHashLsh.MaxAllPairsBucket} AND vec_id <> m
       |           UNION ALL
       |           SELECT a.vec_id AS a_id, b.vec_id AS b_id
       |           FROM bk a JOIN bk b ON a.bk = b.bk AND a.vec_id < b.vec_id
       |           JOIN (SELECT bk, COUNT(*) AS n FROM bk GROUP BY bk) z ON z.bk = a.bk
       |           WHERE z.n <= ${MinHashLsh.MaxAllPairsBucket}))
       |SELECT a_id, b_id, cos FROM (
       |  SELECT a_id, b_id, ${cosSql("ea.embedding", "eb.embedding")} AS cos
       |  FROM cand JOIN aug ea ON ea.vec_id = a_id
       |            JOIN aug eb ON eb.vec_id = b_id)
       |WHERE cos >= ${graft.dedup.EmbedLsh.Threshold} ORDER BY a_id, b_id""".stripMargin

  /** SemDeDup cosine cutoff (the tuned near-dup regime; twins land at
    * cos ≈ 0.95-0.97, unrelated synthetic vectors max out near 0.46). */
  val SemThreshold = 0.9

  /** d_semdedup: SEMANTIC dedup, SemDeDup-style — k-means clusters the
    * embedding space (deterministic Lloyd, the same trainer as s_kmeans),
    * exact cosine runs only WITHIN each cluster, pairs at cos ≥ 0.9 form
    * components, and every vector maps to its component-min canonical id.
    * This is the other embedding-dedup blocking family next to
    * d_embed_neardup's random-hyperplane LSH: centroids adapt to the data
    * (better recall per comparison) at the cost of a training pass.
    *
    * Scale shape: training collects k centroid rows only; assignment is
    * one broadcast cross-score with map-side argmin; the in-cluster pair
    * join is an equi-join on the cluster id, so comparisons are
    * O(N²/k) — k scales as N/clusterBudget at 100 TB, keeping per-cluster
    * work constant. The gate runs the vec_id % 5 slice (plus its
    * perturbed twins) so the DuckDB oracle's unrolled fold stays fast. */
  def dSemdedup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val base = e.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
    val twins = e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("""transform(embedding, (x, j) ->
                 CAST(x AS DOUBLE) * (1.0D + CASE WHEN (vec_id + j) % 2 = 0
                                             THEN 0.3D ELSE -0.3D END))""").as("embedding"))
    val aug = base.unionByName(twins).filter(col("vec_id") % 5 === 0)
      .cpEager // feeds training, assignment and the final expand
    // k derives from the cluster budget (125-row slice / 16 → k = 8 at
    // the gate's sf0.01, the same k the static oracle SQL unrolls); the
    // budget rule, not the caller, bounds per-cluster pair work
    graft.dedup.SemDedup.canonicalBudgeted(s, aug, "vec_id", "embedding",
        clusterBudget = 16, iters = 2, cosMin = SemThreshold)
      .orderBy(col("vec_id"))
  }

  /** Oracle: twin augmentation (identical IEEE ops), the SAME exact-dup
    * embedding collapse SemDedup.canonical performs (window min per
    * identical vector — a no-op on the synthetic slice, which has unique
    * embeddings, but the mirror must not depend on that), the
    * s_kmeans-style unrolled Lloyd CTEs over the collapsed reps,
    * in-cluster cosine pairs, the shared recursive closure, and the
    * rep-map expansion. */
  val dSemdedupSql: String = {
    val iters = (1 to 2).flatMap(i => Seq(
      Similarity.kmAssignCte("pts", s"c${i - 1}", s"a$i"),
      Similarity.kmRecenterCte(s"a$i", s"c$i")))
    s"""WITH RECURSIVE rawaug AS (
       |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000,
       |    [CAST(embedding[j+1] AS DOUBLE) * (1.0 + CASE WHEN (vec_id + j) % 2 = 0
       |                                              THEN 0.3 ELSE -0.3 END)
       |     for j in range(0, len(embedding))]
       |  FROM embeddings WHERE vec_id % 20 = 0),
       |aug AS (SELECT * FROM rawaug WHERE vec_id % 5 = 0),
       |rm AS (SELECT vec_id, embedding,
       |         MIN(vec_id) OVER (PARTITION BY embedding) AS rep FROM aug),
       |reps AS (SELECT vec_id, embedding FROM rm WHERE vec_id = rep),
       |pts AS (SELECT vec_id AS p_id, embedding AS pv FROM reps),
       |c0 AS (SELECT vec_id AS c_id, embedding AS cv FROM reps ORDER BY vec_id LIMIT 8),
       |${iters.mkString(",\n")},
       |${Similarity.kmAssignCte("pts", "c2", "f")},
       |pairs AS (
       |  SELECT a_id, b_id FROM (
       |    SELECT x.p_id AS a_id, y.p_id AS b_id, ${Similarity.cosSql("x.pv", "y.pv")} AS cos
       |    FROM f x JOIN f y ON x.c_id = y.c_id AND x.p_id < y.p_id)
       |  WHERE cos >= $SemThreshold),
       |$closureCtes
       |SELECT rm.vec_id, coalesce(l.canonical_id, rm.rep) AS canonical_id
       |FROM rm LEFT JOIN lbl l ON l.id = rm.rep
       |ORDER BY rm.vec_id""".stripMargin
  }

  /** d_paragraph: CCNet-style sub-document dedup — duplicated sentences
    * (the boilerplate unit here; paragraphs in a corpus with newlines) are
    * removed CORPUS-WIDE, keeping only the first occurrence in
    * (doc_id, position) order, and each document is reassembled from its
    * surviving sentences. Catches shared headers/footers/disclaimers that
    * doc-level dedup never sees.
    *
    * Scale shape: two unavoidable shuffles — re-key exploded sentences by
    * content hash (md5, so the shuffle carries a fixed-width key instead
    * of the sentence text) to pick the global first occurrence, then
    * re-key survivors by doc_id to reassemble. Per-group state is one
    * row_number window over each hash bucket; no corpus-wide structure is
    * ever materialized on one node.
    */
  def dParagraph(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
    val sents = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\\. ")))
      .toDF("doc_id", "pos", "sent")
      .filter(length(trim(col("sent"))) > 0)
      .withColumn("h", md5(lower(trim(col("sent")))))
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("pos"))
    val kept = sents.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("sent")))), x => x("sent")),
          ". ").as("clean_text"))
    docs.select(col("doc_id"), size(split(col("text"), "\\. ")).as("n_sents"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sents"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  val dParagraphSql: String =
    """WITH s AS (
      |  SELECT doc_id, u.pos AS pos, u.sent AS sent, md5(lower(trim(u.sent))) AS h
      |  FROM (SELECT doc_id,
      |          unnest(list_transform(range(1, len(sents) + 1),
      |            i -> struct_pack(pos := i, sent := sents[i]))) AS u
      |        FROM (SELECT doc_id, string_split(text, '. ') AS sents FROM documents))
      |  WHERE length(trim(u.sent)) > 0),
      |kept AS (
      |  SELECT doc_id, COUNT(*) AS n_kept, string_agg(sent, '. ' ORDER BY pos) AS clean_text
      |  FROM (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn FROM s)
      |  WHERE rn = 1 GROUP BY doc_id)
      |SELECT d.doc_id, len(string_split(d.text, '. ')) AS n_sents,
      |  COALESCE(k.n_kept, 0) AS n_kept, COALESCE(k.clean_text, '') AS clean_text
      |FROM documents d LEFT JOIN kept k ON k.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** d_report: dedup OBSERVABILITY — the one-page outcome report a
    * pipeline operator reads after a dedup run: corpus size, cluster
    * count, duplicate-cluster count and membership, the dedup ratio
    * (fraction of docs removed keeping one survivor per cluster), and a
    * cluster-size histogram. Composes the full fuzzyCanonical pipeline
    * (exact-dup collapse → star-edge LSH → Jaccard → components) and
    * reduces it to a fixed handful of metric rows — cluster-count-sized
    * aggregations, nothing corpus-sized leaves the executors. */
  def dReport(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // the report reads the RUN's canonical map (fullCanonical — label-
    // identical to the collapse-route oracle, see its doc) instead of
    // re-running the whole fuzzy pass d_components just produced
    val canon = fullCanonical(s, dir)
    val sizes = canon.groupBy(col("canonical_id")).agg(count(lit(1)).as("sz"))
      .cpEager // feeds five metric aggregations
    def m(name: String, v: org.apache.spark.sql.Column, src: DataFrame): DataFrame =
      src.agg(v.cast("double").as("value")).select(lit(name).as("metric"), col("value"))
    val metrics = Seq(
      m("n_docs", count(lit(1)), docs),
      m("n_clusters", count(lit(1)), sizes),
      m("n_dup_clusters", count(when(col("sz") > 1, lit(1))), sizes),
      m("n_docs_in_dup_clusters", coalesce(sum(when(col("sz") > 1, col("sz"))), lit(0L)), sizes),
      m("dedup_ratio",
        lit(1.0) - count(lit(1)).cast("double") / sum(col("sz")).cast("double"), sizes))
    val hist = sizes.groupBy(
        when(col("sz") === 1, "1").when(col("sz") === 2, "2")
          .when(col("sz") <= 4, "3_4").otherwise("5p").as("b"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(concat(lit("hist_"), col("b")).as("metric"), col("value"))
    metrics.reduce(_ unionByName _).unionByName(hist).orderBy(col("metric"))
  }

  /** Oracle: the collapsed star-edge pipeline over ALL documents (rm =
    * rep map with no quality gate), closure over reps, expand, then the
    * same metric unions. */
  val dReportSql: String =
    s"""WITH RECURSIVE rm AS (
       |  SELECT doc_id, text,
       |    MIN(doc_id) OVER (PARTITION BY
       |      md5(regexp_replace(lower(trim(text)), '[ \t\n\r\f]+', ' ', 'g'))) AS rep
       |  FROM documents),
       |qdocs AS (SELECT doc_id, text FROM rm WHERE doc_id = rep),
       |${shingleCteFor("qdocs")},
       |$hpCte,
       |$sigsCte,
       |$bandsCte,
       |cand AS ($candSelect),
       |$pairsCte,
       |$closureCtes,
       |canon AS (SELECT rm.doc_id, coalesce(l.canonical_id, rm.rep) AS canonical_id
       |          FROM rm LEFT JOIN lbl l ON l.id = rm.rep),
       |sizes AS (SELECT canonical_id, COUNT(*) AS sz FROM canon GROUP BY 1)
       |SELECT metric, value FROM (
       |  SELECT 'n_docs' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM documents
       |  UNION ALL SELECT 'n_clusters', CAST(COUNT(*) AS DOUBLE) FROM sizes
       |  UNION ALL SELECT 'n_dup_clusters', CAST(COUNT(*) FILTER (sz > 1) AS DOUBLE) FROM sizes
       |  UNION ALL SELECT 'n_docs_in_dup_clusters', CAST(COALESCE(SUM(sz) FILTER (sz > 1), 0) AS DOUBLE) FROM sizes
       |  UNION ALL SELECT 'dedup_ratio', 1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(sz) AS DOUBLE) FROM sizes
       |  UNION ALL SELECT 'hist_' || b, CAST(COUNT(*) AS DOUBLE) FROM (
       |    SELECT CASE WHEN sz = 1 THEN '1' WHEN sz = 2 THEN '2'
       |                WHEN sz <= 4 THEN '3_4' ELSE '5p' END AS b FROM sizes) GROUP BY b)
       |ORDER BY metric""".stripMargin

  /** d_editdist: bounded edit-distance near-dup join on document HEADS
    * (first 24 chars — the "title" proxy) — the fuzzy-match family LSH
    * doesn't cover: MinHash sees bag-of-shingle overlap, edit distance
    * sees typo-grade character perturbations. Candidates block on the
    * 4-char prefix with a ±2 length guard, then the O(n·m) Levenshtein DP
    * runs ONLY inside blocks (never all-pairs; both engines implement the
    * same classic DP, so the integer distances compare exactly). At
    * 100 TB extend the block key with a length bucket and salt hot
    * prefixes — the shape stays one equi-join shuffle on the block key. */
  def dEditdist(s: SparkSession, dir: String): DataFrame = {
    val heads = Tables.documents(s, dir)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("head"))
      .withColumn("blk", substring(col("head"), 1, 4))
    // r16 opt (guide §7.2 duplicated-subtree trap, §2.4): the old
    // self-join planned the heads subtree TWICE (two scans of the wide
    // text column, two exchanges, one join); per-block sorted doc sets
    // now expand to a<b pairs in-task — the q_degree_dist idiom — so the
    // fact is scanned ONCE and the only exchange is the block rollup.
    // Identical pair set: doc_id is unique, structs sort by doc_id first,
    // i<j expansion ≡ a_id < b_id within a block. Fan-out is bounded by
    // the block-size cap the ±2 length guard and 4-char prefix give; at
    // 100 TB extend the block key with a length bucket and salt hot
    // prefixes — the shape stays one keyed rollup.
    heads.groupBy(col("blk"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("head")))).as("ds"))
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds) - i - 1), " +
          "y -> struct(x.doc_id AS a_id, x.head AS ha, y.doc_id AS b_id, y.head AS hb))))"))
        .as("e"))
      .select(col("e.a_id").as("a_id"), col("e.ha").as("ha"),
        col("e.b_id").as("b_id"), col("e.hb").as("hb"))
      .filter(abs(length(col("ha")) - length(col("hb"))) <= 2)
      // threshold-banded DP: O(len·k) per pair instead of O(len²), exact
      // for distances within the bound (out-of-bound pairs report -1 and die)
      .withColumn("dist", levenshtein(col("ha"), col("hb"), 2))
      .filter(col("dist").between(0, 2))
      .select(col("a_id"), col("b_id"), col("dist"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val dEditdistSql: String =
    """WITH k AS (SELECT doc_id, substr(text, 1, 24) AS head FROM documents)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  levenshtein(a.head, b.head) AS dist
      |FROM k a JOIN k b
      |  ON substr(a.head, 1, 4) = substr(b.head, 1, 4)
      |  AND a.doc_id < b.doc_id
      |  AND abs(length(a.head) - length(b.head)) <= 2
      |WHERE levenshtein(a.head, b.head) <= 2
      |ORDER BY a_id, b_id""".stripMargin

  /** d_source_overlap: WHICH sources duplicate each other — the verified
    * near-dup pairs of the corpus dedup run rolled up into a symmetric
    * source×source matrix (unordered source pair → pair count). The
    * cross-snapshot overlap report every multi-crawl corpus build reads
    * before deciding which source to keep; runs off the SAME cached
    * verified-pair stage as d_jaccard/d_components, adding only a
    * broadcast-sized (doc_id, source) join and a |sources|²-bounded
    * aggregation. Pair REPORTING inherits the hot-bucket star-edge recall
    * contract documented on d_contamination: within an over-budget band
    * bucket only bucket-min edges are scored. */
  def dSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    jaccardScored(s, dir).filter(col("jaccard") >= JaccardThreshold)
      .join(src.select(col("doc_id").as("a_id"), col("source").as("sa")), "a_id")
      .join(src.select(col("doc_id").as("b_id"), col("source").as("sb")), "b_id")
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val dSourceOverlapSql: String =
    s"""WITH $shingleCte,\n$hpCte,\n$sigsCte,\n$bandsCte,
       |cand AS ($candSelect),
       |$pairsCte
       |SELECT least(da.source, db.source) AS src_a,
       |  greatest(da.source, db.source) AS src_b, COUNT(*) AS n_pairs
       |FROM pairs p
       |JOIN documents da ON da.doc_id = p.a_id
       |JOIN documents db ON db.doc_id = p.b_id
       |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin

  /** d_decontam_sem: SEMANTIC decontamination — the embedding-space
    * counterpart of the lexical t_decontam_ngram/d_contamination gates.
    * Paraphrased benchmark leakage defeats n-gram matching; here every
    * (eval item, training item) pair at cosine ≥ 0.9 is reported, so a
    * reworded eval question whose embedding still lands next to its
    * source is caught. Eval set = vec_id ≡ 0 (mod 13); leakage is
    * simulated by planting perturbed twins (same IEEE ops as
    * d_embed_neardup's, id + 2,000,000 → never ≡ 0 mod 13) of every
    * third eval item into the training side.
    *
    * Scale: rides the SAME hyperplane-band machinery as d_embed_neardup
    * (bucket-size-adaptive: all pairs in small buckets, min-id star in
    * hot ones — the star carries the documented hot-bucket recall
    * caveat), then keeps only cross-side pairs; cosine verification only
    * on candidates. Output is bounded by true leakage, not corpus size. */
  def dDecontamSem(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val e = Tables.embeddings(s, dir)
    val base = e.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
    val leaked = e.filter(col("vec_id") % 39 === 0)
      .select((col("vec_id") + 2000000L).as("vec_id"),
        expr("""transform(embedding, (x, j) ->
                 CAST(x AS DOUBLE) * (1.0D + CASE WHEN (vec_id + j) % 2 = 0
                                             THEN 0.3D ELSE -0.3D END))""").as("embedding"))
    val aug = base.unionByName(leaked)
    val cands = EmbedLsh.candidatePairs(aug)
      .filter((col("a_id") % 13 === 0) =!= (col("b_id") % 13 === 0))
    val ea = aug.select(col("vec_id").as("a_id"), col("embedding").as("a_e"))
    val eb = aug.select(col("vec_id").as("b_id"), col("embedding").as("b_e"))
    cands.join(ea, "a_id").join(eb, "b_id")
      .withColumn("cos", expr("cosine_sim(a_e, b_e)"))
      .filter(col("cos") >= EmbedLsh.Threshold)
      .select(
        when(col("a_id") % 13 === 0, col("a_id")).otherwise(col("b_id")).as("eval_id"),
        when(col("a_id") % 13 === 0, col("b_id")).otherwise(col("a_id")).as("train_id"),
        col("cos"))
      .orderBy(col("eval_id"), col("train_id"))
  }

  /** Oracle: identical leak planting, the shared band CTEs, the same
    * adaptive candidate policy, cross-side filter, cosine verify. */
  val dDecontamSemSql: String =
    s"""WITH aug AS (
       |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 2000000,
       |    [CAST(embedding[j+1] AS DOUBLE) * (1.0 + CASE WHEN (vec_id + j) % 2 = 0
       |                                              THEN 0.3 ELSE -0.3 END)
       |     for j in range(0, len(embedding))]
       |  FROM embeddings WHERE vec_id % 39 = 0),
       |${graft.dedup.EmbedLsh.bandsCteSql("aug")},
       |cand AS (SELECT DISTINCT a_id, b_id FROM (
       |           SELECT m AS a_id, vec_id AS b_id
       |           FROM (SELECT vec_id, MIN(vec_id) OVER (PARTITION BY bk) AS m,
       |                        COUNT(*) OVER (PARTITION BY bk) AS n FROM bk)
       |           WHERE n > ${MinHashLsh.MaxAllPairsBucket} AND vec_id <> m
       |           UNION ALL
       |           SELECT a.vec_id AS a_id, b.vec_id AS b_id
       |           FROM bk a JOIN bk b ON a.bk = b.bk AND a.vec_id < b.vec_id
       |           JOIN (SELECT bk, COUNT(*) AS n FROM bk GROUP BY bk) z ON z.bk = a.bk
       |           WHERE z.n <= ${MinHashLsh.MaxAllPairsBucket})
       |         WHERE (a_id % 13 = 0) <> (b_id % 13 = 0))
       |SELECT CASE WHEN a_id % 13 = 0 THEN a_id ELSE b_id END AS eval_id,
       |       CASE WHEN a_id % 13 = 0 THEN b_id ELSE a_id END AS train_id, cos
       |FROM (
       |  SELECT a_id, b_id, ${cosSql("ea.embedding", "eb.embedding")} AS cos
       |  FROM cand JOIN aug ea ON ea.vec_id = a_id
       |            JOIN aug eb ON eb.vec_id = b_id)
       |WHERE cos >= ${graft.dedup.EmbedLsh.Threshold} ORDER BY eval_id, train_id""".stripMargin

  /** d_substring_overlap: winnowing put to its actual MOSS use — LOCAL
    * overlap detection: document pairs sharing winnowing fingerprints
    * (t_winnowing's k=8/w=8 selection), i.e. pairs sharing verbatim
    * substrings of ≥ w+k−1 chars — the quotation/boilerplate signal that
    * document-level Jaccard smooths away. Ubiquitous fingerprints
    * (appearing in > 16 docs — common-phrase noise with no pair signal,
    * the same hot-bucket cap philosophy as the LSH star expansion) are
    * dropped BEFORE pairing, so the fingerprint join is linear per
    * bucket; pairs rank by shared-fingerprint count. */
  def dSubstringOverlap(s: SparkSession, dir: String): DataFrame = {
    val maxBucket = 16
    // fingerprints come from the shared winnowing stage (one corpus pass
    // serves this gate AND t_winnowing)
    val fps = winnowFps(s, dir)
      .select(col("doc_id"), explode(col("fps")).as("fp"))
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") <= maxBucket)
    val pruned = fps.join(rare.select(col("fp")), "fp")
    pruned.select(col("fp"), col("doc_id").as("a_id"))
      .join(pruned.select(col("fp"), col("doc_id").as("b_id")), "fp")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .orderBy(col("a_id"), col("b_id"))
  }

  val dSubstringOverlapSql: String =
    s"""WITH h AS (
      |  SELECT doc_id, ${graft.functions.TextFunctions.kgramHashesSql("text", 8)} AS hs
      |  FROM documents),
      |fp AS (
      |  SELECT doc_id, unnest(list_distinct([list_min(hs[j + 1 : j + 8])
      |    for j in range(0, greatest(len(hs) - 8, 0) + 1)])) AS fp
      |  FROM h),
      |rare AS (SELECT fp FROM (SELECT fp, COUNT(*) AS n FROM fp GROUP BY fp) WHERE n <= 16),
      |pruned AS (SELECT f.doc_id, f.fp FROM fp f JOIN rare USING (fp))
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
      |FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |ORDER BY a_id, b_id""".stripMargin

  /** d_cdc_chunks: content-defined chunking dedup — the storage-dedup /
    * near-identical-revision primitive the fixed-shingle family can't
    * give: chunk boundaries are decided by TOKEN CONTENT (a boundary
    * falls after any token whose md5 starts with one of 4 of the 16 hex
    * digits — expected chunk ≈ 4 tokens), so inserting a sentence into a
    * document shifts ONE chunk instead of re-keying every fixed-width
    * window downstream of the edit. Output: the top-20 chunks shared by
    * ≥2 documents (doc reach, occurrence count, token length); a ≥3-token
    * floor keeps singleton stopword chunks out of the report.
    *
    * Scale shape: tokenize + flag + chunk-id are narrow per-doc ops on
    * ONE doc-keyed shuffle (the cumulative-boundary window and the
    * (doc, chunk) collapse share the partitioning via Spark's
    * ClusteredDistribution subset rule); the cross-doc reach count
    * shuffles md5 CHUNK KEYS only — raw text never rides a wire — and
    * the final top-20 window sees only chunks that already proved
    * n_docs ≥ 2. */
  def dCdcChunks(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val toks = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
    val chunks = toks
      .withColumn("b",
        when(substring(md5(col("tok")), 1, 1).isin("0", "4", "8", "c"), 1L).otherwise(0L))
      .withColumn("chunk", coalesce(sum(col("b")).over(w), lit(0L)))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ")).as("chunk_key"),
        count(lit(1)).as("chunk_len"))
    val shared = chunks.groupBy(col("chunk_key"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_occ"),
        max(col("chunk_len")).as("chunk_len"))
      .filter(col("n_docs") >= 2 && col("chunk_len") >= 3)
    // orderBy().limit() plans as TakeOrderedAndProject (per-partition heap
    // + driver merge of 20-row heads); the rank window then sees 20 rows,
    // never the full shared-chunk set.
    val wTop = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_docs").desc, col("chunk_key"))
    shared.orderBy(col("n_docs").desc, col("chunk_key")).limit(20)
      .withColumn("rnk", row_number().over(wTop))
      .select(col("rnk"), col("chunk_key"), col("n_docs"), col("n_occ"), col("chunk_len"))
      .orderBy(col("rnk"))
  }

  val dCdcChunksSql: String =
    s"""WITH tk AS (SELECT doc_id, ${Text.toksSql} AS toks FROM documents),
       |t AS (SELECT doc_id, unnest(range(len(toks))) AS pos, unnest(toks) AS tok FROM tk),
       |f AS (SELECT doc_id, pos, tok,
       |        CASE WHEN substr(md5(tok), 1, 1) IN ('0','4','8','c') THEN 1 ELSE 0 END AS b
       |      FROM t),
       |c AS (SELECT doc_id, pos, tok,
       |        COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
       |      FROM f),
       |ch AS (SELECT doc_id, chunk, md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_key,
       |         COUNT(*) AS chunk_len
       |       FROM c GROUP BY doc_id, chunk),
       |sh AS (SELECT chunk_key, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ,
       |         MAX(chunk_len) AS chunk_len
       |       FROM ch GROUP BY chunk_key
       |       HAVING COUNT(DISTINCT doc_id) >= 2 AND MAX(chunk_len) >= 3)
       |SELECT rnk, chunk_key, n_docs, n_occ, chunk_len FROM (
       |  SELECT chunk_key, n_docs, n_occ, chunk_len,
       |    ROW_NUMBER() OVER (ORDER BY n_docs DESC, chunk_key) AS rnk FROM sh)
       |WHERE rnk <= 20 ORDER BY rnk""".stripMargin

  /** The (bands × rows) grid d_lsh_tune evaluates — every factorization
    * of the 24 signature slots. */
  private val TuneConfigs = Seq((2, 12), (3, 8), (4, 6), (6, 4), (8, 3), (12, 2))

  /** d_lsh_tune: LSH BANDING PARAMETER TUNING — the measured S-curve
    * behind MinHashLsh's (b=4, r=6) default: for every factorization of
    * the 24 signature slots, how many VERIFIED near-dup pairs
    * (jaccard ≥ 0.5) would still collide in ≥1 band (recall proxy) and
    * how many verified NON-dups would survive as candidates (wasted
    * verification work) — the two numbers a production pipeline trades
    * when it re-tunes banding for a new similarity target (more bands of
    * fewer rows → catches lower similarity, pays more candidates).
    * Collision is decided EXACTLY from the per-pair signature slots (a
    * band collides iff all its r slots agree), not from the 1-(1-s^r)^b
    * formula — measured, not modeled. Conditioning caveat: the pair
    * population is the CURRENT (4,6) candidate set (by construction that
    * config shows full recall); the report ranks configs relative to it,
    * which is exactly the question "what would retuning do to the pairs I
    * know about".
    *
    * Scale shape: rides the cached signature + scored-pair stages (zero
    * extra corpus passes); the config grid is evaluated in ONE
    * aggregation over the candidate-pair frame (18 conditional sums →
    * 6 stacked rows) — per-pair cost is 24 slot equalities, output is
    * |configs| rows. */
  def dLshTune(s: SparkSession, dir: String): DataFrame = {
    val n = MinHashLsh.NumHashes
    val sigs = stage(s, dir)
    val aS = sigs.select(col("doc_id").as("a_id") +:
      (0 until n).map(i => col(s"sig_$i").as(s"a_$i")): _*)
    val bS = sigs.select(col("doc_id").as("b_id") +:
      (0 until n).map(i => col(s"sig_$i").as(s"b_$i")): _*)
    val scored = jaccardScored(s, dir).join(aS, "a_id").join(bS, "b_id")
      .withColumn("is_dup", col("jaccard") >= JaccardThreshold)
    def collide(b: Int, r: Int) = (0 until b).map { j =>
      (j * r until (j + 1) * r).map(i => col(s"a_$i") === col(s"b_$i")).reduce(_ && _)
    }.reduce(_ || _)
    val aggs = sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup") +:
      TuneConfigs.flatMap { case (b, r) => Seq(
        sum(when(col("is_dup") && collide(b, r), 1L).otherwise(0L)).as(s"dc_$b"),
        sum(when(!col("is_dup") && collide(b, r), 1L).otherwise(0L)).as(s"nc_$b"))
      }
    val stacked = TuneConfigs.map { case (b, r) =>
      s"$b, $r, n_dup, dc_$b, nc_$b" }.mkString(", ")
    scored.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${TuneConfigs.size}, $stacked) AS " +
        "(bands, rows_per_band, n_dup, n_dup_collide, n_nondup_collide)"))
      .withColumn("recall", col("n_dup_collide").cast("double") /
        greatest(col("n_dup"), lit(1L)).cast("double"))
      .orderBy(col("bands"))
  }

  val dLshTuneSql: String = {
    val n = MinHashLsh.NumHashes
    val aAl = (0 until n).map(i => s"sa.sig_$i AS a_$i").mkString(", ")
    val bAl = (0 until n).map(i => s"sb.sig_$i AS b_$i").mkString(", ")
    def collide(b: Int, r: Int) = (0 until b).map { j =>
      (j * r until (j + 1) * r).map(i => s"a_$i = b_$i").mkString("(", " AND ", ")")
    }.mkString("(", " OR ", ")")
    val sums = TuneConfigs.map { case (b, r) =>
      s"""SUM(CASE WHEN is_dup AND ${collide(b, r)} THEN 1 ELSE 0 END) AS dc_$b,
         |    SUM(CASE WHEN (NOT is_dup) AND ${collide(b, r)} THEN 1 ELSE 0 END) AS nc_$b""".stripMargin
    }.mkString(",\n    ")
    val rows = TuneConfigs.map { case (b, r) =>
      s"SELECT $b AS bands, $r AS rows_per_band, n_dup, dc_$b AS n_dup_collide, nc_$b AS n_nondup_collide FROM agg"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shingleCte,\n$hpCte,\n$sigsCte,\n$bandsCte,
       |cand AS ($candSelect),
       |pj AS (
       |  SELECT a_id, b_id, $jaccardExprSql AS jaccard
       |  FROM cand JOIN sh sa ON sa.doc_id = a_id JOIN sh sb ON sb.doc_id = b_id),
       |wide AS (
       |  SELECT pj.jaccard >= $JaccardThreshold AS is_dup, $aAl, $bAl
       |  FROM pj JOIN sigs sa ON sa.doc_id = pj.a_id JOIN sigs sb ON sb.doc_id = pj.b_id),
       |agg AS (
       |  SELECT SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup,
       |    $sums
       |  FROM wide)
       |SELECT bands, rows_per_band, CAST(n_dup AS BIGINT) AS n_dup,
       |  CAST(n_dup_collide AS BIGINT) AS n_dup_collide,
       |  CAST(n_nondup_collide AS BIGINT) AS n_nondup_collide,
       |  CAST(n_dup_collide AS DOUBLE) / CAST(greatest(n_dup, 1) AS DOUBLE) AS recall
       |FROM ($rows) t
       |ORDER BY bands""".stripMargin
  }

  /** d_cos_hist: the COSINE-THRESHOLD selection curve for embedding
    * near-dup (d_lsh_tune's sibling for the cosine side — the measured
    * evidence behind EmbedLsh.Threshold): every hyperplane-band candidate
    * pair from the SAME twin-augmented corpus as d_embed_neardup, bucketed
    * by floor(cos·20) — the histogram is bimodal (planted twins near 1.0,
    * band-collision noise far below), and the threshold belongs in the
    * valley. Per band: pair count and the exact min/max cosine.
    *
    * Scale shape: identical candidate budget to d_embed_neardup (bucketed,
    * linear per band bucket, never all-pairs); the histogram rollup is
    * ≤40 rows. */
  def dCosHist(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val e = Tables.embeddings(s, dir)
    val base = e.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
    val twins = e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("""transform(embedding, (x, j) ->
                 CAST(x AS DOUBLE) * (1.0D + CASE WHEN (vec_id + j) % 2 = 0
                                             THEN 0.3D ELSE -0.3D END))""").as("embedding"))
    val aug = base.unionByName(twins)
    val cands = EmbedLsh.candidatePairs(aug)
    val ea = aug.select(col("vec_id").as("a_id"), col("embedding").as("a_e"))
    val eb = aug.select(col("vec_id").as("b_id"), col("embedding").as("b_e"))
    cands.join(ea, "a_id").join(eb, "b_id")
      .withColumn("cos", expr("cosine_sim(a_e, b_e)"))
      .select(floor(col("cos") * 20).cast("long").as("cos_bucket"), col("cos"))
      .groupBy(col("cos_bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        graft.functions.OracleParity.x6(min(col("cos"))).as("min_cos"),
        graft.functions.OracleParity.x6(max(col("cos"))).as("max_cos"))
      .orderBy(col("cos_bucket"))
  }

  val dCosHistSql: String =
    s"""WITH aug AS (
       |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000,
       |    [CAST(embedding[j+1] AS DOUBLE) * (1.0 + CASE WHEN (vec_id + j) % 2 = 0
       |                                              THEN 0.3 ELSE -0.3 END)
       |     for j in range(0, len(embedding))]
       |  FROM embeddings WHERE vec_id % 20 = 0),
       |${graft.dedup.EmbedLsh.bandsCteSql("aug")},
       |cand AS (SELECT DISTINCT a_id, b_id FROM (
       |           SELECT m AS a_id, vec_id AS b_id
       |           FROM (SELECT vec_id, MIN(vec_id) OVER (PARTITION BY bk) AS m,
       |                        COUNT(*) OVER (PARTITION BY bk) AS n FROM bk)
       |           WHERE n > ${MinHashLsh.MaxAllPairsBucket} AND vec_id <> m
       |           UNION ALL
       |           SELECT a.vec_id AS a_id, b.vec_id AS b_id
       |           FROM bk a JOIN bk b ON a.bk = b.bk AND a.vec_id < b.vec_id
       |           JOIN (SELECT bk, COUNT(*) AS n FROM bk GROUP BY bk) z ON z.bk = a.bk
       |           WHERE z.n <= ${MinHashLsh.MaxAllPairsBucket})),
       |sc AS (
       |  SELECT ${cosSql("ea.embedding", "eb.embedding")} AS cos
       |  FROM cand JOIN aug ea ON ea.vec_id = a_id
       |            JOIN aug eb ON eb.vec_id = b_id)
       |SELECT CAST(floor(cos * 20) AS BIGINT) AS cos_bucket, COUNT(*) AS n_pairs,
       |  CAST(CAST(MIN(cos) AS DECIMAL(18,6)) AS DOUBLE) AS min_cos,
       |  CAST(CAST(MAX(cos) AS DECIMAL(18,6)) AS DOUBLE) AS max_cos
       |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin

  /** d_dup_mass: the DEDUP ROI estimate — how much TOKEN MASS duplicates
    * waste (the number that justifies the dedup pipeline's compute bill:
    * every duplicated token is training compute spent re-seeing data,
    * and the inflation factor prices it): total token mass vs the mass
    * of canonical survivors off the run's shared canonical map, with the
    * inflation factor and the wasted share as pinned divisions.
    *
    * Scale shape: rides the cached fullCanonical stage (computed once
    * per session/dataset like the signature table) + one narrow token
    * count; ONE global aggregation to a single report row. */
  def dDupMass(s: SparkSession, dir: String): DataFrame = {
    val canon = fullCanonical(s, dir)
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_toks"))
    canon.join(toks, "doc_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") === col("canonical_id"), 1L).otherwise(0L)).as("n_survivors"),
        sum(col("n_toks")).as("total_tokens"),
        sum(when(col("doc_id") === col("canonical_id"), col("n_toks")).otherwise(0L))
          .as("survivor_tokens"))
      .select(col("n_docs"), col("n_survivors"), col("total_tokens"), col("survivor_tokens"),
        (col("total_tokens") - col("survivor_tokens")).as("dup_tokens"),
        graft.functions.OracleParity.x6(
          col("total_tokens").cast("double") / col("survivor_tokens").cast("double"))
          .as("inflation"),
        graft.functions.OracleParity.x6(
          (col("total_tokens") - col("survivor_tokens")).cast("double") /
            col("total_tokens").cast("double")).as("waste_share"))
  }

  val dDupMassSql: String =
    s"""WITH RECURSIVE rm AS (
       |  SELECT doc_id, text,
       |    MIN(doc_id) OVER (PARTITION BY
       |      md5(regexp_replace(lower(trim(text)), '[ \t\n\r\f]+', ' ', 'g'))) AS rep
       |  FROM documents),
       |qdocs AS (SELECT doc_id, text FROM rm WHERE doc_id = rep),
       |${shingleCteFor("qdocs")},
       |$hpCte,
       |$sigsCte,
       |$bandsCte,
       |cand AS ($candSelect),
       |$pairsCte,
       |$closureCtes,
       |canon AS (SELECT rm.doc_id, coalesce(l.canonical_id, rm.rep) AS canonical_id
       |          FROM rm LEFT JOIN lbl l ON l.id = rm.rep),
       |toks AS (SELECT doc_id, CAST(len(${graft.queries.Text.toksSql}) AS BIGINT) AS n_toks
       |         FROM documents),
       |m AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(CASE WHEN c.doc_id = c.canonical_id THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
       |    CAST(SUM(t.n_toks) AS BIGINT) AS total_tokens,
       |    CAST(SUM(CASE WHEN c.doc_id = c.canonical_id THEN t.n_toks ELSE 0 END) AS BIGINT) AS survivor_tokens
       |  FROM canon c JOIN toks t ON t.doc_id = c.doc_id)
       |SELECT n_docs, n_survivors, total_tokens, survivor_tokens,
       |  total_tokens - survivor_tokens AS dup_tokens,
       |  CAST(CAST(CAST(total_tokens AS DOUBLE) / CAST(survivor_tokens AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS inflation,
       |  CAST(CAST(CAST(total_tokens - survivor_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS waste_share
       |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_dup_mass"      -> dDupMass _,
    "d_cos_hist"      -> dCosHist _,
    "d_lsh_tune"      -> dLshTune _,
    "d_cdc_chunks"    -> dCdcChunks _,
    "d_decontam_sem"  -> dDecontamSem _,
    "d_source_overlap" -> dSourceOverlap _,
    "d_substring_overlap" -> dSubstringOverlap _,
    "d_editdist"      -> dEditdist _,
    "d_paragraph"     -> dParagraph _,
    "d_exact"         -> dExact _,
    "d_minhash_pairs" -> dMinhashPairs _,
    "d_minhash_est"   -> dMinhashEst _,
    "d_jaccard"       -> dJaccard _,
    "d_components"    -> dComponents _,
    "d_curate"        -> dCurate _,
    "d_contamination" -> dContamination _,
    "d_incremental"   -> dIncremental _,
    "d_containment"   -> dContainment _,
    "d_simhash"       -> dSimhash _,
    "d_simhash128"    -> dSimhash128 _,
    "d_embed_neardup" -> dEmbedNeardup _,
    "d_semdedup"      -> dSemdedup _,
    "d_report"        -> dReport _,
  )

  val oracle: Map[String, String] = Map(
    "d_dup_mass"      -> dDupMassSql,
    "d_cos_hist"      -> dCosHistSql,
    "d_lsh_tune"      -> dLshTuneSql,
    "d_cdc_chunks"    -> dCdcChunksSql,
    "d_decontam_sem"  -> dDecontamSemSql,
    "d_source_overlap" -> dSourceOverlapSql,
    "d_substring_overlap" -> dSubstringOverlapSql,
    "d_editdist"      -> dEditdistSql,
    "d_paragraph"     -> dParagraphSql,
    "d_exact"         -> dExactSql,
    "d_minhash_pairs" -> dMinhashPairsSql,
    "d_minhash_est"   -> dMinhashEstSql,
    "d_jaccard"       -> dJaccardSql,
    "d_components"    -> dComponentsSql,
    "d_curate"        -> dCurateSql,
    "d_contamination" -> dContaminationSql,
    "d_incremental"   -> dIncrementalSql,
    "d_containment"   -> dContainmentSql,
    "d_simhash"       -> dSimhashSql,
    "d_simhash128"    -> dSimhash128Sql,
    "d_embed_neardup" -> dEmbedNeardupSql,
    "d_semdedup"      -> dSemdedupSql,
    "d_report"        -> dReportSql,
  )
}
