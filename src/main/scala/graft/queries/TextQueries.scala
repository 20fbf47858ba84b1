package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/**
 * Text-analysis + dedup operator coverage on `documents.parquet`.
 * DuckDB oracles mirror the tokenization (split on whitespace of
 * trimmed lowercased text, drop empties) and the fixed stopword lists
 * verbatim. Hash-based ops (MinHash/SimHash/rolling hash) are
 * rows-only: their hash functions are engine-internal by design;
 * their invariants are covered by DedupSpec.
 */
object TextQueries {
  import Tables.table

  // DuckDB-side token expression, kept in lockstep with TextAnalysis.tokens
  private val toksSql = ReplaySql.toksSql

  private def stopList(lang: String): String =
    TextAnalysis.stopwords.toMap.apply(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  /** q96's engine plan, named so the generated oracle can reuse it to
    * read the top-30 pmi values off the engine's own result. */
  private def q96Run(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    // round-17: spread the one-split scan before tokenize+explode (the
    // expensive map work); nDocs avoids the explode+distinct pass — it
    // only needs "docs with >= 1 token", which one cheap scan computes
    // (doc_id is the table's primary key; distinct guards duplicates).
    val docs = graft.operators.Parallelism.spreadForMapWork(
      table(spark, dir, "documents"), "doc_id")
    val toks = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .distinct()
    val nDocs = docs.filter(size(TextAnalysis.tokens(col("text"))) > 0)
      .select("doc_id").distinct().count()
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(50)
    val shared = toks.join(broadcast(vocab), "term")
      .filter(col("doc_id").isNotNull)
      .repartition(col("doc_id"))
    val a = shared.select(col("doc_id"), col("term").as("t1"), col("c").as("c1"))
    val b = shared.select(col("doc_id"), col("term").as("t2"), col("c").as("c2"))
    a.join(b, Seq("doc_id"))
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2", "c1", "c2")
      .agg(count(lit(1)).as("c12"))
      .select(col("t1"), col("t2"), col("c1"), col("c2"), col("c12"),
        round(log(col("c12").cast("double") * nDocs / (col("c1") * col("c2"))), 6)
          .as("pmi"))
      .orderBy(col("c12").desc, col("t1"), col("t2"))
      .limit(30)
  }

  private val allStopSql =
    TextAnalysis.stopwords.flatMap(_._2).distinct.map(w => s"'$w'").mkString("[", ", ", "]")

  def defs: Seq[QueryDef] = Seq(

    QueryDef("q30_token_stats", Some(
      s"""WITH t AS (SELECT doc_id, lang, text, $toksSql AS toks FROM documents)
         |SELECT doc_id, lang,
         |  CAST(len(toks) AS INTEGER) AS n_tokens,
         |  CAST(floor((CASE WHEN len(toks) = 0 THEN 0.0
         |    ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) END) * 1000000.0 + 0.5) AS BIGINT) AS avg_token_len_e6,
         |  CAST(floor((CASE WHEN len(toks) = 0 THEN 0.0
         |    ELSE CAST(len(list_filter(toks, x -> list_contains($allStopSql, x))) AS DOUBLE) / len(toks) END) * 1000000.0 + 0.5) AS BIGINT) AS stopword_ratio_e6
         |FROM t
         |ORDER BY doc_id""".stripMargin),
      (spark, dir) =>
        table(spark, dir, "documents")
          .withColumn("m", TextAnalysis.textMetrics(col("text")))
          // per-row single-division rationals -> e6 floor (round-16):
          // both engines divide the same integers, then floor the same
          // premultiplied double — no decimal tie class
          .select(col("doc_id"), col("lang"),
            col("m.n_tokens").as("n_tokens"),
            floor(col("m.avg_token_len") * lit(1e6) + lit(0.5))
              .as("avg_token_len_e6"),
            floor(col("m.stopword_ratio") * lit(1e6) + lit(0.5))
              .as("stopword_ratio_e6"))
          .orderBy("doc_id")),

    QueryDef("q31_quality_langid", Some({
      val scores = TextAnalysis.stopwords.sortBy(_._1).map { case (lang, _) =>
        s"CAST(len(list_intersect(list_distinct(toks), ${stopList(lang)})) AS INTEGER) AS s_$lang"
      }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, lang, text, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, lang, text, toks, $scores FROM t),
         |g AS (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS gm FROM s)
         |SELECT doc_id, lang,
         |  CASE WHEN gm = 0 THEN 'und'
         |    WHEN s_de = gm THEN 'de' WHEN s_en = gm THEN 'en'
         |    WHEN s_es = gm THEN 'es' WHEN s_fr = gm THEN 'fr' ELSE 'zh' END AS lang_pred,
         |  CAST(floor((
         |    (CASE WHEN len(toks) BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END) * 0.3 +
         |    (CASE WHEN (CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, x -> list_contains($allStopSql, x))) AS DOUBLE) / len(toks) END) BETWEEN 0.01 AND 0.7 THEN 1.0 ELSE 0.0 END) * 0.3 +
         |    (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?''"\\-\\(\\)]', '', 'g')) AS DOUBLE) / length(text) END) < 0.2 THEN 1.0 ELSE 0.0 END) * 0.2 +
         |    (CASE WHEN (CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) END) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) * 0.2) * 1000000.0 + 0.5) AS BIGINT) AS quality_score_e6
         |FROM g
         |ORDER BY doc_id""".stripMargin}),
      (spark, dir) =>
        table(spark, dir, "documents")
          .withColumn("m", TextAnalysis.textMetrics(col("text")))
          // the score lattice is 1dp-valued (weights .3/.3/.2/.2), so
          // x*1e6 sits 100000 steps from any half-integer — the e6
          // floor is noise-tolerant even across op-order differences
          .select(col("doc_id"), col("lang"),
            col("m.lang_pred").as("lang_pred"),
            floor(col("m.quality_score") * lit(1e6) + lit(0.5))
              .as("quality_score_e6"))
          .orderBy("doc_id")),

    QueryDef("q32_langid_confusion", Some({
      val scores = TextAnalysis.stopwords.sortBy(_._1).map { case (lang, _) =>
        s"len(list_intersect(list_distinct(toks), ${stopList(lang)})) AS s_$lang"
      }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, lang, $scores FROM t),
         |g AS (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS gm FROM s),
         |p AS (SELECT lang, CASE WHEN gm = 0 THEN 'und'
         |    WHEN s_de = gm THEN 'de' WHEN s_en = gm THEN 'en'
         |    WHEN s_es = gm THEN 'es' WHEN s_fr = gm THEN 'fr' ELSE 'zh' END AS lang_pred
         |  FROM g)
         |SELECT lang, lang_pred, count(*) AS n FROM p
         |GROUP BY lang, lang_pred
         |ORDER BY lang, lang_pred""".stripMargin}),
      (spark, dir) =>
        table(spark, dir, "documents")
          .select(col("lang"),
            TextAnalysis.textMetrics(col("text")).getField("lang_pred").as("lang_pred"))
          .groupBy("lang", "lang_pred")
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "lang_pred")),

    QueryDef("q33_dedup_exact", Some(
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY text_hash""".stripMargin),
      (spark, dir) =>
        Dedup.exactDuplicateGroups(table(spark, dir, "documents"), "doc_id", "text")
          .orderBy("text_hash")),

    // Stop-shingle prune at df > 1000 on BOTH sides (engine + oracle):
    // inert on this corpus (max df 25 at sf0.1) but load-bearing at
    // 100x, where one boilerplate shingle with df = m would stream m^2
    // rows into the counting aggregate. A shingle in >1000 docs carries
    // no similarity signal — it only costs quadratic join mass.
    QueryDef("q34_ngram_jaccard_topk", Some(
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] FOR i IN range(1, greatest(len(tk) - 1, 1))]) AS shingles
        |  FROM toks WHERE len(tk) >= 3),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
        |freq AS (SELECT shingle, count(*) AS dfc FROM ex GROUP BY shingle),
        |exf AS (SELECT e.* FROM ex e JOIN freq USING (shingle) WHERE dfc <= 1000),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
        |    count(*) AS common
        |  FROM exf a JOIN exf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b, CAST(floor(CAST(common AS DOUBLE) / (n_a + n_b - common) * 1000000.0 + 0.5) AS BIGINT) AS jaccard_e6
        |FROM pairs
        |WHERE CAST(common AS DOUBLE) / (n_a + n_b - common) >= 0.2
        |ORDER BY CAST(common AS DOUBLE) / (n_a + n_b - common) DESC, id_a, id_b
        |LIMIT 20""".stripMargin),
      (spark, dir) =>
        Dedup.ngramJaccardPairs(table(spark, dir, "documents"), "doc_id", "text",
            shingleSize = 3, minJaccard = 0.2, maxShingleFreq = 1000L)
          .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
          .limit(20)
          .select(col("id_a"), col("id_b"), floor(col("jaccard") * lit(1e6) + lit(0.5)).as("jaccard_e6"))),

    // High-threshold jaccard variant (t=0.6). Uses the default counting
    // plan — prefix filtering is opt-in and loses on this corpus's
    // small shingle vocabulary (see ngramJaccardPairs scaladoc); the
    // prefix plan is differentially tested against this one in
    // DedupSpec.
    QueryDef("q66_jaccard_prefix_filter", Some(
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] FOR i IN range(1, greatest(len(tk) - 1, 1))]) AS shingles
        |  FROM toks WHERE len(tk) >= 3),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
        |freq AS (SELECT shingle, count(*) AS dfc FROM ex GROUP BY shingle),
        |exf AS (SELECT e.* FROM ex e JOIN freq USING (shingle) WHERE dfc <= 1000),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
        |    count(*) AS common
        |  FROM exf a JOIN exf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b, CAST(floor(CAST(common AS DOUBLE) / (n_a + n_b - common) * 1000000.0 + 0.5) AS BIGINT) AS jaccard_e6
        |FROM pairs
        |WHERE CAST(common AS DOUBLE) / (n_a + n_b - common) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin),
      (spark, dir) =>
        Dedup.ngramJaccardPairs(table(spark, dir, "documents"), "doc_id", "text",
            shingleSize = 3, minJaccard = 0.6, maxShingleFreq = 1000L)
          .select(col("id_a"), col("id_b"), floor(col("jaccard") * lit(1e6) + lit(0.5)).as("jaccard_e6"))
          .orderBy("id_a", "id_b")),

    // PII redaction. The corpus is synthetic, so each doc is seeded
    // with deterministic PII (an email, a phone, an IP derived from
    // doc_id) on BOTH sides, then redacted; outputs the md5 of the
    // redacted text plus per-kind match counts. Patterns use only the
    // Java-regex/RE2 common subset with a fixed application order, so
    // the redaction replays exactly.
    QueryDef("q74_pii_redact", Some(
      s"""WITH seeded AS (
         |  SELECT doc_id,
         |    text || ' contact u' || CAST(doc_id AS VARCHAR) ||
         |    '@example.com or call 555-123-4567 from 10.0.0.' ||
         |    CAST(doc_id % 256 AS VARCHAR) AS s
         |  FROM documents)
         |SELECT doc_id,
         |  md5(regexp_replace(regexp_replace(regexp_replace(s,
         |    '${TextAnalysis.emailPattern}', '<EMAIL>', 'g'),
         |    '${TextAnalysis.phonePattern}', '<PHONE>', 'g'),
         |    '${TextAnalysis.ipv4Pattern}', '<IP>', 'g')) AS redacted_hash,
         |  CAST(len(regexp_extract_all(s, '${TextAnalysis.emailPattern}')) AS INTEGER) AS n_email,
         |  CAST(len(regexp_extract_all(s, '${TextAnalysis.phonePattern}')) AS INTEGER) AS n_phone,
         |  CAST(len(regexp_extract_all(regexp_replace(s, '${TextAnalysis.phonePattern}', ' ', 'g'),
         |    '${TextAnalysis.ipv4Pattern}')) AS INTEGER) AS n_ip
         |FROM seeded ORDER BY doc_id""".stripMargin),
      (spark, dir) =>
        // round-17: 6 regex passes per row off a one-split scan —
        // spread first (per-row CPU dominates; no-op on well-split
        // inputs)
        graft.operators.Parallelism.spreadForMapWork(
            table(spark, dir, "documents"), "doc_id")
          .withColumn("s", concat(col("text"),
            lit(" contact u"), col("doc_id").cast("string"),
            lit("@example.com or call 555-123-4567 from 10.0.0."),
            (col("doc_id") % 256).cast("string")))
          .select(col("doc_id"),
            md5(TextAnalysis.redactPii(col("s"))).as("redacted_hash"),
            TextAnalysis.piiCounts(col("s")).getField("n_email").as("n_email"),
            TextAnalysis.piiCounts(col("s")).getField("n_phone").as("n_phone"),
            TextAnalysis.piiCounts(col("s")).getField("n_ip").as("n_ip"))
          .orderBy("doc_id")),

    // Benchmark decontamination: src0 docs play the eval set, the rest
    // the corpus; a doc sharing any 8-token shingle with a benchmark
    // doc is contaminated. The benchmark shingle table broadcasts —
    // the corpus side never shuffles (the property that matters at
    // 100 TB; asserted in PlanAuditSpec).
    QueryDef("q75_decontaminate", Some(
      """WITH toks AS (
        |  SELECT doc_id, source, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source,
        |    list_distinct([array_to_string(tk[i:i+7], ' ') FOR i IN range(1, greatest(len(tk) - 6, 1))]) AS shingles
        |  FROM toks WHERE len(tk) >= 8),
        |c AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh WHERE source <> 'src0'),
        |b AS (SELECT doc_id AS bench_id, unnest(shingles) AS shingle FROM sh WHERE source = 'src0')
        |SELECT c.doc_id AS id, b.bench_id, count(*) AS n_shared
        |FROM c JOIN b USING (shingle)
        |GROUP BY 1, 2
        |ORDER BY id, bench_id""".stripMargin),
      (spark, dir) => {
        val docs = table(spark, dir, "documents")
        TextAnalysis.contaminationPairs(
            docs.filter(col("source") =!= "src0"), "doc_id", "text",
            docs.filter(col("source") === "src0"), "doc_id", "text",
            n = 8, minOverlap = 1)
          .orderBy("id", "bench_id")
      }),

    // Bloom-prefiltered decontamination — the SAME contamination
    // semantics as q75 when the benchmark registry is too large to
    // broadcast (contaminationPairsBloom scaladoc): a Bloom filter over
    // the benchmark shingle hashes prefilters the corpus map-side (no
    // false negatives), and a shuffle join confirms exactly — so the
    // oracle is the plain exact string-shingle join. src1 plays the
    // registry here (src0 stays q75's), corpus = everything else.
    QueryDef("q121_decontam_bloom", Some(
      """WITH toks AS (
        |  SELECT doc_id, source, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source,
        |    list_distinct([array_to_string(tk[i:i+7], ' ') FOR i IN range(1, greatest(len(tk) - 6, 1))]) AS shingles
        |  FROM toks WHERE len(tk) >= 8),
        |c AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh WHERE source <> 'src1'),
        |b AS (SELECT doc_id AS bench_id, unnest(shingles) AS shingle FROM sh WHERE source = 'src1')
        |SELECT c.doc_id AS id, b.bench_id, count(*) AS n_shared
        |FROM c JOIN b USING (shingle)
        |GROUP BY 1, 2
        |ORDER BY id, bench_id""".stripMargin),
      (spark, dir) => {
        val docs = table(spark, dir, "documents")
        TextAnalysis.contaminationPairsBloom(
            docs.filter(col("source") =!= "src1"), "doc_id", "text",
            docs.filter(col("source") === "src1"), "doc_id", "text",
            n = 8, minOverlap = 1)
          .orderBy("id", "bench_id")
      }),

    // Multi-benchmark decontamination (contaminationPairsMulti
    // scaladoc): screen the corpus against TWO benchmark sets in one
    // shingle pass — the stacked benchmark tables broadcast once,
    // the corpus scans once total.
    QueryDef("q105_multi_decontaminate", Some(
      """WITH toks AS (
        |  SELECT doc_id, source, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source,
        |    list_distinct([array_to_string(tk[i:i+7], ' ') FOR i IN range(1, greatest(len(tk) - 6, 1))]) AS shingles
        |  FROM toks WHERE len(tk) >= 8),
        |c AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh
        |  WHERE source NOT IN ('src0', 'src1')),
        |b AS (
        |  SELECT 'b0' AS benchmark, doc_id AS bench_id, unnest(shingles) AS shingle
        |  FROM sh WHERE source = 'src0'
        |  UNION ALL
        |  SELECT 'b1', doc_id, unnest(shingles) FROM sh WHERE source = 'src1')
        |SELECT c.doc_id AS id, b.benchmark, b.bench_id, count(*) AS n_shared
        |FROM c JOIN b USING (shingle)
        |GROUP BY 1, 2, 3
        |ORDER BY id, benchmark, bench_id""".stripMargin),
      (spark, dir) => {
        val docs = table(spark, dir, "documents")
        TextAnalysis.contaminationPairsMulti(
            docs.filter(!col("source").isin("src0", "src1")), "doc_id", "text",
            Seq(
              ("b0", docs.filter(col("source") === "src0"), "doc_id", "text"),
              ("b1", docs.filter(col("source") === "src1"), "doc_id", "text")),
            n = 8, minOverlap = 1)
          .orderBy("id", "benchmark", "bench_id")
      }),

    // Token-window chunking — the upstream document splitter (windows
    // of 64 tokens every 48, tail kept, 16-token overlap). Pure
    // function of the text: DuckDB replays the window arithmetic and
    // slicing exactly, so the split is hash-compared end-to-end.
    QueryDef("q72_chunk_split", Some(
      s"""WITH toks AS (
         |  SELECT doc_id, $toksSql AS tk FROM documents),
         |w AS (
         |  SELECT doc_id, tk,
         |    CASE WHEN len(tk) <= 64 THEN 1
         |      ELSE 1 + CAST(ceil((len(tk) - 64) / 48.0) AS INTEGER) END AS nw
         |  FROM toks WHERE len(tk) > 0),
         |e AS (
         |  SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         |    tk[i*48+1 : i*48+64] AS win
         |  FROM w, unnest(range(0, nw)) AS u(i))
         |SELECT doc_id, chunk_idx,
         |  array_to_string(win, ' ') AS chunk_text,
         |  CAST(len(win) AS INTEGER) AS chunk_tokens
         |FROM e ORDER BY doc_id, chunk_idx""".stripMargin),
      (spark, dir) =>
        TextAnalysis.chunkByTokens(table(spark, dir, "documents"),
            "doc_id", "text", size = 64, stride = 48)
          .orderBy("doc_id", "chunk_idx")),

    // bands=32 (rows=2): LSH threshold (1/b)^(1/r) ~ 0.18, matched to
    // the 0.2 verification cut so banding recall stays high. Slice
    // banding + replayable hashes make even this approximate pipeline
    // hash-comparable: the oracle recomputes the same minhash
    // signatures, bands on the same slices, verifies the same jaccard.
    QueryDef("q35_minhash_neardup", Some(q35OracleSql),
      (spark, dir) =>
        Dedup.minHashNearDupPairs(table(spark, dir, "documents"), "doc_id", "text",
            shingleSize = 3, numHashes = 64, bands = 32, minJaccard = 0.2)
          .select(col("id_a"), col("id_b"), floor(col("jaccard") * lit(1e6) + lit(0.5)).as("jaccard_e6"))
          .orderBy("id_a", "id_b")),

    // Incremental near-dup against an authoritative corpus: docs with
    // doc_id % 3 = 0 play the incoming batch. Same replayable banding
    // machinery as q35; the oracle filters/orients the full pair set
    // (equivalent by banding id-agnosticism, proven differentially in
    // DedupSpec) — so the production incremental path is hash-compared.
    QueryDef("q76_incremental_neardup", Some(q76OracleSql),
      (spark, dir) => {
        val docs = table(spark, dir, "documents")
        Dedup.incrementalMinHashPairs(
            docs.filter(col("doc_id") % 3 =!= 0),
            docs.filter(col("doc_id") % 3 === 0),
            "doc_id", "text",
            shingleSize = 3, numHashes = 64, bands = 32, minJaccard = 0.2)
          .select(col("id_a"), col("id_b"), floor(col("jaccard") * lit(1e6) + lit(0.5)).as("jaccard_e6"))
          .orderBy("id_a", "id_b")
      }),

    // SimHash is deterministic arithmetic (poly-31 string hash +
    // splitmix finalizer + bit votes), so DuckDB replays it exactly —
    // hash-compared, not rows-only.
    QueryDef("q36_simhash_fingerprints", Some(q36OracleSql),
      (spark, dir) =>
        table(spark, dir, "documents")
          .select(col("doc_id"),
            Dedup.simhash(TextAnalysis.tokens(col("text"))).as("simhash"))
          .orderBy("doc_id")),

    // The Karp-Rabin polynomial (base 257 mod 2^61-1, over bytes) is
    // plain modular arithmetic, so DuckDB can replay it exactly with
    // HUGEINT list_reduce — a REAL oracle for the fingerprint, not a
    // rows-only check. (Corpus is ASCII, so ord(char) == byte.)
    QueryDef("q37_rolling_fingerprint", Some(
      """SELECT doc_id,
        |  CAST(CASE WHEN length(text) = 0 THEN 0 ELSE list_reduce(
        |    list_prepend(CAST(0 AS HUGEINT),
        |      [CAST(ord(c) AS HUGEINT) FOR c IN string_split(text, '')]),
        |    (acc, c) -> (acc * 257 + c) % 2305843009213693951) END AS BIGINT) AS fingerprint
        |FROM documents
        |ORDER BY doc_id""".stripMargin),
      (spark, dir) => {
        import org.apache.spark.sql.graft.Bridge
        import org.apache.spark.sql.graft.expressions.RollingHash
        table(spark, dir, "documents")
          .select(col("doc_id"),
            Bridge.column(RollingHash(Bridge.expression(col("text")))).as("fingerprint"))
          .orderBy("doc_id")
      }),

    // Substring-level dedup signal (Lee et al. 2021's fixed-length
    // window formulation): fingerprint full 8-token windows every 4
    // tokens, mark spans whose hash occurs in >= 2 distinct docs, and
    // profile each document by its repeated fraction. Everything after
    // tokenization shuffles only (hash, id) pairs; the poly-31+splitmix
    // span hash replays exactly in DuckDB HUGEINT.
    QueryDef("q81_repeated_spans", Some(q81OracleSql),
      (spark, dir) =>
        Dedup.repetitionProfile(table(spark, dir, "documents"),
            "doc_id", "text", spanTokens = 8, stride = 4, minDocs = 2)
          .withColumn("repeated_frac_e6",
            floor(col("n_repeated").cast("double") / col("n_spans")
              * lit(1e6) + lit(0.5)))
          .drop("repeated_frac")
          .orderBy("doc_id")),

    // The capstone composition: the full training-set preparation
    // pipeline as ONE replayable query — quality gate (q31 formula) ->
    // exact dedup (q33) -> near-dup removal via jaccard pairs +
    // connected components (q34/q61) -> deterministic split (q62) ->
    // shard + token-budget packing (q64/q82). One splitmix stream
    // drives split AND shard (shard is a parallelism unit, not an
    // independent statistical draw, so stream reuse is harmless and
    // keeps the oracle one expression). Output: bin occupancy per
    // (split, shard, bin) — the shape a trainer consumes.
    QueryDef("q83_training_set_prep", Some(q83OracleSql),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        // round-17: spreadForMapWork was A/B'd here and REJECTED (same
        // per-task-init-dominated profile as q111: CPU x8 at sf0.1)
        val docs = table(spark, dir, "documents")
        val gated = docs
          .withColumn("__m", TextAnalysis.textMetrics(col("text")))
          .filter(round(col("__m.quality_score"), 6) >= 0.5)
          .withColumn("n_tok", col("__m.n_tokens").cast("long"))
          .select("doc_id", "text", "n_tok")
        // The quality gate + exact dedup feeds BOTH the near-dup pair
        // pipeline (forced during connectedComponents' size-guarded
        // collect) and the final split/pack plan — eagerly checkpoint it
        // so the documents scan + metrics + dedup run ONCE per query,
        // not once per consuming job. localCheckpoint (not persist):
        // blocks are ContextCleaner-reclaimed when the frame is GC'd,
        // so repeated bench runs don't accrete cache entries.
        val ded = Dedup.exactDedup(gated, "doc_id", "text").localCheckpoint(true)
        val pairs = Dedup.ngramJaccardPairs(ded, "doc_id", "text",
          shingleSize = 3, minJaccard = 0.6, maxShingleFreq = 1000L)
        val comps = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
        val dropIds = comps.filter(col("id") =!= col("label"))
          .select(col("id").as("doc_id"))
        val surv = ded.join(dropIds, Seq("doc_id"), "left_anti")
        val assigned = surv
          .withColumn("b100", bucketCol(col("doc_id"), 100))
          .withColumn("split", when(col("b100") < 80, "train")
            .when(col("b100") < 90, "val").otherwise("test"))
          .withColumn("shard", bucketCol(col("doc_id"), 8))
        val w = Window.partitionBy("split", "shard").orderBy("doc_id")
        assigned
          .withColumn("bin_start",
            coalesce(sum(col("n_tok")).over(w) - col("n_tok"), lit(0L)))
          .withColumn("bin", floor(col("bin_start") / 1024).cast("long"))
          .groupBy("split", "shard", "bin")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
          .orderBy("split", "shard", "bin")
      }),

    // The curation pipeline WITH the semantic (SemDeDup) stage — the
    // paper's gate -> lexical near-dup -> semantic dedup ordering
    // (Abbas et al. 2023 run semantic last for the same reason the
    // pipeline does: the cluster self-join must never see the lexical
    // duplicate mass) exposed as one replayable query at data scale.
    // The semantic model is trained ONCE per dir on the pipeline's own
    // pre-semantic corpus (q111Model — train once, curate many, the
    // served-index philosophy) and SHARED with the oracle generator:
    // model identity is what makes the full-composition replay exact.
    // Replay-oracled (q111OracleGen): every stage reuses an
    // already-proven chain — quality gate (q31/q83), exact dedup (q33),
    // minhash banding + jaccard verify (q35), components (q61),
    // HashingEmbedder replay (exact: ±1 float sums are integers, the
    // final scale is one float multiply both engines round identically),
    // the q109 semantic chain, splitmix split assignment (q62/q83).
    // PipelineSpec gates stage ordering, drop attribution, and the
    // caller-supplied-model path. Output aggregates to per-split counts
    // so the dump stays driver-small.
    QueryDef("q111_curation_semantic", None,
      (spark, dir) => {
        import graft.pipeline.CorpusPipeline
        import graft.pipeline.CorpusPipeline.CurationConfig
        // round-17: spreadForMapWork was A/B'd here and REJECTED — the
        // pipeline's fused metrics/shingle stages carry heavy per-task
        // init (regex compiles) that dominates small per-task row
        // counts: spread multiplied total CPU ~8x at sf0.1
        val docs = table(spark, dir, "documents")
        val out = CorpusPipeline.curate(docs, "doc_id", "text",
          CurationConfig(minQuality = 0.5, nearDupJaccard = 0.6,
            semanticMinCosine = Some(0.8)),
          semanticModel = Some(q111Model(spark, dir)))
        out.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens").cast("long")).as("n_tokens"),
            round(avg("quality_score"), 6).as("avg_quality"))
          .orderBy("split")
      },
      oracleGen = Some((spark, dir) =>
        AnnOracles.safe("q111") { q111OracleGen(spark, dir) })),

    // Multimodal plumbing through the driver surface: documents bytes
    // play the media payload; the deterministic stub codec decodes
    // shape + features (real decode is a MediaCodec impl away).
    // The stub's byte-chained splitmix mix is plain 64-bit arithmetic,
    // so DuckDB replays it exactly (HUGEINT wraparound + signed
    // floorMod) — hash-compared, not rows-only.
    QueryDef("q38_media_decode", Some(q38OracleSql),
      (spark, dir) => {
        import graft.multimodal.Multimodal
        val media = Multimodal.mediaFromText(
          table(spark, dir, "documents"), "doc_id", "text", "image")
        Multimodal.withResizeTarget(Multimodal.decodeImages(media), maxSide = 256)
          .select(col("media_id"), col("width"), col("height"),
            col("target_width"), col("target_height"),
            floor(element_at(col("features"), 1).cast("double") * lit(1e6)
              + lit(0.5)).as("f0_e6"))
          .orderBy("media_id")
      }),

    // The REAL video path at data scale: deterministic MJPEG-in-AVI
    // clips generated per document row (real JDK JPEG encode, RIFF
    // mux), then the production pipeline — VideoDemux frame sampling
    // (every 2nd frame) -> javax.imageio decode of each demuxed JPEG —
    // all partition-local until one map-side-combined aggregate. The
    // oracle pins the codec-exact surface: sampled-frame count
    // ((nFrames+1)/2 for everyNth=2) and the TRUE decoded dimensions/
    // channels, which are 0 if demux or decode ever fails — so the
    // hash-compare is an end-to-end mux->demux->decode gate. Luminance
    // accuracy (JPEG-quantization-tolerant) is asserted in
    // MultimodalStreamingSpec, not hashed.
    QueryDef("q108_video_pipeline", Some(
      """SELECT doc_id AS media_id,
        |  CAST((2 + doc_id % 7 + 1) // 2 AS BIGINT) AS n_frames,
        |  CAST(32 AS INTEGER) AS min_width, CAST(32 AS INTEGER) AS max_width,
        |  CAST(24 AS INTEGER) AS min_height, CAST(24 AS INTEGER) AS max_height,
        |  CAST(3 AS INTEGER) AS min_channels
        |FROM documents ORDER BY media_id""".stripMargin),
      (spark, dir) => {
        import graft.multimodal.Multimodal
        val media = Multimodal.syntheticMjpegVideos(
          table(spark, dir, "documents"), "doc_id")
        val frames = Multimodal.sampleVideoFrames(media, everyNth = 2,
          Multimodal.ImageIoCodec)
        val decoded = Multimodal.decodeImages(
          frames.withColumnRenamed("frame_bytes", "bytes"), Multimodal.ImageIoCodec)
        decoded.groupBy("media_id")
          .agg(count(lit(1)).as("n_frames"),
            min(col("width")).as("min_width"), max(col("width")).as("max_width"),
            min(col("height")).as("min_height"), max(col("height")).as("max_height"),
            min(col("channels")).as("min_channels"))
          .orderBy("media_id")
      }),

    // Inverted index — the search-engine primitive: term -> document
    // frequency, corpus frequency, and the full posting list. One
    // tokenize + two hash aggregations (doc-term tf, then term);
    // postings serialize as a sorted "doc:tf" string so the compare is
    // order-insensitive on both engines. Top-30 terms by df keeps the
    // output bounded; the plan's per-term postings are collect_list
    // over the GROUPED tf rows (bounded by df), never per-row text.
    QueryDef("q93_inverted_index", Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    t -> t <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY 1, 2)
        |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
        |  array_to_string(list_sort(list(doc_id || ':' || tf)), ',') AS postings
        |FROM tf GROUP BY term
        |ORDER BY df DESC, term LIMIT 30""".stripMargin),
      (spark, dir) => {
        import graft.operators.TextAnalysis
        // round-17: spreadForMapWork A/B'd here and REJECTED — the
        // whole map side is ~0.35s of CPU; the per-task tax outweighs it
        val tf = table(spark, dir, "documents")
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        tf.groupBy("term")
          .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"),
            concat_ws(",", array_sort(collect_list(
              concat(col("doc_id").cast("string"), lit(":"),
                col("tf").cast("string"))))).as("postings"))
          .orderBy(col("df").desc, col("term").asc)
          .limit(30)
      }),

    // Term co-occurrence PMI — corpus association mining (the
    // collocation statistic behind phrase detection). Counting plan:
    // distinct (doc, term) presence, top-50-df vocabulary as a
    // BROADCAST prune (bounds the quadratic pair expansion the way the
    // stop-shingle cap bounds jaccard), then a self-join on doc_id
    // whose both sides hang off ONE repartition exchange
    // (ReuseExchange — the explicit isNotNull keeps the canonical
    // forms identical). Pair count stays |vocab|^2-bounded at any
    // corpus size.
    // Round-15: oracle GENERATED (TextLutOracles.q96) — the top-30
    // selection orders by INTEGER c12; only the displayed pmi passes
    // through ln, so it ships as a ≤ 30-row literal LUT keyed on
    // (c12, c1, c2) and DuckDB replays the counting self-join with
    // zero libm exposure.
    QueryDef("q96_term_pmi", None, q96Run,
      oracleGen = Some((spark, dir) => AnnOracles.safe("q96") {
        TextLutOracles.q96(spark, dir, q96Run)
      })),

    // Bigram vocabulary stats (n-gram LM counts): corpus frequency and
    // document frequency of word bigrams. WordShingles dedups (set
    // semantics for MinHash), so the MULTISET bigrams come from
    // zip_with over the materialized token array — the HOF target is a
    // plain array ref, so the round-1 re-tokenize-per-element trap
    // doesn't apply. One narrow map + one hash aggregation;
    // count-ordered so ordering is engine-stable.
    QueryDef("q97_bigram_topk", Some(
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    t -> t <> '') AS tk
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS bigram
        |  FROM d, unnest(range(1, len(tk))) AS u(i)
        |  WHERE len(tk) >= 2)
        |SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS df
        |FROM bg GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 40""".stripMargin),
      (spark, dir) => {
        import graft.operators.TextAnalysis
        // round-17: tokenize+bigram-explode+partial-agg all run in the
        // one-split scan stage — spread first (no-op on well-split inputs)
        graft.operators.Parallelism.spreadForMapWork(
            table(spark, dir, "documents"), "doc_id")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
          .filter(size(col("tk")) >= 2)
          .select(col("doc_id"), explode(zip_with(
            slice(col("tk"), lit(1), size(col("tk")) - 1),
            slice(col("tk"), lit(2), size(col("tk")) - 1),
            (a, b) => concat(a, lit(" "), b))).as("bigram"))
          .groupBy("bigram")
          .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("df"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(40)
      }),

    // Source token-budget planning — the data-recipe question "which
    // sources fit under X% of the token budget": per-source doc/token
    // totals, global share, and the cumulative share in descending
    // token order (the greedy packing order). One tokenize, one
    // aggregation, one window over #sources rows (tiny).
    QueryDef("q95_source_token_budget", Some(
      """WITH per_doc AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      t -> t <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |per_source AS (
        |  SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens
        |  FROM per_doc GROUP BY source)
        |SELECT source, n_docs, tokens,
        |  CAST(floor(CAST(tokens AS DOUBLE) / sum(tokens) OVER () * 1000000.0 + 0.5) AS BIGINT) AS share_e6,
        |  CAST(floor(CAST(sum(tokens) OVER (ORDER BY tokens DESC, source) AS DOUBLE)
        |    / sum(tokens) OVER () * 1000000.0 + 0.5) AS BIGINT) AS cum_share_e6
        |FROM per_source
        |ORDER BY tokens DESC, source""".stripMargin),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.operators.TextAnalysis
        val perSource = table(spark, dir, "documents")
          .select(col("source"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
        // OFFSET-MERGED running sum (VERDICT r16 item 6): the greedy
        // cumulative share is a global ordered window — instead of one
        // partition, repartitionByRange on the greedy order, run the
        // running sum locally, and add driver-merged per-partition
        // token-sum offsets (bounded: one long per partition; the
        // q67 shape). The (tokens DESC, source) key is unique, so the
        // local ROWS frame equals the oracle's RANGE frame, and the
        // integer sums + single double divisions are identical.
        val parted = perSource
          .repartitionByRange(4, col("tokens").desc, col("source").asc)
          .withColumn("__pid", spark_partition_id())
          .localCheckpoint(true)
        val psums = parted.groupBy("__pid")
          .agg(sum(col("tokens")).as("t")).collect()
          .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        val total = psums.map(_._2).sum
        val offsets = psums.map(_._1)
          .zip(psums.scanLeft(0L)(_ + _._2).dropRight(1)).toMap
        val greedyLoc = Window.partitionBy("__pid")
          .orderBy(col("tokens").desc, col("source").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        parted
          .select(col("source"), col("n_docs"), col("tokens"),
            floor(col("tokens").cast("double") / lit(total.toDouble)
              * lit(1e6) + lit(0.5)).as("share_e6"),
            floor((element_at(typedlit(offsets), col("__pid"))
                + sum(col("tokens")).over(greedyLoc)).cast("double")
              / lit(total.toDouble) * lit(1e6) + lit(0.5))
              .as("cum_share_e6"))
          .orderBy(col("tokens").desc, col("source").asc)
      }),

    // Gopher repetition battery per document (repetitionSignals
    // scaladoc). HASHED COLUMNS ARE EXACT-ONLY (round-15 rule, the
    // r14 driver-hash lesson): the projection carries the integer
    // numerators/denominators of every fraction plus the keep verdict
    // — no rounded double ever reaches the hash. keep compares the
    // UNROUNDED single-division fractions against the literal
    // thresholds; one IEEE division + compare is bit-identical on both
    // engines, while round(x, 6) is not (round-algorithm variance on a
    // .5e-6 boundary). COALESCE guards every division (the zero-token
    // document contract: all-zero stats, keep = true). 40-doc detail
    // sample; q125 is the at-scale corpus gate.
    QueryDef("q124_gopher_repetition", Some(
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |base AS (SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS nd
        |  FROM toks WHERE doc_id < 40),
        |g AS (SELECT doc_id, gn, array_to_string(tk[i:i+gn-1], ' ') AS gram
        |  FROM toks, unnest([2,3,4,5,8]) AS s(gn), unnest(range(1, len(tk) - gn + 2)) AS u(i)
        |  WHERE len(tk) >= gn AND doc_id < 40),
        |cnt AS (SELECT doc_id, gn, gram, count(*) AS c FROM g GROUP BY 1,2,3),
        |st AS (SELECT doc_id, gn, max(c) AS mx,
        |    sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup, sum(c) AS tot
        |  FROM cnt GROUP BY 1,2)
        |SELECT b.doc_id, CAST(b.n AS INTEGER) AS n_tokens,
        |  CAST(b.n - b.nd AS INTEGER) AS dup_tokens,
        |  CAST(COALESCE(s2.mx, 0) AS INTEGER) AS top2_cnt,
        |  CAST(COALESCE(s3.mx, 0) AS INTEGER) AS top3_cnt,
        |  CAST(COALESCE(s4.mx, 0) AS INTEGER) AS top4_cnt,
        |  CAST(COALESCE(s5.dup, 0) AS INTEGER) AS dup5_num,
        |  CAST(COALESCE(s5.tot, 0) AS INTEGER) AS dup5_den,
        |  CAST(COALESCE(s8.dup, 0) AS INTEGER) AS dup8_num,
        |  CAST(COALESCE(s8.tot, 0) AS INTEGER) AS dup8_den,
        |  COALESCE(CAST(s2.mx AS DOUBLE) * 2 / b.n, 0) <= 0.20
        |    AND COALESCE(CAST(s3.mx AS DOUBLE) * 3 / b.n, 0) <= 0.18
        |    AND COALESCE(CAST(s4.mx AS DOUBLE) * 4 / b.n, 0) <= 0.16
        |    AND COALESCE(CAST(s5.dup AS DOUBLE) / s5.tot, 0) <= 0.15
        |    AND COALESCE(CAST(s8.dup AS DOUBLE) / s8.tot, 0) <= 0.10 AS keep
        |FROM base b
        |LEFT JOIN st s2 ON s2.doc_id = b.doc_id AND s2.gn = 2
        |LEFT JOIN st s3 ON s3.doc_id = b.doc_id AND s3.gn = 3
        |LEFT JOIN st s4 ON s4.doc_id = b.doc_id AND s4.gn = 4
        |LEFT JOIN st s5 ON s5.doc_id = b.doc_id AND s5.gn = 5
        |LEFT JOIN st s8 ON s8.doc_id = b.doc_id AND s8.gn = 8
        |ORDER BY b.doc_id""".stripMargin),
      (spark, dir) =>
        TextAnalysis.repetitionSignals(
            table(spark, dir, "documents").filter(col("doc_id") < 40),
            "doc_id", "text")
          .select("doc_id", "n_tokens", "dup_tokens", "top2_cnt",
            "top3_cnt", "top4_cnt", "dup5_num", "dup5_den", "dup8_num",
            "dup8_den", "keep")
          .orderBy("doc_id")),

    // The corpus-wide repetition gate — ALL docs scored, aggregated per
    // source. EXACT-ONLY hashed columns (round-15 rule): the per-source
    // sums are INTEGER sums of the fraction numerators/denominators
    // (sum_top2_cnt/sum_tokens and sum_dup5_num/sum_dup5_den carry the
    // same corpus-weighted signal the old decimal-sum-of-rounded-
    // doubles columns did, exactly), and n_keep counts the unrounded
    // threshold verdicts — nothing in the 20-row output ever passes
    // through round(double), so the hash is stable across DuckDB
    // builds/libm (the r14 q125 driver failure class).
    QueryDef("q125_repetition_gate", Some(
      """WITH toks AS (
        |  SELECT doc_id, source, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |base AS (SELECT doc_id, source, len(tk) AS n FROM toks),
        |g AS (SELECT doc_id, gn, array_to_string(tk[i:i+gn-1], ' ') AS gram
        |  FROM toks, unnest([2,3,4,5,8]) AS s(gn), unnest(range(1, len(tk) - gn + 2)) AS u(i)
        |  WHERE len(tk) >= gn),
        |cnt AS (SELECT doc_id, gn, gram, count(*) AS c FROM g GROUP BY 1,2,3),
        |st AS (SELECT doc_id, gn, max(c) AS mx,
        |    sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup, sum(c) AS tot
        |  FROM cnt GROUP BY 1,2),
        |f AS (SELECT b.doc_id, b.source, b.n,
        |  COALESCE(s2.mx, 0) AS t2c, COALESCE(s5.dup, 0) AS d5n,
        |  COALESCE(s5.tot, 0) AS d5d,
        |  COALESCE(CAST(s2.mx AS DOUBLE) * 2 / b.n, 0) <= 0.20
        |    AND COALESCE(CAST(s3.mx AS DOUBLE) * 3 / b.n, 0) <= 0.18
        |    AND COALESCE(CAST(s4.mx AS DOUBLE) * 4 / b.n, 0) <= 0.16
        |    AND COALESCE(CAST(s5.dup AS DOUBLE) / s5.tot, 0) <= 0.15
        |    AND COALESCE(CAST(s8.dup AS DOUBLE) / s8.tot, 0) <= 0.10 AS keep
        |FROM base b
        |LEFT JOIN st s2 ON s2.doc_id = b.doc_id AND s2.gn = 2
        |LEFT JOIN st s3 ON s3.doc_id = b.doc_id AND s3.gn = 3
        |LEFT JOIN st s4 ON s4.doc_id = b.doc_id AND s4.gn = 4
        |LEFT JOIN st s5 ON s5.doc_id = b.doc_id AND s5.gn = 5
        |LEFT JOIN st s8 ON s8.doc_id = b.doc_id AND s8.gn = 8)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  CAST(sum(t2c) AS BIGINT) AS sum_top2_cnt,
        |  CAST(sum(n) AS BIGINT) AS sum_tokens,
        |  CAST(sum(d5n) AS BIGINT) AS sum_dup5_num,
        |  CAST(sum(d5d) AS BIGINT) AS sum_dup5_den
        |FROM f GROUP BY source ORDER BY source""".stripMargin),
      (spark, dir) => {
        val sig = TextAnalysis.repetitionSignals(
          table(spark, dir, "documents"), "doc_id", "text",
          passthrough = Seq("source"))
        sig.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
            sum(col("top2_cnt").cast("long")).as("sum_top2_cnt"),
            sum(col("n_tokens").cast("long")).as("sum_tokens"),
            sum(col("dup5_num").cast("long")).as("sum_dup5_num"),
            sum(col("dup5_den").cast("long")).as("sum_dup5_den"))
          .orderBy("source")
      }),

    // Streaming vocabulary tracker (CorpusStream.vocabularyStream):
    // the corpus arrives as three deterministic micro-batches
    // (doc_id % 3, write→processAllAvailable boundaries like q115);
    // each trigger merges the batch's Misra-Gries summary into a
    // STAGED fold, advances the persisted exact count table by the
    // batch delta (round-15: versioned on-disk state with an atomic
    // commit pointer — restart-safe, per-trigger cost independent of
    // corpus age), and reads the top-10 off the exact table. Because
    // each epoch's verdict (cnt_k·m > N_epoch ∧ |result| = k) holds on
    // this fixture, every epoch's top-10 is EXACT — so this is the
    // suite's first STREAMING query with a fully static SQL oracle:
    // DuckDB just computes the exact top-10 over each prefix of the
    // batch split.
    QueryDef("q126_streaming_vocabulary", Some(
      """WITH toks AS (
        |  SELECT doc_id % 3 AS b, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    t -> t <> '')) AS term
        |  FROM documents),
        |e AS (SELECT unnest([0, 1, 2]) AS epoch),
        |f AS (SELECT epoch, term, CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks JOIN e ON toks.b <= e.epoch GROUP BY 1, 2),
        |n AS (SELECT epoch, CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM toks JOIN e ON toks.b <= e.epoch GROUP BY 1),
        |r AS (SELECT epoch, term, cnt,
        |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY cnt DESC, term) AS INTEGER) AS rank
        |  FROM f),
        |k AS (SELECT * FROM r WHERE rank <= 10),
        |kth AS (SELECT epoch, min(cnt) AS kth, count(*) AS nret
        |  FROM k GROUP BY epoch)
        |SELECT CAST(k.epoch AS INTEGER) AS epoch, k.rank, k.term, k.cnt,
        |  kth.kth * 4096 > n.n_tokens AND kth.nret = 10 AS provably_complete
        |FROM k JOIN kth USING (epoch) JOIN n USING (epoch)
        |ORDER BY epoch, rank""".stripMargin),
      (spark, dir) => {
        val docs = table(spark, dir, "documents").select("doc_id", "text")
        val staging = java.nio.file.Files
          .createTempDirectory("graft-q126-arrivals").toString
        val stateDir = java.nio.file.Files
          .createTempDirectory("graft-q126-state").toString
        val epochs = scala.collection.mutable.Buffer.empty[org.apache.spark.sql.DataFrame]
        val stream = spark.readStream.schema(docs.schema).parquet(staging)
        val q = graft.streaming.CorpusStream.vocabularyStream(
          stream, "text", k = 10, counters = 4096, stateDir = stateDir,
          onEpoch = (id, df) =>
            epochs += df.withColumn("epoch", lit(id.toInt)))
        try (0 until 3).foreach { b =>
          docs.filter(pmod(col("doc_id"), lit(3)) === b)
            .coalesce(1).write.mode("append").parquet(staging)
          q.processAllAvailable()
        } finally q.stop()
        epochs.reduce(_ unionByName _)
          .select("epoch", "rank", "term", "cnt", "provably_complete")
          .orderBy("epoch", "rank")
      }),

    // Round-15: the hashed projection is EXACT-ONLY — (n_bigrams,
    // sum_logp, keep); avg_logp/ppl (round-of-double display columns,
    // the r14 driver-hash flakes) stay available on the operator but
    // never reach the hash. The oracle is GENERATED (LmOracles.q118):
    // DuckDB replays tokenization/counting/joins/decimal-sum but looks
    // the per-position log-probability up in a literal table computed
    // once in the JVM — it never evaluates ln, so no libm variance.
    QueryDef("q118_lm_perplexity", None,
      (spark, dir) => {
        import graft.operators.TextAnalysis
        TextAnalysis.lmPerplexity(table(spark, dir, "documents"),
            "doc_id", "text", refFilter = col("source") === "src0")
          .filter(col("doc_id") < 30)
          .select("doc_id", "n_bigrams", "sum_logp", "keep")
          .orderBy("doc_id")
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q118") {
        LmOracles.q118(spark, dir)
      })),

    // The corpus-wide LM quality gate — the AT-SCALE form of q118:
    // score EVERY document, aggregate keep/drop and the exact decimal
    // log-mass per source. Round-15: corpus_avg_logp (a round-of-
    // double) dropped from the hashed projection; the generated
    // literal-LUT oracle (LmOracles.q119) keeps DuckDB ln-free.
    QueryDef("q119_lm_quality_gate", None,
      (spark, dir) => {
        import graft.operators.TextAnalysis
        val docs = table(spark, dir, "documents")
        val scored = TextAnalysis.lmPerplexity(docs, "doc_id", "text",
          refFilter = col("source") === "src0")
        scored.join(docs.select("doc_id", "source"), Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs_scored"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
            sum(col("n_bigrams")).as("n_bigrams"),
            sum(col("sum_logp")).cast("decimal(27,9)").as("sum_logp"))
          .orderBy("source")
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q119") {
        LmOracles.q119(spark, dir)
      })),

    // The BOUNDED-model LM gate (VERDICT r14 item 4): q119's scoring
    // with the bigram model pruned to the exact frequency-cutoff set
    // (cnt·m > N at m = 1024) — built via Misra-Gries candidates +
    // exact recount so the model-build exchange is bounded by m
    // instead of the reference slice's n-gram universe (the MG
    // guarantee makes the cutoff set partitioning-invariant, so a
    // plain HAVING replays it in the generated literal-LUT oracle).
    // At 100 TB this is the variant that ships: the three scoring
    // joins broadcast an m-bounded model.
    QueryDef("q127_lm_pruned_gate", None,
      (spark, dir) => {
        import graft.operators.TextAnalysis
        val docs = table(spark, dir, "documents")
        val scored = TextAnalysis.lmPerplexity(docs, "doc_id", "text",
          refFilter = col("source") === "src0",
          maxModelTerms = Some(1024))
        scored.join(docs.select("doc_id", "source"), Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs_scored"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
            sum(col("n_bigrams")).as("n_bigrams"),
            sum(col("sum_logp")).cast("decimal(27,9)").as("sum_logp"))
          .orderBy("source")
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q127") {
        LmOracles.q127(spark, dir, 1024)
      })),

    // Model-based quality gate — the GPT-3/CCNet classifier filter:
    // a closed-form ridge probe over hashed token counts
    // (QualityClassifier.trainRidge — ONE distributed pass builds the
    // integer Gram matrix, the driver solves the normal equations)
    // learns a reference label, then scores every document. The label
    // here is the fixture's rare planted marker token 'dup' (5% of
    // docs — the real reference-slice imbalance regime); the
    // class-balanced targets make the probe catch all of them
    // (measured 0.986 accuracy, 25/25 caught at sf0.001) where plain
    // full-batch logistic GD sat at the majority class.
    // The GENERATED oracle re-trains the same deterministic trajectory
    // (the Gram sufficient statistics are exact integers —
    // partitioning- and order-independent) and dumps the weights as
    // literals; scoring replays with NO transcendentals: the margin z
    // is a fixed-order double chain (bit-identical in both engines).
    // Round-15: the hashed columns are EXACT-ONLY — every output is a
    // COUNT of z compared against a literal threshold (z >= 0 plus the
    // ±1 margin bands for extra discriminating power); the r14 sum_z
    // column (decimal sum of round(z, 6) doubles) is gone — round-of-
    // double is the one op in the chain that is NOT cross-engine
    // stable, and it flipped the driver's hash while rows matched.
    QueryDef("q120_quality_classifier", None,
      (spark, dir) => {
        import graft.operators.QualityClassifier
        // round-17: per-doc featurization (token hash -> dim counts) is
        // the map cost in both train and score — spread the one-split
        // scan (Gram stats are exact integers, partitioning-independent)
        val docs = graft.operators.Parallelism.spreadForMapWork(
          table(spark, dir, "documents"), "doc_id")
        val label = array_contains(
          graft.operators.TextAnalysis.tokens(col("text")), "dup")
        val (bias, w) = QualityClassifier.trainRidge(docs, "doc_id", "text",
          label)
        QualityClassifier.score(docs, "doc_id", "text", label, bias, w)
          .join(docs.select(col("doc_id").as("id"), col("source")), Seq("id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("pred"), 1L).otherwise(0L)).as("n_pred_ref"),
            sum(when(col("pred") === (col("y") === 1.0), 1L).otherwise(0L))
              .as("n_correct"),
            sum(when(col("z") >= 1.0, 1L).otherwise(0L)).as("n_strong_ref"),
            sum(when(col("z") < -1.0, 1L).otherwise(0L)).as("n_strong_non"))
          .orderBy("source")
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q120") {
        q120OracleGen(spark, dir)
      })),

    // DSIR distribution-matching selection (Xie et al. 2023): weight
    // every document by the log importance ratio of two hashed-ngram
    // models (target slice src0 vs the raw corpus) and keep docs whose
    // average log-ratio clears 0. The hashing trick bounds both models
    // to dim buckets — built in ONE corpus scan, broadcast for scoring
    // — so unlike the unbounded LM gate (q118) no vocabulary-scale
    // exchange exists at ANY corpus size (see DataSelection's scaladoc
    // for the 100 TB shape). Hashed projection is exact-only per the
    // round-16 rule: counts, one DECIMAL sum of 9 dp-quantized bucket
    // log-ratios, and the margin-guarded keep verdict; the generated
    // oracle (DsirOracles.q129) re-derives everything in DuckDB except
    // ln, which it looks up in a literal (c_t, c_r) → λ table.
    QueryDef("q129_dsir_selection", None,
      (spark, dir) => {
        import graft.operators.DataSelection
        // round-17: hashed-ngram featurization is the map cost — spread
        // the one-split scan (DataSelectionSpec pins that a
        // repartitioned corpus gives identical weights)
        val docs = graft.operators.Parallelism.spreadForMapWork(
          table(spark, dir, "documents"), "doc_id")
        val scored = DataSelection.dsirWeights(docs, "doc_id", "text",
          targetFilter = col("source") === "src0", dim = 256, seed = 11L)
        scored.join(docs.select("doc_id", "source"), Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs_scored"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
            sum(col("n_feats")).as("n_feats"),
            sum(col("sum_w")).cast("decimal(27,9)").as("sum_w"))
          .orderBy("source")
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q129") {
        DsirOracles.q129(spark, dir, dim = 256, seed = 11L)
      })))

  /** q120's oracle: re-train (deterministic), dump (bias, w) literals,
    * replay hashed counts + the fixed-order margin chain in DuckDB. */
  private def q120OracleGen(spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[String] = {
    import graft.operators.QualityClassifier
    val docs = Tables.table(spark, dir, "documents")
    val (bias, w) = QualityClassifier.trainRidge(docs, "doc_id", "text",
      array_contains(graft.operators.TextAnalysis.tokens(col("text")), "dup"))
    val dim = w.length
    def dd(x: Double): String = java.lang.Double.toString(x)
    // bucket of a token: floorMod(splitmix64(poly31(bytes, seed 7)), dim)
    val tokHash = mixSql(
      "list_reduce(list_prepend(CAST(7 AS HUGEINT), " +
        "[CAST(ord(c) AS HUGEINT) FOR c IN string_split(tok, '')]), " +
        "(acc, b) -> (acc * 31 + b) % 18446744073709551616)")
    val bucket = floorModSql(tokHash, dim.toLong)
    // z: the SAME left-associated chain the Spark side folds
    val zChain = (0 until dim).foldLeft(s"CAST(${dd(bias)} AS DOUBLE)") {
      (acc, d) => s"($acc + CAST(${dd(w(d))} AS DOUBLE) * c$d)"
    }
    val cntCols = (0 until dim).map(d =>
      s"COALESCE(SUM(CASE WHEN b = $d THEN c END), 0) AS c$d").mkString(",\n    ")
    Some(
      s"""WITH d AS (
         |  SELECT doc_id, source, $toksSql AS tk FROM documents),
         |tok AS (SELECT doc_id, unnest(tk) AS tok FROM d),
         |hb AS (SELECT doc_id, CAST($bucket AS BIGINT) AS b FROM tok),
         |cnt AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
         |  FROM hb GROUP BY doc_id, b),
         |dense AS (SELECT doc_id,
         |    $cntCols
         |  FROM cnt GROUP BY doc_id),
         |scored AS (SELECT d.doc_id, d.source,
         |    CASE WHEN dense.doc_id IS NULL THEN CAST(${dd(bias)} AS DOUBLE)
         |      ELSE $zChain END AS z,
         |    list_contains(d.tk, 'dup') AS y
         |  FROM d LEFT JOIN dense ON dense.doc_id = d.doc_id)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN z >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_ref,
         |  CAST(sum(CASE WHEN (z >= 0) = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |  CAST(sum(CASE WHEN z >= 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_strong_ref,
         |  CAST(sum(CASE WHEN z < -1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_strong_non
         |FROM scored GROUP BY source ORDER BY source""".stripMargin)
  }

  // ---- DuckDB replay of the FakeCodec stub (Multimodal.FakeCodec) ----
  // HUGEINT hash-arithmetic fragments live in ReplaySql (shared with
  // the LM/DSIR oracle generators since round 16); local aliases keep
  // the many call sites below unchanged.
  private def mul64(a: String, c: String): String = ReplaySql.mul64(a, c)
  private def mixSql(h: String): String = ReplaySql.mixSql(h)
  private def floorModSql(h: String, m: Long): String =
    ReplaySql.floorModSql(h, m)

  /** Shared minhash-banding oracle prelude (CTEs through `verify`):
    * DuckDB replays shingling, the poly-31+splitmix hashes, slice
    * banding, candidate generation, and exact-jaccard verification.
    * `finalSelect` is appended — q35 takes every pair, q76 filters and
    * orients for the incremental path. */
  private def minhashOraclePrelude: String = {
    // stringHash(shingle, 42): poly-31 + splitmix finalizer
    val baseHash = mixSql(
      "list_reduce(list_prepend(CAST(42 AS HUGEINT), " +
        "[CAST(ord(c) AS HUGEINT) FOR c IN string_split(shingle, '')]), " +
        "(acc, b) -> (acc * 31 + b) % 18446744073709551616)")
    // permutation j (0..63): splitmix(base ^ (seed + 0x9e3779b9*(j+1)))
    val jHash = mixSql("CAST(xor(CAST(bh AS UBIGINT), " +
      "CAST((42 + 2654435769 * (j + 1)) % 18446744073709551616 AS UBIGINT)) AS HUGEINT)")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '') AS tk
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] FOR i IN range(1, greatest(len(tk) - 1, 1))]) AS shingles
       |  FROM toks WHERE len(tk) >= 3),
       |ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
       |distinct_sh AS (SELECT DISTINCT shingle FROM ex),
       |shb AS (SELECT shingle, $baseHash AS bh FROM distinct_sh),
       |shj AS (SELECT shingle, j, CAST($jHash AS UBIGINT) AS h
       |  FROM shb, unnest(range(64)) AS u(j)),
       |doc_j AS (
       |  SELECT e.doc_id, s.j, min(s.h) AS mh
       |  FROM ex e JOIN shj s USING (shingle)
       |  GROUP BY e.doc_id, s.j),
       |sigs AS (SELECT doc_id, list(mh ORDER BY j) AS sig FROM doc_j GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, b, sig[2*b+1:2*b+2] AS bucket FROM sigs, unnest(range(32)) AS u(b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
       |  FROM banded a JOIN banded b2
       |    ON a.b = b2.b AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id),
       |verify AS (
       |  SELECT c.id_a, c.id_b,
       |    CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
       |      len(list_distinct(sa.shingles || sb.shingles)) AS jaccard
       |  FROM cand c JOIN sh sa ON sa.doc_id = c.id_a JOIN sh sb ON sb.doc_id = c.id_b)""".stripMargin
  }

  private def q35OracleSql: String =
    s"""$minhashOraclePrelude
       |SELECT id_a, id_b, CAST(floor(jaccard * 1000000.0 + 0.5) AS BIGINT) AS jaccard_e6 FROM verify
       |WHERE jaccard >= 0.2 ORDER BY id_a, id_b""".stripMargin

  /** Incremental pairs (docs with doc_id % 3 = 0 play the new batch):
    * the full pair set filtered to incoming-touching and oriented so
    * id_b is the incoming side — banding is id-agnostic, so this
    * equals the incremental operator's output exactly (the same
    * equivalence DedupSpec proves differentially). */
  private def q76OracleSql: String =
    s"""$minhashOraclePrelude,
       |inc AS (SELECT id_a, id_b, jaccard FROM verify
       |  WHERE jaccard >= 0.2 AND (id_a % 3 = 0 OR id_b % 3 = 0))
       |SELECT
       |  CASE WHEN id_b % 3 = 0 THEN id_a ELSE id_b END AS id_a,
       |  CASE WHEN id_b % 3 = 0 THEN id_b ELSE id_a END AS id_b,
       |  CAST(floor(jaccard * 1000000.0 + 0.5) AS BIGINT) AS jaccard_e6
       |FROM inc ORDER BY id_a, id_b""".stripMargin

  private def q36OracleSql: String = {
    // stringHash(token, seed=42): poly-31 over bytes (64-bit wrap; 31 is
    // small enough that no operand split is needed), splitmix finalized
    val tokenHash = mixSql(
      "list_reduce(list_prepend(CAST(42 AS HUGEINT), " +
        "[CAST(ord(c) AS HUGEINT) FOR c IN string_split(t, '')]), " +
        "(acc, b) -> (acc * 31 + b) % 18446744073709551616)")
    s"""SELECT doc_id,
       |  CAST(CASE WHEN u >= 9223372036854775808 THEN u - 18446744073709551616
       |    ELSE u END AS BIGINT) AS simhash
       |FROM (
       |  SELECT doc_id,
       |    list_sum([CASE WHEN list_sum(
       |        [CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END FOR h IN hs]) > 0
       |      THEN CAST(CAST(1 AS UBIGINT) << b AS HUGEINT) ELSE 0 END
       |      FOR b IN range(0, 64)]) AS u
       |  FROM (
       |    SELECT doc_id, [CAST($tokenHash AS UBIGINT) FOR t IN
       |      list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')] AS hs
       |    FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  /** `hash_bucket` column (splitmix64 + unsigned mod). */
  private def bucketCol(c: org.apache.spark.sql.Column, n: Int) = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.graft.expressions.HashBucket
    Bridge.column(HashBucket(Bridge.expression(c), n))
  }

  /** q83: every stage replayed — quality formula (q31), exact dedup by
    * text, capped jaccard pairs (q34), recursive-CTE components (q61),
    * one splitmix stream for split%100 and shard%8 (q62/q82), and the
    * running-sum bin cut (q64). */
  // ------------------------------------------------------------- q111
  /** Pre-semantic corpus of the q111 pipeline (CorpusPipeline.curate
    * steps 1-5 at q111's config: quality gate 0.5, exact dedup,
    * minhash near-dup at jaccard 0.6, 64-dim hashing embedder),
    * replicated verbatim so the semantic model can be trained ONCE per
    * dir and SHARED between the query and its oracle generator.
    * Memoized + checkpointed per dir. */
  private val q111MatCache =
    new scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.DataFrame]()
  private val q111ModelCache =
    new scala.collection.concurrent.TrieMap[String, graft.index.IvfModel]()

  private def q111Mat(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    q111MatCache.getOrElseUpdate(dir, {
      val docs = table(spark, dir, "documents")
      val withMetrics = docs
        .withColumn("__m", TextAnalysis.textMetrics(col("text")))
        .withColumn("quality_score", col("__m.quality_score"))
        .withColumn("lang_pred", col("__m.lang_pred"))
        .withColumn("n_tokens", col("__m.n_tokens"))
        .drop("__m")
      val gated = withMetrics.filter(col("quality_score") >= 0.5)
      val exactDeduped = Dedup.exactDedup(gated, "doc_id", "text")
      val pairs = Dedup.minHashNearDupPairs(exactDeduped, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 32, minJaccard = 0.6)
      val components = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
      val dropIds = components.filter(col("id") =!= col("label"))
        .select(col("id").as("doc_id"))
      val nearDeduped = exactDeduped.join(dropIds, Seq("doc_id"), "left_anti")
      val embed = graft.functions.Embedder.embedColumn(
        graft.functions.HashingEmbedder(dimension = 64))
      nearDeduped.withColumn("embedding", embed(col("text"))).localCheckpoint(true)
    })

  private[queries] def q111Model(spark: org.apache.spark.sql.SparkSession,
      dir: String): graft.index.IvfModel =
    q111ModelCache.getOrElseUpdate(dir,
      graft.operators.SemDedup.trainModel(q111Mat(spark, dir), "embedding"))

  /** q111's split assignment (CorpusPipeline.curate step 6). */
  private def q111SplitCol(id: org.apache.spark.sql.Column) = {
    val b = bucketCol(id.cast("long"), 100)
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  /** q111 replay oracle: the shared SemDeDup guards over the pipeline's
    * pre-semantic corpus + three composition-specific withholds, then
    * the full-chain SQL. */
  private def q111OracleGen(spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[String] = {
    val mat = q111Mat(spark, dir)
    val model = q111Model(spark, dir)
    val base = mat.select(col("doc_id").as("vec_id"), col("embedding"))
    // pairEps 1e-12: the hashing embedder's rational components land
    // near-threshold cosines legitimately; see semGuardsOkCached doc
    if (!AnnOracles.semGuardsOkCached(dir + "#q111", spark, base, model,
        0.8, 65536, pairEps = 1e-12)) return None
    // keeper flips only change per-SPLIT counts when the two thinnest
    // members of a duplicate group land in different splits
    val attrBase = mat.select(col("doc_id").as("vec_id"), col("embedding"),
      q111SplitCol(col("doc_id")).as("attr"))
    if (!AnnOracles.keeperRankOkCached(dir + "#q111split", spark, attrBase,
        model, 0.8, strict = false)) return None
    // the quality GATE compares the unrounded score: both engines
    // evaluate the identical left-associated double chain over exact
    // {0,1} indicators, so exact 0.5 hits pass >= on both; this guards
    // compiler/runtime drift only
    val qBad = table(spark, dir, "documents")
      .withColumn("qs", TextAnalysis.qualityScore(col("text")))
      .filter(col("qs") =!= 0.5 && abs(col("qs") - lit(0.5)) < 1e-12)
      .limit(1).collect().nonEmpty
    if (qBad) {
      System.err.println("[oracle-gen] q111 withheld: quality-gate boundary")
      return None
    }
    // avg(quality_score) is the one summation-order-sensitive output
    // term (the q109 (f) argument): withhold near its 6-dp boundary
    val flags = graft.operators.SemDedup.semDedup(mat, "doc_id", "embedding",
      minCosine = 0.8, model = Some(model))
    val surv = mat.join(flags.filter(!col("keep")).select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    val avgBad = surv.withColumn("split", q111SplitCol(col("doc_id")))
      .groupBy("split").agg(avg("quality_score").as("a"))
      .select((abs(col("a")) * 1e6).as("y"))
      .select(abs(col("y") - floor(col("y")) - 0.5).as("db"))
      .filter(col("db") < 1e-6).limit(1).collect().nonEmpty
    if (avgBad) {
      System.err.println("[oracle-gen] q111 withheld: avg rounding boundary")
      return None
    }
    Some(q111OracleSql(model))
  }

  /** The q111 composition SQL: quality gate (raw, q31 formula) ->
    * exact dedup (q33) -> minhash banding + exact-jaccard verify +
    * components (q35/q61) -> HashingEmbedder replay (poly-31+splitmix
    * token hash, signed-bucket sums — exact integers in FLOAT — and
    * the one float-rounded normalization multiply) -> the q109
    * semantic chain over the shared model's centroid literals ->
    * splitmix split assignment (q62) -> per-split aggregates. */
  private def q111OracleSql(model: graft.index.IvfModel): String = {
    val baseHash = mixSql(
      "list_reduce(list_prepend(CAST(42 AS HUGEINT), " +
        "[CAST(ord(c) AS HUGEINT) FOR c IN string_split(shingle, '')]), " +
        "(acc, b) -> (acc * 31 + b) % 18446744073709551616)")
    val jHash = mixSql("CAST(xor(CAST(bh AS UBIGINT), " +
      "CAST((42 + 2654435769 * (j + 1)) % 18446744073709551616 AS UBIGINT)) AS HUGEINT)")
    val tokHash = mixSql(
      "list_reduce(list_prepend(CAST(42 AS HUGEINT), " +
        "[CAST(ord(c) AS HUGEINT) FOR c IN string_split(tk, '')]), " +
        "(acc, b) -> (acc * 31 + b) % 18446744073709551616)")
    val docMix = mixSql("CAST(doc_id AS HUGEINT)")
    s"""WITH RECURSIVE cent(cid, cen) AS (VALUES
       |    ${AnnOracles.centValues(model)}),
       |t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |q AS (SELECT doc_id, text, toks, CAST(len(toks) AS BIGINT) AS n_tok,
       |  (CASE WHEN len(toks) BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END) * 0.3 +
       |    (CASE WHEN (CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, x -> list_contains($allStopSql, x))) AS DOUBLE) / len(toks) END) BETWEEN 0.01 AND 0.7 THEN 1.0 ELSE 0.0 END) * 0.3 +
       |    (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?''"\\-\\(\\)]', '', 'g')) AS DOUBLE) / length(text) END) < 0.2 THEN 1.0 ELSE 0.0 END) * 0.2 +
       |    (CASE WHEN (CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) END) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) * 0.2
       |    AS qs
       |  FROM t),
       |gated AS (SELECT doc_id, text, toks, n_tok, qs FROM q WHERE qs >= 0.5),
       |ded AS (SELECT * FROM gated QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)),
       |msh AS (
       |  SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN range(1, greatest(len(toks) - 1, 1))]) AS shingles
       |  FROM ded WHERE len(toks) >= 3),
       |mex AS (SELECT doc_id, unnest(shingles) AS shingle FROM msh),
       |mdsh AS (SELECT DISTINCT shingle FROM mex),
       |mshb AS (SELECT shingle, $baseHash AS bh FROM mdsh),
       |mshj AS (SELECT shingle, j, CAST($jHash AS UBIGINT) AS h
       |  FROM mshb, unnest(range(64)) AS u(j)),
       |mdocj AS (
       |  SELECT e2.doc_id, s2.j, min(s2.h) AS mh
       |  FROM mex e2 JOIN mshj s2 USING (shingle)
       |  GROUP BY e2.doc_id, s2.j),
       |msigs AS (SELECT doc_id, list(mh ORDER BY j) AS sig FROM mdocj GROUP BY doc_id),
       |mbanded AS (
       |  SELECT doc_id, b, sig[2*b+1:2*b+2] AS bucket FROM msigs, unnest(range(32)) AS u(b)),
       |mcand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
       |  FROM mbanded a JOIN mbanded b2
       |    ON a.b = b2.b AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id),
       |mjac AS (
       |  SELECT c.id_a, c.id_b
       |  FROM mcand c JOIN msh sa ON sa.doc_id = c.id_a JOIN msh sb ON sb.doc_id = c.id_b
       |  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
       |      len(list_distinct(sa.shingles || sb.shingles)) >= 0.6),
       |medges AS (SELECT id_a AS a, id_b AS b FROM mjac
       |  UNION ALL SELECT id_b, id_a FROM mjac),
       |mnodes AS (SELECT DISTINCT a AS id FROM medges),
       |mreach AS (
       |  SELECT id, id AS r FROM mnodes
       |  UNION
       |  SELECT e3.b AS id, mreach.r FROM mreach JOIN medges e3 ON e3.a = mreach.id),
       |mlabels AS (SELECT id, min(r) AS lbl FROM mreach GROUP BY id),
       |mdrop AS (SELECT id FROM mlabels WHERE id <> lbl),
       |surv AS (SELECT d.doc_id, d.text, d.n_tok, d.qs FROM ded d
       |  LEFT JOIN mdrop ON d.doc_id = mdrop.id WHERE mdrop.id IS NULL),
       |etok AS (SELECT doc_id, unnest(list_filter(
       |    string_split_regex(lower(text), '\\W+'), x -> x <> '')) AS tk FROM surv),
       |eth AS (SELECT doc_id, $tokHash AS th FROM etok),
       |etsb AS (SELECT doc_id,
       |    CAST(${floorModSql("th", 64L)} AS INTEGER) AS bucket,
       |    CASE WHEN (CAST(th AS UBIGINT) >> 62) & 1 = 0 THEN 1 ELSE -1 END AS sgn
       |  FROM eth),
       |ebuck AS (SELECT doc_id, bucket, CAST(sum(sgn) AS DOUBLE) AS vi
       |  FROM etsb GROUP BY 1, 2),
       |egrid AS (SELECT s3.doc_id, r.b FROM surv s3, unnest(range(64)) AS r(b)),
       |evr AS (SELECT g.doc_id, g.b, coalesce(eb.vi, 0.0) AS vi
       |  FROM egrid g LEFT JOIN ebuck eb ON eb.doc_id = g.doc_id AND eb.bucket = g.b),
       |evd AS (SELECT doc_id, list(vi ORDER BY b) AS vraw FROM evr GROUP BY doc_id),
       |e AS (SELECT doc_id AS vec_id,
       |    CASE WHEN list_dot_product(vraw, vraw) = 0 THEN vraw
       |      ELSE list_transform(vraw, x -> CAST(CAST(CAST(x AS FLOAT) *
       |        CAST(1.0 / sqrt(list_dot_product(vraw, vraw)) AS FLOAT) AS FLOAT) AS DOUBLE))
       |    END AS v
       |  FROM evd),
       |${AnnOracles.semBatchCtes("0.8")},
       |sdrop AS (SELECT vec_id FROM keeprn WHERE krn > 1),
       |fin AS (SELECT s4.doc_id, s4.n_tok, s4.qs FROM surv s4
       |  LEFT JOIN sdrop ON s4.doc_id = sdrop.vec_id WHERE sdrop.vec_id IS NULL),
       |hx AS (SELECT doc_id, n_tok, qs, CAST($docMix AS UBIGINT) AS m FROM fin),
       |sp AS (SELECT n_tok, qs,
       |  CASE WHEN m % 100 < 80 THEN 'train' WHEN m % 100 < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM hx)
       |SELECT split, count(*) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  round(avg(qs), 6) AS avg_quality
       |FROM sp GROUP BY split ORDER BY split""".stripMargin
  }

  private def q83OracleSql: String = {
    val scores = TextAnalysis.stopwords.sortBy(_._1).map { case (lang, _) =>
      s"CAST(len(list_intersect(list_distinct(toks), ${stopList(lang)})) AS INTEGER) AS s_$lang"
    }.mkString(", ")
    val docMix = mixSql("CAST(doc_id AS HUGEINT)")
    s"""WITH RECURSIVE t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |s AS (SELECT doc_id, text, toks, $scores FROM t),
       |g AS (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS gm FROM s),
       |q AS (SELECT doc_id, text, toks, CAST(len(toks) AS BIGINT) AS n_tok,
       |  round(
       |    (CASE WHEN len(toks) BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END) * 0.3 +
       |    (CASE WHEN (CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, x -> list_contains($allStopSql, x))) AS DOUBLE) / len(toks) END) BETWEEN 0.01 AND 0.7 THEN 1.0 ELSE 0.0 END) * 0.3 +
       |    (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?''"\\-\\(\\)]', '', 'g')) AS DOUBLE) / length(text) END) < 0.2 THEN 1.0 ELSE 0.0 END) * 0.2 +
       |    (CASE WHEN (CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) END) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) * 0.2, 6) AS qs
       |  FROM g),
       |gated AS (SELECT doc_id, text, toks, n_tok FROM q WHERE qs >= 0.5),
       |ded AS (SELECT * FROM gated QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN range(1, greatest(len(toks) - 1, 1))]) AS shingles
       |  FROM ded WHERE len(toks) >= 3),
       |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
       |freq AS (SELECT shingle, count(*) AS dfc FROM ex GROUP BY shingle),
       |exf AS (SELECT e.* FROM ex e JOIN freq USING (shingle) WHERE dfc <= 1000),
       |prs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
       |    count(*) AS common
       |  FROM exf a JOIN exf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4),
       |jac AS (SELECT id_a, id_b FROM prs
       |  WHERE CAST(common AS DOUBLE) / (n_a + n_b - common) >= 0.6),
       |edges AS (SELECT id_a AS a, id_b AS b FROM jac
       |  UNION ALL SELECT id_b, id_a FROM jac),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |reach AS (
       |  SELECT id, id AS r FROM nodes
       |  UNION
       |  SELECT e.b AS id, reach.r FROM reach JOIN edges e ON e.a = reach.id),
       |labels AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
       |dropids AS (SELECT id FROM labels WHERE id <> label),
       |surv AS (SELECT d.doc_id, d.n_tok FROM ded d
       |  LEFT JOIN dropids ON d.doc_id = dropids.id WHERE dropids.id IS NULL),
       |hx AS (SELECT doc_id, n_tok, CAST($docMix AS UBIGINT) AS m FROM surv),
       |sp AS (SELECT doc_id, n_tok,
       |  CASE WHEN m % 100 < 80 THEN 'train' WHEN m % 100 < 90 THEN 'val' ELSE 'test' END AS split,
       |  CAST(m % 8 AS INTEGER) AS shard FROM hx),
       |packed AS (
       |  SELECT split, shard, n_tok,
       |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY split, shard ORDER BY doc_id) - n_tok, 0) AS BIGINT) AS bin_start
       |  FROM sp),
       |binned AS (SELECT split, shard,
       |  CAST(floor(bin_start / 1024) AS BIGINT) AS bin, n_tok FROM packed)
       |SELECT split, shard, bin, count(*) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |FROM binned GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  private def q81OracleSql: String = {
    // stringHash(span, 42): poly-31 over bytes + splitmix finalizer —
    // the same replay as the shingle hash (corpus is ASCII, ord == byte)
    val spanHash = mixSql(
      "list_reduce(list_prepend(CAST(42 AS HUGEINT), " +
        "[CAST(ord(c) AS HUGEINT) FOR c IN string_split(span, '')]), " +
        "(acc, b) -> (acc * 31 + b) % 18446744073709551616)")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '') AS tk
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, tk,
       |    CASE WHEN len(tk) <= 8 THEN 1
       |      ELSE 1 + CAST(ceil((len(tk) - 8) / 4.0) AS INTEGER) END AS nw
       |  FROM toks WHERE len(tk) > 0),
       |e AS (
       |  SELECT doc_id, array_to_string(tk[i*4+1 : i*4+8], ' ') AS span
       |  FROM w, unnest(range(0, nw)) AS u(i)
       |  WHERE len(tk[i*4+1 : i*4+8]) = 8),
       |h AS (SELECT doc_id, CAST($spanHash AS UBIGINT) AS bh FROM e),
       |dc AS (SELECT bh, count(DISTINCT doc_id) AS n_docs FROM h GROUP BY bh),
       |prof AS (
       |  SELECT h.doc_id, count(*) AS n_spans,
       |    CAST(sum(CASE WHEN dc.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated
       |  FROM h JOIN dc USING (bh) GROUP BY h.doc_id)
       |SELECT doc_id, n_spans, n_repeated,
       |  CAST(floor(CAST(n_repeated AS DOUBLE) / n_spans * 1000000.0 + 0.5) AS BIGINT) AS repeated_frac_e6
       |FROM prof ORDER BY doc_id""".stripMargin
  }

  private def q38OracleSql: String = {
    val byteChain = "list_reduce(list_prepend(CAST(1469598103934665603 AS HUGEINT), " +
      "[CAST(ord(c) AS HUGEINT) FOR c IN string_split(text, '')]), " +
      s"(acc, b) -> ${mixSql("xor(CAST(acc AS UBIGINT), CAST(b AS UBIGINT))")})"
    s"""WITH h AS (
       |  SELECT doc_id AS media_id,
       |    CASE WHEN length(text) = 0 THEN CAST(1469598103934665603 AS HUGEINT)
       |      ELSE $byteChain END AS h
       |  FROM documents),
       |dims AS (
       |  SELECT media_id,
       |    CAST(64 + ${floorModSql("h", 448L)} AS INTEGER) AS width,
       |    CAST(64 + ((h // 65536) % 448) AS INTEGER) AS height,
       |    CAST(floor((${floorModSql(mixSql("h"), 2000L)} / 1000.0 - 1.0) * 1000000.0 + 0.5) AS BIGINT) AS f0_e6
       |  FROM h),
       |resz AS (
       |  SELECT media_id, width, height, f0_e6,
       |    CASE WHEN greatest(width, height) <= 256 THEN 1.0
       |      ELSE 256.0 / greatest(width, height) END AS scale
       |  FROM dims)
       |SELECT media_id, width, height,
       |  CAST(floor(width * scale) AS INTEGER) AS target_width,
       |  CAST(floor(height * scale) AS INTEGER) AS target_height,
       |  f0_e6
       |FROM resz ORDER BY media_id""".stripMargin
  }
}
