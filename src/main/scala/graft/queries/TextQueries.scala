package graft.queries

import graft.Tables
import graft.operators.{BpeOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis queries over documents, each mirrored exactly in DuckDB
  * SQL (language markers, stopword list, and score weights kept in
  * lockstep with [[graft.operators.TextOps]]).
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "text_stats" -> { (s, dir) =>
      TextOps.stats(Tables.documents(s, dir))
    },
    // Aggregate quality profile per (lang, source) — the shape a curation
    // pipeline filters on.
    "text_quality_by_source" -> { (s, dir) =>
      TextOps.stats(Tables.documents(s, dir))
        .join(Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("source")), "doc_id")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          min(col("quality_score")).as("min_q"),
          max(col("quality_score")).as("max_q"))
    },
    // Exact per-source quantile gate: keep the top half of each source's
    // docs by token count (median-and-above), reporting the kept count,
    // token mass, and realized cutoff. Rank arithmetic is all-integer, so
    // the oracle is exact. Scale: one sort-window per source partition;
    // at 100 TB swap the exact rank for an approx-quantile threshold +
    // stateless filter (same output columns), but the exact form is what
    // the oracle can pin.
    "text_quality_quantile" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).as("n_tokens"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_tokens").desc, col("doc_id"))
      d.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
        .filter(col("rn") * 2 <= col("n") + 1)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_tokens")).as("kept_tokens"),
          min(col("n_tokens")).as("cutoff_tokens"))
    },
    // Winnowing (rolling-hash) fingerprints — the substring-level
    // fingerprint family (shared >=8-char runs guarantee a shared row).
    "text_winnow_fp" -> { (s, dir) =>
      TextOps.winnowFingerprints(Tables.documents(s, dir))
    },
    // Corpus vocabulary: per-token term + document frequency.
    "text_vocabulary" -> { (s, dir) =>
      TextOps.vocabulary(Tables.documents(s, dir))
    },
    // The composite curation pass over the dup-injected corpus: score,
    // dedup to representatives, gate on quality + language.
    "pipeline_curate" -> { (s, dir) =>
      TextOps.curate(Tables.corpus(s, dir))
    },
    // Deterministic hash-grid split assignment, summarized per split.
    "pipeline_split" -> { (s, dir) =>
      TextOps.assignSplits(Tables.documents(s, dir))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
    },
    // Benchmark decontamination: 3-gram overlap of every corpus doc
    // (source <> 'src0') against the broadcast eval set (source = 'src0').
    "pipeline_decontam" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      TextOps.contaminationReport(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"))
    },
    // Same report through the Bloom-prefiltered scale path: the sketch
    // replaces the eval-gram broadcast, the exact verify join kills the
    // false positives, and the oracle is therefore the identical SQL.
    "pipeline_decontam_bloom" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      TextOps.contaminationReportBloom(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"))
    },
    // Deterministic stratified sampling: keep all of src0, none of src1,
    // a quarter of everything else.
    "pipeline_sample" -> { (s, dir) =>
      TextOps.sampleByStratum(Tables.documents(s, dir),
          Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.25)
        .select(col("doc_id"), col("source"))
    },
    // Gopher-style repeated-2-gram stats per document.
    // PII scrub — the redaction pass every training-data pipeline runs
    // before anything else. The synthetic corpus carries no PII, so the
    // fixture injects deterministic e-mail/phone/IP strings keyed on
    // doc_id; the operator counts and redacts them with scan-local
    // codegen regexes (patterns in the Java∩RE2 dialect so the DuckDB
    // oracle runs the IDENTICAL expressions).
    "text_pii_scrub" -> { (s, dir) =>
      val txt = concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" mail u"), col("doc_id").cast("string"), lit("@ex.com")))
          .otherwise(""),
        when(col("doc_id") % 4 === 1,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" or 555-0000")))
          .otherwise(""),
        when(col("doc_id") % 5 === 2,
          concat(lit(" ip 10."), (col("doc_id") % 256).cast("string"), lit(".0.1")))
          .otherwise(""))
      TextOps.piiScrub(
        Tables.documents(s, dir).select(col("doc_id"), txt.as("text")))
    },
    "text_repetition" -> { (s, dir) =>
      TextOps.repetitionStats(Tables.documents(s, dir))
    },
    // PII redaction report (this corpus is synthetic word salad, so the
    // counts are zero and redaction is the identity — the oracle pins the
    // regex chain cross-engine; planted-PII behavior is spec-tested).
    "pipeline_redact" -> { (s, dir) =>
      TextOps.piiStats(Tables.documents(s, dir))
    },
    // Deterministic mixture resampling: src0 seen 2.5x, src1 dropped,
    // the rest 1x; summarized per source with a copy-weighted checksum.
    "pipeline_resample" -> { (s, dir) =>
      TextOps.resampleByWeight(Tables.documents(s, dir),
          Map("src0" -> 2.5, "src1" -> 0.0))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("doc_id")).as("n_docs"),
          sum(col("doc_id") * col("copy")).as("checksum"))
    },
    // Per-document top-5 keywords by (exact-arithmetic) tf-idf.
    "text_top_terms" -> { (s, dir) =>
      TextOps.topTerms(Tables.documents(s, dir))
    },
    // Unigram-LM surprisal scoring (CCNet-style perplexity-filter proxy)
    // in exact integer bit arithmetic.
    "text_unigram" -> { (s, dir) =>
      TextOps.unigramSurprisal(Tables.documents(s, dir))
    },
    // Conditional (bigram) surprisal — same exact-bit arithmetic, the
    // next rung of the perplexity-filter ladder.
    "text_bigram" -> { (s, dir) =>
      TextOps.bigramSurprisal(Tables.documents(s, dir))
    },
    // Token-id encoding: top-256 frequency-ranked vocab (deterministic
    // lexicographic tie-break), OOV = -1, per-doc int sequence in token
    // order — the encode step feeding context packing. The operator API
    // returns token_ids as array<int>; the QUERY surface renders it to a
    // space-joined string because the driver's pandas harness cannot
    // sort/hash array cells (r5's `err` row) — scalar columns only in
    // anything oracle-compared.
    "pipeline_tokenize" -> { (s, dir) =>
      TextOps.tokenizeEncode(Tables.documents(s, dir), vocabSize = 256)
        .withColumn("token_ids", array_join(col("token_ids"), " "))
    },
    // Fixed token-window chunking with overlap (RAG/context prep):
    // 40-token windows advancing by 32 — scan-speed, zero shuffle.
    "pipeline_chunk" -> { (s, dir) =>
      TextOps.chunkDocuments(Tables.documents(s, dir), chunkTokens = 40, overlapTokens = 8)
    },
    // Distributed BPE tokenizer training (Sennrich-style subword merges,
    // batched non-interfering rounds on the compressed word-freq table).
    // Oracle-checked since r8: batchedBpeOracle replays the batched
    // greedy non-interfering selection + queued application as one
    // recursive CTE (the batch=1 degenerate stays separately checked as
    // pipeline_bpe_seq; batch equivalence and per-merge count exactness
    // additionally asserted in BpeSpec).
    "pipeline_bpe" -> { (s, dir) =>
      BpeOps.trainBpe(Tables.documents(s, dir), numMerges = 32, batch = 8)
    },
    // Sequential (batch=1) BPE TRAINING, oracle-checked end-to-end: with
    // one merge per round the trainer is the textbook algorithm, and a
    // DuckDB recursive CTE can replay it exactly — selection = argmax of
    // overlap-inclusive adjacent-pair counts (freq desc, left, right
    // ties), application = leftmost-occurrence replace iterated to
    // fixpoint (replace-FIRST, not replace-all, so self-pairs like (a,a)
    // keep the greedy kernel's exact symbol sequence). The batched
    // production trainer stays `pipeline_bpe` (rows-only, spec-covered).
    "pipeline_bpe_seq" -> { (s, dir) =>
      BpeOps.trainBpe(Tables.documents(s, dir), numMerges = 24, batch = 1)
    },
    // Encode the corpus with a FIXED merge table: per-doc word/piece/char
    // counts (tokenizer fertility report). Fixture merges (not trained
    // in-query) make the encode kernel fully oracle-checkable — a DuckDB
    // recursive CTE replays the same rules (r6 VERDICT stretch #7); the
    // trained-merge composition stays spec-covered in BpeSpec.
    "pipeline_bpe_encode" -> { (s, dir) =>
      BpeOps.bpeEncode(Tables.documents(s, dir), BpeOps.fixtureMerges(s))
    },
    // Per-source corpus report — the at-a-glance table a curation run
    // publishes per snapshot. Mean is integer-sum / count (exact in any
    // engine); no floating aggregation order dependence anywhere.
    "text_source_report" -> { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("bigint")).as("total_tokens"),
          (sum(col("n_chars")).cast("double") / count(lit(1)).cast("double")).as("mean_chars"),
          count_distinct(col("lang")).as("n_langs"))
    },
    // Snapshot reconcile: documents vs a derived second snapshot with
    // deterministic deletions (%11), edits (%7), and additions (%13).
    "pipeline_snapshot_diff" -> { (s, dir) =>
      val old = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val neu = old.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")).as("text"))
        .unionAll(old.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 50000).as("doc_id"),
            concat(col("text"), lit(" new")).as("text")))
      TextOps.snapshotDiff(old, neu)
    },
    // The curation columns through the SQL surface only (TextFunctions
    // registered via GraftExtensions) — proves a SQL-only user gets the
    // identical pipeline.
    "text_sql_surface" -> { (s, dir) =>
      Tables.documents(s, dir).createOrReplaceTempView("graft_docs_sql")
      s.sql("""SELECT doc_id,
              |  token_count(text) AS n_tokens,
              |  quality_score(text) AS quality_score,
              |  lang_guess(text) AS lang_guess,
              |  doc_fingerprint(text) AS fingerprint,
              |  split_assign(doc_id) AS split
              |FROM graft_docs_sql""".stripMargin)
    },
    // Training-shard assignment summary: per shard, the doc count and the
    // first document in the hash-interleaved read order (proves the order
    // is reproducible cross-engine, not just the partitioning).
    "pipeline_shard" -> { (s, dir) =>
      TextOps.shardForTraining(Tables.documents(s, dir), nShards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_sum"),
          min_by(col("doc_id"), col("ord")).as("first_doc"))
    },
    // Context-window packing: per-document (shard, pack_id, pack_offset)
    // for 512-token windows over the hash-interleaved shard order —
    // concat-and-chunk, the standard pretraining layout.
    "pipeline_pack" -> { (s, dir) =>
      TextOps.packAssignments(Tables.documents(s, dir), budget = 512, nShards = 8)
    },
    // Line-level dedup over the dup-injected corpus: every 20-word chunk
    // of a duplicated document appears in >= 2 docs, so whole duplicated
    // texts strip to empty while unique prose passes through.
    "pipeline_linededup" -> { (s, dir) =>
      TextOps.lineDedup(Tables.corpus(s, dir), maxDf = 1)
    })

  private def statsSqlOver(table: String): String = statsSqlBody + table

  private val statsSql: String = statsSqlOver("documents")

  // def, not val: referenced by statsSqlOver during the object's own
  // initialization (a val here would still be null at that point).
  private def statsSqlBody: String =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INT) AS n_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_subtokens,
      |  CAST(length(text) AS INT) AS n_chars,
      |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INT) AS n_punct,
      |  CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |       x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
      |    / len(string_split_regex(lower(trim(text)), '\s+')) AS stopword_ratio,
      |  CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS DOUBLE)
      |    / len(string_split_regex(lower(trim(text)), '\s+')) AS type_token_ratio,
      |  least(1.0, CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE) / 50.0) * 0.5
      |    + CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS DOUBLE)
      |      / len(string_split_regex(lower(trim(text)), '\s+')) * 0.5 AS quality_score,
      |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
      |       WHEN len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |            x -> x IN ('der','die','das','und','nicht'))) > 0 THEN 'de'
      |       WHEN len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |            x -> x IN ('le','les','et','est','une'))) > 0 THEN 'fr'
      |       WHEN len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |            x -> x IN ('el','los','las','es','una'))) > 0 THEN 'es'
      |       ELSE 'en' END AS lang_guess,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
      |FROM """.stripMargin

  /** Bit-for-bit mirror of BpeOps.trainBpe(numMerges, batch) — the
    * BATCHED production trainer as one recursive CTE (extends the
    * pipeline_bpe_seq machine with a pending-rule QUEUE and the greedy
    * non-interfering selection). State rows: kind 'w' = one live row per
    * vocab word (s = sentinel-spaced symbols, done = merges logged),
    * kind 'p' = queued rules of the current batch (ord = application
    * order), kind 'm' = emitted merge-log rows (never recursed). Per
    * step exactly one phase fires:
    *  (a) queue head still occurs in some word → every word replaces its
    *      LEFTMOST occurrence (replace-first iterated == the kernel's
    *      greedy left-to-right pass);
    *  (b) head at fixpoint → pop it;
    *  (c) queue empty, budget left → count adjacent pairs >= minFreq 2,
    *      take the trainer's max(want*8, 64) candidate window (freq
    *      desc, left, right), then the chained
    *      s1..s`batch` CTEs replay the greedy scan: s_k = the first
    *      candidate whose {left, right, left||right} avoids every
    *      previously SELECTED pair's trio (skipped candidates taint
    *      nothing), truncated to want = min(batch, budget) — exactly
    *      takeWhile(selected < want). Ranks are assigned at selection
    *      (done + si - 1) like the trainer; the final batch skips the
    *      queue + word rows entirely (its application cannot affect any
    *      further output), so the recursion ends with the last log row.
    * No candidate or budget exhausted → no rows → termination. */
  private def batchedBpeOracle(numMerges: Int, batch: Int): String = {
    // Every CTE here is MATERIALIZED: DuckDB inlines plain CTEs at each
    // reference, and the u1←s1, s2←u1, u2←u1∪s2, ... chain would expand
    // `cands` (a full-vocab unnest aggregation) EXPONENTIALLY in the
    // batch width — measured >150s at sf0.001 vs 0.6s materialized.
    val selCtes = new StringBuilder(
      "  s1 AS MATERIALIZED (SELECT l, r, f FROM cands ORDER BY f DESC, l, r LIMIT 1),\n" +
      "  u1 AS MATERIALIZED (SELECT * FROM s1),\n")
    for (k <- 2 to batch) {
      selCtes ++= (
        s"  s$k AS MATERIALIZED (SELECT c.l, c.r, c.f FROM cands c WHERE NOT EXISTS (" +
        s"SELECT 1 FROM u${k - 1} u WHERE c.l IN (u.l, u.r, u.l||u.r) " +
        s"OR c.r IN (u.l, u.r, u.l||u.r) OR (c.l||c.r) IN (u.l, u.r, u.l||u.r)) " +
        s"ORDER BY c.f DESC, c.l, c.r LIMIT 1),\n")
      if (k < batch)
        selCtes ++= s"  u$k AS MATERIALIZED (SELECT * FROM u${k - 1} UNION ALL SELECT * FROM s$k),\n"
    }
    val selUnion = (1 to batch)
      .map(k => s"SELECT $k AS si, * FROM s$k").mkString("\n    UNION ALL ")
    s"""WITH RECURSIVE
       |wf AS (
       |  SELECT w, count(*)::BIGINT AS freq FROM (
       |    SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
       |    FROM documents) GROUP BY w),
       |st AS (
       |  SELECT 'w' AS kind, w, freq,
       |    ' ' || array_to_string([w[i] for i in generate_series(1, len(w))], ' ') || ' </w> ' AS s,
       |    0 AS done, NULL::INT AS ord, NULL::VARCHAR AS pl, NULL::VARCHAR AS pr, NULL::BIGINT AS sf
       |  FROM wf
       |  UNION ALL
       |  (
       |  WITH cur AS MATERIALIZED (SELECT * FROM st WHERE kind IN ('w', 'p')),
       |  wrows AS MATERIALIZED (SELECT * FROM cur WHERE kind = 'w'),
       |  hasp AS MATERIALIZED (SELECT count(*) > 0 AS yes FROM cur WHERE kind = 'p'),
       |  head AS MATERIALIZED (SELECT pl, pr FROM cur WHERE kind = 'p' ORDER BY ord LIMIT 1),
       |  occ AS MATERIALIZED (SELECT bool_or(position((' ' || h.pl || ' ' || h.pr || ' ') IN w.s) > 0) AS any
       |          FROM wrows w, head h),
       |  dn AS MATERIALIZED (SELECT max(done) AS done FROM wrows),
       |  cands AS MATERIALIZED (
       |    SELECT l, r, f FROM (
       |      SELECT e.x['l'] AS l, e.x['r'] AS r, sum(c.freq) AS f FROM (
       |        SELECT freq, string_split(trim(s), ' ') AS sy FROM wrows) c,
       |        LATERAL (SELECT unnest([{'l': c.sy[i], 'r': c.sy[i+1]} for i in generate_series(1, len(c.sy)-1)]) AS x) e
       |      GROUP BY l, r HAVING sum(c.freq) >= 2)
       |    WHERE (SELECT NOT yes FROM hasp) AND (SELECT done FROM dn) < $numMerges
       |    ORDER BY f DESC, l, r
       |    LIMIT GREATEST(LEAST($batch, $numMerges - (SELECT done FROM dn)) * 8, 64)),
       |$selCtes  sel AS MATERIALIZED ($selUnion),
       |  selw AS MATERIALIZED (SELECT * FROM sel
       |           WHERE si <= LEAST($batch, $numMerges - (SELECT done FROM dn))),
       |  nsel AS MATERIALIZED (SELECT count(*) AS k FROM selw)
       |  SELECT * FROM (
       |    SELECT w.kind, w.w, w.freq,
       |      CASE WHEN position((' ' || h.pl || ' ' || h.pr || ' ') IN w.s) > 0 THEN
       |        substr(w.s, 1, position((' ' || h.pl || ' ' || h.pr || ' ') IN w.s) - 1)
       |          || ' ' || h.pl || h.pr || ' '
       |          || substr(w.s, position((' ' || h.pl || ' ' || h.pr || ' ') IN w.s)
       |                         + len(' ' || h.pl || ' ' || h.pr || ' '))
       |      ELSE w.s END AS s,
       |      w.done, w.ord, w.pl, w.pr, w.sf
       |    FROM wrows w, head h, occ o WHERE o.any
       |    UNION ALL
       |    SELECT p.kind, p.w, p.freq, p.s, p.done, p.ord, p.pl, p.pr, p.sf
       |    FROM cur p, occ o WHERE p.kind = 'p' AND o.any
       |    UNION ALL
       |    SELECT w.kind, w.w, w.freq, w.s, w.done, w.ord, w.pl, w.pr, w.sf
       |    FROM wrows w, occ o WHERE NOT o.any
       |    UNION ALL
       |    SELECT p.kind, p.w, p.freq, p.s, p.done, p.ord, p.pl, p.pr, p.sf
       |    FROM cur p, occ o
       |    WHERE p.kind = 'p' AND NOT o.any
       |      AND p.ord > (SELECT min(ord) FROM cur WHERE kind = 'p')
       |    UNION ALL
       |    SELECT 'm', NULL, NULL, NULL, d.done + s.si - 1, NULL, s.l, s.r, s.f
       |    FROM selw s, dn d
       |    UNION ALL
       |    SELECT 'p', NULL, NULL, NULL, NULL, s.si, s.l, s.r, NULL
       |    FROM selw s, dn d, nsel n WHERE d.done + n.k < $numMerges
       |    UNION ALL
       |    SELECT w.kind, w.w, w.freq, w.s, w.done + n.k, w.ord, w.pl, w.pr, w.sf
       |    FROM wrows w, hasp hp, dn d, nsel n
       |    WHERE NOT hp.yes AND n.k > 0 AND d.done + n.k < $numMerges
       |  )
       |  )
       |)
       |SELECT CAST(done AS INT) AS rank, pl AS "left", pr AS "right",
       |  pl || pr AS merged, sf AS pair_freq
       |FROM st WHERE kind = 'm'""".stripMargin
  }

  private val oracleBase: Map[String, String] = Map(
    "pipeline_bpe" -> batchedBpeOracle(numMerges = 32, batch = 8),
    "text_stats" -> statsSql,
    "text_quality_by_source" ->
      s"""WITH stats AS ($statsSql)
         |SELECT d.lang, d.source, COUNT(*) AS n_docs,
         |  CAST(SUM(s.n_tokens) AS BIGINT) AS total_tokens,
         |  MIN(s.quality_score) AS min_q, MAX(s.quality_score) AS max_q
         |FROM stats s JOIN documents d USING (doc_id)
         |GROUP BY d.lang, d.source""".stripMargin,
    "text_pii_scrub" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\b555-\\d{4}\\b"
      val ip = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
      s"""WITH d AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % 3 = 0
         |         THEN ' mail u' || CAST(doc_id AS VARCHAR) || '@ex.com'
         |         ELSE '' END
         |    || CASE WHEN doc_id % 4 = 1
         |         THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |              || ' or 555-0000'
         |         ELSE '' END
         |    || CASE WHEN doc_id % 5 = 2
         |         THEN ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
         |         ELSE '' END AS txt
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(txt, '$email')) AS INT) AS n_email,
         |  CAST(len(regexp_extract_all(txt, '$phone')) AS INT) AS n_phone,
         |  CAST(len(regexp_extract_all(txt, '$ip')) AS INT) AS n_ip,
         |  regexp_replace(regexp_replace(regexp_replace(txt,
         |    '$email', '[EMAIL]', 'g'), '$phone', '[PHONE]', 'g'),
         |    '$ip', '[IP]', 'g') AS redacted
         |FROM d""".stripMargin
    },
    "text_quality_quantile" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INT) AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tokens DESC, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM t)
        |SELECT source, COUNT(*) AS n_kept,
        |  CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
        |  MIN(n_tokens) AS cutoff_tokens
        |FROM r WHERE rn * 2 <= n + 1 GROUP BY source""".stripMargin,
    // Bit-for-bit mirror of TextOps.winnowFingerprints (k=5, w=4): same
    // base-257 polynomial mod 2^31-1 over the normalized text's code
    // points (ord = code point; ASCII corpus), same clamped windows with
    // a single whole-text window for sub-w-gram documents. Powers of 257:
    // 257^4=4362470401, 257^3=16974593, 257^2=66049.
    "text_winnow_fp" ->
      """WITH norm AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    [ (ord(t[i])*4362470401 + ord(t[i+1])*16974593 + ord(t[i+2])*66049
        |       + ord(t[i+3])*257 + ord(t[i+4])) % 2147483647
        |      for i in generate_series(1, len(t) - 4) ] AS hs
        |  FROM norm),
        |wins AS (
        |  SELECT doc_id,
        |    [ list_min(hs[s : s + 3]) for s in generate_series(1, greatest(1, len(hs) - 3)) ] AS fps
        |  FROM grams WHERE len(hs) >= 1)
        |SELECT doc_id, unnest(list_distinct(fps)) AS fp FROM wins""".stripMargin,
    // Bit-for-bit mirror of BpeOps.trainBpe(batch = 1) — sequential
    // textbook BPE as one recursive CTE. State rows: kind 'w' = one live
    // row per vocab word (s = sentinel-spaced symbol string, done =
    // merges completed, pl/pr/sf = the pending rule and its recorded
    // count); kind 'm' = one emitted merge-log row (recursive results
    // accumulate, so each 'm' row appears once in the final table and
    // never recurses — `cur` filters to 'w'). Per step exactly one phase
    // fires: (a) a rule is pending and some word still contains it →
    // every word replaces its LEFTMOST occurrence (replace-first iterated
    // == the kernel's greedy left-to-right pass, self-pairs included —
    // replace-ALL would mis-order odd runs of a self-pair); (b) pending +
    // fixpoint → clear the rule, count the merge; (c) nothing pending and
    // budget left → pick argmax(count, then left, right) over
    // overlap-inclusive adjacent pairs >= minFreq 2, log it. No candidate
    // or budget exhausted → no rows → recursion terminates.
    "pipeline_bpe_seq" ->
      """WITH RECURSIVE
        |wf AS (
        |  SELECT w, count(*)::BIGINT AS freq FROM (
        |    SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS w
        |    FROM documents) GROUP BY w),
        |st AS (
        |  SELECT 'w' AS kind, w, freq,
        |    ' ' || array_to_string([w[i] for i in generate_series(1, len(w))], ' ') || ' </w> ' AS s,
        |    0 AS done, NULL::VARCHAR AS pl, NULL::VARCHAR AS pr, NULL::BIGINT AS sf
        |  FROM wf
        |  UNION ALL
        |  (
        |  WITH cur AS (SELECT * FROM st WHERE kind = 'w'),
        |  pending AS (SELECT max(pl) AS pl, max(pr) AS pr, max(done) AS done FROM cur),
        |  occ AS (SELECT bool_or(position((' ' || p.pl || ' ' || p.pr || ' ') IN c.s) > 0) AS any
        |          FROM cur c, pending p WHERE p.pl IS NOT NULL),
        |  best AS (
        |    SELECT l, r, sum(freq) AS f FROM (
        |      SELECT c.freq, e.x['l'] AS l, e.x['r'] AS r FROM (
        |        SELECT freq, string_split(trim(s), ' ') AS sy FROM cur) c,
        |        LATERAL (SELECT unnest([{'l': c.sy[i], 'r': c.sy[i+1]} for i in generate_series(1, len(c.sy)-1)]) AS x) e)
        |    GROUP BY l, r HAVING sum(freq) >= 2
        |    ORDER BY f DESC, l ASC, r ASC LIMIT 1)
        |  SELECT * FROM (
        |    SELECT c.kind, c.w, c.freq,
        |      CASE WHEN position((' ' || p.pl || ' ' || p.pr || ' ') IN c.s) > 0 THEN
        |        substr(c.s, 1, position((' ' || p.pl || ' ' || p.pr || ' ') IN c.s) - 1)
        |          || ' ' || p.pl || p.pr || ' '
        |          || substr(c.s, position((' ' || p.pl || ' ' || p.pr || ' ') IN c.s)
        |                         + len(' ' || p.pl || ' ' || p.pr || ' '))
        |      ELSE c.s END AS s,
        |      c.done, c.pl, c.pr, c.sf
        |    FROM cur c, pending p, occ o WHERE p.pl IS NOT NULL AND o.any
        |    UNION ALL
        |    SELECT c.kind, c.w, c.freq, c.s, c.done + 1, NULL, NULL, NULL
        |    FROM cur c, pending p, occ o WHERE p.pl IS NOT NULL AND NOT o.any
        |    UNION ALL
        |    SELECT c.kind, c.w, c.freq, c.s, c.done, b.l, b.r, b.f
        |    FROM cur c, pending p, best b WHERE p.pl IS NULL AND p.done < 24
        |    UNION ALL
        |    -- log row: rank = merges completed so far (0-based, matching
        |    -- the Spark trainer's merge-table ranks)
        |    SELECT 'm', NULL, NULL, NULL, p.done, b.l, b.r, b.f
        |    FROM pending p, best b WHERE p.pl IS NULL AND p.done < 24
        |  )
        |  )
        |)
        |SELECT CAST(done AS INT) AS rank, pl AS "left", pr AS "right",
        |  pl || pr AS merged, sf AS pair_freq
        |FROM st WHERE kind = 'm'""".stripMargin,
    // Bit-for-bit mirror of BpeOps.bpeEncode over the FixtureMerges
    // table (interpolated below from the same Scala value — one source
    // of truth). Encoding state is the space-joined symbol string with
    // sentinel spaces; each recursion step applies the current rule's
    // boundary-safe replace-all and stays on the rule until fixpoint.
    // Iterated replace-all == applyMerge's single greedy left-to-right
    // pass: replace-all is left-to-right non-overlapping, the skipped
    // boundary-sharing occurrences are exactly the non-overlapping pairs
    // a later iteration picks up, and a merge never creates a new
    // occurrence of its own pair (merged = left+right is longer than
    // either side).
    "pipeline_bpe_encode" -> {
      val vals = graft.operators.BpeOps.FixtureMerges
        .map { case (r, l, ri, m) => s"($r,'$l','$ri','$m')" }.mkString(", ")
      s"""WITH RECURSIVE
         |rules(rank, l, r, m) AS (VALUES $vals),
         |dw AS (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |  FROM documents),
         |vocab AS (SELECT DISTINCT w FROM dw),
         |enc AS (
         |  SELECT w, ' ' || array_to_string([w[i] for i in generate_series(1, len(w))], ' ') || ' </w> ' AS s, 1 AS rk
         |  FROM vocab
         |  UNION ALL
         |  SELECT e.w,
         |    CASE WHEN position((' ' || ru.l || ' ' || ru.r || ' ') IN e.s) > 0
         |         THEN replace(e.s, ' ' || ru.l || ' ' || ru.r || ' ', ' ' || ru.m || ' ')
         |         ELSE e.s END,
         |    CASE WHEN position((' ' || ru.l || ' ' || ru.r || ' ') IN e.s) > 0 THEN e.rk ELSE e.rk + 1 END
         |  FROM enc e JOIN rules ru ON ru.rank = e.rk),
         |pieces AS (
         |  SELECT w, len(string_split(trim(s), ' ')) AS n_pieces
         |  FROM enc WHERE rk = (SELECT max(rank) + 1 FROM rules)),
         |agg AS (
         |  SELECT dw.doc_id, COUNT(*) AS n_words, SUM(p.n_pieces) AS n_pieces, SUM(len(dw.w)) AS n_chars
         |  FROM dw JOIN pieces p USING (w) GROUP BY dw.doc_id)
         |SELECT d.doc_id, CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
         |  CAST(COALESCE(a.n_pieces, 0) AS BIGINT) AS n_pieces,
         |  CAST(COALESCE(a.n_chars, 0) AS BIGINT) AS n_chars_in_words
         |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin
    },
    "pipeline_curate" ->
      s"""WITH ${graft.OracleCtes.corpus},
         |s AS (${statsSqlOver("corpus")}),
         |rep AS (SELECT fingerprint, min(doc_id) AS doc_id FROM s GROUP BY fingerprint)
         |SELECT s.doc_id, s.n_tokens, s.quality_score
         |FROM s JOIN rep ON s.fingerprint = rep.fingerprint AND s.doc_id = rep.doc_id
         |WHERE s.quality_score >= 0.5 AND s.lang_guess = 'en'""".stripMargin,
    "pipeline_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 AS bk
        |  FROM documents)
        |SELECT CASE WHEN bk < 900000 THEN 'train'
        |            WHEN bk < 950000 THEN 'val'
        |            ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM b GROUP BY 1""".stripMargin,
    "pipeline_redact" ->
      """WITH t0 AS (SELECT doc_id, text FROM documents),
        |t1 AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS text
        |  FROM t0),
        |t2 AS (SELECT doc_id, n_emails,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
        |  regexp_replace(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS text
        |  FROM t1),
        |t3 AS (SELECT doc_id, n_emails, n_ips,
        |  CAST(len(regexp_extract_all(text, '\d{13,19}')) AS INT) AS n_numbers,
        |  regexp_replace(text, '\d{13,19}', '<NUMBER>', 'g') AS text
        |  FROM t2),
        |t4 AS (SELECT doc_id, n_emails, n_ips, n_numbers,
        |  CAST(len(regexp_extract_all(text, '\+?\d{3}[- ]?\d{3,4}[- ]?\d{4}')) AS INT) AS n_phones,
        |  regexp_replace(text, '\+?\d{3}[- ]?\d{3,4}[- ]?\d{4}', '<PHONE>', 'g') AS text
        |  FROM t3)
        |SELECT doc_id, n_emails, n_ips, n_numbers, n_phones, md5(text) AS redacted_fp
        |FROM t4""".stripMargin,
    "pipeline_resample" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':resample'), 1, 8)) AS BIGINT)
        |      % 1000000 AS bk
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, source,
        |    CASE WHEN source = 'src0' THEN 2 + (CASE WHEN bk < 500000 THEN 1 ELSE 0 END)
        |         WHEN source = 'src1' THEN 0
        |         ELSE 1 END AS n_copies
        |  FROM b),
        |e AS (SELECT doc_id, source, unnest(range(1, n_copies + 1)) AS copy FROM n)
        |SELECT source, count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs,
        |  CAST(SUM(doc_id * copy) AS BIGINT) AS checksum
        |FROM e GROUP BY source""".stripMargin,
    "text_top_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |  FROM documents),
        |t AS (SELECT doc_id, token, count(*) AS tf FROM toks WHERE token <> '' GROUP BY 1, 2),
        |d AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks WHERE token <> '' GROUP BY 1),
        |s AS (
        |  SELECT t.doc_id, t.token, t.tf, d.df,
        |    CAST(t.tf AS DOUBLE)
        |      * (CAST((SELECT count(*) FROM documents) AS DOUBLE) / CAST(d.df AS DOUBLE)) AS score
        |  FROM t JOIN d USING (token)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rk
        |      FROM s)
        |SELECT doc_id, CAST(rk AS INT) AS rank, token, tf, df, score FROM r WHERE rk <= 5""".stripMargin,
    "text_sql_surface" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 AS bk
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INT) AS n_tokens,
        |  least(1.0, CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE) / 50.0) * 0.5
        |    + CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS DOUBLE)
        |      / len(string_split_regex(lower(trim(text)), '\s+')) * 0.5 AS quality_score,
        |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |       WHEN len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |            x -> x IN ('der','die','das','und','nicht'))) > 0 THEN 'de'
        |       WHEN len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |            x -> x IN ('le','les','et','est','une'))) > 0 THEN 'fr'
        |       WHEN len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |            x -> x IN ('el','los','las','es','una'))) > 0 THEN 'es'
        |       ELSE 'en' END AS lang_guess,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        |  CASE WHEN bk < 900000 THEN 'train'
        |       WHEN bk < 950000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b""".stripMargin,
    "pipeline_shard" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 8)) AS BIGINT)
        |      % 8 AS INT) AS shard,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':order'), 1, 8)) AS BIGINT) AS ord
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
        |  arg_min(doc_id, ord) AS first_doc
        |FROM b GROUP BY shard""".stripMargin,
    "pipeline_linededup" ->
      s"""WITH ${graft.OracleCtes.corpus},
         |toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM corpus),
         |ch AS (SELECT doc_id,
         |  unnest([{'idx': i, 'chunk': array_to_string(w[i*20+1 : i*20+20], ' ')}
         |          for i in range(0, CAST(ceil(len(w) / 20.0) AS BIGINT))]) AS c
         |  FROM toks),
         |chunks AS (SELECT doc_id, c.idx AS idx, c.chunk AS chunk FROM ch),
         |dfs AS (SELECT chunk, count(DISTINCT doc_id) AS df FROM chunks GROUP BY 1),
         |kept AS (SELECT c.doc_id, string_agg(c.chunk, ' ' ORDER BY c.idx) AS text_clean,
         |                count(*) AS n_kept
         |         FROM chunks c JOIN dfs USING (chunk) WHERE dfs.df <= 1 GROUP BY 1),
         |total AS (SELECT doc_id, count(*) AS n_total FROM chunks GROUP BY 1)
         |SELECT t.doc_id, coalesce(k.text_clean, '') AS text_clean,
         |  coalesce(k.n_kept, 0) AS n_kept,
         |  t.n_total - coalesce(k.n_kept, 0) AS n_dropped
         |FROM total t LEFT JOIN kept k USING (doc_id)""".stripMargin,
    "pipeline_pack" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 8)) AS BIGINT)
        |      % 8 AS INT) AS shard,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':order'), 1, 8)) AS BIGINT) AS ord,
        |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ord, doc_id) AS cum
        |  FROM b)
        |SELECT doc_id, shard, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id,
        |  CAST((cum - n_tokens) % 512 AS INT) AS pack_offset
        |FROM c""".stripMargin,
    // 3-grams via list comprehension (inclusive slicing: t[i:i+2] is
    // three tokens); eval grams left-joined so unhit docs report 0.
    // The Bloom variant is exact after its verify join, so it shares
    // this SQL verbatim (bound below the map).
    "pipeline_decontam" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source,
        |    unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)]) AS gram
        |  FROM toks),
        |ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |c AS (
        |  SELECT g.doc_id, count(*) AS n_grams, count(ev.gram) AS n_hits
        |  FROM g LEFT JOIN ev USING (gram)
        |  WHERE g.source <> 'src0'
        |  GROUP BY g.doc_id)
        |SELECT d.doc_id, coalesce(c.n_grams, 0) AS n_grams, coalesce(c.n_hits, 0) AS n_hits
        |FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
        |LEFT JOIN c USING (doc_id)""".stripMargin,
    "pipeline_sample" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 8)) AS BIGINT)
        |      % 1000000 AS bk
        |  FROM documents)
        |SELECT doc_id, source FROM b
        |WHERE bk < CASE WHEN source = 'src0' THEN 1000000
        |                WHEN source = 'src1' THEN 0
        |                ELSE 250000 END""".stripMargin,
    "text_repetition" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))] AS grams
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |        FROM documents))
        |SELECT doc_id, CAST(len(grams) AS INT) AS n_grams,
        |  CAST(len(list_distinct(grams)) AS INT) AS n_distinct,
        |  CASE WHEN len(grams) > 0
        |       THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams)
        |       ELSE 0.0 END AS dup_frac
        |FROM g""".stripMargin,
    "text_vocabulary" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |  FROM documents)
        |SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM toks WHERE token <> '' GROUP BY token""".stripMargin,
    "pipeline_chunk" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                t -> t <> '') AS w
        |  FROM documents),
        |starts AS (
        |  SELECT doc_id, w,
        |    unnest(generate_series(0, (len(w) - 1) // 32)) AS chunk_id
        |  FROM w WHERE len(w) > 0)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  CAST(len(list_slice(w, chunk_id * 32 + 1, chunk_id * 32 + 40)) AS INT)
        |    AS n_tokens,
        |  array_to_string(list_slice(w, chunk_id * 32 + 1, chunk_id * 32 + 40), ' ')
        |    AS text_chunk
        |FROM starts""".stripMargin,
    "pipeline_tokenize" ->
      """WITH toks0 AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS token,
        |    generate_subscripts(string_split_regex(lower(trim(text)), '\s+'), 1) AS pos
        |  FROM documents),
        |toks AS (SELECT * FROM toks0 WHERE token <> ''),
        |v AS (SELECT token, count(*) AS tf FROM toks GROUP BY 1
        |      ORDER BY tf DESC, token ASC LIMIT 256),
        |vid AS (SELECT token,
        |          CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token ASC) - 1 AS INT) AS token_id
        |        FROM v),
        |j AS (SELECT t.doc_id, t.pos, CAST(COALESCE(vid.token_id, -1) AS INT) AS token_id
        |      FROM toks t LEFT JOIN vid ON t.token = vid.token)
        |SELECT doc_id,
        |  array_to_string(list(token_id ORDER BY pos), ' ') AS token_ids,
        |  COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN token_id = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |FROM j GROUP BY doc_id""".stripMargin,
    "text_unigram" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |  FROM documents),
        |t AS (SELECT doc_id, token FROM toks WHERE token <> ''),
        |v AS (SELECT token, count(*) AS tf FROM t GROUP BY 1),
        |tot AS (SELECT count(*) AS total FROM t)
        |SELECT t.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(length(bin(tot.total)) - length(bin(v.tf))) AS BIGINT) AS surprisal_bits,
        |  CAST(SUM(length(bin(tot.total)) - length(bin(v.tf))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS mean_surprisal
        |FROM t JOIN v USING (token) CROSS JOIN tot
        |GROUP BY t.doc_id""".stripMargin,
    "text_source_report" ->
      """SELECT source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
        |  COUNT(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY source""".stripMargin,
    "pipeline_snapshot_diff" ->
      """WITH o AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_old
        |  FROM documents),
        |nsrc AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 50000, text || ' new' FROM documents WHERE doc_id % 13 = 0),
        |n AS (SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_new FROM nsrc)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.fp_old <> n.fp_new THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,
    "text_bigram" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, bg['prev'] AS prev, bg['tok'] AS tok FROM (
        |    SELECT doc_id, unnest([{'prev': w[i], 'tok': w[i+1]}
        |                           for i in generate_series(1, len(w)-1)]) AS bg
        |    FROM t)),
        |c2 AS (SELECT prev, tok, count(*) AS c2 FROM b GROUP BY 1, 2),
        |c1 AS (SELECT prev, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1)
        |SELECT b.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(length(bin(c1.c1)) - length(bin(c2.c2))) AS BIGINT) AS surprisal_bits,
        |  CAST(SUM(length(bin(c1.c1)) - length(bin(c2.c2))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS mean_surprisal
        |FROM b JOIN c2 USING (prev, tok) JOIN c1 USING (prev)
        |GROUP BY b.doc_id""".stripMargin)

  // The Bloom path's verify join makes it bit-identical to the exact
  // operator, so its oracle is the exact operator's SQL, not a weaker
  // rows-only check.
  val oracle: Map[String, String] =
    oracleBase + ("pipeline_decontam_bloom" -> oracleBase("pipeline_decontam"))
}
