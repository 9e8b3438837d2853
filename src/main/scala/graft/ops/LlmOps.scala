package graft.ops

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.Tables
import Op._

/** §2.10 — the north-star LLM-training-data pipeline operators over
  * `documents` (text) and `embeddings` (64-dim float vectors).
  *
  * Scale design (100 TB): nothing here is all-pairs. Near-dedup generates
  * candidates from per-doc minimum shingles (MinHash-band-shaped — at full
  * scale swap in k independent hash-min signatures / MinHashLSH, same
  * plan shape); brute-force similarity search broadcasts a fixed probe
  * set so the big side never shuffles; the LSH variant buckets with
  * random hyperplanes so candidate pairs are per-bucket only. Text
  * pipelines are explode → hash-aggregate, partial-agg'd map-side.
  */
object LlmOps {

  private def toks: Column = split(col("text"), " ")

  /** Element-wise double view of the float vector (float→double is exact,
    * so both engines fold identical doubles — SURVEY §5.3.2/.6).
    */
  private def dvec(c: Column): Column = transform(c, x => x.cast(DoubleType))

  private def l2(c: Column): Column =
    sqrt(aggregate(transform(c, x => x * x), lit(0.0), (a, x) => a + x))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** The standard LLM-corpus quality gate: language, char-length band,
    * minimum token count. Pure filter — predicate pushdown sends the
    * lang/n_chars conjuncts to the parquet reader.
    */
  val llmQualityFilter: Op = Op(
    "llm_quality_filter",
    (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("n_toks", size(toks))
        .filter(
          col("lang") === "en" &&
            col("n_chars").between(100, 2000) &&
            col("n_toks") >= 10)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("n_toks"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id, lang, source, n_chars,
        len(string_split(text, ' ')) AS n_toks
      FROM documents
      WHERE lang = 'en' AND n_chars BETWEEN 100 AND 2000
        AND len(string_split(text, ' ')) >= 10
      ORDER BY doc_id
    """.stripMargin.trim))

  /** Corpus statistics per language: doc/token/term counts, type-token
    * ratio, mean doc length, and the top-10 terms (count desc, term asc —
    * fully tie-broken). Term counting is explode → hash-agg (map-side
    * partial), top-k is a per-lang window over the small aggregated set.
    */
  val llmTextStats: Op = Op(
    "llm_text_stats",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val terms = docs.select(col("lang"), explode(toks).as("term"))
      val termCounts = terms.groupBy("lang", "term").agg(count(lit(1)).as("cnt"))
      val top = termCounts
        .withColumn("rn", row_number().over(
          Window.partitionBy("lang").orderBy(col("cnt").desc, col("term"))))
        .filter(col("rn") <= 10)
        .groupBy("lang")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("rn"), col("term")))),
            x => x.getField("term")), ",").as("top_terms"))
      val tok = terms.groupBy("lang").agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("term")).as("n_terms"))
      val doc = docs.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 6).as("avg_chars"))
      doc.join(tok, "lang").join(top, "lang")
        .select(
          col("lang"), col("n_docs"), col("n_tokens"), col("n_terms"),
          round(col("n_terms").cast(DoubleType) / col("n_tokens"), 6).as("ttr"),
          col("avg_chars"), col("top_terms"))
        .orderBy("lang")
    },
    Some("""
      WITH terms AS (
        SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
      ), tc AS (
        SELECT lang, term, COUNT(*) AS cnt FROM terms GROUP BY 1, 2
      ), top AS (
        SELECT lang, string_agg(term, ',' ORDER BY rn) AS top_terms
        FROM (SELECT lang, term,
                row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS rn
              FROM tc)
        WHERE rn <= 10 GROUP BY lang
      ), tok AS (
        SELECT lang, COUNT(*) AS n_tokens, COUNT(DISTINCT term) AS n_terms
        FROM terms GROUP BY 1
      ), doc AS (
        SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 6) AS avg_chars
        FROM documents GROUP BY 1
      )
      SELECT doc.lang, n_docs, n_tokens, n_terms,
        ROUND(CAST(n_terms AS DOUBLE) / n_tokens, 6) AS ttr,
        avg_chars, top_terms
      FROM doc JOIN tok ON doc.lang = tok.lang JOIN top ON doc.lang = top.lang
      ORDER BY doc.lang
    """.stripMargin.trim))

  /** Pure-relational TF-IDF (no MLlib, so it stays oracle-checkable):
    * tf(doc,term) × ln(N/df(term)), top term per doc. The corpus size N
    * stays in-plan as a broadcast 1-row aggregate — no driver-side count.
    * Ranking uses the ROUNDED score (both engines rank identical values,
    * so the winner can't flip on a last-ulp difference).
    */
  val llmTextTfidf: Op = Op(
    "llm_text_tfidf",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val tf = docs.select(col("doc_id"), explode(toks).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
      val n = docs.agg(count(lit(1)).as("n_total"))
      tf.join(dfreq, "term")
        .crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") * log(col("n_total").cast(DoubleType) / col("dfreq")), 6))
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("term"), col("tf"), col("dfreq"), col("tfidf"))
        .orderBy("doc_id")
    },
    Some("""
      WITH tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY 1, 2
      ), dfreq AS (
        SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY 1
      ), n AS (
        SELECT COUNT(*) AS n_total FROM documents
      ), scored AS (
        SELECT doc_id, tf.term, tf, dfreq.dfreq,
          ROUND(tf * ln(CAST(n_total AS DOUBLE) / dfreq.dfreq), 6) AS tfidf
        FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
      )
      SELECT doc_id, term, tf, dfreq, tfidf
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, term) AS rn FROM scored)
      WHERE rn = 1 ORDER BY doc_id
    """.stripMargin.trim))

  /** Exact dedup on normalized text (lower/trim/space-squeeze), keep the
    * minimum doc_id per group. Groups by the sha256 fingerprint, NOT the
    * full text — at 100 TB the shuffle carries a 64-char key per row
    * instead of multi-KB documents. (Fixture plants 0 exact duplicates,
    * so every group has n_copies = 1 — the near-dup operator below holds
    * the real signal.)
    */
  val llmDedupExact: Op = Op(
    "llm_dedup_exact",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          sha2(regexp_replace(trim(lower(col("text"))), " +", " "), 256).as("fp"))
        .groupBy("fp")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"), col("fp"))
        .orderBy("keep_id"),
    Some("""
      SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies, fp
      FROM (SELECT doc_id,
              sha256(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp
            FROM documents)
      GROUP BY fp ORDER BY keep_id
    """.stripMargin.trim))

  /** Per-doc sorted distinct shingle ARRAY, computed entirely narrowly —
    * no explode, no distinct, NO SHUFFLE. The round-3 formulation
    * materialized a (doc_id, shingle) row table whose explode+distinct
    * exchange Catalyst re-planned 4-6× across its consumers (verified in
    * the static plan: no ReusedExchange); keeping the shingle set as an
    * array column makes every consumer a cheap narrow re-scan instead.
    * Row width is bounded by the document itself (a shingle array is
    * ~5× the text), the same envelope the text column already sets.
    */
  private def shingleArr(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), array_sort(array_distinct(
        expr("transform(sequence(1, size(toks) - 4), i -> concat_ws(' ', slice(toks, i, 5)))")))
      .as("shs"))

  /** Near-duplicate pairs: word-5-gram shingles → banded candidate
    * generation → EXACT Jaccard verify at ≥ 0.8. Never all-pairs: each
    * doc contributes its 5 lexicographically-smallest shingles as
    * candidate keys (a deterministic MinHash band — P[miss] ≈ (1−J)⁵,
    * < 1e-3 at J ≥ 0.8; on this fixture it finds all 25 planted pairs,
    * verified against the full-join ground truth). At 100 TB swap the
    * lexicographic band for k seeded hash-min signatures (MinHashLSH) —
    * identical plan shape: per-doc signature array → equi-join on band →
    * exact verify on the (tiny) candidate set.
    *
    * Shuffle inventory (the 100 TB story): the ONLY wide exchanges are
    * (1) the 5-shingles/doc band self-join and (2) joining the small
    * verified pair set back to the shingle arrays — the full shingle set
    * never shuffles as rows. The array table is materialized ONCE via
    * eager localCheckpoint: its 4 consumers then read executor-local
    * blocks instead of re-running the narrow compute (measured 2×
    * faster than recomputing at sf0.1: 1.5 s → 0.8 s warm; round 3's
    * row-table formulation, which re-planned an explode+distinct
    * exchange 4-6×, was 6.55 s single-shot). On a real cluster swap
    * localCheckpoint for a reliable checkpoint dir if executor loss
    * mid-query must be survivable.
    */
  val llmDedupNear: Op = Op(
    "llm_dedup_near",
    (s, dir) => {
      graft.functions.SortedIntersectCount.register(s)
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 5)
      val withSh = shingleArr(docs).localCheckpoint(true)
      // candidate bands: 5 lexicographically-min shingles = first 5 of
      // the sorted array (narrow — the round-3 window+filter needed a
      // full shuffle on doc_id just to rank shingles)
      val cand = withSh.select(col("doc_id"), explode(slice(col("shs"), 1, 5)).as("shingle"))
      val pairs = cand.as("a")
        .join(cand.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      // exact verify: pull both docs' shingle arrays and intersect —
      // arrays are sorted+distinct, so the native two-pointer
      // SortedIntersectCount (codegen'd, zero-allocation; proven equal
      // to size(array_intersect) in SortedIntersectSuite) counts the
      // true overlap
      val inter = expr("graft_sorted_intersect_count(a_shs, b_shs)").cast(DoubleType)
      val jacc = inter / (size(col("a_shs")) + size(col("b_shs")) - inter)
      pairs
        .join(withSh.select(col("doc_id").as("a_id"), col("shs").as("a_shs")), "a_id")
        .join(withSh.select(col("doc_id").as("b_id"), col("shs").as("b_shs")), "b_id")
        .filter(jacc >= 0.8)
        .select(col("a_id"), col("b_id"), round(jacc, 6).as("jacc"))
        .orderBy("a_id", "b_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      ), idx AS (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 4)) AS i
        FROM t WHERE len(toks) >= 5
      ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS shingle FROM idx
      ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1
      ), cand AS (
        SELECT doc_id, shingle
        FROM (SELECT doc_id, shingle,
                row_number() OVER (PARTITION BY doc_id ORDER BY shingle) AS rn FROM sh)
        WHERE rn <= 5
      ), pairs AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM cand a JOIN cand b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      ), inter AS (
        SELECT p.a_id, p.b_id, COUNT(*) AS inter
        FROM pairs p
          JOIN sh sa ON sa.doc_id = p.a_id
          JOIN sh sb ON sb.doc_id = p.b_id AND sb.shingle = sa.shingle
        GROUP BY 1, 2
      )
      SELECT i.a_id, i.b_id,
        ROUND(CAST(inter AS DOUBLE) / (za.sz + zb.sz - inter), 6) AS jacc
      FROM inter i
        JOIN sizes za ON za.doc_id = i.a_id
        JOIN sizes zb ON zb.doc_id = i.b_id
      WHERE CAST(inter AS DOUBLE) / (za.sz + zb.sz - inter) >= 0.8
      ORDER BY a_id, b_id
    """.stripMargin.trim))

  /** SimHash near-dedup — the signature-based alternative to the
    * set-similarity pipeline above: each doc compresses to ONE 60-bit
    * signature (bitwise majority vote over md5-hashed shingles), so
    * at 100 TB the heavy state is 8 bytes/doc instead of a shingle
    * table. Candidates come from 6 banded 10-bit sub-signatures
    * (guaranteed complete for hamming ≤ 5, overwhelmingly complete at
    * the ≤ 10 threshold; the oracle replicates the same bands, so the
    * compared results agree by construction). On this corpus
    * (word-level tokens fail here — the tiny vocabulary makes unrelated
    * token SETS near-identical) shingle-level SimHash separates cleanly:
    * planted pairs at hamming 1–8, noise floor 17+. The 60-bit hash is
    * md5-prefix based because BOTH engines define it identically
    * (Spark conv(hex,16,10) ≡ DuckDB CAST('0x'||hex AS BIGINT)).
    */
  val llmDedupSimhash: Op = Op(
    "llm_dedup_simhash",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 5)
      // per-doc distinct shingles computed narrowly (shingleArr — no
      // distinct shuffle), hashed in-array, then exploded as bare longs
      // into the one-pass majority-vote Aggregator. One shuffle total
      // before the band join, and it carries 8-byte hashes, not shingle
      // strings. (A fully-narrow higher-order-function fold was measured
      // 6× SLOWER here — nested lambdas run interpreted at
      // O(shingles × 60) with per-step array allocation; the typed
      // Aggregator's mutable 60-counter buffer is the fast fold.)
      val hashes = shingleArr(docs).select(col("doc_id"), explode(
          expr("transform(shs, sh -> cast(conv(substring(md5(sh), 1, 15), 16, 10) as bigint))"))
        .as("h"))
      val simhash = udaf(SimHashAgg)
      val sig = hashes.groupBy("doc_id").agg(simhash(col("h")).as("sig"))
      val bands = sig
        .select(col("doc_id"), col("sig"), explode(expr("sequence(0, 5)")).as("j"))
        .withColumn("band", expr("shiftright(sig, 10 * j) & 1023"))
      bands.as("a")
        .join(bands.as("b"),
          col("a.j") === col("b.j") && col("a.band") === col("b.band") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(
          col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
        .distinct()
        .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
        .filter(col("hamming") <= 10)
        .select("a_id", "b_id", "hamming")
        .orderBy("a_id", "b_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      ), idx AS (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 4)) AS i
        FROM t WHERE len(toks) >= 5
      ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS shingle FROM idx
      ), th AS (
        SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h FROM sh
      ), bits AS (
        SELECT doc_id, i, SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS w
        FROM th, (SELECT unnest(generate_series(0, 59)) AS i) GROUP BY 1, 2
      ), sig AS (
        SELECT doc_id,
          SUM(CASE WHEN w > 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END) AS sig
        FROM bits GROUP BY 1
      ), bands AS (
        SELECT doc_id, sig, j, (sig >> (10 * j)) & 1023 AS band
        FROM sig, (SELECT unnest(generate_series(0, 5)) AS j)
      ), cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
               a.sig AS sig_a, b.sig AS sig_b
        FROM bands a JOIN bands b
          ON a.j = b.j AND a.band = b.band AND a.doc_id < b.doc_id
      )
      SELECT a_id, b_id, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
      FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 10
      ORDER BY a_id, b_id
    """.stripMargin.trim))

  /** Document fingerprinting by WINNOWING (Schleimer/Wilkerson/Aiken's
    * local algorithm, the MOSS fingerprint): positional word-5-gram
    * rolling hashes → per-window-of-8 minimum → distinct fingerprint
    * set. Guarantees any shared run of ≥ 12 tokens (w + k − 1) between
    * two docs shares ≥ 1 fingerprint, while keeping only ~2/(w+1) of
    * the hashes — the standard sublinear dedup/plagiarism index.
    *
    * Entirely NARROW per-doc array math (no explode, no shuffle —
    * same discipline as shingleArr); emits a per-doc digest: count,
    * min/max, and the 5 smallest fingerprints as the bucket-able
    * prefix. At 100 TB the fingerprint set is the doc's posting list —
    * explode it into an inverted index keyed by fingerprint.
    */
  /** The winnowing core (k=5 word-grams, window w=8), exposed for the
    * guarantee test: (doc_id, hs positional hash sequence, fps sorted
    * distinct fingerprint set). Narrow — safe to reuse anywhere.
    */
  private[graft] def winnowFps(docs: DataFrame): DataFrame =
    docs
      .filter(size(col("toks")) >= 12) // w + k − 1 tokens minimum
      .withColumn("hs", expr(
        """transform(sequence(1, size(toks) - 4),
             i -> cast(conv(substring(md5(concat_ws(' ', slice(toks, i, 5))), 1, 15), 16, 10) as bigint))"""))
      .withColumn("fps", expr(
        """array_sort(array_distinct(transform(sequence(1, size(hs) - 7),
             j -> array_min(slice(hs, j, 8)))))"""))

  val llmFingerprintWinnow: Op = Op(
    "llm_fingerprint_winnow",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), toks.as("toks"))
      winnowFps(docs)
        .select(
          col("doc_id"),
          size(col("hs")).as("n_grams"),
          size(col("fps")).as("n_fp"),
          expr("fps[0]").as("fp_min"),
          expr("element_at(fps, -1)").as("fp_max"),
          concat_ws(",", expr("transform(slice(fps, 1, 5), x -> cast(x as string))"))
            .as("fp_head"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      ), h AS (
        SELECT doc_id, len(toks) AS n_toks,
          list_transform(generate_series(1, len(toks) - 4),
            i -> CAST('0x' || substr(md5(array_to_string(toks[i:i+4], ' ')), 1, 15) AS BIGINT)) AS hs
        FROM t WHERE len(toks) >= 12
      ), w AS (
        SELECT doc_id, len(hs) AS n_grams,
          list_sort(list_distinct(list_transform(generate_series(1, len(hs) - 7),
            j -> list_min(hs[j:j+7])))) AS fps
        FROM h
      )
      SELECT doc_id, n_grams, len(fps) AS n_fp,
        fps[1] AS fp_min, fps[-1] AS fp_max,
        array_to_string(list_transform(fps[1:5], x -> CAST(x AS VARCHAR)), ',') AS fp_head
      FROM w ORDER BY doc_id
    """.stripMargin.trim))

  /** Embedding-cosine near-dup — the fourth dedup detector (alongside
    * exact, MinHash-band Jaccard, SimHash): docs embed as 128-dim
    * hashed bag-of-words vectors (term → md5 dim, weight = tf; the
    * deterministic, engine-portable stand-in for a learned encoder —
    * the fixture's `embeddings` table is random noise w.r.t. text, max
    * pairwise cosine 0.51, so a learned-embedding dedup has no signal
    * there), candidates come from a top-2-heaviest-dims band (NEVER
    * all-pairs: 1081 candidate pairs vs 124 750 all-pairs at sf0.01),
    * then exact cosine ≥ 0.95 verifies. All 25 planted near-dup pairs
    * survive — cross-detector agreement with the Jaccard pipeline is
    * property-tested.
    *
    * Determinism: tf weights are integer-valued doubles, so dots/norms
    * are exact and bit-identical across engines; both engines compute
    * the same md5 dims and the same band, so candidates agree by
    * construction. SCALE NOTE: a top-2 band concentrates under a
    * heavy-head vocabulary; at 100 TB swap the band for k
    * hyperplane-sign bands (llm_simsearch_lsh's mechanism) — same
    * plan shape: per-doc signature → band equi-join → exact verify.
    */
  val llmDedupEmbed: Op = Op(
    "llm_dedup_embed",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // tf feeds 4 consumers (top2, norms, both dot sides): materialize
      // its explode+group ONCE so the corpus shuffles once, not 4×.
      // (Locally timing-neutral — cold cost here is plan/codegen — but
      // at scale the explode+group is the dominant shuffle.)
      val tf = docs.select(col("doc_id"), explode(toks).as("term"))
        .withColumn("dim",
          expr("cast(cast(conv(substring(md5(term), 1, 7), 16, 10) as bigint) % 128 as int)"))
        .groupBy("doc_id", "dim")
        .agg(count(lit(1)).cast(DoubleType).as("w"))
        .localCheckpoint(true)
      // ONE hash-agg yields both the top-2 band dims (collect the
      // per-doc dim list — ≤ 128 entries — and sort in-row; cheaper
      // than a ranking window, partials run map-side) AND the L2 norm,
      // which then rides along through the candidate join — no separate
      // norm aggregation, no norm joins. struct(-w, dim) ascending ≡
      // (w DESC, dim ASC), the oracle's exact tie-break.
      val top2 = tf
        .groupBy("doc_id")
        .agg(
          slice(array_sort(collect_list(struct((-col("w")).as("nw"), col("dim")))), 1, 2)
            .as("t2"),
          sqrt(sum(col("w") * col("w"))).as("nr"))
        .select(col("doc_id"),
          expr("try_element_at(t2, 1).dim").as("d1"),
          expr("try_element_at(t2, 2).dim").as("d2"),
          col("nr"))
      val cand = top2.as("a")
        .join(top2.as("b"),
          col("a.d1") === col("b.d1") && col("a.d2") === col("b.d2") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          col("a.nr").as("na"), col("b.nr").as("nb"))
      // norms are functionally dependent on the ids, so carrying them
      // through the groupBy keys keeps the dot aggregation exact
      val dots = cand
        .join(tf.as("ta"), col("a_id") === col("ta.doc_id"))
        .join(tf.as("tb"),
          col("b_id") === col("tb.doc_id") && col("ta.dim") === col("tb.dim"))
        .groupBy("a_id", "b_id", "na", "nb")
        .agg(sum(col("ta.w") * col("tb.w")).as("dot"))
      val sim = col("dot") / (col("na") * col("nb"))
      dots
        .filter(sim >= 0.95)
        .select(col("a_id"), col("b_id"), round(sim, 6).as("cos_sim"))
        .orderBy("a_id", "b_id")
    },
    Some("""
      WITH tf AS (
        SELECT doc_id,
          CAST(CAST('0x' || substr(md5(term), 1, 7) AS BIGINT) % 128 AS INT) AS dim,
          CAST(COUNT(*) AS DOUBLE) AS w
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY 1, 2
      ), top2 AS (
        SELECT doc_id,
          max(CASE WHEN rn = 1 THEN dim END) AS d1,
          max(CASE WHEN rn = 2 THEN dim END) AS d2
        FROM (SELECT doc_id, dim,
                row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, dim) AS rn
              FROM tf)
        WHERE rn <= 2 GROUP BY 1
      ), cand AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM top2 a JOIN top2 b
          ON a.d1 = b.d1 AND a.d2 = b.d2 AND a.doc_id < b.doc_id
      ), nrm AS (
        SELECT doc_id, sqrt(sum(w * w)) AS nr FROM tf GROUP BY 1
      ), dots AS (
        SELECT c.a_id, c.b_id, sum(ta.w * tb.w) AS dot
        FROM cand c
          JOIN tf ta ON ta.doc_id = c.a_id
          JOIN tf tb ON tb.doc_id = c.b_id AND tb.dim = ta.dim
        GROUP BY 1, 2
      )
      SELECT d.a_id, d.b_id,
        ROUND(dot / (na.nr * nb.nr), 6) AS cos_sim
      FROM dots d
        JOIN nrm na ON na.doc_id = d.a_id
        JOIN nrm nb ON nb.doc_id = d.b_id
      WHERE dot / (na.nr * nb.nr) >= 0.95
      ORDER BY a_id, b_id
    """.stripMargin.trim))

  /** Brute-force cosine top-5 for a fixed deterministic probe set
    * (vec_id % 50 = 0). The probe side is broadcast, so the full table is
    * scanned exactly once with NO shuffle of the big side — cost is
    * |probes| × N bounded dot products, the correct exact-search baseline.
    * The pairwise kernel is the native codegen'd CosineSim expression
    * (one fused array pass; bit-identical to the zip_with composition —
    * CosineSimSuite proves it). Ranking happens on the ROUNDED similarity
    * (rank can't flip on a last-ulp engine difference). The scale path is
    * llm_simsearch_lsh.
    */
  val llmSimsearchTopk: Op = Op(
    "llm_simsearch_topk",
    (s, dir) => {
      graft.functions.CosineSim.register(s)
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding").as("v"))
      val probes = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("p_id"), col("v").as("pv"))
      e.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("p_id"))
        .select(
          col("p_id"), col("vec_id").as("n_id"),
          round(expr("graft_cosine(pv, v)"), 6).as("sim"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("p_id").orderBy(col("sim").desc, col("n_id"))))
        .filter(col("rn") <= 5)
        .select(col("p_id"), col("n_id"), col("sim"), col("rn"))
        .orderBy("p_id", "rn")
    },
    Some("""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
      ), probes AS (
        SELECT vec_id AS p_id, v AS pv FROM e WHERE vec_id % 50 = 0
      ), sims AS (
        SELECT p_id, vec_id AS n_id,
          ROUND(list_sum(list_transform(list_zip(pv, v), z -> z[1] * z[2]))
            / (sqrt(list_sum(list_transform(pv, x -> x * x)))
               * sqrt(list_sum(list_transform(v, x -> x * x)))), 6) AS sim
        FROM probes, e WHERE vec_id != p_id
      )
      SELECT p_id, n_id, sim, rn
      FROM (SELECT *, row_number() OVER (PARTITION BY p_id
              ORDER BY sim DESC, n_id) AS rn FROM sims)
      WHERE rn <= 5 ORDER BY p_id, rn
    """.stripMargin.trim))

  /** Approximate NN via random-hyperplane bucketing
    * (BucketedRandomProjectionLSH, spark-mllib): candidates are generated
    * per hash bucket, so the pair space is bucket-local — the 100 TB
    * scale path where brute force is impossible. Fixed seed ⇒ the
    * hyperplanes, buckets, and result set are deterministic and
    * partition-invariant. No oracle (approximate); ANNRecallSuite gates
    * recall ≥ 0.8 against the brute-force baseline above.
    */
  val llmSimsearchLsh: Op = Op(
    "llm_simsearch_lsh",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
      val lsh = new BucketedRandomProjectionLSH()
        .setBucketLength(1.0).setNumHashTables(3).setSeed(42)
        .setInputCol("features").setOutputCol("hashes")
      val model = lsh.fit(e)
      val probes = e.filter(col("vec_id") % 50 === 0)
      model.approxSimilarityJoin(probes, e, 1.25, "dist")
        .select(
          col("datasetA.vec_id").as("p_id"),
          col("datasetB.vec_id").as("n_id"),
          round(col("dist"), 6).as("dist"))
        .filter(col("p_id") =!= col("n_id"))
        .orderBy("p_id", "n_id")
    },
    None)

  /** IVF (inverted-file) approximate NN — the OTHER classic ANN scale
    * path next to LSH: a k-means coarse quantizer (spark-mllib KMeans,
    * fixed seed) partitions the corpus into k cells; each probe
    * searches only its nprobe nearest cells, so the pair space is
    * nprobe/k of brute force and each cell is an independent bucket —
    * at 100 TB cells are the partition/bucket layout of the vector
    * lake. k=16, nprobe=6 here (uniform-random fixture vectors cluster
    * weakly, so a real-embedding deployment reaches the same recall
    * with a smaller nprobe/k ratio); recall vs exact top-5 is gated in
    * AnnRecallSuite alongside LSH. A production deployment fits the
    * quantizer ONCE offline and reuses it across queries; this op
    * refits per call only to stay self-contained — the fit dominates
    * its bench time.
    *
    * Determinism: seeded k-means on fixed data is deterministic at a
    * fixed partitioning (the driver's config), and the emitted row
    * count (probes × 5) is invariant to centroid jitter; distances are
    * exact within searched cells. No oracle (approximate by design).
    */
  val llmSimsearchIvf: Op = Op(
    "llm_simsearch_ivf",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.vector_to_array
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
      val model = new KMeans().setK(16).setSeed(42).setMaxIter(10)
        .setFeaturesCol("features").setPredictionCol("cell")
        .fit(e)
      val assigned = model.transform(e)
        .select(col("vec_id"), col("cell"), vector_to_array(col("features")).as("v"))
      // the 16 centroids are driver-side by construction (the coarse
      // quantizer IS tiny); broadcast them back as a 16-row dimension
      val cents = model.clusterCenters.toSeq.zipWithIndex
        .map { case (c, i) => (i, c.toArray) }
        .toDF("cell", "cvec")
      def sqdist(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, z) => acc + z)
      val probes = assigned.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("p_id"), col("v").as("pv"))
      val probeCells = probes.crossJoin(broadcast(cents))
        .withColumn("rn", row_number().over(
          Window.partitionBy("p_id").orderBy(sqdist(col("pv"), col("cvec")), col("cell"))))
        .filter(col("rn") <= 6) // nprobe
        .select(col("p_id"), col("pv"), col("cell"))
      probeCells.join(assigned, "cell")
        .filter(col("vec_id") =!= col("p_id"))
        .select(col("p_id"), col("vec_id").as("n_id"),
          round(sqrt(sqdist(col("pv"), col("v"))), 6).as("dist"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("p_id").orderBy(col("dist"), col("n_id"))))
        .filter(col("rn") <= 5)
        .select(col("p_id"), col("n_id"), col("dist"), col("rn"))
        .orderBy("p_id", "rn")
    },
    None)

  /** The multimodal row: text + vector + typed metadata joined into one
    * record (documents ⋈ embeddings on doc_id = vec_id). Inner join —
    * sf0.1 has 5000 docs vs 2000 vecs, so the contract is
    * intersection-tolerant. Nested struct output is exercised internally
    * (meta struct) and flattened for the oracle compare; both sides are
    * fact-sized at scale, so this is a shuffle equi-join on the id —
    * co-partitioning/bucketing both lakes on the id makes it shuffle-free.
    */
  val llmMultimodalJoin: Op = Op(
    "llm_multimodal_join",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      docs.join(emb, col("doc_id") === col("vec_id"))
        .withColumn("meta", struct(col("lang"), col("source"), col("label")))
        .select(
          col("doc_id"),
          col("meta.lang").as("lang"),
          col("meta.source").as("source"),
          col("meta.label").as("label"),
          col("n_chars"),
          size(toks).as("n_toks"),
          round(l2(dvec(col("embedding"))), 6).as("emb_l2"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, lang, source, label, n_chars,
        len(string_split(text, ' ')) AS n_toks,
        ROUND(sqrt(list_sum(list_transform(embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS emb_l2
      FROM documents JOIN embeddings ON doc_id = vec_id
      ORDER BY doc_id
    """.stripMargin.trim))

  val ops: Seq[Op] = Seq(
    llmQualityFilter, llmTextStats, llmTextTfidf, llmDedupExact,
    llmDedupNear, llmDedupSimhash, llmDedupEmbed, llmFingerprintWinnow,
    llmSimsearchTopk, llmSimsearchLsh, llmSimsearchIvf, llmMultimodalJoin)
}
