package graft.queries

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Text-analysis and deduplication operators over the `documents` table —
  * the training-data-pipeline surface (SURVEY.md §7.1.8). Oracle SQL is
  * generated from the same constants as the Spark expressions (stopword
  * lists, shingle k, thresholds) so the two can't drift.
  */
object TextQueries {

  import QueryDef.t

  /** DuckDB tokenization identical to TextAnalysis.tokens. */
  private[queries] val duckToks =
    "CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) " +
      "ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END"

  private def duckList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  private[queries] val langs = TextAnalysis.stopwords.keys.toSeq.sorted

  /** BM25 probe: one rare, discriminating term plus three common ones. */
  private val bm25Terms = Seq("dup", "spark", "window", "merge")

  /** Shared DuckDB CTE chain: word 3-shingles and all-pairs intersection/
    * union sizes over the deterministic doc subset (doc_id % 10 = 0) —
    * used by both the pair query (d3) and the clustering query (c1).
    */
  private val duckShPairs =
    """sub AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks FROM documents WHERE doc_id % 10 = 0),
      |sh AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[]) ELSE list_distinct(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) END AS s FROM sub),
      |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  len(list_intersect(a.s, b.s)) AS inter, len(list_distinct(list_concat(a.s, b.s))) AS uni
      |  FROM sh a, sh b WHERE a.doc_id < b.doc_id)""".stripMargin.replace("\n", " ")

  /** DuckDB stopword-hit count for one language. */
  private[queries] def duckHits(lang: String): String =
    s"len(list_filter(toks, t -> list_contains(${duckList(TextAnalysis.stopwords(lang))}, t)))"

  private[queries] val duckLangCase: String = {
    val best = s"greatest(${langs.map(l => s"h_$l").mkString(", ")})"
    val arms = langs.map(l => s"WHEN h_$l = $best THEN '$l'").mkString(" ")
    s"CASE WHEN $best = 0 THEN 'und' $arms ELSE 'und' END"
  }

  val all: Seq[QueryDef] = Seq(

    // Token counting: whitespace tokens + BPE-ish subword pieces.
    QueryDef("t1_token_stats",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextAnalysis.subwordCount(col("text")).cast("long").as("n_subwords"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |CAST(len($duckToks) AS BIGINT) AS n_tokens,
              |CAST(len(list_filter(CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) ELSE regexp_split_to_array(lower(trim(text)), '[^\\p{L}\\p{N}]+') END, p -> len(p) > 0)) AS BIGINT) AS n_subwords,
              |md5(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS fingerprint
              |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Language-ID heuristic: stopword-hit argmax, alphabetical tiebreak.
    QueryDef("t2_lang_id",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_id"))
        .orderBy("doc_id"),
      Some(s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |h AS (SELECT doc_id, ${langs.map(l => s"${duckHits(l)} AS h_$l").mkString(", ")} FROM tok)
              |SELECT doc_id, $duckLangCase AS lang_id FROM h ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Quality scoring: exact integer signals + 3-arm verdict.
    QueryDef("t3_quality",
      (s, dir) => {
        val base = t(s, dir, "documents")
        val sigs = TextAnalysis.qualitySignals(col("text"))
        base.select(
          (col("doc_id") +: sigs.map { case (n, c) => c.as(n) }) :+
            TextAnalysis.qualityVerdict(col("text")).as("verdict"): _*)
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, text, $duckToks AS toks FROM documents)
              |SELECT doc_id,
              |CAST(length(text) AS BIGINT) AS n_chars_calc,
              |CAST(len(toks) AS BIGINT) AS n_tokens,
              |CAST(CASE WHEN len(toks) > 0 THEN floor(length(regexp_replace(trim(text), '\\s+', '', 'g')) * 100 / len(toks)) ELSE 0 END AS BIGINT) AS mean_token_len_x100,
              |CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS punct_count,
              |CAST(${duckHits("en")} AS BIGINT) AS stopword_hits,
              |CASE WHEN len(toks) >= 20 AND ${duckHits("en")} >= 1 THEN 'PASS'
              | WHEN len(toks) >= 5 THEN 'WARN' ELSE 'FAIL' END AS verdict
              |FROM tok ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Exact dedup by raw text: groupBy+min, one partial-agg shuffle.
    QueryDef("d1_dedup_exact",
      (s, dir) => Dedup.exact(t(s, dir, "documents"), "text", "doc_id")
        .select("doc_id", "copies").orderBy("doc_id"),
      Some("SELECT min(doc_id) AS doc_id, count(*) AS copies FROM documents GROUP BY text ORDER BY doc_id")),

    // Exact dedup by normalized fingerprint (formatting-insensitive).
    QueryDef("d2_dedup_fingerprint",
      (s, dir) => Dedup.exactByFingerprint(t(s, dir, "documents"))
        .select("doc_id", "copies", "fp").orderBy("doc_id"),
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS copies, fp FROM
             |(SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS fp FROM documents)
             |GROUP BY fp ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Corpus term statistics: top-3 distinctive terms per doc by exact
    // integer (tf DESC, df ASC, term) ranking — the TF-IDF surface without
    // float-log cross-engine risk.
    QueryDef("t4_distinctive_terms",
      (s, dir) => TextAnalysis.distinctiveTerms(t(s, dir, "documents"), 3)
        .select("doc_id", "rn", "term", "tf", "df")
        .orderBy("doc_id", "rn"),
      Some(s"""WITH terms AS (SELECT doc_id, unnest($duckToks) AS term FROM documents),
              |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
              |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
              |ranked AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
              |  row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rn
              |  FROM tf JOIN df USING (term))
              |SELECT doc_id, rn, term, tf, df FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin.replace("\n", " "))),

    // Deterministic train/val/test split: membership is a pure function of
    // md5(id||salt) — reproducible across partitioning, engines, and runs
    // (DuckDB recomputes the identical assignment).
    QueryDef("samp1_deterministic_split",
      (s, dir) => graft.operators.Sampling.assignSplit(
        t(s, dir, "events").select("event_id"), "event_id", 80, 10)
        .orderBy("event_id"),
      Some("""SELECT event_id, CASE
             |WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
             |FROM (SELECT event_id, ('0x' || substr(md5(CAST(event_id AS VARCHAR) || 'graft'), 1, 8))::UBIGINT % 100 AS b FROM events)
             |ORDER BY event_id""".stripMargin.replace("\n", " "))),

    // Deterministic k-fold CV assignment: fold = md5(id||salt) mod k —
    // reproducible under any partitioning; the oracle recomputes the
    // identical assignment and the per-(source, fold) counts.
    QueryDef("samp7_kfold",
      (s, dir) => graft.operators.Sampling.kFold(
        t(s, dir, "documents").select("doc_id", "source"), "doc_id", k = 5)
        .groupBy(col("source"), col("fold").cast("long").as("fold"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("source", "fold"),
      Some("""SELECT source, CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8))::UBIGINT % 5 AS BIGINT) AS fold, count(*) AS cnt
             |FROM documents GROUP BY 1, 2 ORDER BY source, fold""".stripMargin.replace("\n", " "))),

    // Poisson-bootstrap uncertainty: 10 deterministic replicates of the
    // mean event value. Multiplicities are inverse-CDF Poisson(1) draws
    // on md5 hashes — map-only, no global n, no sort (the online
    // bootstrap); the oracle's CASE chain is GENERATED from the same CDF
    // doubles so the draw is bit-identical in both engines.
    QueryDef("samp8_bootstrap",
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select("event_id", "value")
        graft.operators.Sampling.bootstrapReplicates(ev, "event_id", reps = 10)
          .groupBy(col("replicate").cast("long").as("replicate"))
          .agg(sum(col("m")).cast("long").as("n_eff"),
            (sum(col("value").cast("decimal(18,2)") * col("m")).cast("double") /
              sum(col("m")).cast("double")).as("boot_mean"))
          .orderBy("replicate")
      },
      Some {
        val arms = graft.operators.Sampling.poissonCdf1.zipWithIndex
          .map { case (c, i) => s"WHEN u < $c THEN $i" }.mkString(" ")
        s"""WITH r AS (SELECT range AS rep FROM range(10)),
           |b AS (SELECT e.event_id, e.value, r.rep,
           |('0x' || substr(md5(CAST(e.event_id AS VARCHAR) || 'graft:boot' || CAST(r.rep AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0 AS u
           |FROM events e CROSS JOIN r WHERE e.value IS NOT NULL),
           |c AS (SELECT event_id, value, rep, CASE $arms ELSE 8 END AS m FROM b)
           |SELECT CAST(rep AS BIGINT) AS replicate, CAST(sum(m) AS BIGINT) AS n_eff,
           |CAST(sum(CAST(value AS DECIMAL(18,2)) * m) AS DOUBLE) / CAST(sum(m) AS DOUBLE) AS boot_mean
           |FROM c GROUP BY rep ORDER BY replicate""".stripMargin.replace("\n", " ")
      }),

    // Per-group cap: keep the n longest docs per source via the
    // bounded-heap top-k (map-side partial, no window sort).
    QueryDef("samp2_cap_per_group",
      (s, dir) => graft.operators.Sampling.capPerGroup(
        t(s, dir, "documents").select("doc_id", "source", "n_chars"),
        "source", col("n_chars"), "doc_id", n = 5)
        .select("source", "doc_id", "n_chars")
        .orderBy("source", "doc_id"),
      Some("""SELECT source, doc_id, n_chars FROM (
             |SELECT source, doc_id, n_chars,
             |row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
             |FROM documents) WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin.replace("\n", " "))),

    // Exact n-gram Jaccard near-dup pairs on a deterministic subset (the
    // verification metric; LSH below generates candidates at scale).
    QueryDef("d3_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(
        t(s, dir, "documents").filter(col("doc_id") % 10 === 0), k = 3, threshold = 0.02)
        .orderBy("a_id", "b_id"),
      Some(s"""WITH $duckShPairs
             |SELECT a_id, b_id, round(CASE WHEN uni = 0 THEN 0.0 ELSE CAST(inter AS DOUBLE) / uni END, 6) AS jaccard
             |FROM pairs WHERE (CASE WHEN uni = 0 THEN 0.0 ELSE CAST(inter AS DOUBLE) / uni END) >= 0.02
             |ORDER BY a_id, b_id""".stripMargin.replace("\n", " "))),

    // Prefix-filtered exact similarity join (PPJoin family): identical
    // output contract to d3 — every pair with shingle-Jaccard ≥ t — but
    // candidates come from a rarest-first prefix inverted index, never
    // an all-pairs product. Near-copies are planted (append one token)
    // so t = 0.5 has a non-trivial exact answer; the oracle is the
    // all-pairs formulation over the same planted relation, which the
    // prefix theorem says the operator must reproduce pair for pair.
    QueryDef("d11_ppjoin",
      (s, dir) => {
        val base = t(s, dir, "documents").filter(col("doc_id") % 10 === 0)
          .select("doc_id", "text")
        val copies = base.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" zz")).as("text"))
        Dedup.ppjoinPairs(base.unionByName(copies), k = 3, threshold = 0.5)
          .orderBy("a_id", "b_id")
      },
      Some("""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
             |pl AS (SELECT doc_id + 100000 AS doc_id, text || ' zz' AS text FROM base WHERE doc_id % 20 = 0),
             |ad AS (SELECT * FROM base UNION ALL SELECT * FROM pl),
             |sub AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks FROM ad),
             |sh AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[]) ELSE list_distinct(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) END AS s FROM sub),
             |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  len(list_intersect(a.s, b.s)) AS inter, len(list_distinct(list_concat(a.s, b.s))) AS uni
             |  FROM sh a, sh b WHERE a.doc_id < b.doc_id)
             |SELECT a_id, b_id, round(CAST(inter AS DOUBLE) / uni, 6) AS jaccard
             |FROM pairs WHERE uni > 0 AND CAST(inter AS DOUBLE) / uni >= 0.5
             |ORDER BY a_id, b_id""".stripMargin.replace("\n", " "))),

    // Dedup clustering: connected components over the exact-Jaccard pair
    // list — pairwise matches become clusters labeled by their smallest
    // member (the representative a dedup pass would keep). Oracle: DuckDB
    // recursive CTE computing the reachability closure's min label.
    QueryDef("c1_dedup_clusters",
      (s, dir) => {
        val sub = t(s, dir, "documents").filter(col("doc_id") % 10 === 0)
        val edges = Dedup.ngramJaccardPairs(sub, k = 3, threshold = 0.02)
          .select("a_id", "b_id")
        Dedup.connectedComponents(edges, sub.select("doc_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $duckShPairs,
             |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs WHERE uni > 0 AND CAST(inter AS DOUBLE) / uni >= 0.02
             |  UNION ALL SELECT b_id, a_id FROM pairs WHERE uni > 0 AND CAST(inter AS DOUBLE) / uni >= 0.02),
             |reach(id, r) AS (SELECT doc_id, doc_id FROM sub
             |  UNION SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst)
             |SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Soft dedup: every doc kept, downweighted by near-dup cluster size
    // (⌊10⁶/|cluster|⌋ micro-units — a cluster contributes ~one doc of
    // training mass). Composes c1's connected components with one
    // comp-keyed size agg + join; the oracle extends c1's recursive
    // closure with the same integer division.
    QueryDef("d12_soft_dedup",
      (s, dir) => {
        val sub = t(s, dir, "documents").filter(col("doc_id") % 10 === 0)
        val edges = Dedup.ngramJaccardPairs(sub, k = 3, threshold = 0.02)
          .select("a_id", "b_id")
        Dedup.softDedupWeights(edges, sub.select("doc_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $duckShPairs,
             |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs WHERE uni > 0 AND CAST(inter AS DOUBLE) / uni >= 0.02
             |  UNION ALL SELECT b_id, a_id FROM pairs WHERE uni > 0 AND CAST(inter AS DOUBLE) / uni >= 0.02),
             |reach(id, r) AS (SELECT doc_id, doc_id FROM sub
             |  UNION SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst),
             |comp AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id),
             |sz AS (SELECT comp, count(*) AS cluster_size FROM comp GROUP BY 1)
             |SELECT doc_id, comp, cluster_size, 1000000 // cluster_size AS weight_x1e6
             |FROM comp JOIN sz USING (comp) ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Duplicated-span removal (Lee et al. "deduplicate substrings"):
    // the transform face of t11 — tokens covered by any corpus-repeated
    // 4-gram are cut, survivors re-join. Exact integer positions; the
    // oracle replays the positional grams, occurrence counts, and the
    // index-lambda cut verbatim (DuckDB lambda indexes are 1-based,
    // Spark's 0-based — the j-1 below is that shift).
    QueryDef("c5_dup_span_removal",
      (s, dir) => TextAnalysis.removeDupSpans(
          t(s, dir, "documents"), k = 4)
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
             |g0 AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 3),
             |  i -> struct_pack(pos := i, g := array_to_string(toks[i+1:i+4], ' ')))) AS u
             |  FROM t WHERE len(toks) >= 4),
             |g AS (SELECT doc_id, u.pos AS pos, u.g AS gram FROM g0),
             |c AS (SELECT gram, count(*) AS occ FROM g GROUP BY 1),
             |dp AS (SELECT doc_id, list_sort(list(pos)) AS dup_pos
             |  FROM g JOIN c USING (gram) WHERE occ >= 2 GROUP BY 1),
             |o AS (SELECT t.doc_id, t.toks, COALESCE(dp.dup_pos, []) AS dup_pos
             |  FROM t LEFT JOIN dp ON t.doc_id = dp.doc_id),
             |cut AS (SELECT doc_id, toks,
             |  list_filter(toks, (x, j) -> NOT len(list_filter(dup_pos,
             |    p -> j - 1 >= p AND j - 1 <= p + 3)) > 0) AS kept FROM o)
             |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             |CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
             |COALESCE(array_to_string(kept, ' '), '') AS clean_text
             |FROM cut ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Leakage-safe split: train/val/test assignment keyed on the
    // near-dup CLUSTER representative (c1's connected components), so a
    // doc and its near-copy can never straddle train and test. Oracle:
    // c1's recursive-CTE closure + the samp1 md5 bucket, applied to the
    // component label instead of the doc id.
    QueryDef("split1_leakage_safe",
      (s, dir) => {
        val sub = t(s, dir, "documents").filter(col("doc_id") % 10 === 0)
        val edges = Dedup.ngramJaccardPairs(sub, k = 3, threshold = 0.02)
          .select("a_id", "b_id")
        graft.operators.Sampling.leakageSafeSplit(
          sub.select("doc_id"), "doc_id", edges, trainPct = 80, valPct = 10)
          .select("doc_id", "comp", "split")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $duckShPairs,
             |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs WHERE uni > 0 AND CAST(inter AS DOUBLE) / uni >= 0.02
             |  UNION ALL SELECT b_id, a_id FROM pairs WHERE uni > 0 AND CAST(inter AS DOUBLE) / uni >= 0.02),
             |reach(id, r) AS (SELECT doc_id, doc_id FROM sub
             |  UNION SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst),
             |comp AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id),
             |bk AS (SELECT doc_id, comp,
             |  ('0x' || substr(md5(CAST(comp AS VARCHAR) || 'graft'), 1, 8))::UBIGINT % 100 AS b FROM comp)
             |SELECT doc_id, comp,
             |CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
             |FROM bk ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Repetition statistics: exact integer boilerplate/spam signals
    // (token count, distinct tokens, highest single-token frequency).
    QueryDef("t5_repetition",
      (s, dir) => TextAnalysis.repetitionStats(t(s, dir, "documents"))
        .orderBy("doc_id"),
      Some(s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
             |trm AS (SELECT doc_id, unnest(toks) AS term FROM tok),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM trm GROUP BY doc_id, term),
             |agg AS (SELECT doc_id, sum(tf) AS n_tokens, count(*) AS n_distinct, max(tf) AS top_tf FROM tf GROUP BY doc_id)
             |SELECT d.doc_id, CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
             |CAST(coalesce(agg.n_distinct, 0) AS BIGINT) AS n_distinct,
             |CAST(coalesce(agg.top_tf, 0) AS BIGINT) AS top_tf
             |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin.replace("\n", " "))),

    // Curriculum ordering: docs bucketed into length deciles (easy →
    // hard proxy) with deterministic within-bucket positions — the
    // curriculum-learning schedule. Boundaries from ONE percentile
    // aggregate (a6 bit-parity), positions from the distributed
    // prefix-sum; oracle = quantile boundaries + row_number window
    // over the identical md5 walk.
    QueryDef("cur1_curriculum",
      (s, dir) => graft.operators.Curation.curriculumOrder(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", buckets = 10)
        .select("doc_id", "n_chars", "bucket", "pos_in_bucket")
        .orderBy("doc_id"),
      Some {
        val cmp = (1 to 9).map(i => s"CAST(n_chars > qs[$i] AS BIGINT)").mkString(" + ")
        s"""WITH q AS (SELECT quantile_cont(n_chars, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs FROM documents),
           |b AS (SELECT doc_id, n_chars, 1 + $cmp AS bucket,
           |('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8))::UBIGINT AS k
           |FROM documents, q),
           |r AS (SELECT doc_id, n_chars, bucket,
           |row_number() OVER (PARTITION BY bucket ORDER BY k, doc_id) - 1 AS pos_in_bucket FROM b)
           |SELECT doc_id, n_chars, CAST(bucket AS BIGINT) AS bucket,
           |CAST(pos_in_bucket AS BIGINT) AS pos_in_bucket
           |FROM r ORDER BY doc_id""".stripMargin.replace("\n", " ")
      }),

    // Length-bucketed inference batching: fixed-size batches within
    // length buckets (padding waste bounded by the bucket width), with
    // per-bucket positions from the distributed prefix-sum — never one
    // window per bucket. Oracle: a row_number window over the identical
    // md5 walk.
    QueryDef("pack2_inference_batches",
      (s, dir) => graft.operators.Packing.inferenceBatches(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", bucketWidth = 100, batchSize = 8)
        .select("doc_id", "len_bucket", "batch_id", "pos_in_batch")
        .orderBy("doc_id"),
      Some("""WITH h AS (SELECT doc_id, n_chars // 100 AS len_bucket,
             |('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8))::UBIGINT AS k FROM documents),
             |r AS (SELECT doc_id, len_bucket,
             |row_number() OVER (PARTITION BY len_bucket ORDER BY k, doc_id) - 1 AS p FROM h)
             |SELECT doc_id, CAST(len_bucket AS BIGINT) AS len_bucket,
             |CAST(p // 8 AS BIGINT) AS batch_id, CAST(p % 8 AS BIGINT) AS pos_in_batch
             |FROM r ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Padding-waste audit for the inference batches: per batch, padded
    // cost = max length × batch rows, waste = padded − real — the
    // number that justifies (or indicts) the bucketing choice. Exact
    // integers over pack2's identical walk.
    QueryDef("pack3_padding_waste",
      (s, dir) => graft.operators.Packing.inferenceBatches(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", bucketWidth = 100, batchSize = 8)
        .groupBy("len_bucket", "batch_id")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_chars")).as("real_cost"),
          (max(col("n_chars")) * count(lit(1))).as("padded_cost"))
        .withColumn("waste", col("padded_cost") - col("real_cost"))
        .orderBy("len_bucket", "batch_id"),
      Some("""WITH h AS (SELECT doc_id, n_chars, n_chars // 100 AS len_bucket,
             |('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8))::UBIGINT AS k FROM documents),
             |r AS (SELECT doc_id, n_chars, len_bucket,
             |(row_number() OVER (PARTITION BY len_bucket ORDER BY k, doc_id) - 1) // 8 AS batch_id FROM h)
             |SELECT CAST(len_bucket AS BIGINT) AS len_bucket, CAST(batch_id AS BIGINT) AS batch_id,
             |count(*) AS n_rows, CAST(sum(n_chars) AS BIGINT) AS real_cost,
             |CAST(max(n_chars) * count(*) AS BIGINT) AS padded_cost,
             |CAST(max(n_chars) * count(*) - sum(n_chars) AS BIGINT) AS waste
             |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "))),

    // Cross-source contamination matrix: distinct-shingle overlap and
    // fixed-point Jaccard per source pair — the "is src3 a renamed
    // crawl of src7" diagnostic. Shingle-keyed join, never an all-docs
    // cross product; integer Jaccard so the matrix is engine-exact.
    QueryDef("c4_source_overlap",
      (s, dir) => TextAnalysis.sourceOverlap(
        t(s, dir, "documents").filter(col("doc_id") % 5 === 0), k = 3)
        .orderBy("src_a", "src_b"),
      Some("""WITH tok AS (SELECT source, CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks FROM documents WHERE doc_id % 5 = 0),
             |sh AS (SELECT DISTINCT source, unnest(CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[]) ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS s FROM tok),
             |cnt AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
             |inter AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
             |FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source GROUP BY 1, 2)
             |SELECT src_a, src_b, n_shared,
             |CAST(n_shared * 1000000 // (ca.n + cb.n - n_shared) AS BIGINT) AS jaccard_x1e6
             |FROM inter JOIN cnt ca ON src_a = ca.source JOIN cnt cb ON src_b = cb.source
             |ORDER BY src_a, src_b""".stripMargin.replace("\n", " "))),

    // END-TO-END curation funnel with a hash-exact oracle: language
    // keep → entropy band-pass → exact-dedup first occurrence, each
    // stage's surviving count in one row. The stages reuse t2/t12/d2's
    // proven machinery, and the oracle chains their SQL fragments — so
    // the COMPOSITION is oracle-verified, not just each stage alone
    // (CurationSpec covers the richer pipeline; this pins a
    // SQL-expressible slice of it cross-engine).
    QueryDef("cur2_funnel",
      (s, dir) => {
        // ONE pass over the text instead of one per funnel stage: the
        // stage predicates become per-doc FLAGS (langId evaluated once,
        // entropy only for the surviving language slice, fingerprint
        // only for entropy survivors), and all four funnel counts fold
        // into a single aggregate — count / conditional sums / distinct
        // fingerprints. Same counts as the stage-by-stage formulation
        // (the oracle still states that one); measured −60% at sf0.1,
        // and at 100 TB it is the difference between one corpus scan
        // and four.
        val base = t(s, dir, "documents")
        val flagged = base.select(col("doc_id"), col("text"),
          (TextAnalysis.langId(col("text")) === "en").as("is_en"))
        val entIds = TextAnalysis.tokenEntropyScaled(flagged.filter(col("is_en")))
          .filter(col("h_x1e9") >= 4200000000L)
          .select(col("doc_id"), lit(true).as("is_ent"))
        flagged.join(entIds, Seq("doc_id"), "left")
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("is_en"), 1L).otherwise(0L)).as("n_lang"),
            sum(when(col("is_ent"), 1L).otherwise(0L)).as("n_entropy"),
            countDistinct(when(col("is_ent"),
              TextAnalysis.fingerprint(col("text")))).as("n_dedup"))
      },
      Some {
        val llist = TextAnalysis.log2Table(256).mkString("[", ", ", "]")
        s"""WITH lt AS (SELECT $llist AS l),
           |tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
           |h AS (SELECT doc_id, ${langs.map(l => s"${duckHits(l)} AS h_$l").mkString(", ")} FROM tok),
           |lang AS (SELECT doc_id FROM h WHERE $duckLangCase = 'en'),
           |trm AS (SELECT doc_id, unnest(toks) AS t FROM tok),
           |tf AS (SELECT doc_id, count(*) AS c FROM trm GROUP BY doc_id, t),
           |ag AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
           |CAST(sum(c * l[c + 1]) AS BIGINT) AS s FROM tf CROSS JOIN lt GROUP BY doc_id),
           |ent AS (SELECT lang.doc_id FROM lang LEFT JOIN ag USING (doc_id) CROSS JOIN lt
           |WHERE CASE WHEN ag.n IS NULL OR ag.n = 0 THEN 0 ELSE lt.l[ag.n + 1] - ag.s // ag.n END >= 4200000000),
           |ded AS (SELECT min(d.doc_id) AS keep FROM documents d JOIN ent USING (doc_id)
           |GROUP BY md5(regexp_replace(lower(d.text), '[^a-z0-9]+', ' ', 'g')))
           |SELECT (SELECT count(*) FROM documents) AS n_total,
           |(SELECT count(*) FROM lang) AS n_lang,
           |(SELECT count(*) FROM ent) AS n_entropy,
           |(SELECT count(*) FROM ded) AS n_dedup""".stripMargin.replace("\n", " ")
      }),

    // Language-ID confidence margin: winner's stopword hits minus the
    // runner-up's — the mixed-language / low-signal gate the bare
    // argmax (t2) can't express. Exact integers; the oracle sorts the
    // per-language hit list and takes the top two.
    QueryDef("t13_langid_margin",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.langIdConfidence(col("text")).as("c"))
        .select(col("doc_id"), col("c.lang_id").as("lang_id"),
          col("c.best").as("best"), col("c.second").as("second"),
          col("c.margin").as("margin"))
        .orderBy("doc_id"),
      Some {
        val hs = langs.map(l => s"h_$l").mkString("[", ", ", "]")
        val n = langs.size
        s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
           |h AS (SELECT doc_id, ${langs.map(l => s"${duckHits(l)} AS h_$l").mkString(", ")} FROM tok)
           |SELECT doc_id, $duckLangCase AS lang_id,
           |CAST(list_sort($hs)[$n] AS BIGINT) AS best,
           |CAST(list_sort($hs)[${n - 1}] AS BIGINT) AS second,
           |CAST(list_sort($hs)[$n] - list_sort($hs)[${n - 1}] AS BIGINT) AS margin
           |FROM h ORDER BY doc_id""".stripMargin.replace("\n", " ")
      }),

    // Per-doc token Shannon entropy, exact fixed-point: the shared
    // log2 lookup table is generated once in Scala and interpolated
    // into BOTH sides as literals — neither engine computes a log at
    // query time, so the entropy is integer-exact (H = log n −
    // (1/n)Σ c·log c over token counts). Low entropy flags
    // repetitive/boilerplate docs.
    QueryDef("t12_token_entropy",
      (s, dir) => TextAnalysis.tokenEntropyScaled(
        t(s, dir, "documents"), maxN = 256)
        .orderBy("doc_id"),
      Some {
        val llist = TextAnalysis.log2Table(256).mkString("[", ", ", "]")
        s"""WITH lt AS (SELECT $llist AS l),
           |tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
           |trm AS (SELECT doc_id, unnest(toks) AS t FROM tok),
           |tf AS (SELECT doc_id, count(*) AS c FROM trm GROUP BY doc_id, t),
           |ag AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
           |CAST(sum(c * l[c + 1]) AS BIGINT) AS s FROM tf CROSS JOIN lt GROUP BY doc_id)
           |SELECT d.doc_id, CAST(coalesce(ag.n, 0) AS BIGINT) AS n_tok,
           |CAST(CASE WHEN ag.n IS NULL OR ag.n = 0 THEN 0 ELSE lt.l[ag.n + 1] - ag.s // ag.n END AS BIGINT) AS h_x1e9
           |FROM documents d LEFT JOIN ag USING (doc_id) CROSS JOIN lt
           |ORDER BY d.doc_id""".stripMargin.replace("\n", " ")
      }),

    // PII scrubbing: emails / IPv4s / phone-shaped digit runs redacted
    // with typed placeholders. PII is planted deterministically on both
    // sides (the corpus itself is synthetic and clean), then scrubbed with
    // the same regex family; outputs must match byte-for-byte.
    QueryDef("f8_pii_scrub",
      (s, dir) => {
        val planted = t(s, dir, "documents").withColumn("ptext",
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com from 10.0.0."), (col("doc_id") % 255).cast("string"),
              lit(" tel +1 555 000 1234")))
            .otherwise(col("text")))
        planted.select(col("doc_id"),
          TextAnalysis.scrubPii(col("ptext")).as("scrubbed"))
          .orderBy("doc_id")
      },
      Some(s"""WITH planted AS (SELECT doc_id,
             |CASE WHEN doc_id % 5 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.0.' || CAST(doc_id % 255 AS VARCHAR) || ' tel +1 555 000 1234' ELSE text END AS ptext
             |FROM documents)
             |SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(ptext,
             |'${TextAnalysis.piiEmailRe}', '<EMAIL>', 'g'),
             |'${TextAnalysis.piiIpRe}', '<IP>', 'g'),
             |'${TextAnalysis.piiPhoneRe}', '<PHONE>', 'g') AS scrubbed
             |FROM planted ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Stratified deterministic sampling: per-source keep rates (the
    // training-mixture operation), membership a pure function of
    // (doc_id, salt) on both engines.
    QueryDef("samp4_stratified",
      (s, dir) => graft.operators.Sampling.stratifiedSample(
        t(s, dir, "documents").select("doc_id", "source"), "source", "doc_id",
        Map("src0" -> 100, "src1" -> 50, "src2" -> 10), defaultPct = 25)
        .select("doc_id", "source")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM (
             |SELECT doc_id, source,
             |('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8))::UBIGINT % 100 AS b,
             |CASE source WHEN 'src2' THEN 10 WHEN 'src1' THEN 50 WHEN 'src0' THEN 100 ELSE 25 END AS pct
             |FROM documents) WHERE b < pct ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Deterministic per-group reservoir: the n rows with the smallest
    // md5(id||salt) per group — uniform-without-replacement in
    // distribution, reproducible under any partitioning or engine.
    QueryDef("samp3_reservoir",
      (s, dir) => graft.operators.Sampling.reservoirPerGroup(
        t(s, dir, "documents").select("doc_id", "source"), "source", "doc_id", n = 3)
        .select("source", "doc_id")
        .orderBy("source", "doc_id"),
      Some("""SELECT source, doc_id FROM (
             |SELECT source, doc_id,
             |row_number() OVER (PARTITION BY source ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8))::UBIGINT, doc_id) AS rn
             |FROM documents) WHERE rn <= 3 ORDER BY source, doc_id""".stripMargin.replace("\n", " "))),

    // Deterministic weighted reservoir (A-ES): per source, the 5 docs with
    // the largest u^(1/n_chars) — inclusion probability ∝ length, chosen
    // by the bounded-heap top-k, reproducible under any partitioning.
    QueryDef("samp5_weighted_reservoir",
      (s, dir) => graft.operators.Sampling.weightedReservoirPerGroup(
        t(s, dir, "documents").select("doc_id", "source", "n_chars"),
        "source", "doc_id", col("n_chars"), n = 5)
        .select("source", "doc_id")
        .orderBy("source", "doc_id"),
      Some("""SELECT source, doc_id FROM (
             |SELECT source, doc_id,
             |row_number() OVER (PARTITION BY source ORDER BY pow((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8))::UBIGINT + 1) / 4294967296.0, 1.0 / n_chars) DESC, doc_id) AS rn
             |FROM documents) WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin.replace("\n", " "))),

    // Passage-level exact dedup: corpus-wide first occurrence of every
    // 25-word passage survives; documents reassembled from survivors.
    QueryDef("c2_passage_dedup",
      (s, dir) => Dedup.passageDedup(
        t(s, dir, "documents").select("doc_id", "text"), words = 25)
        .orderBy("doc_id"),
      Some(s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |ti AS (SELECT doc_id, u.w AS w, u.i AS i FROM tok, unnest(list_transform(toks, (x, j) -> struct_pack(w := x, i := j - 1))) AS t(u)),
              |ch AS (SELECT doc_id, i // 25 AS p_idx, string_agg(w, ' ' ORDER BY i) AS passage FROM ti GROUP BY doc_id, i // 25),
              |rn AS (SELECT doc_id, p_idx, passage, row_number() OVER (PARTITION BY passage ORDER BY doc_id, p_idx) AS rn FROM ch),
              |keptagg AS (SELECT doc_id, count(*) AS n_kept, string_agg(passage, ' ' ORDER BY p_idx) AS clean_text FROM rn WHERE rn = 1 GROUP BY doc_id),
              |perdoc AS (SELECT doc_id, count(*) AS n_passages FROM ch GROUP BY doc_id)
              |SELECT d.doc_id, coalesce(p.n_passages, 0) AS n_passages, coalesce(k.n_kept, 0) AS n_kept, coalesce(k.clean_text, '') AS clean_text
              |FROM documents d LEFT JOIN perdoc p USING (doc_id) LEFT JOIN keptagg k USING (doc_id) ORDER BY d.doc_id""".stripMargin.replace("\n", " "))),

    // Benchmark decontamination: training docs sharing any word 8-gram
    // with the (broadcast) benchmark subset, with shared-shingle counts.
    QueryDef("d8_decontaminate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.contaminationReport(
          docs.filter(col("doc_id") % 17 =!= 3),
          docs.filter(col("doc_id") % 17 === 3), k = 8)
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |sh8 AS (SELECT doc_id, CASE WHEN len(toks) < 8 THEN CAST([] AS VARCHAR[]) ELSE list_distinct(list_transform(range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' '))) END AS s FROM tok),
              |tsh AS (SELECT doc_id, unnest(s) AS sh FROM sh8 WHERE doc_id % 17 <> 3),
              |bsh AS (SELECT DISTINCT unnest(s) AS sh FROM sh8 WHERE doc_id % 17 = 3)
              |SELECT t.doc_id, count(*) AS n_shared FROM tsh t JOIN bsh b USING (sh)
              |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin.replace("\n", " "))),

    // Incremental batch-vs-corpus dedup (daily-crawl shape): of the
    // doc_id % 5 = 0 batch, survivors are first-in-batch by fingerprint
    // AND novel against the rest of the corpus; each increment is
    // O(batch) + one fp-keyed anti-join, never a corpus rewrite.
    QueryDef("d10_incremental_dedup",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.incrementalNew(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0))
          .select("doc_id", "source").orderBy("doc_id")
      },
      Some("""WITH fps AS (SELECT doc_id, source, md5(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS fp FROM documents),
             |b AS (SELECT doc_id, source, fp FROM fps WHERE doc_id % 5 = 0),
             |f AS (SELECT fp, min(doc_id) AS doc_id FROM b GROUP BY fp)
             |SELECT b.doc_id, b.source FROM b JOIN f ON b.fp = f.fp AND b.doc_id = f.doc_id
             |WHERE b.fp NOT IN (SELECT fp FROM fps WHERE doc_id % 5 <> 0)
             |ORDER BY b.doc_id""".stripMargin.replace("\n", " "))),

    // Overlapping token chunking (RAG / context-window prep): width-40
    // chunks every 25 tokens; a chunk fully inside its predecessor is
    // never emitted. Map-only — the chunker streams at scan speed.
    QueryDef("c3_chunk_overlap",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          posexplode(TextAnalysis.tokenChunks(col("text"), width = 40, stride = 25)))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
          least(lit(40L), col("n_tokens") - col("pos").cast("long") * 25L).as("n_chunk_tokens"),
          col("col").as("chunk"))
        .orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |nc AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
              |CASE WHEN len(toks) = 0 THEN 0 WHEN len(toks) <= 40 THEN 1
              |ELSE CAST(ceil((len(toks) - 40) / CAST(25 AS DOUBLE)) AS BIGINT) + 1 END AS k FROM tok)
              |SELECT doc_id, CAST(u AS BIGINT) AS chunk_idx,
              |least(CAST(40 AS BIGINT), n - u*25) AS n_chunk_tokens,
              |array_to_string(toks[u*25+1 : u*25+40], ' ') AS chunk
              |FROM nc, unnest(range(0, k)) AS t(u)
              |ORDER BY doc_id, chunk_idx""".stripMargin.replace("\n", " "))),

    // Vocabulary-coverage / OOV-rate quality signal: occurrences inside
    // the corpus's top-50 vocabulary (broadcast) per document — exact
    // integers; the oracle rebuilds the same vocabulary.
    QueryDef("t7_vocab_coverage",
      (s, dir) => TextAnalysis.vocabCoverage(t(s, dir, "documents"), topK = 50)
        .orderBy("doc_id"),
      Some(s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |tf AS (SELECT doc_id, u AS term, CAST(count(*) AS BIGINT) AS tf FROM tok, unnest(toks) AS t(u) GROUP BY 1, 2),
              |cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
              |vocab AS (SELECT term FROM (SELECT term, row_number() OVER (ORDER BY cf DESC, term) AS rn FROM cf) WHERE rn <= 50),
              |hits AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_in_vocab FROM tf JOIN vocab USING (term) GROUP BY 1)
              |SELECT k.doc_id, CAST(len(k.toks) AS BIGINT) AS n_tokens,
              |CAST(coalesce(h.n_in_vocab, 0) AS BIGINT) AS n_in_vocab,
              |CAST(len(k.toks) - coalesce(h.n_in_vocab, 0) AS BIGINT) AS n_oov
              |FROM tok k LEFT JOIN hits h USING (doc_id) ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Deterministic source-mixture sampling: target proportions 0.5 /
    // 0.3 / 0.2 over three sources; the binding source keeps every row,
    // the others thin to match; membership is md5(id)-deterministic and
    // the scan is map-only (rates ride as literals). The oracle
    // recomputes the identical rates in SQL.
    QueryDef("samp6_source_mixture",
      (s, dir) => graft.operators.Sampling.mixtureSample(
        t(s, dir, "documents"), "source", "doc_id",
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .select("doc_id", "source").orderBy("doc_id"),
      Some("""WITH cnt AS (SELECT source, CAST(count(*) AS DOUBLE) AS n,
             |CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3 ELSE 0.2 END AS w
             |FROM documents WHERE source IN ('src0','src1','src2') GROUP BY source),
             |rt AS (SELECT source, w * (SELECT min(n / w) FROM cnt) / n AS rate FROM cnt)
             |SELECT d.doc_id, d.source FROM documents d JOIN rt USING (source)
             |WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8))::UBIGINT) / 4294967296.0 < rate
             |ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // BM25 ranked retrieval (Lucene "+1" idf): the lexical-search
    // workhorse — decontamination probes, targeted corpus queries, hard
    // negatives next to embedding kNN. Map-only per-term tf (no explode,
    // no inverted index), ONE broadcast stats row, TakeOrderedAndProject
    // top-k. The oracle replays the identical fixed-association float
    // expression — every constant below is interpolated from the SAME
    // Scala doubles the operator uses, and both sides round to 6
    // decimals before ranking with doc_id as the tiebreak.
    QueryDef("ret1_bm25_topk",
      (s, dir) => graft.operators.Retrieval.bm25TopK(
        t(s, dir, "documents"), "doc_id", "text",
        bm25Terms, k1 = 1.2, b = 0.75, topK = 20),
      Some {
        val (k1, b) = (1.2, 0.75)
        val tfs = bm25Terms.indices.map(i =>
          s"CAST(len(list_filter(toks, x -> x = '${bm25Terms(i)}')) AS DOUBLE) AS tf$i").mkString(", ")
        val dfs = bm25Terms.indices.map(i =>
          s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i").mkString(", ")
        val score = bm25Terms.indices.map(i =>
          s"ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * " +
            s"(tf$i * ${k1 + 1.0} / (tf$i + $k1 * (${1.0 - b} + $b * dl / avgdl)))")
          .mkString(" + ")
        s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
           |base AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, $tfs FROM tok),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) / count(*) AS avgdl, $dfs FROM base)
           |SELECT doc_id, round($score, 6) AS score FROM base CROSS JOIN st
           |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin.replace("\n", " ")
      }),

    // Per-domain cost-budget selection: walk each source's docs in
    // deterministic hash order and keep a prefix whose cumulative size
    // stays within the budget — "give me ~3000 chars per domain", the
    // data-mixing primitive a fixed rate can't express under domain
    // skew. Distributed prefix-sum (no single window per domain); the
    // oracle is one SQL running-sum window over the identical md5 walk.
    QueryDef("samp9_token_budget",
      (s, dir) => graft.operators.Sampling.budgetPerGroup(
        t(s, dir, "documents").select("doc_id", "source", "n_chars"),
        "source", "doc_id", "n_chars", budget = 3000L)
        .select("doc_id", "source", "n_chars", "budget_run")
        .orderBy("source", "doc_id"),
      Some("""WITH h AS (SELECT doc_id, source, n_chars,
             |('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8))::UBIGINT AS k FROM documents),
             |r AS (SELECT doc_id, source, n_chars,
             |CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY k, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS budget_run FROM h)
             |SELECT doc_id, source, n_chars, budget_run FROM r
             |WHERE budget_run <= 3000 ORDER BY source, doc_id""".stripMargin.replace("\n", " "))),

    // Bloom-filter decontamination — the scale path for benchmark sets
    // too large to broadcast exactly: the filter is tree-aggregated over
    // the benchmark shingles, then the training scan is a map-only
    // per-row bit probe (no join). The exact kept set is not what the
    // Bloom path computes (an ~fpp fraction of clean docs is dropped),
    // but the NO-FALSE-NEGATIVE guarantee IS SQL-expressible: every doc
    // the exact path (d8) calls contaminated must be dropped by the
    // Bloom path too. The query emits that containment check alongside
    // the exact-kept count the oracle recomputes independently.
    QueryDef("d9_decontaminate_bloom",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val train = docs.filter(col("doc_id") % 17 =!= 3)
        val bench = docs.filter(col("doc_id") % 17 === 3)
        val bloomKept = Dedup.decontaminateBloom(train, bench, k = 8, fpp = 0.001)
          .select(col("doc_id"), lit(1).as("in_bloom"))
        val contam = Dedup.contaminationReport(train, bench, k = 8)
          .select(col("doc_id"), lit(1).as("is_contam"))
        train.select("doc_id")
          .join(contam, Seq("doc_id"), "left")
          .join(bloomKept, Seq("doc_id"), "left")
          .agg(
            count(lit(1)).as("n_train"),
            sum(when(col("is_contam").isNull, 1L).otherwise(0L)).as("n_exact_kept"),
            sum(when(col("is_contam").isNotNull && col("in_bloom").isNotNull, 1L)
              .otherwise(0L)).as("missed_contaminated"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |sh8 AS (SELECT doc_id, CASE WHEN len(toks) < 8 THEN CAST([] AS VARCHAR[]) ELSE list_distinct(list_transform(range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' '))) END AS s FROM tok),
              |tsh AS (SELECT doc_id, unnest(s) AS sh FROM sh8 WHERE doc_id % 17 <> 3),
              |bsh AS (SELECT DISTINCT unnest(s) AS sh FROM sh8 WHERE doc_id % 17 = 3),
              |contam AS (SELECT DISTINCT t.doc_id FROM tsh t JOIN bsh b USING (sh))
              |SELECT CAST((SELECT count(*) FROM documents WHERE doc_id % 17 <> 3) AS BIGINT) AS n_train,
              |CAST((SELECT count(*) FROM documents WHERE doc_id % 17 <> 3) - (SELECT count(*) FROM contam) AS BIGINT) AS n_exact_kept,
              |CAST(0 AS BIGINT) AS missed_contaminated""".stripMargin.replace("\n", " "))),

    // Sequence packing: docs → fixed-token-budget training sequences via
    // distributed prefix-sum (quantile range groups, never a global
    // window). The oracle recomputes the assignment with a SQL window.
    QueryDef("pack1_sequence_pack",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"),
          graft.operators.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
        val packed = graft.operators.Packing.packByOffset(
          docs, "n_tok", "doc_id", budget = 2000, numPartitions = 8)
        graft.operators.Packing.packSummary(packed, "n_tok").orderBy("pack_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, CAST(len($duckToks) AS BIGINT) AS n_tok FROM documents),
              |off AS (SELECT n_tok, sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS s FROM toks)
              |SELECT CAST(floor(s / 2000) AS BIGINT) AS pack_id, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
              |FROM off GROUP BY 1 ORDER BY pack_id""".stripMargin.replace("\n", " "))),

    // Broadcast linear quality model: fixed-point integer score over the
    // quality signals, thresholded to a keep decision — learned-filter
    // inference as a map-only scan; the oracle recomputes the same
    // integer dot product.
    QueryDef("t6_quality_model",
      (s, dir) => {
        val w = Map("n_tokens" -> 2L, "punct_count" -> -3L, "stopword_hits" -> 50L)
        t(s, dir, "documents").select(col("doc_id"),
            TextAnalysis.qualityModelScore(col("text"), w, bias = -100L).as("score"))
          .withColumn("kept", when(col("score") >= 0, 1L).otherwise(0L))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, text, $duckToks AS toks FROM documents),
              |sc AS (SELECT doc_id, CAST(-100 + 2*len(toks) - 3*(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) + 50*(${duckHits("en")}) AS BIGINT) AS score FROM tok)
              |SELECT doc_id, score, CAST(CASE WHEN score >= 0 THEN 1 ELSE 0 END AS BIGINT) AS kept FROM sc ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Corpus bigram LM predictability (the CCNet/KenLM perplexity-filter
    // shape): conditional bigram probabilities from corpus-trained
    // counts, fixed-point ×1e6 integer mean per doc — exact across
    // engines; the float cross-entropy twin column stays spec-only (ln
    // is libm-dependent).
    QueryDef("t8_bigram_lm",
      (s, dir) => TextAnalysis.bigramLm(t(s, dir, "documents"))
        .select("doc_id", "n_bigrams", "mean_prob_x1e6")
        .orderBy("doc_id"),
      Some(s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS b FROM tok WHERE len(toks) >= 2),
              |bgw AS (SELECT doc_id, b, split_part(b, ' ', 1) AS w1 FROM bg),
              |uni AS (SELECT u AS w1, CAST(count(*) AS BIGINT) AS c1 FROM tok, unnest(toks) AS t(u) GROUP BY 1),
              |c2 AS (SELECT b, CAST(count(*) AS BIGINT) AS c2 FROM bgw GROUP BY 1),
              |sc AS (SELECT doc_id, (1000000 * c2.c2) // uni.c1 AS p FROM bgw JOIN c2 USING (b) JOIN uni USING (w1)),
              |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, CAST(CAST(sum(p) AS BIGINT) // count(*) AS BIGINT) AS mean_prob_x1e6 FROM sc GROUP BY 1)
              |SELECT t.doc_id, CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams, a.mean_prob_x1e6
              |FROM tok t LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // PMI collocations: top-20 bigrams by pointwise lift
    // c_ab·T·1e6 div (c_a·c_b) — the phrase-mining pass before
    // tokenizer training. Exact integer end to end (products in
    // DECIMAL(38,0) / HUGEINT — the same 127-bit class — so the
    // ranking is engine-exact; no log anywhere); minCount prunes the
    // hapax tail before any join; distributed TakeOrderedAndProject
    // top-k, never a global sort. (lift, bigram) is a total order
    // because the bigram string is unique per row.
    QueryDef("t17_collocations",
      (s, dir) => TextAnalysis.collocations(t(s, dir, "documents"))
        .orderBy(col("lift_x1e6").desc, col("bigram")),
      Some(s"""WITH tok AS (SELECT $duckToks AS toks FROM documents),
              |uni AS (SELECT u AS w, CAST(count(*) AS BIGINT) AS c FROM tok, unnest(toks) AS t(u) GROUP BY 1),
              |tot AS (SELECT CAST(sum(c) AS BIGINT) AS T FROM uni),
              |bgc AS (SELECT b, CAST(count(*) AS BIGINT) AS c_ab FROM (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS b FROM tok WHERE len(toks) >= 2) GROUP BY 1 HAVING count(*) >= 5),
              |j AS (SELECT b, c_ab, u1.c AS c_a, u2.c AS c_b FROM bgc JOIN uni u1 ON split_part(b, ' ', 1) = u1.w JOIN uni u2 ON split_part(b, ' ', 2) = u2.w)
              |SELECT b AS bigram, c_ab, CAST(CAST(c_ab AS HUGEINT) * T * 1000000 // (CAST(c_a AS HUGEINT) * c_b) AS BIGINT) AS lift_x1e6
              |FROM j CROSS JOIN tot ORDER BY lift_x1e6 DESC, bigram LIMIT 20""".stripMargin.replace("\n", " "))),

    // BPE tokenizer training: merges learned from the corpus —
    // distributed word-frequency pass, driver-side vocab-scale merge
    // loop (the subword-nmt/HF split). PARTIAL ORACLE: the full merge
    // sequence is iterative state no SQL engine reproduces, but merge #1
    // is by construction the corpus's most frequent adjacent CHARACTER
    // pair (weighted by word occurrence count, ties lexicographic on
    // (left, right)) — one SQL aggregate — and the merge count is
    // closed-form (the dictionary never exhausts in 32 rounds). The
    // query emits exactly that contract: (first_left, first_right,
    // first_count, n_merges). A trainer that miscounts pairs, breaks
    // ties differently, or stops early flips the row. The full 32-merge
    // sequence stays pinned by the hand-computed PropertySpec fixture
    // and exercised end-to-end by t10's losslessness oracle.
    QueryDef("t9_bpe_merges",
      (s, dir) => {
        val m = TextAnalysis.bpeTrain(t(s, dir, "documents"), numMerges = 32)
        m.filter(col("rank") === 1)
          .select(col("left").as("first_left"), col("right").as("first_right"),
            col("pair_count").as("first_count"))
          .crossJoin(m.groupBy().agg(count(lit(1)).as("n_merges")))
      },
      Some(s"""WITH tok AS (SELECT unnest($duckToks) AS w FROM documents),
              |wf AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY w),
              |pairs AS (SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pr, f FROM wf),
              |agg AS (SELECT pr, CAST(sum(f) AS BIGINT) AS c FROM pairs GROUP BY pr)
              |SELECT substr(pr, 1, 1) AS first_left, substr(pr, 2, 1) AS first_right,
              |c AS first_count, CAST(32 AS BIGINT) AS n_merges
              |FROM agg ORDER BY c DESC, pr LIMIT 1""".stripMargin.replace("\n", " "))),

    // BPE inference: the learned merges applied corpus-wide as a
    // MAP-ONLY expression (merge table rides in the plan) — train once,
    // tokenize 100 TB at scan speed. ORACLE-CHECKED via the LOSSLESSNESS
    // invariant: per-doc subword counts are merge-table-specific, but
    // BPE merges only ever concatenate within a word, so rejoining the
    // subwords must reproduce the concatenated tokens for EVERY document
    // — and the doc/word totals are SQL. A single dropped or duplicated
    // subword anywhere in the corpus flips n_lossless and fails the hash.
    QueryDef("t10_bpe_encode",
      (s, dir) => {
        val merges = TextAnalysis.bpeTrain(t(s, dir, "documents"), numMerges = 32)
          .orderBy("rank")
          .collect().map(r => (r.getString(1), r.getString(2))).toSeq
        val toks = TextAnalysis.tokens(col("text"))
        val bpe = graft.functions.BpeEncode.encode(toks, merges)
        t(s, dir, "documents")
          .select(
            (concat_ws("", bpe) === concat_ws("", toks)).as("lossless"),
            size(toks).cast("long").as("n_words"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("lossless"), 1L).otherwise(0L)).as("n_lossless"),
            sum(col("n_words")).as("n_words_total"))
      },
      Some(s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
              |CAST(count(*) AS BIGINT) AS n_lossless,
              |CAST(sum(len($duckToks)) AS BIGINT) AS n_words_total
              |FROM documents""".stripMargin.replace("\n", " "))),

    // Duplicated-span share (Lee et al. 2022 exact-substring signal): per
    // doc, the fraction of its distinct word 8-grams that occur in ≥1
    // OTHER document — catches boilerplate/templating that whole-doc
    // fingerprints miss. Three partial-aggregated shuffles, no self-join
    // (see TextAnalysis.dupSpanStats scale notes).
    QueryDef("t11_dup_spans",
      (s, dir) => TextAnalysis.dupSpanStats(t(s, dir, "documents"), k = 8)
        .select(col("doc_id"), col("n_grams"), col("n_dup"),
          round(col("dup_frac"), 6).as("dup_frac"))
        .orderBy("doc_id"),
      Some(s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |sh AS (SELECT doc_id, CASE WHEN len(toks) < 8 THEN CAST([] AS VARCHAR[]) ELSE list_distinct(list_transform(range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' '))) END AS s FROM tok),
              |g AS (SELECT doc_id, unnest(s) AS gram FROM sh),
              |df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram),
              |per AS (SELECT g.doc_id, count(*) AS n_grams, sum(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS n_dup
              |FROM g JOIN df USING (gram) GROUP BY g.doc_id)
              |SELECT d.doc_id, CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
              |CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup,
              |ROUND(CASE WHEN coalesce(per.n_grams, 0) = 0 THEN 0.0
              |ELSE CAST(per.n_dup AS DOUBLE) / CAST(per.n_grams AS DOUBLE) END, 6) AS dup_frac
              |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
              |ORDER BY d.doc_id""".stripMargin.replace("\n", " "))),

    // DSIR importance-resampling scores (Xie et al. 2023): sources
    // src1–src5 act as the curated target corpus, everything else as
    // raw; each doc's score is the integer dot product of its hashed-
    // unigram bucket counts with the micro-rounded log-likelihood-ratio
    // model (see Selection.dsirScore determinism notes). The oracle
    // rebuilds the identical model in SQL — md5 buckets, add-one
    // smoothing, one ln — and matches hash-exact because the per-doc
    // sum is all-integer.
    QueryDef("dsir1_importance",
      (s, dir) => graft.operators.Selection.dsirScore(
          t(s, dir, "documents"), "doc_id", "text",
          col("source").isin("src1", "src2", "src3", "src4", "src5"),
          buckets = 256)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
      Some(s"""WITH tok AS (SELECT doc_id, source IN ('src1','src2','src3','src4','src5') AS tgt, unnest($duckToks) AS tok FROM documents),
              |tb AS (SELECT doc_id, tgt, CAST(('0x' || substr(md5(tok || 'dsir'), 1, 8)) AS UBIGINT) % 256 AS bucket FROM tok),
              |cnt AS (SELECT bucket, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct, sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr FROM tb GROUP BY bucket),
              |tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM cnt),
              |model AS (SELECT bucket, CAST(round(ln(((ct + 1.0) / (tt + 256.0)) / ((cr + 1.0) / (tr + 256.0))) * 1e6, 0) AS BIGINT) AS slr FROM cnt CROSS JOIN tot),
              |db AS (SELECT doc_id, bucket, count(*) AS n FROM tb GROUP BY doc_id, bucket)
              |SELECT db.doc_id, CAST(sum(db.n * model.slr) AS BIGINT) AS score_micro,
              |CAST(sum(db.n * model.slr) AS BIGINT) > 0 AS selected
              |FROM db JOIN model USING (bucket) GROUP BY db.doc_id
              |ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Deterministic global corpus shuffle: shuffle_pos = rank in
    // ascending (md5(id‖salt), id) order, computed by distributed
    // prefix-sum (never a single-task global window — see
    // Sampling.deterministicShuffle). The oracle is the same permutation
    // as one SQL row_number.
    QueryDef("shuf1_global_shuffle",
      (s, dir) => graft.operators.Sampling.deterministicShuffle(
          t(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), col("shuffle_pos"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(row_number() OVER (ORDER BY
             |CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8)) AS UBIGINT), doc_id) - 1 AS BIGINT) AS shuffle_pos
             |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Round-8 curation funnel v2, composed from THIS round's operators:
    // Gopher rule keep → duplicated-span removal over the survivors →
    // exact dedup of the CLEANED text (md5 fingerprint, min-doc_id rep)
    // → corpus summary (counts + surviving token mass). The oracle
    // chains the t16, c5, and d2-style SQL fragments over the same
    // constants — a hash-exact end-to-end pipeline certificate, cur2's
    // pattern with the new stages.
    QueryDef("cur3_gopher_funnel",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val gr = TextAnalysis.gopherRules(col("text"))
        // survivors PINNED: the rule struct (tokenization + four regex
        // scans per doc) is the funnel's expensive predicate, and both
        // the n_rules count and the dup-span stage consume the same
        // survivor set — unpinned, the rules would run once per branch
        // and the corpus would be scanned three times instead of
        // 1 survivor pass + 1 count-only scan
        val kept = graft.operators.Materialize(
          docs.select(col("doc_id"), col("text"))
            .filter(gr.getField("wc_ok") && gr.getField("wlen_ok") &&
              gr.getField("sym_ok") && gr.getField("alpha_ok") && gr.getField("stop_ok")))
        val cleaned = TextAnalysis.removeDupSpans(kept, k = 4)
        val reps = cleaned
          .withColumn("fp", md5(col("clean_text")))
          .groupBy("fp")
          .agg(min(struct(col("doc_id"),
            (col("n_tokens") - col("n_removed")).as("n_kept"))).as("m"))
        val nIn = docs.agg(count(lit(1)).as("n_input"))
        val nRules = kept.agg(count(lit(1)).as("n_rules"))
        val dedup = reps.agg(count(lit(1)).as("n_dedup"),
          sum(col("m.n_kept")).as("tokens_kept"))
        nIn.crossJoin(nRules).crossJoin(dedup)
          .select(col("n_input"), col("n_rules"), col("n_dedup"),
            col("tokens_kept").cast("long").as("tokens_kept"))
      },
      Some {
        val sw = duckList(TextAnalysis.unionStopwords)
        s"""WITH tt AS (SELECT doc_id, text, $duckToks AS toks FROM documents),
           |r AS (SELECT doc_id, toks,
           |  len(toks) AS n,
           |  list_sum(list_transform(toks, x -> len(x))) AS sumlen,
           |  (len(text) - len(replace(text, '#', ''))) AS hashbytes,
           |  (len(text) - len(replace(text, '...', ''))) AS ellbytes,
           |  len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS alphaw,
           |  len(list_filter(toks, x -> list_contains($sw, x))) AS stoph
           |  FROM tt),
           |keep AS (SELECT doc_id, toks FROM r
           |  WHERE (n >= 20 AND n <= 80) AND (n > 0 AND sumlen >= n * 4 AND sumlen <= n * 5)
           |  AND ((hashbytes * 3 + ellbytes) * 10 <= n * 3)
           |  AND (alphaw * 5 >= n * 4) AND (stoph >= 2)),
           |g0 AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 3),
           |  i -> struct_pack(pos := i, g := array_to_string(toks[i+1:i+4], ' ')))) AS u
           |  FROM keep WHERE len(toks) >= 4),
           |g AS (SELECT doc_id, u.pos AS pos, u.g AS gram FROM g0),
           |c AS (SELECT gram, count(*) AS occ FROM g GROUP BY 1),
           |dp AS (SELECT doc_id, list(pos) AS dup_pos
           |  FROM g JOIN c USING (gram) WHERE occ >= 2 GROUP BY 1),
           |o AS (SELECT keep.doc_id, keep.toks, COALESCE(dp.dup_pos, []) AS dup_pos
           |  FROM keep LEFT JOIN dp ON keep.doc_id = dp.doc_id),
           |cut AS (SELECT doc_id,
           |  list_filter(toks, (x, j) -> NOT len(list_filter(dup_pos,
           |    p -> j - 1 >= p AND j - 1 <= p + 3)) > 0) AS kept FROM o),
           |fp AS (SELECT doc_id, len(kept) AS n_kept,
           |  md5(COALESCE(array_to_string(kept, ' '), '')) AS f FROM cut),
           |reps AS (SELECT f, min(doc_id) AS keep_id FROM fp GROUP BY 1),
           |ded AS (SELECT count(*) AS n_dedup, sum(n_kept) AS tokens_kept
           |  FROM fp JOIN reps ON fp.doc_id = reps.keep_id)
           |SELECT (SELECT count(*) FROM documents) AS n_input,
           |(SELECT count(*) FROM keep) AS n_rules,
           |CAST(n_dedup AS BIGINT) AS n_dedup, CAST(tokens_kept AS BIGINT) AS tokens_kept
           |FROM ded""".stripMargin.replace("\n", " ")
      }),

    // Temperature-scaled source mixture (α = 1/2): quotas ∝ √(Σ n_chars)
    // per source, derived FROM the corpus (samp6 takes weights as
    // input); selection = first quotaₛ docs of each source's md5 walk
    // via the distributed prefix-sum. ⌊√int⌋ of an IEEE sqrt is exact
    // below 2⁵², so quotas and kept set are engine-exact.
    QueryDef("samp11_temperature",
      (s, dir) => graft.operators.Sampling.temperatureSample(
          t(s, dir, "documents").select("doc_id", "source", "n_chars"),
          "source", "doc_id", "n_chars", targetN = 200L)
        .select("doc_id", "source", "mix_pos").orderBy("doc_id"),
      Some("""WITH st AS (SELECT source, CAST(floor(sqrt(CAST(sum(n_chars) AS DOUBLE))) AS BIGINT) AS s
             |  FROM documents GROUP BY 1),
             |tot AS (SELECT sum(s) AS stot FROM st),
             |q AS (SELECT source, (200 * s) // stot AS quota FROM st CROSS JOIN tot),
             |h AS (SELECT doc_id, source,
             |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8))::UBIGINT AS k FROM documents),
             |r AS (SELECT doc_id, source,
             |  CAST(row_number() OVER (PARTITION BY source ORDER BY k, doc_id) AS BIGINT) AS mix_pos FROM h)
             |SELECT r.doc_id, r.source, r.mix_pos FROM r JOIN q USING (source)
             |WHERE mix_pos <= quota ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Gopher-style quality rule battery: five integer-exact format rules
    // in one fused map-only projection (cross-multiplied ratios, no
    // division, no float), plus the conjunctive keep. All thresholds are
    // shared constants between the Spark expression and this SQL.
    QueryDef("t16_gopher_rules",
      (s, dir) => {
        val g = TextAnalysis.gopherRules(col("text"))
        t(s, dir, "documents")
          .select(col("doc_id"), g.as("g"))
          .select(col("doc_id"), col("g.wc_ok"), col("g.wlen_ok"),
            col("g.sym_ok"), col("g.alpha_ok"), col("g.stop_ok"),
            (col("g.wc_ok") && col("g.wlen_ok") && col("g.sym_ok") &&
              col("g.alpha_ok") && col("g.stop_ok")).as("keep"))
          .orderBy("doc_id")
      },
      Some {
        val sw = duckList(TextAnalysis.unionStopwords)
        s"""WITH t AS (SELECT doc_id, text, $duckToks AS toks FROM documents),
           |r AS (SELECT doc_id,
           |  len(toks) AS n,
           |  list_sum(list_transform(toks, x -> len(x))) AS sumlen,
           |  (len(text) - len(replace(text, '#', ''))) AS hashbytes,
           |  (len(text) - len(replace(text, '...', ''))) AS ellbytes,
           |  len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS alphaw,
           |  len(list_filter(toks, x -> list_contains($sw, x))) AS stoph
           |  FROM t)
           |SELECT doc_id,
           |  (n >= 20 AND n <= 80) AS wc_ok,
           |  (n > 0 AND sumlen >= n * 4 AND sumlen <= n * 5) AS wlen_ok,
           |  ((hashbytes * 3 + ellbytes) * 10 <= n * 3) AS sym_ok,
           |  (alphaw * 5 >= n * 4) AS alpha_ok,
           |  (stoph >= 2) AS stop_ok,
           |  ((n >= 20 AND n <= 80) AND (n > 0 AND sumlen >= n * 4 AND sumlen <= n * 5)
           |   AND ((hashbytes * 3 + ellbytes) * 10 <= n * 3)
           |   AND (alphaw * 5 >= n * 4) AND (stoph >= 2)) AS keep
           |FROM r ORDER BY doc_id""".stripMargin.replace("\n", " ")
      }),

    // TextRank keyword extraction (Mihalcea & Tarau 2004): candidate
    // words (lowercase alphabetic, length ≥ 3) vote for their
    // within-window neighbors; the stationary scores are PageRank over
    // the undirected co-occurrence graph, and the top-k words are the
    // corpus's keywords. Composition showcase: the same fixed-point
    // integer Graph.pageRank arithmetic as graph2 — via pageRankKeyed,
    // the word string IS the vertex key, no driver-side id dictionary —
    // over adjacency edges generated map-side from the token arrays
    // (one explode, no self-join). Scale: edges distinct in one
    // shuffle; every PageRank iteration is one vocab-sized shuffle; the
    // final top-k is a distributed TakeOrderedAndProject with the
    // unique word as tiebreak. Oracle: generated CTE chain restating
    // the identical integer recurrence (the graph2/pca1 pattern) on
    // string vertex ids.
    QueryDef("t18_textrank",
      (s, dir) => {
        val toksF = filter(TextAnalysis.tokens(col("text")),
          tk => tk.rlike("^[a-z]{3,}$"))
        val base = t(s, dir, "documents").select(toksF.as("toks"))
          .filter(size(col("toks")) >= 2)
        val adj = base.select(explode(transform(
            sequence(lit(1), size(col("toks")) - 1),
            i => struct(element_at(col("toks"), i).as("a"),
              element_at(col("toks"), i + 1).as("b")))).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
        val edges = adj.select(col("a").as("src"), col("b").as("dst"))
          .unionByName(adj.select(col("b").as("src"), col("a").as("dst")))
        // materializeEvery = 2 (round-17, paired A/B min-of-3: 3.25 s
        // lazy / 2.45 s every-1 / 2.38 s every-2 at sf0.1): one mid-loop
        // rank pin truncates the otherwise 116-exchange 3-iteration
        // lazy plan that per-action analysis kept re-walking, without
        // every-1's pin-churn (the r16 revert). Semantics-neutral —
        // fixed-point integer ranks, GraphSpec pins bit-equality.
        graft.operators.Graph.pageRankKeyed(edges, "src", "dst",
            iterations = 3, materializeEvery = 2)
          .select(col("id").as("word"), col("rank_scaled"))
          .orderBy(col("rank_scaled").desc, col("word"))
          .limit(15)
      },
      Some {
        val edgeCtes =
          s"""tokf AS (SELECT list_filter($duckToks, t -> regexp_full_match(t, '[a-z]{3,}')) AS toks FROM documents),
             |adj AS (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS p FROM tokf WHERE len(toks) >= 2),
             |e AS (SELECT split_part(p, ' ', 1) AS src, split_part(p, ' ', 2) AS dst FROM adj
             |  UNION SELECT split_part(p, ' ', 2), split_part(p, ' ', 1) FROM adj)"""
            .stripMargin.replace("\n", " ")
        duckPageRank(edgeCtes, iterations = 3, scale = 1000000000L) +
          " SELECT id AS word, CAST(r AS BIGINT) AS rank_scaled FROM r3" +
          " ORDER BY rank_scaled DESC, word LIMIT 15"
      }),

    // Hashing-trick featurization (Weinberger 2009): tokens land in
    // dim = h mod 64 with a ±1 sign from the hash's higher bits — the
    // VOCABULARY-FREE vectorizer (no dictionary pass, no driver state,
    // no OOV), which is what makes it the 100 TB featurizer. The hash
    // is the prefix-8 polynomial Σ cp(cᵢ)·31^(i−1) — plain integer
    // arithmetic, so the oracle restates it EXACTLY (a murmur built-in
    // would be engine-private). One explode + one partial-agg groupBy.
    QueryDef("t19_hashed_features",
      (s, dir) => TextAnalysis.hashedFeatureRows(
          t(s, dir, "documents"), "doc_id", "text", dims = 64)
        .orderBy("doc_id", "dim"),
      Some {
        val pows = (0 until 8).map(i => math.pow(31, i).toLong)
          .mkString("[", ", ", "]")
        s"""WITH tok AS (SELECT doc_id, unnest($duckToks) AS t FROM documents),
           |h AS (SELECT doc_id, list_sum(list_transform(range(1, least(length(t), 8) + 1),
           |  i -> unicode(substr(t, i, 1)) * ($pows)[i])) AS h FROM tok WHERE length(t) > 0),
           |f AS (SELECT doc_id, h % 64 AS dim, 1 - 2 * ((h // 64) % 2) AS sign FROM h)
           |SELECT doc_id, CAST(dim AS BIGINT) AS dim, count(*) AS cnt,
           |CAST(sum(sign) AS BIGINT) AS signed
           |FROM f GROUP BY doc_id, dim ORDER BY doc_id, dim"""
          .stripMargin.replace("\n", " ")
      })
  )

  /** DuckDB twin of [[graft.operators.Graph.pageRank]]'s fixed-point
    * integer recurrence, as a generated CTE chain (the graph2 oracle's
    * shape, programmatic so iteration count is a parameter): expects
    * `edgeCtes` to end with an `e(src, dst)` CTE and leaves the final
    * ranks in `r<iterations>(id, r)`.
    */
  private def duckPageRank(edgeCtes: String, iterations: Int, scale: Long): String = {
    val sb = new StringBuilder(s"WITH $edgeCtes, ")
    sb.append("nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e), ")
    sb.append(s"nn AS (SELECT count(*) AS n, $scale // count(*) AS base FROM nodes), ")
    sb.append("od AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY src), ")
    sb.append("r0 AS (SELECT id, (SELECT base FROM nn) AS r FROM nodes)")
    for (i <- 1 to iterations) {
      val p = s"r${i - 1}"
      sb.append(s", d$i AS (SELECT coalesce(sum(r.r), 0) AS dang FROM $p r " +
        "LEFT JOIN od ON r.id = od.id WHERE od.id IS NULL)")
      sb.append(s", i$i AS (SELECT e.dst AS id, sum(r.r // od.deg) AS inflow " +
        s"FROM e JOIN $p r ON e.src = r.id JOIN od ON e.src = od.id GROUP BY e.dst)")
      sb.append(s", r$i AS (SELECT n.id, (15 * nn.base + 85 * " +
        s"(coalesce(i$i.inflow, 0) + d$i.dang // nn.n)) // 100 AS r " +
        s"FROM nodes n CROSS JOIN nn CROSS JOIN d$i LEFT JOIN i$i ON n.id = i$i.id)")
    }
    sb.toString
  }
}
