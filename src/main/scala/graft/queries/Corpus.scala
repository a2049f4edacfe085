package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Corpus-governance tier: the source-level triage and documentation
  * artifacts a curation pipeline emits before training — which
  * sources duplicate each other, and the dataset-card summary row.
  */
object Corpus {

  private def r6(c: org.apache.spark.sql.Column) = graft.Rounding.r6(c)

  /** Source-vocabulary overlap: exact Jaccard between every source
    * pair over their distinct BIGRAM vocabularies (unigram vocab is
    * saturated on this corpus — every source shares all ~31 words —
    * bigrams differentiate). This is corpus-level dedup triage:
    * which SOURCES are near-copies, answered before any doc-level
    * pass. The join is token-keyed (source-pair counts via the
    * inverted index), never sources×sources×docs; per-source vocab
    * is bounded by the token space, and the 190-pair output is
    * dimension-sized. */
  val sourceOverlap: QueryDef = QueryDef.sql(
    s"""WITH t AS (SELECT source, string_split(trim(text), ' ')
             AS toks FROM documents),
       st AS (SELECT DISTINCT source,
               unnest(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1])) AS tok
             FROM t WHERE len(toks) >= 2),
       sz AS (SELECT source AS sz_s, CAST(count(*) AS BIGINT) AS nv
              FROM st GROUP BY 1),
       p AS (SELECT a.source AS s1, b.source AS s2,
               CAST(count(*) AS BIGINT) AS common
             FROM st a JOIN st b ON a.tok = b.tok
               AND a.source < b.source
             GROUP BY 1, 2)
       SELECT s1, s2, common,
         ${graft.Rounding.r6sql(
           "CAST(common AS DOUBLE) / (za.nv + zb.nv - common)")}
           AS jaccard
       FROM p JOIN sz za ON s1 = za.sz_s JOIN sz zb ON s2 = zb.sz_s
       ORDER BY s1, s2""") { (s, d) =>
    val t = Tables.documents(s, d).select(col("source"),
      graft.text.TextOps.tokens(col("text")).as("toks"))
    val st = t.filter(size(col("toks")) >= 2)
      .select(col("source"), explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => concat(element_at(col("toks"), i + 1), lit(" "),
          element_at(col("toks"), i + 2)))).as("tok"))
      .distinct()
    val sz = st.groupBy(col("source").as("sz_s"))
      .agg(count(lit(1)).cast("long").as("nv"))
    val p = st.as("a").join(st.as("b"),
        col("a.tok") === col("b.tok") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).cast("long").as("common"))
    p.join(sz.select(col("sz_s").as("za_s"), col("nv").as("za_nv")),
        col("s1") === col("za_s"))
      .join(sz.select(col("sz_s").as("zb_s"), col("nv").as("zb_nv")),
        col("s2") === col("zb_s"))
      .select(col("s1"), col("s2"), col("common"),
        r6(col("common").cast("double") /
          (col("za_nv") + col("zb_nv") - col("common")))
          .as("jaccard"))
      .orderBy(col("s1"), col("s2"))
  }

  /** Dataset-card summary: the one-row corpus documentation artifact
    * (doc/lang/source counts, token totals and range, exact-dup
    * count, char volume) in ONE full-scan aggregate. Exact-dup
    * counting distincts the md5 of the text, not the text — at
    * 100 TB the shuffle carries 32-byte digests instead of
    * multi-KB documents (same stance as q29's hash-group dedup). */
  val datasetCard: QueryDef = QueryDef.sql(
    s"""WITH t AS (SELECT doc_id, lang, source, n_chars,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT)
               AS n_tok,
             md5(text) AS h
           FROM documents)
       SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         CAST(min(n_tok) AS BIGINT) AS min_tokens,
         CAST(max(n_tok) AS BIGINT) AS max_tokens,
         ${graft.Rounding.r6sql(
           "CAST(sum(n_tok) AS DOUBLE) / count(*)")} AS mean_tokens,
         CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_exact_dups,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
       FROM t""") { (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), col("source"), col("n_chars"),
        size(graft.text.TextOps.tokens(col("text"))).cast("long")
          .as("n_tok"),
        md5(col("text")).as("h"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        countDistinct(col("lang")).cast("long").as("n_langs"),
        countDistinct(col("source")).cast("long").as("n_sources"),
        sum(col("n_tok")).cast("long").as("total_tokens"),
        min(col("n_tok")).cast("long").as("min_tokens"),
        max(col("n_tok")).cast("long").as("max_tokens"),
        r6(sum(col("n_tok")).cast("double") / count(lit(1)))
          .as("mean_tokens"),
        (count(lit(1)) - countDistinct(col("h"))).cast("long")
          .as("n_exact_dups"),
        sum(col("n_chars")).cast("long").as("total_chars"))
  }

  /** Blocklist filtering per source — the C4-style badword screen:
    * flag every document containing any blocklist term, report the
    * per-source contamination rate. The term list is modeled as a
    * TABLE (not an IN-list) joined via explode(tokens) → BROADCAST
    * left-semi — the shape that still works when the blocklist is
    * 10k phrases: the token explosion is map-local, the semi-join
    * never shuffles the corpus, and only the (source, doc_id)
    * survivors reach the per-doc distinct. At fixture scale the
    * 3-term list would also fit `arrays_overlap` with a literal
    * array (zero extra shuffle), noted here as the degenerate-case
    * shortcut; the broadcast-join form is the one that scales in
    * blocklist size. */
  val blocklistFilter: QueryDef = QueryDef.sql(
    s"""WITH f AS (SELECT source, doc_id,
           CASE WHEN list_has_any(string_split(trim(text),' '),
             ['dup','slow','big']) THEN 1 ELSE 0 END AS hit
         FROM documents)
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(hit) AS BIGINT) AS n_flagged,
         ${graft.Rounding.r6sql(
           "CAST(sum(hit) AS DOUBLE)/count(*)")} AS flag_rate
       FROM f GROUP BY 1 ORDER BY 1""") { (s, d) =>
    import s.implicits._
    val blocklist = Seq("dup", "slow", "big").toDF("term")
    val docs = Tables.documents(s, d)
    val flagged = docs
      .select(col("source"), col("doc_id"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      .join(broadcast(blocklist), col("tok") === col("term"),
        "left_semi")
      .select(col("source"), col("doc_id")).distinct()
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_flagged"))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .join(flagged, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        r6(coalesce(col("n_flagged"), lit(0L)).cast("double")
          / col("n_docs")).as("flag_rate"))
      .orderBy(col("source"))
  }

  /** Asymmetric containment near-dup: C(A→B) = |S(A)∩S(B)| / |S(A)|
    * over distinct token-3-gram shingle sets — the screen that
    * catches a document EMBEDDED in a larger one, which symmetric
    * Jaccard (q30/q39) dilutes away. Pair candidates come from the
    * inverted shingle index routed through the chunked pair
    * expansion ([[graft.ops.Graph.cooccurPairCounts]] with the
    * shingle as the bucket — never docs×docs, and never a hot
    * shingle's f² inside one join task); the top-10 output orders
    * by the RAW containment
    * double (the identical IEEE divide on both engines, so the
    * LIMIT boundary is deterministic) with a (doc_a, doc_b) total
    * tie-break, and only the emitted value is r6-rounded. */
  val containmentTopk: QueryDef = QueryDef.sql(
    s"""WITH t AS (SELECT doc_id, string_split(trim(text),' ')
             AS toks FROM documents),
       s AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(toks)-1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
               AS g
             FROM t WHERE len(toks) >= 3),
       sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) ns
              FROM s GROUP BY 1),
       p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS common
             FROM s a JOIN s b ON a.g = b.g AND a.doc_id <> b.doc_id
             GROUP BY 1,2),
       c AS (SELECT doc_a, doc_b, common,
               CAST(common AS DOUBLE)/sz.ns AS cont
             FROM p JOIN sz ON p.doc_a = sz.doc_id)
       SELECT doc_a, doc_b, common,
         ${graft.Rounding.r6sql("cont")} AS containment
       FROM c ORDER BY cont DESC, doc_a, doc_b LIMIT 10""") { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"),
        graft.text.TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    val sh = t.select(col("doc_id"),
      explode(graft.text.TextOps.shingles(col("toks"), 3)).as("g"))
    val sz = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("ns"))
    // Hot-shingle safety: a raw g===g self-join puts a shingle
    // shared by f documents (boilerplate at corpus scale) through
    // ONE g-keyed join task as f² rows — measured 65-75% single-
    // task share even at sf0.1. Route the pair counts through the
    // chunked co-occurrence machinery instead (shingle = bucket):
    // rank-sliced member sets spread a hot shingle's (f/chunk)²
    // cross products over explicit-count repartitions, and the
    // symmetric (u<v, common) count is exactly |S(A)∩S(B)|.
    // Containment is asymmetric, so emit BOTH directions. (The
    // bucket column is renamed: cooccurPairCounts uses `g` for its
    // internal chunk index.)
    val pc = graft.ops.Graph.cooccurPairCounts(
      sh.select(col("doc_id"), col("g").as("shingle")),
      Seq("shingle"), "doc_id", cacheGroups = true)
    val p = pc.select(col("u").as("doc_a"), col("v").as("doc_b"),
        col("w").cast("long").as("common"))
      .unionByName(pc.select(col("v").as("doc_a"),
        col("u").as("doc_b"), col("w").cast("long").as("common")))
    p.join(sz, col("doc_a") === col("doc_id"))
      .select(col("doc_a"), col("doc_b"), col("common"),
        (col("common").cast("double") / col("ns")).as("cont"))
      .orderBy(col("cont").desc, col("doc_a"), col("doc_b"))
      .limit(10)
      .select(col("doc_a"), col("doc_b"), col("common"),
        r6(col("cont")).as("containment"))
  }

  /** Df-capped containment screen — the SEMANTIC scale lever for
    * q230's operating point at corpus scale (text-skew probe,
    * SURVEY §17): a shingle present in most documents (boilerplate,
    * licence headers, templates) generates f²-fold candidate pairs
    * while carrying no dedup signal — at a 70%-df stop-shingle the
    * probe measures the pair volume itself as the wall (≈1e9 pairs
    * at the 10× tier, quadratic BY DEFINITION of containment; no
    * plan shape removes output). Standard practice (Broder-style
    * shingle dedup, CCNet/RefinedWeb curation) drops
    * high-document-frequency shingles BEFORE pair generation:
    * counting only shingles with df <= cap lower-bounds true
    * containment (every dropped term could only add to the
    * intersection) and bounds EVERY posting list at cap, so the
    * candidate volume is <= cap·|postings| — linear in the corpus,
    * no hot keys by construction (the chunk machinery degenerates
    * to single slices). Cap = 3 exercises the drop path at fixture
    * scale (fixture df: median 1, p90 3, max 9); a deployment sets
    * it to ~50-100. Denominator stays the FULL |S(A)| so the score
    * is comparable across caps. */
  val containmentDfCap: QueryDef = QueryDef.sql(
    s"""WITH t AS (SELECT doc_id, string_split(trim(text),' ')
             AS toks FROM documents),
       s AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(toks)-1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
               AS g
             FROM t WHERE len(toks) >= 3),
       keep AS (SELECT g FROM s GROUP BY g
                HAVING count(*) BETWEEN 2 AND 3),
       k AS (SELECT s.doc_id, s.g FROM s JOIN keep USING (g)),
       sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) ns
              FROM s GROUP BY 1),
       p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS common
             FROM k a JOIN k b ON a.g = b.g AND a.doc_id <> b.doc_id
             GROUP BY 1,2),
       c AS (SELECT doc_a, doc_b, common,
               CAST(common AS DOUBLE)/sz.ns AS cont
             FROM p JOIN sz ON p.doc_a = sz.doc_id)
       SELECT doc_a, doc_b, common,
         ${graft.Rounding.r6sql("cont")} AS containment_lb
       FROM c ORDER BY cont DESC, doc_a, doc_b LIMIT 10""") { (s, d) =>
    val cap = 3
    val t = Tables.documents(s, d)
      .select(col("doc_id"),
        graft.text.TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    val sh = t.select(col("doc_id"),
      explode(graft.text.TextOps.shingles(col("toks"), 3)).as("g"))
    val sz = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("ns"))
    // df <= cap also implies df >= 2 for pair purposes, so the keep
    // set is the [2, cap] band; the join on g is skew-free (every
    // kept posting list is <= cap rows).
    val keep = sh.groupBy(col("g"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2 && col("__df") <= cap)
      .select(col("g"))
    val kept = sh.join(keep, "g")
    val pc = graft.ops.Graph.cooccurPairCounts(
      kept.select(col("doc_id"), col("g").as("shingle")),
      Seq("shingle"), "doc_id")
    val p = pc.select(col("u").as("doc_a"), col("v").as("doc_b"),
        col("w").cast("long").as("common"))
      .unionByName(pc.select(col("v").as("doc_a"),
        col("u").as("doc_b"), col("w").cast("long").as("common")))
    p.join(sz, col("doc_a") === col("doc_id"))
      .select(col("doc_a"), col("doc_b"), col("common"),
        (col("common").cast("double") / col("ns")).as("cont"))
      .orderBy(col("cont").desc, col("doc_a"), col("doc_b"))
      .limit(10)
      .select(col("doc_a"), col("doc_b"), col("common"),
        r6(col("cont")).as("containment_lb"))
  }

  /** Sorted-neighborhood blocking — the third dedup candidate-
    * generation family next to LSH (q30/q38) and the inverted index
    * (q230): sort the corpus by a blocking key (lang, n_chars,
    * doc_id) and compare each document only to its next w=3
    * neighbors. Global order comes from `Packing.withGlobalOffsets`
    * (range shuffle + driver prefix-scan — the scalable exact-rank
    * recipe, NO single-partition window), and the neighbor pairing
    * is ONE equi-join on rank+k with k exploded from [1,3]; exact
    * unigram-set Jaccard decides, thresholded on the raw double
    * (identical IEEE divide both engines). The blocking key is
    * carried as one lexicographic string (zero-padded numerics) so
    * the composite order is a single range-partitionable column. */
  val sortedNeighborhood: QueryDef = QueryDef.sql(
    s"""WITH t AS (SELECT doc_id, lang, n_chars,
             list_distinct(string_split(trim(text),' ')) AS toks
           FROM documents),
       o AS (SELECT doc_id, toks,
           lead(doc_id, 1) OVER w AS d1, lead(toks, 1) OVER w AS t1,
           lead(doc_id, 2) OVER w AS d2, lead(toks, 2) OVER w AS t2,
           lead(doc_id, 3) OVER w AS d3, lead(toks, 3) OVER w AS t3
         FROM t WINDOW w AS (ORDER BY lang, n_chars, doc_id)),
       pairs AS (
         SELECT doc_id AS a, d1 AS b, toks AS ta, t1 AS tb FROM o
           WHERE d1 IS NOT NULL
         UNION ALL SELECT doc_id, d2, toks, t2 FROM o
           WHERE d2 IS NOT NULL
         UNION ALL SELECT doc_id, d3, toks, t3 FROM o
           WHERE d3 IS NOT NULL),
       j AS (SELECT a, b,
           CAST(len(list_intersect(ta, tb)) AS BIGINT) AS inter,
           CAST(len(ta) + len(tb) - len(list_intersect(ta, tb))
             AS BIGINT) AS uni
         FROM pairs)
       SELECT a, b,
         ${graft.Rounding.r6sql("CAST(inter AS DOUBLE)/uni")}
           AS jaccard
       FROM j WHERE CAST(inter AS DOUBLE)/uni >= 0.8
       ORDER BY a, b""") { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        array_distinct(graft.text.TextOps.tokens(col("text")))
          .as("toks"))
      .select(col("doc_id"), col("toks"),
        concat(col("lang"), lit("|"),
          lpad(col("n_chars").cast("string"), 12, "0"), lit("|"),
          lpad(col("doc_id").cast("string"), 12, "0")).as("bkey"))
      .withColumn("one", lit(1L))
    val ranked = graft.ops.Packing
      .withGlobalOffsets(t, "bkey", "one")
      .select(col("doc_id"), col("toks"),
        (col("offset") + 1).as("rn"))
    val left = ranked.select(col("doc_id").as("a"),
        col("toks").as("ta"), col("rn"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("k"))
      .select(col("a"), col("ta"), (col("rn") + col("k")).as("rn2"))
    val right = ranked.select(col("doc_id").as("b"),
      col("toks").as("tb"), col("rn").as("rn2"))
    left.join(right, "rn2")
      .select(col("a"), col("b"),
        size(array_intersect(col("ta"), col("tb"))).cast("long")
          .as("inter"),
        (size(col("ta")) + size(col("tb"))
          - size(array_intersect(col("ta"), col("tb"))))
          .cast("long").as("uni"))
      .filter(col("inter").cast("double") / col("uni") >= 0.8)
      .select(col("a"), col("b"),
        r6(col("inter").cast("double") / col("uni")).as("jaccard"))
      .orderBy(col("a"), col("b"))
  }

  /** Export-shard balance audit: docs assigned to 64 output shards
    * by a deterministic integer hash of doc_id, with each shard's
    * doc count, char mass, and its balance ratio vs the even split —
    * the pre-flight check before a 100 TB shard-export job (a 3×
    * shard is a straggler writer and a hot downstream reader). One
    * exact aggregate over the corpus; ratios from exact longs. */
  val shardBalance: QueryDef = QueryDef.sql(
    s"""WITH s AS (SELECT (doc_id * 2654435761) % 64 AS shard,
           n_chars FROM documents),
       g AS (SELECT CAST(shard AS BIGINT) shard,
           CAST(count(*) AS BIGINT) n_docs,
           CAST(sum(n_chars) AS BIGINT) n_chars FROM s GROUP BY 1),
       t AS (SELECT CAST(sum(n_chars) AS BIGINT) tc,
           CAST(count(*) AS BIGINT) ns FROM g)
       SELECT shard, n_docs, g.n_chars,
         ${graft.Rounding.r6sql(
           "CAST(g.n_chars AS DOUBLE)*ns/tc")} AS balance_ratio
       FROM g, t ORDER BY shard""") { (s, d) =>
    val g = Tables.documents(s, d)
      .select(((col("doc_id") * lit(2654435761L)) % 64).as("shard"),
        col("n_chars"))
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_chars")).cast("long").as("n_chars"))
    val t = g.agg(sum(col("n_chars")).cast("long").as("tc"),
      count(lit(1)).cast("long").as("ns"))
    g.crossJoin(broadcast(t))
      .select(col("shard"), col("n_docs"), col("n_chars"),
        graft.Rounding.r6(col("n_chars").cast("double") * col("ns")
          / col("tc")).as("balance_ratio"))
      .orderBy(col("shard"))
  }

  /** Per-source KL divergence of the doc-length distribution from
    * the corpus-wide one — the drift lens q202 (PSI) applies to
    * events, pointed at corpus composition: a source whose length
    * profile diverges hard from the blend is over-contributing
    * shorts or longs and distorts the token budget. Fixed-width
    * length buckets (all-integer), exact counts, r6-pinned
    * p·ln(p/q) contributions folded in bucket order; zero-p buckets
    * vanish and q > 0 by construction (the blend contains every
    * source). */
  val sourceLengthKl: QueryDef = QueryDef.sql(
    s"""WITH d AS (SELECT source,
           least(n_chars // 200, 9) AS bkt FROM documents),
       p AS (SELECT source, CAST(bkt AS BIGINT) bkt,
           CAST(count(*) AS BIGINT) np FROM d GROUP BY 1,2),
       ps AS (SELECT source AS s2, CAST(sum(np) AS BIGINT) ns
              FROM p GROUP BY 1),
       q AS (SELECT CAST(bkt AS BIGINT) bkt,
           CAST(count(*) AS BIGINT) nq FROM d GROUP BY 1),
       qt AS (SELECT CAST(sum(nq) AS BIGINT) nt FROM q),
       kl AS (SELECT source, list_sum(list(${graft.Rounding.r6sql(
         """(CAST(np AS DOUBLE)/ns)
            * ln((CAST(np AS DOUBLE)/ns) / (CAST(nq AS DOUBLE)/nt))""")}
           ORDER BY p.bkt)) klv, CAST(sum(np) AS BIGINT) n_docs
         FROM p JOIN ps ON source = s2 JOIN q ON p.bkt = q.bkt, qt
         GROUP BY 1)
       SELECT source, n_docs, ${graft.Rounding.r6sql("klv")}
         AS kl_nats
       FROM kl ORDER BY 1""") { (s, d) =>
    val r6 = graft.Rounding.r6 _
    val dd = Tables.documents(s, d)
      .select(col("source"),
        least(expr("n_chars div 200"), lit(9L)).cast("long")
          .as("bkt"))
    val p = dd.groupBy(col("source"), col("bkt"))
      .agg(count(lit(1)).cast("long").as("np"))
    val ps = p.groupBy(col("source").as("s2"))
      .agg(sum(col("np")).cast("long").as("ns"))
    val q = dd.groupBy(col("bkt").as("qb"))
      .agg(count(lit(1)).cast("long").as("nq"))
    val qt = q.agg(sum(col("nq")).cast("long").as("nt"))
    val pp = col("np").cast("double") / col("ns")
    val qq = col("nq").cast("double") / col("nt")
    p.join(ps, col("source") === col("s2"))
      .join(broadcast(q), col("bkt") === col("qb"))
      .crossJoin(broadcast(qt))
      .groupBy(col("source"))
      .agg(
        aggregate(transform(array_sort(collect_list(struct(
            col("bkt"), r6(pp * log(pp / qq)).as("contrib")))),
            _.getField("contrib")), lit(0.0), _ + _).as("klv"),
        sum(col("np")).cast("long").as("n_docs"))
      .select(col("source"), col("n_docs"),
        r6(col("klv")).as("kl_nats"))
      .orderBy(col("source"))
  }

  /** Heaps'-law vocabulary-growth curve: distinct vocabulary vs
    * tokens ingested at ten corpus checkpoints (docs in doc_id
    * order) — the saturation read that tells a data buyer whether
    * the next 10% of corpus still buys new vocabulary. First
    * occurrences via one min-aggregate per token (never a sequential
    * scan); both cumulative curves are windows over the |docs|
    * rank residue; checkpoint ranks are all-integer c·N/10
    * selections (q253's cross-multiplication recipe). */
  val heapsLaw: QueryDef = QueryDef.sql(
    """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') toks
             FROM documents),
       r AS (SELECT doc_id, len(toks) ntk,
           row_number() OVER (ORDER BY doc_id) rk FROM t),
       n AS (SELECT CAST(count(*) AS BIGINT) nd FROM r),
       tok AS (SELECT unnest(toks) tk, doc_id FROM t),
       fo AS (SELECT tk, min(doc_id) fd FROM tok GROUP BY 1),
       fr AS (SELECT fo.tk, r.rk FROM fo JOIN r ON fo.fd = r.doc_id),
       nv AS (SELECT rk, CAST(count(*) AS BIGINT) nn FROM fr
              GROUP BY 1),
       cum AS (SELECT r.rk,
           CAST(sum(coalesce(nv.nn,0)) OVER (ORDER BY r.rk)
             AS BIGINT) vocab,
           CAST(sum(r.ntk) OVER (ORDER BY r.rk) AS BIGINT) toks_seen
         FROM r LEFT JOIN nv ON r.rk = nv.rk),
       cp AS (SELECT c.c, (c.c * nd) // 10 AS brk FROM
         (SELECT unnest(generate_series(1,10)) c) c, n)
       SELECT CAST(cp.c AS BIGINT) cp_i, cum.vocab, cum.toks_seen
       FROM cp JOIN cum ON cum.rk = cp.brk ORDER BY 1""") { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), split(trim(col("text")), " ").as("toks"))
    val base = t.select(col("doc_id"),
      size(col("toks")).cast("long").as("ntk"), lit(1L).as("one"))
    val fo = t.select(col("doc_id"), explode(col("toks")).as("tk"))
      .groupBy(col("tk")).agg(min(col("doc_id")).as("fd"))
      .groupBy(col("fd")).agg(count(lit(1)).cast("long").as("nn"))
    val joined = base.join(fo, col("doc_id") === col("fd"), "left")
      .select(col("doc_id"), col("ntk"), col("one"),
        coalesce(col("nn"), lit(0L)).as("nn"))
    // three distributed prefix sums over the |docs| residue (range
    // shuffle + driver prefix, never a single-partition window) —
    // FUSED: one range shuffle + one totals job + one window pass
    // for rank, cumulative tokens, and cumulative new vocabulary
    // (VERDICT r13 #3: the nested form scanned the input 3×, making
    // this the catalog's most cold-read-sensitive query)
    val cum = graft.ops.Packing.withGlobalOffsetsMulti(joined,
      "doc_id", Seq("one" -> "rk0", "ntk" -> "to0", "nn" -> "vo0"))
      .select((col("rk0") + 1).as("rk"),
        (col("to0") + col("ntk")).cast("long").as("toks_seen"),
        (col("vo0") + col("nn")).cast("long").as("vocab"))
    val n = base.agg(count(lit(1)).cast("long").as("nd"))
    val cp = n.withColumn("c", explode(sequence(lit(1L), lit(10L))))
      .select(col("c"), expr("(c * nd) div 10").as("brk"))
    cum.join(broadcast(cp), col("rk") === col("brk"))
      .select(col("c").cast("long").as("cp_i"), col("vocab"),
        col("toks_seen"))
      .orderBy(col("cp_i"))
  }

  /** OOV rate per source against a top-20 reference vocabulary
    * mined from src0 — the domain-shift read before reusing a
    * tokenizer or model trained on one slice: a source whose token
    * mass falls outside the reference vocab needs its own vocab
    * budget. The reference is an exact top-k (count desc, token —
    * total order) broadcast; one anti-membership aggregate per
    * source. */
  val oovRate: QueryDef = QueryDef.sql(
    s"""WITH tok AS (SELECT source,
           unnest(string_split(trim(text), ' ')) tk FROM documents),
       ref AS (SELECT tk FROM (SELECT tk, count(*) c FROM tok
           WHERE source = 'src0'
           GROUP BY 1 ORDER BY c DESC, tk LIMIT 20)),
       g AS (SELECT source, CAST(count(*) AS BIGINT) n_tok,
           CAST(sum(CASE WHEN ref.tk IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) n_oov
         FROM tok LEFT JOIN ref ON tok.tk = ref.tk GROUP BY 1)
       SELECT source, n_tok, n_oov,
         ${graft.Rounding.r6sql("CAST(n_oov AS DOUBLE)/n_tok")}
           AS oov_rate
       FROM g ORDER BY 1""") { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("source"),
        explode(split(trim(col("text")), " ")).as("tk"))
    val ref = tok.filter(col("source") === "src0")
      .groupBy(col("tk")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tk")).limit(20)
      .select(col("tk").as("rtk"))
    tok.join(broadcast(ref), col("tk") === col("rtk"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_tok"),
        sum(when(col("rtk").isNull, 1L).otherwise(0L)).cast("long")
          .as("n_oov"))
      .select(col("source"), col("n_tok"), col("n_oov"),
        graft.Rounding.r6(col("n_oov").cast("double")
          / col("n_tok")).as("oov_rate"))
      .orderBy(col("source"))
  }

  /** Jensen–Shannon divergence of each source's token distribution
    * from the corpus blend, over the exact global top-100 token
    * domain — the lexical drift read next to q265's length-KL
    * (JSD is symmetric and bounded, so sources are comparable).
    * Counts exact; each JSD cell r6-pinned and folded in token
    * order (q240 recipe); the top-100 domain keeps the ordered
    * fold residue-sized at any corpus scale. */
  val tokenJsd: QueryDef = QueryDef.sql(
    s"""WITH tok AS (SELECT source,
           unnest(string_split(trim(text), ' ')) tk FROM documents),
       top AS (SELECT tk FROM (SELECT tk, count(*) c FROM tok
           GROUP BY 1 ORDER BY c DESC, tk LIMIT 100)),
       p AS (SELECT source, tok.tk, CAST(count(*) AS BIGINT) np
         FROM tok JOIN top ON top.tk = tok.tk GROUP BY 1,2),
       ps AS (SELECT source s2, CAST(sum(np) AS BIGINT) ns FROM p
              GROUP BY 1),
       q AS (SELECT tk qtk, CAST(sum(np) AS BIGINT) nq FROM p
             GROUP BY 1),
       qt AS (SELECT CAST(sum(nq) AS BIGINT) nt FROM q),
       cells AS (SELECT source, p.tk, CAST(np AS DOUBLE)/ns AS pp,
           CAST(nq AS DOUBLE)/nt AS qq
         FROM p JOIN ps ON source=s2 JOIN q ON p.tk=qtk, qt),
       kl AS (SELECT source, list_sum(list(${graft.Rounding.r6sql(
         """0.5*pp*ln(pp/(0.5*pp+0.5*qq))
            + 0.5*qq*ln(qq/(0.5*pp+0.5*qq))""")} ORDER BY tk)) jsd,
           CAST(count(*) AS BIGINT) n_tokens FROM cells GROUP BY 1)
       SELECT source, n_tokens, ${graft.Rounding.r6sql("jsd")}
         AS jsd_nats
       FROM kl ORDER BY 1""") { (s, d) =>
    val r6f = graft.Rounding.r6 _
    val tok = Tables.documents(s, d)
      .select(col("source"),
        explode(split(trim(col("text")), " ")).as("tk"))
    val top = tok.groupBy(col("tk")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tk")).limit(100)
      .select(col("tk").as("ttk"))
    val p = tok.join(broadcast(top), col("tk") === col("ttk"))
      .groupBy(col("source"), col("tk"))
      .agg(count(lit(1)).cast("long").as("np"))
    val ps = p.groupBy(col("source").as("s2"))
      .agg(sum(col("np")).cast("long").as("ns"))
    val q = p.groupBy(col("tk").as("qtk"))
      .agg(sum(col("np")).cast("long").as("nq"))
    val qt = q.agg(sum(col("nq")).cast("long").as("nt"))
    val pp = col("np").cast("double") / col("ns")
    val qq = col("nq").cast("double") / col("nt")
    val cell = lit(0.5) * pp * log(pp / (lit(0.5) * pp
      + lit(0.5) * qq)) + lit(0.5) * qq * log(qq
      / (lit(0.5) * pp + lit(0.5) * qq))
    p.join(ps, col("source") === col("s2"))
      .join(broadcast(q), col("tk") === col("qtk"))
      .crossJoin(broadcast(qt))
      .groupBy(col("source"))
      .agg(aggregate(transform(array_sort(collect_list(struct(
          col("tk"), r6f(cell).as("contrib")))),
          _.getField("contrib")), lit(0.0), _ + _).as("jsd"),
        count(lit(1)).cast("long").as("n_tokens"))
      .select(col("source"), col("n_tokens"),
        r6f(col("jsd")).as("jsd_nats"))
      .orderBy(col("source"))
  }

  /** Herfindahl concentration of corpus mass across sources, with
    * the effective-source count 1/HHI — the one-number data-mixture
    * read (20 sources at HHI 0.05 ≡ 20 effective; one dominant
    * source collapses it). Exact char-mass counts; the p² cells
    * r6-pinned and folded in source order. */
  val herfindahlSources: QueryDef = QueryDef.sql(
    s"""WITH s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) mass
           FROM documents GROUP BY 1),
       t AS (SELECT CAST(sum(mass) AS BIGINT) tot,
           CAST(count(*) AS BIGINT) k FROM s),
       h AS (SELECT list_sum(list(${graft.Rounding.r6sql(
         "(CAST(mass AS DOUBLE)/tot)*(CAST(mass AS DOUBLE)/tot)")}
           ORDER BY source)) hhi FROM s, t)
       SELECT t.k AS n_sources, ${graft.Rounding.r6sql("hhi")}
         AS herfindahl,
         ${graft.Rounding.r6sql("1.0/hhi")} AS effective_sources
       FROM h, t""") { (s, d) =>
    val r6f = graft.Rounding.r6 _
    val m = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).cast("long").as("mass"))
    val t = m.agg(sum(col("mass")).cast("long").as("tot"),
      count(lit(1)).cast("long").as("k"))
    val p = col("mass").cast("double") / col("tot")
    m.crossJoin(broadcast(t))
      .groupBy(col("k"))
      .agg(aggregate(transform(array_sort(collect_list(struct(
          col("source"), r6f(p * p).as("contrib")))),
          _.getField("contrib")), lit(0.0), _ + _).as("hhi"))
      .select(col("k").as("n_sources"),
        r6f(col("hhi")).as("herfindahl"),
        r6f(lit(1.0) / col("hhi")).as("effective_sources"))
  }

  /** Token burstiness (Fano factor over per-doc term frequencies,
    * zeros included) for the global top-20 tokens — Church & Gale's
    * content-vs-function-word signal: a bursty token concentrates
    * in few docs (Fano ≫ 1), a function word spreads evenly
    * (Fano ≈ 1). Per-(token, doc) counts exact, Σc² as decimal;
    * absent docs enter through the closed form (Σc, Σc² over the
    * sparse relation + the global doc count) — never a dense
    * token×doc join. */
  val tokenBurstiness: QueryDef = QueryDef.sql(
    s"""WITH tok AS (SELECT doc_id,
           unnest(string_split(trim(text), ' ')) tk
         FROM documents),
       top AS (SELECT tk FROM (SELECT tk, count(*) c FROM tok
           GROUP BY 1 ORDER BY c DESC, tk LIMIT 20)),
       dt AS (SELECT tok.tk, doc_id, CAST(count(*) AS BIGINT) c
         FROM tok JOIN top ON top.tk = tok.tk GROUP BY 1,2),
       nd AS (SELECT CAST(count(*) AS BIGINT) n_docs
              FROM documents),
       st AS (SELECT tk, CAST(sum(c) AS BIGINT) s,
           CAST(sum(CAST(c AS DECIMAL(19,0))*CAST(c AS
             DECIMAL(19,0))) AS DOUBLE) scc
         FROM dt GROUP BY 1)
       SELECT tk AS token, s AS n_occurrences,
         ${graft.Rounding.r6sql(
           """(scc/n_docs - (CAST(s AS DOUBLE)/n_docs)
              *(CAST(s AS DOUBLE)/n_docs))
              / (CAST(s AS DOUBLE)/n_docs)""")} AS fano
       FROM st, nd ORDER BY 1""") { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(trim(col("text")), " ")).as("tk"))
    val top = tok.groupBy(col("tk")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tk")).limit(20)
      .select(col("tk").as("ttk"))
    val dt = tok.join(broadcast(top), col("tk") === col("ttk"))
      .groupBy(col("tk"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("c"))
    val nd = Tables.documents(s, d)
      .agg(count(lit(1)).cast("long").as("n_docs"))
    val st = dt.groupBy(col("tk"))
      .agg(sum(col("c")).cast("long").as("s"),
        sum(col("c").cast("decimal(19,0)")
          * col("c").cast("decimal(19,0)")).cast("double")
          .as("scc"))
    val mean = col("s").cast("double") / col("n_docs")
    st.crossJoin(broadcast(nd))
      .select(col("tk").as("token"), col("s").as("n_occurrences"),
        graft.Rounding.r6((col("scc") / col("n_docs")
          - mean * mean) / mean).as("fano"))
      .orderBy(col("token"))
  }

  /** Vocabulary coverage curve by power-of-two rank tiers: how much
    * of the token stream the top-2^j vocabulary entries cover — the
    * read that sizes a tokenizer's vocab budget (the area under
    * this curve is what a bigger vocab buys). The fact reduces to
    * the vocabulary relation in ONE hash aggregate; the global
    * frequency rank comes from [[graft.ops.Packing
    * .withGlobalOffsets]] over that (vocab-sized, not corpus-sized)
    * relation — never a no-partition window over the corpus; tier
    * binning is integer-exact via length(bin(rank))−1 (the q333
    * stance: no libm log2 on a bin boundary). The cumulative runs
    * over the ≤⌈log2 |V|⌉-row residue. */
  val vocabCoverageTiers: QueryDef = QueryDef.sql(
    """WITH tok AS (SELECT unnest(string_split(trim(text), ' ')) tk
                    FROM documents),
       c AS (SELECT tk, CAST(count(*) AS BIGINT) n FROM tok
             WHERE tk <> '' GROUP BY 1),
       rk AS (SELECT n, CAST(row_number() OVER (ORDER BY n DESC, tk)
               AS BIGINT) r FROM c),
       t AS (SELECT CAST(sum(n) AS BIGINT) tot FROM rk),
       tier AS (SELECT CAST(length(bin(r)) - 1 AS BIGINT) tier,
                  CAST(sum(n) AS BIGINT) cn FROM rk GROUP BY 1)
       SELECT tier, cn AS tier_tokens,
         CAST(sum(cn) OVER (ORDER BY tier) AS BIGINT) AS cum_tokens,
         floor(CAST(sum(cn) OVER (ORDER BY tier) AS DOUBLE)
           / (SELECT tot FROM t) * 1000000 + 0.5)/1000000
           AS cum_coverage
       FROM tier ORDER BY 1""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val c = Tables.documents(s, d)
      .select(explode(split(trim(col("text")), " ")).as("tk"))
      .filter(col("tk") =!= "")
      .groupBy(col("tk")).agg(count(lit(1)).cast("long").as("n"))
      .withColumn("negn", -col("n"))
      .withColumn("one", lit(1L))
    val rk = graft.ops.Packing.withGlobalOffsets(c, "negn", "one",
      tieCols = Seq("tk"))
    val tot = rk.agg(sum(col("n")).cast("long").as("tot"))
    val tier = rk
      .groupBy((length(bin(col("offset") + 1)) - 1).cast("long")
        .as("tier"))
      .agg(sum(col("n")).cast("long").as("cn"))
    val w = Window.orderBy(col("tier"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tier.crossJoin(broadcast(tot))
      .select(col("tier"), col("cn").as("tier_tokens"),
        sum(col("cn")).over(w).cast("long").as("cum_tokens"),
        col("tot"))
      .select(col("tier"), col("tier_tokens"), col("cum_tokens"),
        r6(col("cum_tokens").cast("double") / col("tot"))
          .as("cum_coverage"))
      .orderBy(col("tier"))
  }

  /** RAG chunking with overlap — the retrieval-index prep every RAG
    * pipeline runs before embedding: sliding 32-token windows at
    * stride 24 (8-token overlap carries context across boundaries),
    * each chunk fingerprinted (md5 of the joined window) for the
    * downstream chunk-level dedup (q349) and index keying. Fully
    * row-local: tokenize → explode the per-doc chunk-index range →
    * slice — no shuffle until the final order, so the op is a scan
    * at any corpus size. A doc shorter than the stride yields
    * exactly one (possibly short) chunk; trailing windows clamp to
    * the token count. */
  val ragChunking: QueryDef = QueryDef.sql(
    """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
                  FROM documents),
       c AS (SELECT doc_id, CAST(u.i AS INTEGER) AS chunk_idx,
               list_slice(toks, u.i * 24 + 1, u.i * 24 + 32) AS ch
             FROM t, unnest(range(CAST(floor((len(toks) - 1) / 24) + 1
               AS BIGINT))) u(i))
       SELECT doc_id, chunk_idx, CAST(len(ch) AS INTEGER) AS n_toks,
              md5(array_to_string(ch, ' ')) AS fp
       FROM c ORDER BY doc_id, chunk_idx""") { (s, d) =>
    chunks(s, d)
      .select(col("doc_id"), col("chunk_idx"),
        size(col("ch")).as("n_toks"),
        md5(concat_ws(" ", col("ch"))).as("fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Shared chunk relation for q348/q349: (doc_id, chunk_idx, ch). */
  private def chunks(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.text.TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(sequence(lit(0),
          floor((size(col("toks")) - 1) / 24).cast("int")))
          .as("chunk_idx"),
        col("toks"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("toks"), col("chunk_idx") * 24 + 1, lit(32)).as("ch"))

  /** Chunk-level exact dedup across documents — which 32-token
    * windows recur (boilerplate headers, license blocks, templated
    * passages), the RAG-index dedup that stops retrieving the same
    * passage N times under N doc ids. Hash-groupBy over q348's
    * fingerprints: map-side partial counts, only fingerprint groups
    * cross the shuffle — the q29 exact-dedup shape one level below
    * the document. */
  val chunkDedup: QueryDef = QueryDef.sql(
    """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
                  FROM documents),
       c AS (SELECT doc_id,
               list_slice(toks, u.i * 24 + 1, u.i * 24 + 32) AS ch
             FROM t, unnest(range(CAST(floor((len(toks) - 1) / 24) + 1
               AS BIGINT))) u(i))
       SELECT md5(array_to_string(ch, ' ')) AS fp,
              CAST(count(*) AS BIGINT) AS n_occ,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
              min(doc_id) AS first_doc
       FROM c GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""") { (s, d) =>
    chunks(s, d)
      .select(col("doc_id"), md5(concat_ws(" ", col("ch"))).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).cast("long").as("n_occ"),
        countDistinct(col("doc_id")).cast("long").as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_occ") > 1)
      .orderBy(col("fp"))
  }

  /** Tokenizer fertility per language — chars-per-token, the number
    * that decides how much of a context window each language burns
    * (CJK text at whitespace granularity reads several× the fertility
    * of English) and hence per-language token budgets in a mixture.
    * One hash aggregate over row-local projections; both ratios are
    * single divisions of exact integer sums (no float-fold order
    * anywhere), r6 on output only. */
  val tokenizerFertility: QueryDef = QueryDef.sql(
    """WITH t AS (SELECT lang, length(trim(text)) AS nc,
                    len(string_split(trim(text), ' ')) AS nt
                  FROM documents)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(nt) AS BIGINT) AS sum_toks,
              floor((CAST(sum(nt) AS DOUBLE) / count(*))
                * 1000000 + 0.5) / 1000000 AS avg_toks,
              floor((CAST(sum(nc) AS DOUBLE) / sum(nt))
                * 1000000 + 0.5) / 1000000 AS chars_per_tok
       FROM t GROUP BY 1 ORDER BY 1""") { (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), length(trim(col("text"))).as("nc"),
        graft.text.TextOps.tokenCount(col("text")).as("nt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("nt")).cast("long").as("sum_toks"),
        r6(sum(col("nt")).cast("double") / count(lit(1))).as("avg_toks"),
        r6(sum(col("nc")).cast("double") / sum(col("nt")))
          .as("chars_per_tok"))
      .orderBy(col("lang"))
  }

  /** Theta-sketch set algebra over daily audiences — the mergeable
    * sketch family HLL can't provide: INTERSECTION and DIFFERENCE
    * estimates (Datasketches Theta, Spark 4's theta_* functions).
    * Per (day ≤ 3, event_type) the distinct-user set folds into a
    * theta sketch; every same-day type pair then reads estimated
    * |A∩B| and |A∖B| from sketch algebra alone — the "overlap
    * between any two audience segments without re-scanning" read
    * that powers segment dashboards at 100 TB (sketches are KB-sized
    * mergeable state; the exact pair join this query also carries is
    * the fixture-scale audit, not the deployed path). DRIVER-CHECKED
    * via the q104 containment pattern: exact n_both / n_a_only are
    * SQL-portable, and the booleans assert in-plan that both
    * estimates land within max(2, 5%) of exact — below the 4096
    * nominal entries the sets here never exceed, a theta sketch
    * retains the full set and the estimates are EXACT, so the gate
    * is deterministic. */
  val thetaAudienceOverlap: QueryDef = QueryDef.sql(
    """WITH t AS (SELECT DISTINCT CAST(dayofmonth(ts) AS INTEGER) AS d,
                    event_type, user_id
                  FROM events WHERE dayofmonth(ts) <= 3),
       sz AS (SELECT d, event_type, CAST(count(*) AS BIGINT) AS n
              FROM t GROUP BY 1, 2),
       p AS (SELECT a.d, a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_both
             FROM t a JOIN t b ON a.d = b.d AND a.user_id = b.user_id
               AND a.event_type < b.event_type
             GROUP BY 1, 2, 3),
       pairs AS (SELECT x.d, x.event_type AS type_a,
                   y.event_type AS type_b, x.n AS n_a
                 FROM sz x JOIN sz y ON x.d = y.d
                   AND x.event_type < y.event_type)
       SELECT pairs.d, type_a, type_b,
              COALESCE(n_both, 0) AS n_both,
              n_a - COALESCE(n_both, 0) AS n_a_only,
              TRUE AS inter_ok, TRUE AS diff_ok
       FROM pairs LEFT JOIN p USING (d, type_a, type_b)
       ORDER BY 1, 2, 3""") { (s, d) =>
    val t = Tables.events(s, d)
      .select(dayofmonth(col("ts")).as("d"), col("event_type"),
        col("user_id"))
      .filter(col("d") <= 3)
      .distinct()
    val sk = t.groupBy(col("d"), col("event_type"))
      .agg(theta_sketch_agg(col("user_id")).as("sk"),
        count(lit(1)).cast("long").as("n"))
    val both = t.as("x").join(t.as("y"),
        col("x.d") === col("y.d")
          && col("x.user_id") === col("y.user_id")
          && col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.d").as("d"), col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(count(lit(1)).cast("long").as("n_both"))
    val a = sk.select(col("d"), col("event_type").as("type_a"),
      col("sk").as("sk_a"), col("n").as("n_a"))
    val b = sk.select(col("d").as("d2"), col("event_type").as("type_b"),
      col("sk").as("sk_b"))
    val tol = (exact: org.apache.spark.sql.Column) =>
      greatest(lit(2L), (lit(0.05) * exact).cast("long"))
    a.join(b, col("d") === col("d2") && col("type_a") < col("type_b"))
      .join(both, Seq("d", "type_a", "type_b"), "left")
      .select(col("d"), col("type_a"), col("type_b"),
        coalesce(col("n_both"), lit(0L)).as("n_both"),
        (col("n_a") - coalesce(col("n_both"), lit(0L))).as("n_a_only"),
        col("sk_a"), col("sk_b"))
      .select(col("d"), col("type_a"), col("type_b"),
        col("n_both"), col("n_a_only"),
        (abs(theta_sketch_estimate(
            theta_intersection(col("sk_a"), col("sk_b")))
          - col("n_both")) <= tol(col("n_both"))).as("inter_ok"),
        (abs(theta_sketch_estimate(
            theta_difference(col("sk_a"), col("sk_b")))
          - col("n_a_only")) <= tol(col("n_a_only"))).as("diff_ok"))
      .orderBy(col("d"), col("type_a"), col("type_b"))
  }

  /** Curriculum phase assignment — order the corpus easy→hard (token
    * count as the difficulty proxy, doc_id tie-break), split into 4
    * contiguous phases, and give each phase a deterministic shuffle
    * key (md5 of doc_id) so training reads phases in order but docs
    * within a phase in pseudo-random order. No window functions: the
    * global rank comes from the range-shuffle + driver-prefix
    * mechanism ([[graft.ops.Packing.withGlobalOffsets]], the
    * q127/q328 pattern), phase is pure arithmetic on the offset, and
    * the within-phase order is emitted AS the shuffle-key column
    * rather than materialized through a per-phase window (which
    * would sort n/4 rows in one task at scale). */
  val curriculumPhases: QueryDef = QueryDef.sql(
    """WITH t AS (SELECT doc_id,
             len(string_split(trim(text), ' ')) AS score
           FROM documents),
       r AS (SELECT doc_id, CAST(row_number() OVER
               (ORDER BY score, doc_id) AS BIGINT) AS i FROM t),
       n0 AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM t)
       SELECT doc_id, CAST((i - 1) * 4 // nn + 1 AS INTEGER) AS phase,
              md5(CAST(doc_id AS VARCHAR)) AS shuf
       FROM r, n0 ORDER BY phase, shuf, doc_id""") { (s, d) =>
    val base = Tables.documents(s, d)
      .select(col("doc_id"),
        graft.text.TextOps.tokenCount(col("text")).as("score"))
      .withColumn("one", lit(1L))
    val ranked = graft.ops.Packing.withGlobalOffsets(base, "score",
      "one", tieCols = Seq("doc_id"))
    val n = base.agg(count(lit(1)).as("nn"))
    ranked.crossJoin(broadcast(n))
      .select(col("doc_id"),
        (expr("(offset * 4) div nn") + 1).cast("int").as("phase"),
        md5(col("doc_id").cast("string")).as("shuf"))
      .orderBy(col("phase"), col("shuf"), col("doc_id"))
  }

  /** Count-min-sketch heavy hitters — the frequency-sketch family
    * member next to HLL (cardinality, q43/q104), Theta (set algebra,
    * q351), Bloom (membership, q62/q131) and GK (quantiles, q03):
    * sub-linear mergeable state whose estimates NEVER undercount and
    * overcount by at most ε·N with confidence δ. The corpus bigram
    * stream folds into one CMS (ε=0.001, δ=0.99, fixed seed —
    * deterministic given the data); the exact top-20 bigrams then
    * audit it IN-PLAN: `lower_ok` (est ≥ exact, the structural
    * guarantee) and `upper_ok` (est ≤ exact + ⌈ε·N⌉, the
    * probabilistic bound — deterministic for a fixed seed and
    * corpus, and the sketch width ⌈e/ε⌉≈2718 exceeds the bigram
    * vocabulary here, so collisions are rare and est==exact in
    * practice). Estimation is a bounded driver step (read the
    * sketch, probe 20 candidates — the q188/codebook collect
    * pattern), re-entering the plan as a 20-row broadcast; at 100 TB
    * the sketch is the only corpus-sized reduction and is KB-sized
    * mergeable state. */
  val cmsHeavyHitters: QueryDef = QueryDef.sql(
    """WITH t AS (SELECT string_split(trim(text), ' ') AS toks
                  FROM documents),
       g AS (SELECT unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS bg
             FROM t WHERE len(toks) >= 2),
       c AS (SELECT bg, CAST(count(*) AS BIGINT) AS exact_n
             FROM g GROUP BY 1),
       r AS (SELECT bg, exact_n FROM c
             ORDER BY exact_n DESC, bg LIMIT 20)
       SELECT bg, exact_n, TRUE AS lower_ok, TRUE AS upper_ok
       FROM r ORDER BY exact_n DESC, bg""") { (s, d) =>
    import s.implicits._
    // raw occurrence stream, NOT TextOps.shingles (which dedups per
    // doc) — frequency sketches count multiplicity
    val bg = Tables.documents(s, d)
      .select(graft.text.TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    val n = bg.count()
    val eps = 0.001
    val sketchBytes = bg.agg(count_min_sketch(col("bg"), lit(eps),
        lit(0.99), lit(42)).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val top = bg.groupBy(col("bg"))
      .agg(count(lit(1)).cast("long").as("exact_n"))
      .orderBy(col("exact_n").desc, col("bg")).limit(20)
    // bounded driver probe: 20 candidates against the sketch — the
    // aggregate added strings as UTF-8 bytes, so probe the same way
    val ests = top.collect().map(r => (r.getString(0),
        cms.estimateCount(r.getString(0).getBytes("UTF-8"))))
      .toSeq.toDF("bg", "est")
    val slack = math.ceil(eps * n).toLong
    top.join(broadcast(ests), "bg")
      .select(col("bg"), col("exact_n"),
        (col("est") >= col("exact_n")).as("lower_ok"),
        (col("est") <= col("exact_n") + lit(slack)).as("upper_ok"))
      .orderBy(col("exact_n").desc, col("bg"))
  }

  /** Verbatim-duplication spectrum via PREFIX-DOUBLING suffix ranks —
    * the distributed suffix-structure recipe behind suffix-array
    * training-data dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better", arXiv:2107.06499 — their tool
    * builds one giant suffix array; the doubling form is the only
    * shape that survives a cluster): round t labels every token
    * position's forward 2^t-token window by combining round t−1's
    * labels at (p, p+2^(t−1)) — log₂ L rounds of one offset
    * self-join + one label compaction each, never a global suffix
    * sort. Output: per power-of-two window length, how many
    * positions start a window that recurs VERBATIM anywhere in the
    * corpus, and how many documents carry one — the spectrum that
    * separates license boilerplate (deep tiers) from stopword
    * collisions (win 1-2), and the exact-run statistic q79's
    * fixed-16-gram islands sample at a single tier.
    *
    * Labels compact to the MINIMUM (doc, pos) id sharing the window
    * (one groupBy + join-back per round): equality-consistent and
    * deterministic, and the emitted COUNTS are invariant to label
    * values — so the oracle's dense_rank labels agree without the
    * engines ever comparing a rank. Each round localCheckpoints
    * (kCoreProfile lesson: round r references round r−1 three
    * times; an untruncated tree re-analyzes 3^r subtrees) and
    * per-round stats are 1-row aggregates collected as the round
    * completes — the result is a bounded ≤8-row local relation,
    * blocks released before returning. 100 TB shape: log L rounds
    * of key-partitioned shuffles over the (doc, pos) relation. */
  val dupRunTiers: QueryDef = {
    val rounds = (1 to 7).map { t =>
      val off = 1 << (t - 1)
      s"""r$t AS MATERIALIZED (SELECT a.doc_id, a.pos, a.n,
         CAST(dense_rank() OVER (ORDER BY a.rk, b.rk) AS BIGINT) AS rk
         FROM r${t - 1} a JOIN r${t - 1} b
           ON a.doc_id = b.doc_id AND b.pos = a.pos + $off)"""
    }.mkString(",\n")
    val stats = (0 to 7).map { t =>
      s"""SELECT CAST(${1 << t} AS BIGINT) AS win_len,
         CAST(count(*) AS BIGINT) AS n_pos,
         CAST(count(*) FILTER (WHERE c > 1) AS BIGINT) AS n_dup_pos,
         CAST(count(DISTINCT doc_id) FILTER (WHERE c > 1) AS BIGINT)
           AS n_docs
         FROM (SELECT doc_id, count(*) OVER (PARTITION BY rk) AS c
               FROM r$t)"""
    }.mkString(" UNION ALL ")
    QueryDef.sql(
      s"""WITH t AS (SELECT doc_id, string_split(trim(text),' ')
             AS toks FROM documents),
         p0 AS (SELECT doc_id, CAST(u.i AS BIGINT) AS pos, toks[u.i]
                  AS tok, CAST(len(toks) AS BIGINT) AS n
                FROM t, unnest(generate_series(1, len(toks))) u(i)),
         r0 AS MATERIALIZED (SELECT doc_id, pos, n,
           CAST(dense_rank() OVER (ORDER BY tok) AS BIGINT) AS rk
           FROM p0),
         $rounds
         SELECT * FROM ($stats) WHERE n_pos > 0
         ORDER BY win_len""") { (s, d) =>
      import org.apache.spark.sql.DataFrame
      val sc = s.sparkContext
      val ckptIds = scala.collection.mutable.ArrayBuffer[Int]()
      def ckpt(df: DataFrame): DataFrame = {
        val out = df.localCheckpoint()
        out.queryExecution.analyzed.collectFirst {
          case r: org.apache.spark.sql.execution.LogicalRDD =>
            ckptIds += r.rdd.id
        }
        out
      }
      // Per-round plan shape (r15 optimization — measured 9.2 s →
      // see OPTIMIZATION_r15.md): positions are DENSE 1..k per doc
      // at every round (round t keeps exactly the prefix that fits a
      // 2^t window), so the offset self-join on
      // (doc_id, pos + win) IS lead(lbl, win) over the per-doc
      // position order — one window shuffle instead of a two-sided
      // join. Label compaction to min (doc,pos) id is a second
      // window over (la, lb) — the group of a new label is exactly
      // its (la, lb) equivalence class, so the same window also
      // attaches the group SIZE `c`, and each round's stats pass
      // becomes a plain aggregate over the checkpointed round
      // instead of a groupBy-plus-join job. (The unused doc-length
      // column the old rounds carried through every shuffle is
      // dropped — guide §2.3, shuffle fewer bytes.)
      import org.apache.spark.sql.expressions.Window
      val pid = col("doc_id") * lit(1048576L) + col("pos")
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val p0 = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.text.TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          posexplode(col("toks")).as(Seq("pos0", "tok")))
        .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
          col("tok"))
      val wTok = Window.partitionBy(col("tok"))
      var cur = ckpt(p0
        .select(col("doc_id"), col("pos"),
          min(pid).over(wTok).as("lbl"),
          count(lit(1)).over(wTok).as("c")))
      val rows = scala.collection.mutable.ArrayBuffer[
        (Long, Long, Long, Long)]()
      var win = 1L
      var more = true
      while (more) {
        val st = cur
          .agg(count(lit(1)).as("np"),
            coalesce(sum(when(col("c") > 1, 1L).otherwise(0L)), lit(0L))
              .as("ndp"),
            count_distinct(when(col("c") > 1, col("doc_id"))).as("nd"))
          .collect()(0)
        if (st.getLong(0) > 0)
          rows += ((win, st.getLong(0), st.getLong(1), st.getLong(2)))
        more = win < 128 && st.getLong(0) > 0
        if (more) {
          val wl = Window.partitionBy(col("la"), col("lb"))
          cur = ckpt(cur
            .select(col("doc_id"), col("pos"), col("lbl").as("la"),
              lead(col("lbl"), win.toInt).over(wDoc).as("lb"))
            .filter(col("lb").isNotNull)
            .select(col("doc_id"), col("pos"),
              min(pid).over(wl).as("lbl"),
              count(lit(1)).over(wl).as("c")))
          win *= 2
        }
      }
      val reg = sc.getPersistentRDDs
      ckptIds.foreach(id =>
        reg.get(id).foreach(_.unpersist(blocking = false)))
      import s.implicits._
      rows.toSeq.toDF("win_len", "n_pos", "n_dup_pos", "n_docs")
        .orderBy(col("win_len"))
    }
  }

  /** Duplicate-span REMOVAL (the consumer-facing form of the q358
    * suffix machinery; Lee et al. '21 "Deduplicating Training Data
    * Makes Language Models Better", the ExactSubstr removal step —
    * reference has no analogue; LLM-pipeline extension): every
    * 16-token window occurring ≥2 times corpus-wide keeps its FIRST
    * occurrence (global min (doc_id, pos)) and is CUT everywhere
    * else. Emits, per affected document, the merged removable spans'
    * count, removed-token total, and the cleaned text with those
    * spans excised — q79 only MARKS spans (including the copy you'd
    * keep); this is the edit a curation pipeline actually applies.
    *
    * Scale shape: keep-first is a map-side-partial `min(struct(
    * doc_id, pos))` over the gram index (no window over the corpus,
    * no arithmetic pid packing — a ≥1M-token document cannot corrupt
    * first-occurrence selection); the dup-gram join carries NO
    * broadcast hint: in exactly the regime this query exists for
    * (Lee et al. on web corpora, where duplicated substrings are a
    * large corpus fraction) `dup` is a corpus-scale relation, so AQE
    * broadcasts while measured-small and flips to a shuffle join —
    * which reuses `dup`'s gh hash-partitioning from its own groupBy —
    * once it isn't (the q74 discipline; gated hint-free in
    * `PlanAuditSpec`, max-task-bounded at the text-skew 100× tier);
    * island merging is a per-document window over REMOVABLE positions
    * only; the cleaned-text rebuild is one anti join equi-keyed by
    * doc_id (range residual) plus a per-doc sort — all row-local in
    * the document dimension, nothing pairwise. */
  val dupSpanRemoval: QueryDef = QueryDef.sql(
    """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
                  FROM documents),
       g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
               array_to_string(toks[i:i+15], ' ') AS gram
             FROM t, unnest(generate_series(1, len(toks) - 15)) AS s(i)
             WHERE len(toks) >= 16),
       h AS (SELECT doc_id, pos FROM (
               SELECT doc_id, pos,
                 row_number() OVER (PARTITION BY gram
                   ORDER BY doc_id, pos) AS rn,
                 count(*) OVER (PARTITION BY gram) AS cnt
               FROM g)
             WHERE cnt >= 2 AND rn > 1),
       isl AS (SELECT doc_id, pos,
               CASE WHEN pos > COALESCE(max(pos + 15) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                 THEN 1 ELSE 0 END AS new_island
             FROM h),
       grp AS (SELECT doc_id, pos, sum(new_island) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS island
               FROM isl),
       sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 15 AS e
              FROM grp GROUP BY doc_id, island),
       stats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                   CAST(sum(e - s + 1) AS BIGINT) AS n_removed
                 FROM sp GROUP BY doc_id),
       pos AS (SELECT doc_id, CAST(u.i AS BIGINT) AS pos, toks[u.i]
                 AS tok
               FROM t, unnest(generate_series(1, len(toks))) u(i)),
       kept AS (SELECT p.doc_id, p.pos, p.tok
                FROM pos p LEFT JOIN sp ON p.doc_id = sp.doc_id
                  AND p.pos BETWEEN sp.s AND sp.e
                WHERE sp.s IS NULL),
       ct AS (SELECT doc_id,
                string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
              FROM kept GROUP BY doc_id)
       SELECT st.doc_id, st.n_spans, st.n_removed,
         COALESCE(ct.cleaned_text, '') AS cleaned_text
       FROM stats st LEFT JOIN ct ON st.doc_id = ct.doc_id
       ORDER BY st.doc_id""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val k = 16
    graft.functions.GraftFunctions.register(s)
    val toksDf = Tables.documents(s, d)
      .select(col("doc_id"), graft.text.TextOps.tokens(col("text"))
        .as("toks"))
    // 8-byte positional gram hashes stand in for gram strings, the
    // q79 discipline (collision odds ~grams²/2^65)
    val grams = toksDf.filter(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(
        graft.functions.GraftFunctions.gramHashes(col("toks"), k))
        .as(Seq("pos0", "gh")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("gh"))
    // keep-first: one map-side-partial (count, min (doc_id, pos)
    // struct — lexicographic, no width-bounded packing) per gram;
    // NO broadcast hint on the join (dup is corpus-scale in the
    // web-corpus regime — AQE flips broadcast→shuffle at the
    // measured size, and the shuffle reuses dup's gh partitioning)
    val dup = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("keep"))
      .filter(col("cnt") >= 2)
      .select(col("gh"), col("keep"))
    val hits = grams.join(dup, Seq("gh"))
      .filter(struct(col("doc_id"), col("pos")) =!= col("keep"))
      .select(col("doc_id"), col("pos"))
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = hits
      .withColumn("new_island",
        (col("pos") > coalesce(max(col("pos") + (k - 1)).over(wPrev),
          lit(-1L))).cast("int"))
      .withColumn("island", sum(col("new_island")).over(wRun))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (k - 1)).as("e"))
      .select(col("doc_id"), col("s"), col("e"))
    val stats = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("n_removed"))
    val positions = toksDf
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("tok"))
    // anti join equi-keyed by doc_id, range residual: a position
    // survives iff no removable span covers it (spans are disjoint
    // by construction, so at most one could)
    val kept = positions.alias("p").join(spans.alias("sp"),
      col("p.doc_id") === col("sp.doc_id")
        && col("p.pos").between(col("s"), col("e")), "left_anti")
    val cleaned = kept.groupBy(col("doc_id"))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok"))).as("cleaned_text"))
    stats.join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"), col("n_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
      .orderBy(col("doc_id"))
  }

  val defs: Map[String, QueryDef] = Map(
    "q360_dup_span_removal" -> dupSpanRemoval,
    "q359_containment_dfcap" -> containmentDfCap,
    "q358_dup_run_tiers" -> dupRunTiers,
    "q354_cms_heavy_hitters" -> cmsHeavyHitters,
    "q348_rag_chunking" -> ragChunking,
    "q349_chunk_dedup" -> chunkDedup,
    "q350_tokenizer_fertility" -> tokenizerFertility,
    "q351_theta_audience_overlap" -> thetaAudienceOverlap,
    "q352_curriculum_phases" -> curriculumPhases,
    "q343_vocab_coverage_tiers" -> vocabCoverageTiers,
    "q321_token_burstiness" -> tokenBurstiness,
    "q287_oov_rate" -> oovRate,
    "q289_token_jsd" -> tokenJsd,
    "q298_herfindahl_sources" -> herfindahlSources,
    "q222_source_overlap" -> sourceOverlap,
    "q261_shard_balance" -> shardBalance,
    "q265_source_length_kl" -> sourceLengthKl,
    "q268_heaps_law" -> heapsLaw,
    "q223_dataset_card" -> datasetCard,
    "q227_blocklist_filter" -> blocklistFilter,
    "q230_containment_topk" -> containmentTopk,
    "q231_sorted_neighborhood" -> sortedNeighborhood)
}
