package graft.queries

import graft.operators.{Ewma, HtmlClean, Redact, Repetition}

/** DuckDB oracle SQL twins for [[Queries]] (driver contract: run on the
  * same parquet tables, hash-compared column-by-column).
  *
  * Parity strategy (SURVEY.md §5.1 + Q7):
  *  - float SUMs are decimal-exact on both sides (DECIMAL(38,6) /
  *    DECIMAL(38,12)) → bit-identical doubles at any parallelism;
  *  - EWMA uses a recursive CTE replicating the fold's IEEE arithmetic
  *    op-for-op (constants embedded as Scala-printed shortest-repr
  *    literals, which parse to the identical double);
  *  - `ROUND` everywhere matches Spark `round` (HALF_UP); int-rounding
  *    uses FLOOR(x+0.5) (pure binary IEEE on both engines);
  *  - every query ends in the same total ORDER BY.
  *
  * EVERY registered query has a full oracle — the formerly
  * engine-side-only hashes were restated in SQL-expressible form:
  * q16_minhash_lsh oracles against the exact-Jaccard pair set (planted
  * near-dups are recalled with probability 1−O(10⁻¹¹)); q20/q29 derive
  * their LSH hyperplanes / IVF centroids from data with decimal-exact
  * sign tests; q23 uses the polynomial-hash simhash (bounded integer
  * arithmetic — the xxhash64 variant stays the production fingerprint,
  * spec-tested).
  */
object Oracles {

  private val CI = Ewma.CtlImpact.toString
  private val CD = Ewma.CtlDecay.toString
  private val AI = Ewma.AtlImpact.toString
  private val AD = Ewma.AtlDecay.toString

  /** Exact double sum via decimal. */
  private def dsum(x: String) = s"CAST(SUM(CAST($x AS DECIMAL(38,6))) AS DOUBLE)"

  private val dailyCte =
    s"daily AS (SELECT CAST(ts AS DATE) AS d, event_type, ${dsum("value")} AS tss FROM events GROUP BY 1, 2)"

  /** spine of all days between min/max of `src`.`dcol`. */
  private def spineCte(src: String) =
    s"""b AS (SELECT min(d) AS d0, max(d) AS d1 FROM $src),
       |spine AS (SELECT CAST(u AS DATE) AS d FROM (SELECT unnest(generate_series((SELECT d0 FROM b), (SELECT d1 FROM b), INTERVAL 1 DAY)) AS u))""".stripMargin

  private val filledCte =
    s"""$dailyCte,
       |${spineCte("daily")},
       |combos AS (SELECT DISTINCT event_type FROM daily),
       |filled AS (
       |  SELECT c.event_type, s.d, COALESCE(dl.tss, 0.0) AS tss
       |  FROM spine s CROSS JOIN combos c
       |  LEFT JOIN daily dl ON dl.d = s.d AND dl.event_type = c.event_type
       |)""".stripMargin

  private val toksExpr = "list_filter(string_split(text, ' '), x -> len(x) > 0)"

  /** q155/q156 shared SQL: PII injection CASE + the three redaction
    * passes in engine order, counts taken per-pass (Redact scaladoc).
    * Regexes interpolate from [[Redact]] so engine and oracle can
    * never drift.
    */
  private lazy val piiRedactSql: String =
    s"""WITH inj AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 9 = 0 THEN
       |      text || ' contact user' || CAST(doc_id AS VARCHAR) ||
       |      '@example.com at 10.' || CAST(doc_id % 200 AS VARCHAR) ||
       |      '.' || CAST(doc_id % 250 AS VARCHAR) ||
       |      '.' || CAST(doc_id % 100 AS VARCHAR) ||
       |      ' or call +1-555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
       |      '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |    WHEN doc_id % 17 = 0 THEN
       |      text || ' mail ' || CAST(doc_id AS VARCHAR) || '@mail.example.org'
       |    WHEN doc_id % 13 = 0 THEN
       |      text || ' ring (555) 123-' ||
       |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
       |      ' or 555.123.' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
       |      ' not 999.999.999.999 but 192.168.' ||
       |      CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR)
       |    ELSE text END AS text
       |  FROM documents
       |),
       |r1 AS (
       |  SELECT doc_id, text AS t0,
       |    regexp_replace(text, '${Redact.EmailRe}', '${Redact.EmailToken}', 'g') AS t1
       |  FROM inj
       |),
       |r2 AS (
       |  SELECT doc_id, t0, t1,
       |    regexp_replace(t1, '${Redact.PhoneRe}', '${Redact.PhoneToken}', 'g') AS t2
       |  FROM r1
       |)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t0, '${Redact.EmailRe}')) AS INTEGER) AS n_emails,
       |  CAST(len(regexp_extract_all(t1, '${Redact.PhoneRe}')) AS INTEGER) AS n_phones,
       |  CAST(len(regexp_extract_all(t2, '${Redact.IpRe}')) AS INTEGER) AS n_ips,
       |  regexp_replace(t2, '${Redact.IpRe}', '${Redact.IpToken}', 'g') AS clean_text
       |FROM r2 ORDER BY doc_id""".stripMargin

  /** q101's CDC-chunking oracle — shared verbatim by q109 (the
    * streamed kernel must emit the identical chunk table).
    */
  private lazy val cdcChunkingSql =
    s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 300
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents WHERE doc_id < 300)
         |),
         |t AS (SELECT doc_id, $toksExpr AS toks FROM corpus),
         |p AS (SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS i FROM t),
         |hb AS (
         |  SELECT doc_id, tok, i,
         |    (list_sum([CAST(ord(substr(tok, j, 1)) AS BIGINT) * CAST((j % 31) + 1 AS BIGINT) FOR j IN range(1, length(tok) + 1)]) % 2147483647) % 16 = 0 AS b
         |  FROM p
         |),
         |c AS (
         |  SELECT doc_id, tok, i,
         |    COALESCE(SUM(CASE WHEN b THEN 1 ELSE 0 END) OVER (
         |      PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cidx
         |  FROM hb
         |)
         |SELECT doc_id, CAST(cidx AS BIGINT) AS chunk_idx,
         |  array_to_string(list(tok ORDER BY i), ' ') AS chunk,
         |  CAST(COUNT(*) AS BIGINT) AS n_tokens
         |FROM c GROUP BY doc_id, cidx
         |ORDER BY doc_id, chunk_idx""".stripMargin


  /** q70's heavy-hitters oracle — shared verbatim by q106 (the
    * streamed sketch satisfies the same bound booleans).
    */
  private lazy val heavyHittersSql =
    s"""WITH t AS (SELECT unnest($toksExpr) AS tok FROM documents),
         |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY tok)
         |SELECT tok, cnt, TRUE AS ok_lower, TRUE AS ok_upper
         |FROM c ORDER BY cnt DESC, tok LIMIT 10""".stripMargin


  /** q32's full components oracle — shared verbatim by q105 (the
    * incremental label fold must equal the from-scratch recompute).
    */
  private lazy val componentsSql =
    s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents)
         |),
         |${shingleCte("corpus")},
         |pairs AS (
         |  SELECT * FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, ${jaccardExpr("a.s", "b.s")} AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  ) WHERE jaccard >= 0.5
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |),
         |reach(v, m) AS (
         |  SELECT doc_id, doc_id FROM corpus
         |  UNION
         |  SELECT e.dst, r.m FROM reach r JOIN edges e ON e.src = r.v
         |)
         |SELECT v AS doc_id, MIN(m) AS canonical_id
         |FROM reach GROUP BY v ORDER BY doc_id""".stripMargin


  /** q29's full IVF oracle — shared verbatim by q104 (the stored-
    * index roundtrip must reproduce the inline operator exactly).
    */
  private lazy val ivfSeededSql =
    s"""WITH n AS (
         |  SELECT vec_id, embedding,
         |    sqrt(CAST(list_sum([CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len(embedding) + 1)]) AS DOUBLE)) AS nrm
         |  FROM embeddings
         |),
         |s AS (SELECT vec_id AS cell, embedding AS sv, nrm AS sn FROM n WHERE vec_id < 16),
         |cs AS (
         |  SELECT v.vec_id, v.embedding, v.nrm, s.cell,
         |    CASE WHEN v.nrm * s.sn > 0 THEN
         |      CAST(list_sum([CAST(CAST(v.embedding[i] AS DOUBLE) * CAST(s.sv[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len(v.embedding) + 1)]) AS DOUBLE) / (v.nrm * s.sn)
         |    ELSE 0.0 END AS csim
         |  FROM n v CROSS JOIN s
         |),
         |assign AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
         |    FROM cs) WHERE rn = 1
         |),
         |probes AS (
         |  SELECT vec_id AS query_id, cell FROM (
         |    SELECT vec_id, cell,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
         |    FROM cs WHERE vec_id < 50) WHERE rn <= 4
         |),
         |scored AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id,
         |    CASE WHEN qn.nrm * cn.nrm > 0 THEN
         |      CAST(list_sum([CAST(CAST(qn.embedding[i] AS DOUBLE) * CAST(cn.embedding[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len(qn.embedding) + 1)]) AS DOUBLE) / (qn.nrm * cn.nrm)
         |    ELSE 0.0 END AS sim
         |  FROM probes p
         |  JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
         |  JOIN n qn ON qn.vec_id = p.query_id
         |  JOIN n cn ON cn.vec_id = a.vec_id
         |)
         |SELECT query_id, neighbor_id, sim,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS "rank"
         |FROM scored
         |QUALIFY "rank" <= 5
         |ORDER BY query_id, "rank"""".stripMargin


  /** The q99/q102 BPE unroll: `iters` merge rounds as materialized
    * CTEs (words0 … words`iters`, best1 … best`iters`). Pair stats
    * are a position self-join (overlapping occurrences, like the
    * reference get_stats); the greedy non-overlapping merge is the
    * run-parity selection — in each maximal run of consecutive
    * candidate positions, greedy takes the 1st, 3rd, 5th… (odd
    * parity), which is exactly the left-to-right scan.
    * MATERIALIZED is load-bearing: DuckDB inlines plain CTEs per
    * reference, and this chain references each table ~5 times per
    * round — 12 rounds of inlining re-expands the parquet scan
    * exponentially (observed: fd exhaustion at 20k open files).
    */
  /** Semantic contamination replay (q147 batch + q149 stream —
    * stream ≡ batch, one SQL): nearest-benchmark argmax with exact
    * cosines, ties to the lowest bench id, exact ≥ 0.4 threshold.
    */
  private lazy val semanticContaminationSql: String =
    s"""WITH n AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    sqrt(${dotX("embedding", "embedding")}) AS nrm
       |  FROM embeddings
       |),
       |bench AS (SELECT vec_id AS cell, embedding AS sv, nrm AS sn FROM n WHERE vec_id % 50 = 0),
       |corpus AS (SELECT vec_id, embedding, nrm FROM n WHERE vec_id % 50 <> 0),
       |cs AS (
       |  SELECT c.vec_id, b.cell,
       |    CASE WHEN c.nrm * b.sn > 0 THEN ${dotX("c.embedding", "b.sv")} / (c.nrm * b.sn)
       |    ELSE 0.0 END AS sim
       |  FROM corpus c CROSS JOIN bench b
       |),
       |best AS (
       |  SELECT vec_id, cell, sim FROM (
       |    SELECT vec_id, cell, sim,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
       |    FROM cs) WHERE rn = 1
       |)
       |SELECT vec_id, cell AS bench_id, sim
       |FROM best WHERE sim >= 0.4 ORDER BY vec_id""".stripMargin

  /** ExactSubstr batch replay tail (q146/q148): expects a `corpus`
    * CTE (doc_id, text) to be open in the enclosing WITH; tokenizes,
    * computes window df, positional coverage, the removed-token
    * interval union, and rebuilds every cleaned string.
    * `finalWhere` restricts the OUTPUT rows (q148 gates the delta
    * slice of the batch semantics — incremental ≡ from-scratch).
    */
  private def exactSubstrTail(finalWhere: String): String =
    s""",
       |t AS MATERIALIZED (SELECT doc_id, $toksExpr AS toks FROM corpus),
       |w AS MATERIALIZED (
       |  SELECT doc_id,
       |    unnest(list_distinct([array_to_string(toks[i:i+9], ' ')
       |      FOR i IN range(1, greatest(len(toks) - 9, 1) + 1)])) AS win
       |  FROM t
       |),
       |dfq AS MATERIALIZED (
       |  SELECT win FROM (SELECT win, COUNT(*) AS c FROM w GROUP BY win)
       |  WHERE c >= 2
       |),
       |pw AS (
       |  SELECT doc_id,
       |    unnest(generate_series(0, greatest(len(toks) - 10, 0))) AS pos,
       |    unnest([array_to_string(toks[i:i+9], ' ')
       |      FOR i IN range(1, greatest(len(toks) - 9, 1) + 1)]) AS win
       |  FROM t
       |),
       |dp AS MATERIALIZED (SELECT pw.doc_id, pw.pos FROM pw JOIN dfq USING (win)),
       |rem AS MATERIALIZED (
       |  SELECT DISTINCT dp.doc_id, dp.pos + o.off AS j
       |  FROM dp JOIN t USING (doc_id)
       |  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS off) o
       |  WHERE dp.pos + o.off < len(t.toks)
       |),
       |rl AS (SELECT doc_id, list(j ORDER BY j) AS rj FROM rem GROUP BY doc_id),
       |sel AS (
       |  SELECT t.doc_id, t.toks, COALESCE(rl.rj, []) AS rj
       |  FROM t LEFT JOIN rl USING (doc_id)
       |)
       |SELECT doc_id,
       |  COALESCE(array_to_string([toks[j + 1] FOR j IN range(0, len(toks))
       |    IF NOT list_contains(rj, j)], ' '), '') AS clean_text,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(rj) AS BIGINT) AS n_removed,
       |  CAST(len([j FOR j IN rj IF NOT list_contains(rj, j - 1)]) AS BIGINT) AS n_spans
       |FROM sel $finalWhere ORDER BY doc_id""".stripMargin

  /** Unigram-LM head CTEs (q141/q144): distinct-word table, seed
    * inventory (all chars + top-300 multi-char substrings ≤ 4,
    * occurrence-weighted), and the initial model m0 as 9-dp scaled
    * BIGINT neg-log-probs — the q133 scaled-integer discipline.
    */
  private def unigramHeadCtes: String =
    s"""WITH RECURSIVE uwords AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($toksExpr) AS w FROM documents) GROUP BY w
       |),
       |uchars AS (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS f FROM (
       |    SELECT freq, unnest([substr(w, i, 1) FOR i IN range(1, length(w) + 1)]) AS piece
       |    FROM uwords
       |  ) GROUP BY piece
       |),
       |umulti AS (
       |  SELECT piece, f FROM (
       |    SELECT piece, CAST(SUM(freq) AS BIGINT) AS f FROM (
       |      SELECT freq, unnest(
       |        [substr(w, i, 2) FOR i IN range(1, length(w))] ||
       |        [substr(w, i, 3) FOR i IN range(1, length(w) - 1)] ||
       |        [substr(w, i, 4) FOR i IN range(1, length(w) - 2)]) AS piece
       |      FROM uwords
       |    ) GROUP BY piece
       |  ) ORDER BY f DESC, piece LIMIT 300
       |),
       |useed AS MATERIALIZED (
       |  SELECT piece, f FROM uchars UNION ALL SELECT piece, f FROM umulti
       |),
       |m0 AS MATERIALIZED (
       |  SELECT piece, CAST(ROUND(-ln(CAST(f AS DOUBLE)
       |    / CAST((SELECT SUM(f) FROM useed) AS DOUBLE)) * 1e9) AS BIGINT) AS nlp
       |  FROM useed
       |)""".stripMargin

  /** One unigram hard-EM round as CTEs: full Viterbi DP per distinct
    * word — the cost recurrence as a `list_reduce` fold over the
    * per-position nlp matrix (integer-exact scaled-long costs), the
    * argmin-length vector with ties to the LONGEST piece (l = 4
    * checked first — mirrors the kernel's descending-l strict
    * improvement), a fold-based backtrack, piece extraction, and the
    * add-one M-step. Absent pieces cost 1e15 (the
    * [[graft.functions.UnigramLmModel.Big]] literal).
    */
  private def unigramRoundCtes(r: Int, model: String, inv: String = "useed"): String =
    s"""cand$r AS (
       |  SELECT w, freq, j, l, substr(w, CAST(j - l + 1 AS INTEGER), CAST(l AS INTEGER)) AS sub
       |  FROM (SELECT w, freq, unnest(generate_series(1, length(w))) AS j FROM uwords)
       |  CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS l) ll
       |  WHERE l <= j
       |),
       |nl$r AS (
       |  SELECT c.w, c.j, c.l, COALESCE(m.nlp, 1000000000000000) AS nlp
       |  FROM cand$r c LEFT JOIN $model m ON m.piece = c.sub
       |),
       |mat$r AS MATERIALIZED (
       |  SELECT w, list(vec ORDER BY j) AS mat FROM (
       |    SELECT w, j,
       |      [COALESCE(MAX(CASE WHEN l = 1 THEN nlp END), 1000000000000000),
       |       COALESCE(MAX(CASE WHEN l = 2 THEN nlp END), 1000000000000000),
       |       COALESCE(MAX(CASE WHEN l = 3 THEN nlp END), 1000000000000000),
       |       COALESCE(MAX(CASE WHEN l = 4 THEN nlp END), 1000000000000000)] AS vec
       |    FROM nl$r GROUP BY w, j
       |  ) GROUP BY w
       |),
       |dp$r AS MATERIALIZED (
       |  SELECT w, mat,
       |    list_reduce(list_prepend(CAST([0] AS BIGINT[]), mat),
       |      (acc, x) -> list_append(acc,
       |        least(COALESCE(acc[-1], 4000000000000000000) + x[1],
       |              COALESCE(acc[-2], 4000000000000000000) + x[2],
       |              COALESCE(acc[-3], 4000000000000000000) + x[3],
       |              COALESCE(acc[-4], 4000000000000000000) + x[4]))) AS cost
       |  FROM mat$r
       |),
       |bt$r AS MATERIALIZED (
       |  SELECT w, cost,
       |    [CASE WHEN j >= 4 AND cost[j - 3] + mat[j][4] = cost[j + 1] THEN 4
       |          WHEN j >= 3 AND cost[j - 2] + mat[j][3] = cost[j + 1] THEN 3
       |          WHEN j >= 2 AND cost[j - 1] + mat[j][2] = cost[j + 1] THEN 2
       |          ELSE 1 END FOR j IN range(1, len(mat) + 1)] AS bl
       |  FROM dp$r
       |),
       |bkt$r(w, j) AS (
       |  -- backtrack as a RECURSIVE walk (plain list indexing, no
       |  -- lambda: DuckDB 1.0's list_reduce mixes rows when the
       |  -- lambda references an outer column under parallelism)
       |  SELECT w, CAST(len(bl) AS BIGINT) AS j FROM bt$r
       |  UNION ALL
       |  SELECT b.w, r.j - b.bl[CAST(r.j AS INTEGER)]
       |  FROM bkt$r r JOIN bt$r b USING (w) WHERE r.j > 0
       |),
       |seg$r AS MATERIALIZED (
       |  SELECT w, list(j ORDER BY j DESC) AS bnd FROM bkt$r GROUP BY w
       |),
       |pieces$r AS MATERIALIZED (
       |  SELECT s.w, uw.freq,
       |    unnest([substr(s.w, CAST(s.bnd[i + 1] AS INTEGER) + 1,
       |        CAST(s.bnd[i] - s.bnd[i + 1] AS INTEGER))
       |      FOR i IN range(len(s.bnd) - 1, 0, -1)]) AS piece
       |  FROM seg$r s JOIN uwords uw ON uw.w = s.w
       |),
       |cnt$r AS MATERIALIZED (
       |  SELECT s.piece, CAST(COALESCE(SUM(p.freq), 0) AS BIGINT) AS c_raw
       |  FROM $inv s LEFT JOIN pieces$r p ON p.piece = s.piece
       |  GROUP BY s.piece
       |),
       |m$r AS MATERIALIZED (
       |  SELECT piece, CAST(ROUND(-ln(CAST(c_raw + 1 AS DOUBLE)
       |    / CAST((SELECT SUM(c_raw + 1) FROM cnt$r) AS DOUBLE)) * 1e9) AS BIGINT) AS nlp
       |  FROM cnt$r
       |)""".stripMargin

  /** `head` must open the WITH chain and end with a `words0` CTE of
    * (w, freq BIGINT, syms = per-char list) — the default is the
    * corpus word table; the byte-BPE variant feeds a remapped one.
    */
  private def bpeUnrollCtes(iters: Int,
      headOverride: Option[String] = None): String = {
    val head = headOverride.getOrElse(
      s"""WITH words0 AS MATERIALIZED (
         |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, string_split(w, '') AS syms
         |  FROM (SELECT unnest($toksExpr) AS w FROM documents)
         |  GROUP BY w
         |)""".stripMargin)
    val rounds = (1 to iters).map { k =>
      val p = k - 1
      s"""pos$k AS MATERIALIZED (
         |  SELECT w, freq, unnest(syms) AS s, generate_subscripts(syms, 1) AS i
         |  FROM words$p
         |),
         |pair$k AS MATERIALIZED (
         |  SELECT p1.s AS l, p2.s AS r, SUM(p1.freq) AS cnt
         |  FROM pos$k p1 JOIN pos$k p2 ON p1.w = p2.w AND p2.i = p1.i + 1
         |  GROUP BY 1, 2
         |),
         |best$k AS MATERIALIZED (
         |  SELECT l, r, CAST(cnt AS BIGINT) AS cnt FROM pair$k
         |  ORDER BY cnt DESC, l, r LIMIT 1
         |),
         |cand$k AS MATERIALIZED (
         |  SELECT w, freq, i, s,
         |    COALESCE(s = (SELECT l FROM best$k)
         |      AND lead(s) OVER (PARTITION BY w ORDER BY i) = (SELECT r FROM best$k),
         |      FALSE) AS c
         |  FROM pos$k
         |),
         |runs$k AS MATERIALIZED (
         |  SELECT w, freq, i, s, c,
         |    i - ROW_NUMBER() OVER (PARTITION BY w, c ORDER BY i) AS grp
         |  FROM cand$k
         |),
         |sel$k AS MATERIALIZED (
         |  SELECT w, freq, i, s, c,
         |    CASE WHEN c THEN (ROW_NUMBER() OVER (
         |      PARTITION BY w, c, grp ORDER BY i) % 2 = 1)
         |    ELSE FALSE END AS sel
         |  FROM runs$k
         |),
         |out$k AS MATERIALIZED (
         |  SELECT w, freq, i,
         |    CASE WHEN sel THEN s || lead(s) OVER (PARTITION BY w ORDER BY i)
         |         ELSE s END AS s2,
         |    COALESCE(lag(sel) OVER (PARTITION BY w ORDER BY i), FALSE) AS dropped
         |  FROM sel$k
         |),
         |words$k AS MATERIALIZED (
         |  SELECT w, freq, list(s2 ORDER BY i) AS syms
         |  FROM out$k WHERE NOT dropped GROUP BY w, freq
         |)""".stripMargin
    }
    (Seq(head) ++ rounds).mkString(",\n")
  }

  /** Byte-BPE unroll head: the q193/q194 corpus (tokens + the planted
    * multibyte token) with every word BYTE-REMAPPED in SQL — UTF-8
    * bytes recovered by hex-ing the encoded word (uppercase hex
    * digits parsed with the md5-48 idiom), joined to the 256-row
    * GPT-2 `bytes_to_unicode` table (interpolated from
    * [[graft.functions.ByteAlphabet]] so engine and oracle share one
    * bijection), reassembled in byte order. `rm` (w → rw) stays open
    * for q194's roundtrip tail; words0 feeds the standard unroll.
    */
  private lazy val byteBpeHead: String = {
    val bmRows = (0 to 255).map(b =>
      s"($b, ${graft.functions.ByteAlphabet.byteToChar(b).toInt})")
      .grouped(8).map(_.mkString(", ")).mkString(",\n       |  ")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(list_append($toksExpr,
       |      CASE WHEN doc_id % 3 = 0 THEN 'süß'
       |           WHEN doc_id % 3 = 1 THEN '日本語a'
       |           ELSE '🚀end' END)) AS w
       |    FROM documents) GROUP BY w
       |),
       |bm(b, cp) AS (VALUES
       |  $bmRows),
       |by0 AS MATERIALIZED (
       |  SELECT w, freq, i,
       |    CAST(strpos('0123456789ABCDEF', substr(hx, CAST(2*i-1 AS BIGINT), 1)) - 1 AS BIGINT) * 16 +
       |    CAST(strpos('0123456789ABCDEF', substr(hx, CAST(2*i AS BIGINT), 1)) - 1 AS BIGINT) AS bv
       |  FROM (SELECT w, freq, hex(encode(w)) AS hx,
       |        unnest(range(1, octet_length(encode(w)) + 1)) AS i FROM w0)
       |),
       |rm AS MATERIALIZED (
       |  SELECT w, freq, string_agg(chr(CAST(bm.cp AS INTEGER)), '' ORDER BY i) AS rw
       |  FROM by0 JOIN bm ON bm.b = by0.bv GROUP BY w, freq
       |),
       |words0 AS MATERIALIZED (
       |  SELECT rw AS w, freq, string_split(rw, '') AS syms FROM rm
       |)""".stripMargin
  }

  /** 3-gram shingle CTE over `src` (needs doc_id, text). */
  private def shingleCte(src: String) =
    s"""sh AS (
       |  SELECT doc_id,
       |    list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, greatest(len(toks) - 2, 1) + 1)]) AS s
       |  FROM (SELECT doc_id, $toksExpr AS toks FROM $src)
       |)""".stripMargin

  private def jaccardExpr(a: String, b: String) =
    s"CAST(len(list_intersect($a, $b)) AS DOUBLE) / CAST(GREATEST(len($a) + len($b) - len(list_intersect($a, $b)), 1) AS DOUBLE)"

  private val kExpr = "CAST(props->>'$.k' AS BIGINT)"

  /** Exact brute-force cosine top-5 (vec_id < 50 queries) — shared by
    * q17 (brute-force engine path) and q61 (int8-quantized engine
    * path): both must produce the identical exact answer.
    */
  private val cosineTopKSql =
    s"""WITH n AS (
       |  SELECT vec_id, embedding,
       |    sqrt(CAST(list_sum([CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len(embedding) + 1)]) AS DOUBLE)) AS nrm
       |  FROM embeddings
       |),
       |p AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CAST(list_sum([CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len(q.embedding) + 1)]) AS DOUBLE) AS dt,
       |    q.nrm * c.nrm AS den
       |  FROM n q JOIN n c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 50
       |),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    CASE WHEN den > 0 THEN dt / den ELSE 0.0 END AS sim
       |  FROM p
       |)
       |SELECT query_id, neighbor_id, sim,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS "rank"
       |FROM scored
       |QUALIFY "rank" <= 5
       |ORDER BY query_id, "rank"""".stripMargin

  /** Decimal-exact dot product over two list columns (the
    * [[graft.operators.Similarity.dotExact]] twin — q26/q29/q20
    * pattern).
    */
  private def dotX(a: String, b: String) =
    s"CAST(list_sum([CAST(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len($a) + 1)]) AS DOUBLE)"

  /** Two UNROLLED exact Lloyd's iterations (k=8, dim=64) as a CTE
    * chain — bit-for-bit the [[graft.operators.Similarity
    * .kmeansCentroidsExact]] recurrence: init = 8 lowest-id vectors;
    * assignment = argmin of the per-term-quantized squared distance
    * (ties → lowest cell; squares are tie-free under the scale-12
    * cast — even dyadic exponent — so HALF_UP vs HALF_EVEN never
    * diverges); means = 2^43-integer-scaled exact sums divided as
    * doubles (raw float VALUES can tie at scale 12 — 1625/2^13 does —
    * so no decimal cast of raw values); empty cells keep their
    * centroid (the COALESCE). `p` prefixes every CTE name so the
    * chain composes into larger replays (q206's trained-coarse
    * IVFADC) without colliding with their aliases; the trained model
    * is `${p}c2 (cell, c)`.
    */
  private def kmeansCtes(p: String): String = {
    val dist = (c: String) =>
      s"list_sum([CAST((w.e[i] - $c.c[i]) * (w.e[i] - $c.c[i]) AS DECIMAL(18,12)) FOR i IN range(1, 65)])"
    def iter(aN: String, mN: String, cPrev: String, cN: String) =
      s"""$aN AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT w.vec_id, $cPrev.cell,
         |      row_number() OVER (PARTITION BY w.vec_id ORDER BY ${dist(cPrev)}, $cPrev.cell) AS rn
         |    FROM ${p}v w CROSS JOIN $cPrev
         |  ) WHERE rn = 1
         |),
         |$mN AS (
         |  SELECT $aN.cell, pz.i AS pos,
         |    CAST(SUM(CAST(floor(w.e[pz.i] * 8796093022208.0) AS BIGINT)) AS DOUBLE) / 8796093022208.0 / COUNT(*) AS m
         |  FROM $aN JOIN ${p}v w USING (vec_id) CROSS JOIN (SELECT unnest(range(1, 65)) AS i) pz
         |  GROUP BY $aN.cell, pz.i
         |),
         |$cN AS (
         |  SELECT $cPrev.cell, coalesce(mm.c, $cPrev.c) AS c
         |  FROM $cPrev LEFT JOIN (SELECT cell, list(m ORDER BY pos) AS c FROM $mN GROUP BY cell) mm USING (cell)
         |)""".stripMargin
    s"""${p}v AS (
       |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings
       |),
       |${p}c0 AS (
       |  SELECT (row_number() OVER (ORDER BY vec_id) - 1) AS cell, e AS c
       |  FROM (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e
       |        FROM embeddings ORDER BY vec_id LIMIT 8)
       |),
       |${iter(s"${p}a1", s"${p}m1", s"${p}c0", s"${p}c1")},
       |${iter(s"${p}a2", s"${p}m2", s"${p}c1", s"${p}c2")}""".stripMargin
  }

  /** BM25 oracle generator for an arbitrary term list — the q75
    * handwritten SQL with the per-term df/tf/score blocks emitted in
    * a loop, score terms summed LEFT-ASSOCIATIVELY in list order
    * (DuckDB's `t0 + t1 + ...` parse mirrors the Spark side's
    * `reduce(_ + _)` tree), rounded 6dp before rank/filter.
    */
  private def bm25Sql(terms: Seq[String], k: Int,
      where: String = ""): String = {
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(SUM(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"
    }.mkString(",\n    ")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n      ")
    val score = terms.indices.map { i =>
      s"(CASE WHEN tf$i > 0.0 THEN (ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * (tf$i * (1.2 + 1.0))) / (tf$i + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (total_len / n)))) ELSE 0.0 END)"
    }.mkString("\n    + ")
    s"""WITH d AS (
       |  SELECT doc_id, $toksExpr AS toks, len($toksExpr) AS dl
       |  FROM documents $where
       |),
       |st AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(dl) AS DOUBLE) AS total_len,
       |    $dfCols
       |  FROM d
       |),
       |sc AS (
       |  SELECT doc_id, CAST(dl AS BIGINT) AS dl,
       |    ROUND(
       |      $score
       |    , 6) AS score
       |  FROM (
       |    SELECT doc_id, dl,
       |      $tfCols
       |    FROM d
       |  ) CROSS JOIN st
       |)
       |SELECT doc_id, dl, score FROM sc WHERE score > 0.0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** q228: Dirichlet query-likelihood replay — the smoothed
    * log-likelihood ln((tf + mu*cf/C)/(dl + mu)) summed in fixed
    * term order over docs matching >= 1 query term; terms with
    * cf = 0 contribute 0 (background probability undefined).
    */
  private def qlFromIndexSql(terms: Seq[String], k: Int): String = {
    val mu = "1000.0"
    val cfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(SUM(len(list_filter(toks, x -> x = '$t'))) AS DOUBLE) AS cf$i"
    }.mkString(",\n    ")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n      ")
    val score = terms.indices.map { i =>
      s"(CASE WHEN cf$i > 0.0 THEN ln((tf$i + $mu * cf$i / c) / (CAST(dl AS DOUBLE) + $mu)) ELSE 0.0 END)"
    }.mkString("\n    + ")
    val matched = terms.indices.map(i => s"tf$i > 0.0").mkString(" OR ")
    s"""WITH d AS (
       |  SELECT doc_id, $toksExpr AS toks, len($toksExpr) AS dl
       |  FROM documents
       |),
       |st AS (
       |  SELECT CAST(SUM(dl) AS DOUBLE) AS c,
       |    $cfCols
       |  FROM d
       |),
       |sc AS (
       |  SELECT doc_id, CAST(dl AS BIGINT) AS dl,
       |    ROUND(
       |      $score
       |    , 6) AS score,
       |    ($matched) AS m
       |  FROM (
       |    SELECT doc_id, dl,
       |      $tfCols
       |    FROM d
       |  ) CROSS JOIN st
       |)
       |SELECT doc_id, dl, score FROM sc WHERE m
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** q225/q232: phrase counts from the planted phrase corpus —
    * position alignment over whitespace tokens ≡ counting the
    * phrase's 3-grams in the text. Shared verbatim by the base-index
    * serve (q225) and the append-lifecycle serve (q232): both serve
    * the same TRUE corpus.
    */
  private def phraseFromIndexSql(where: String = ""): String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    'prefix ' || text || ' ' ||
       |    CASE WHEN doc_id % 4 = 0 THEN 'alpha beta gamma alpha beta gamma'
       |         WHEN doc_id % 4 = 1 THEN 'alpha beta gamma'
       |         WHEN doc_id % 4 = 2 THEN 'alpha beta delta'
       |         ELSE 'filler f' || CAST(doc_id AS VARCHAR) END ||
       |    ' suffix' AS text
       |  FROM documents $where
       |),
       |t AS (SELECT doc_id, $toksExpr AS tk FROM d)
       |SELECT doc_id, CAST(cnt AS BIGINT) AS phrase_tf FROM (
       |  SELECT doc_id,
       |    len(list_filter(range(1, len(tk) - 1), i ->
       |      tk[i] = 'alpha' AND tk[i+1] = 'beta' AND tk[i+2] = 'gamma')) AS cnt
       |  FROM t
       |) WHERE cnt > 0 ORDER BY doc_id""".stripMargin

  /** q229/q233: min |posA − posB| over the position pair product,
    * replayed from raw token positions — the engine's merge walk
    * must land on the identical minima. Shared verbatim by the
    * base-index serve (q229) and the compacted-lifecycle serve
    * (q233).
    */
  private lazy val proximityFromIndexSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    'prefix ' || text || ' ' ||
       |    CASE WHEN doc_id % 4 = 0 THEN 'alpha beta gamma alpha beta gamma'
       |         WHEN doc_id % 4 = 1 THEN 'alpha beta gamma'
       |         WHEN doc_id % 4 = 2 THEN 'alpha beta delta'
       |         ELSE 'filler f' || CAST(doc_id AS VARCHAR) END ||
       |    ' suffix' AS text
       |  FROM documents
       |),
       |t AS (SELECT doc_id, $toksExpr AS tk FROM d),
       |pa AS (
       |  SELECT doc_id, i FROM (
       |    SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM t)
       |  WHERE tk[i] = 'alpha'
       |),
       |pb AS (
       |  SELECT doc_id, i FROM (
       |    SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM t)
       |  WHERE tk[i] = 'gamma'
       |)
       |SELECT doc_id, min_dist FROM (
       |  SELECT pa.doc_id, CAST(MIN(ABS(pa.i - pb.i)) AS BIGINT) AS min_dist
       |  FROM pa JOIN pb ON pb.doc_id = pa.doc_id GROUP BY 1)
       |WHERE min_dist <= 2 ORDER BY doc_id""".stripMargin

  /** q223: multi-query BM25 replay — shared d/st/tf CTEs over the
    * UNION term list, one ROUND(score, 6) column per query built in
    * that query's OWN term order, then per-query ROW_NUMBER top-k
    * with the engine's exact output quantization (round6 → ×10⁶ →
    * round → BIGINT → ÷10⁶ — the bottom-k path's long key replayed
    * op-for-op so the `score` doubles match bitwise).
    */
  private def bm25BatchSql(queries: Seq[(Long, Seq[String])],
      k: Int): String = {
    val allTerms = queries.flatMap(_._2).distinct
    val dfCols = allTerms.zipWithIndex.map { case (t, i) =>
      s"CAST(SUM(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"
    }.mkString(",\n    ")
    val tfCols = allTerms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n      ")
    def scoreExpr(terms: Seq[String]): String = terms.map { t =>
      val i = allTerms.indexOf(t)
      s"(CASE WHEN tf$i > 0.0 THEN (ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * (tf$i * (1.2 + 1.0))) / (tf$i + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (total_len / n)))) ELSE 0.0 END)"
    }.mkString("\n      + ")
    val sCols = queries.map { case (qid, terms) =>
      s"ROUND(${scoreExpr(terms)}, 6) AS s$qid" }.mkString(",\n    ")
    val parts = queries.map { case (qid, _) =>
      s"""SELECT query_id, rank, doc_id, score FROM (
         |  SELECT CAST($qid AS BIGINT) AS query_id,
         |    ROW_NUMBER() OVER (ORDER BY s$qid DESC, doc_id) AS rank,
         |    doc_id,
         |    CAST(CAST(ROUND(s$qid * 1000000.0, 0) AS BIGINT) AS DOUBLE) / 1000000.0 AS score
         |  FROM scq WHERE s$qid > 0.0)
         |WHERE rank <= $k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH d AS (
       |  SELECT doc_id, $toksExpr AS toks, len($toksExpr) AS dl
       |  FROM documents
       |),
       |st AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(dl) AS DOUBLE) AS total_len,
       |    $dfCols
       |  FROM d
       |),
       |scq AS (
       |  SELECT doc_id,
       |    $sCols
       |  FROM (
       |    SELECT doc_id, dl,
       |      $tfCols
       |    FROM d
       |  ) CROSS JOIN st
       |)
       |$parts
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Hybrid-RRF oracle generator: per-query BM25 replays (q75 score
    * tree over the UNION term list's tf/df columns, ranked top-kList),
    * the q17 decimal-exact dense top-kList, and the integer RRF
    * fusion (10^12 // (c + rank), BIGINT sums) — the whole q119
    * pipeline restated in SQL.
    */
  private def hybridRrfSql(queries: Seq[(Long, Seq[String])],
      kList: Int, kFused: Int, c: Int): String = {
    val allTerms = queries.flatMap(_._2).distinct
    val dfCols = allTerms.zipWithIndex.map { case (t, i) =>
      s"CAST(SUM(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"
    }.mkString(",\n    ")
    val tfCols = allTerms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n      ")
    def scoreExpr(terms: Seq[String]) = terms.map { t =>
      val i = allTerms.indexOf(t)
      s"(CASE WHEN tf$i > 0.0 THEN (ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * (tf$i * (1.2 + 1.0))) / (tf$i + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (total_len / n)))) ELSE 0.0 END)"
    }.mkString("\n      + ")
    val perQuery = queries.map { case (qid, terms) =>
      s"""  SELECT $qid AS query_id, doc_id,
         |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
         |  FROM (SELECT doc_id, ROUND(
         |      ${scoreExpr(terms)}
         |    , 6) AS score FROM tfs CROSS JOIN st)
         |  WHERE score > 0.0
         |  QUALIFY r <= $kList""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH d AS MATERIALIZED (
       |  SELECT doc_id, $toksExpr AS toks, len($toksExpr) AS dl
       |  FROM documents
       |),
       |st AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(dl) AS DOUBLE) AS total_len,
       |    $dfCols
       |  FROM d
       |),
       |tfs AS MATERIALIZED (
       |  SELECT doc_id, dl,
       |      $tfCols
       |  FROM d
       |),
       |bm AS MATERIALIZED (
       |$perQuery
       |),
       |nn AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    sqrt(CAST(list_sum([CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len(embedding) + 1)]) AS DOUBLE)) AS nrm
       |  FROM embeddings
       |),
       |dn AS MATERIALIZED (
       |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |      CASE WHEN q.nrm * c.nrm > 0
       |        THEN ${dotX("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
       |        ELSE 0.0 END DESC, c.vec_id) AS r
       |  FROM nn q JOIN nn c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < ${queries.size}
       |  QUALIFY r <= $kList
       |),
       |lists AS (
       |  SELECT query_id, doc_id, CAST(1000000000000 // ($c + r) AS BIGINT) AS cc FROM bm
       |  UNION ALL
       |  SELECT query_id, doc_id, CAST(1000000000000 // ($c + r) AS BIGINT) AS cc FROM dn
       |),
       |fused AS MATERIALIZED (
       |  SELECT query_id, doc_id, CAST(SUM(cc) AS BIGINT) AS rrf,
       |    CAST(COUNT(*) AS BIGINT) AS n_lists
       |  FROM lists GROUP BY query_id, doc_id
       |)
       |SELECT query_id, CAST(rn AS BIGINT) AS "rank", doc_id, rrf, n_lists FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rn
       |  FROM fused)
       |WHERE rn <= $kFused
       |ORDER BY query_id, "rank"""".stripMargin
  }

  /** The q100 export pipeline (cascade → dedup → chunk → pack) as a
    * CTE chain ending in `pk` — shared by the q100 per-chunk gate and
    * the q135 shard manifest.
    */
  private lazy val exportPkCtes: String = {
    def swCount(words: Seq[String]) =
      s"CAST(len(list_filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)"
    val en = swCount(Seq("the", "and", "of", "is", "to"))
    val de = swCount(Seq("der", "und", "die", "ist", "das"))
    val fr = swCount(Seq("le", "la", "et", "est", "les"))
    val es = swCount(Seq("el", "los", "y", "es", "las"))
    val stop = swCount(graft.functions.Text.Stopwords)
    s"""WITH RECURSIVE t0 AS (SELECT doc_id, text, $toksExpr AS toks FROM documents),
       |m AS (
       |  SELECT doc_id, text, toks,
       |    CAST(len(toks) AS BIGINT) AS tc,
       |    CAST($stop AS DOUBLE) / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS sr,
       |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / CAST(GREATEST(length(text), 1) AS DOUBLE) AS pr,
       |    $en AS s_en, $de AS s_de, $fr AS s_fr, $es AS s_es
       |  FROM t0
       |),
       |pass AS (
       |  SELECT doc_id, text, toks FROM m
       |  WHERE tc >= 20
       |    AND (s_en + s_de + s_fr + s_es > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es)
       |    AND sr >= 0.04 AND pr <= 0.2
       |),
       |keep AS (
       |  SELECT doc_id, toks FROM (
       |    SELECT doc_id, toks,
       |      ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
       |    FROM pass) WHERE rn = 1
       |),
       |n AS (SELECT doc_id, toks, CASE WHEN len(toks) <= 32 THEN 1 ELSE CAST(ceil((len(toks) - 32) / 24.0) AS BIGINT) + 1 END AS nch FROM keep WHERE len(toks) > 0),
       |iv AS (SELECT unnest(range(0, (SELECT max(nch) FROM n))) AS i),
       |ch AS (
       |  SELECT doc_id, iv.i AS chunk_idx,
       |    CAST(len(list_filter(string_split(array_to_string(toks[iv.i*24+1 : iv.i*24+32], ' '), ' '), x -> len(x) > 0)) AS BIGINT) AS n_tokens
       |  FROM n CROSS JOIN iv WHERE iv.i < nch
       |),
       |o AS (
       |  SELECT doc_id % 8 AS shard, doc_id, chunk_idx, n_tokens,
       |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id, chunk_idx) AS rn
       |  FROM ch
       |),
       |pk AS (
       |  SELECT shard, rn, doc_id, chunk_idx, n_tokens,
       |    CAST(0 AS BIGINT) AS seq_idx, CAST(0 AS BIGINT) AS seq_pos, n_tokens AS used
       |  FROM o WHERE rn = 1
       |  UNION ALL
       |  SELECT c.shard, c.rn, c.doc_id, c.chunk_idx, c.n_tokens,
       |    CASE WHEN pk.used > 0 AND pk.used + c.n_tokens > 256 THEN pk.seq_idx + 1 ELSE pk.seq_idx END,
       |    CASE WHEN pk.used > 0 AND pk.used + c.n_tokens > 256 THEN 0 ELSE pk.seq_pos + 1 END,
       |    CASE WHEN pk.used > 0 AND pk.used + c.n_tokens > 256 THEN c.n_tokens ELSE pk.used + c.n_tokens END
       |  FROM o c JOIN pk ON c.shard = pk.shard AND c.rn = pk.rn + 1
       |)""".stripMargin
  }

  private lazy val headOracles: Map[String, String] = Map(

    "q01_catalog" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",

    "q02_minmax" ->
      "SELECT min(CAST(ts AS DATE)) AS d_min, max(CAST(ts AS DATE)) AS d_max, count(*) AS n FROM events",

    "q03_projection" ->
      s"""SELECT event_id, value AS km,
         |  ROUND(value * 0.621371, 8) AS miles,
         |  $kExpr * 60 AS seconds,
         |  CAST(FLOOR(value * 3.28084 + 0.5) AS BIGINT) AS ascent_feet,
         |  CASE WHEN $kExpr * 60 > 0 THEN value * 0.621371 * 3600.0 / ($kExpr * 60) ELSE 0.0 END AS mph,
         |  CASE WHEN $kExpr * 60 > 0 THEN value * 3600.0 / ($kExpr * 60) ELSE 0.0 END AS kph
         |FROM events ORDER BY event_id""".stripMargin,

    "q04_filters" ->
      s"""SELECT event_id, user_id, value, $kExpr AS k FROM events
         |WHERE value > 0 AND COALESCE($kExpr, 0) > 20 AND event_type <> 'purchase'
         |ORDER BY event_id""".stripMargin,

    "q05_calendar" ->
      s"""SELECT d,
         |  CAST(isoyear(d) AS VARCHAR) || '-' || CAST(weekofyear(d) AS VARCHAR) AS year_week,
         |  strftime(d, '%Y-%b') AS year_month,
         |  strftime(d, '%a') AS day_of_week,
         |  strftime(d, '%b') AS month
         |FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events) ORDER BY d""".stripMargin,

    "q06_cube" ->
      s"""WITH base AS (
         |  SELECT CAST(ts AS DATE) AS d, event_type,
         |    'u' || CAST(user_id % 4 AS VARCHAR) AS ubucket,
         |    value AS v,
         |    CASE WHEN value > 100 THEN 1 ELSE 0 END AS is_high,
         |    CAST($kExpr AS DOUBLE) AS k
         |  FROM events
         |), g AS (
         |  SELECT d, event_type, ubucket,
         |    GROUPING(event_type) AS g_et, GROUPING(ubucket) AS g_ub,
         |    ${dsum("v")} AS v_sum,
         |    ${dsum("k")} AS k_sum,
         |    ${dsum("v * k")} AS vk_sum,
         |    COALESCE(MAX(is_high) > 0, FALSE) AS is_high
         |  FROM base
         |  GROUP BY GROUPING SETS ((d, event_type, ubucket), (d, event_type), (d, ubucket), (d))
         |)
         |SELECT d,
         |  CASE WHEN g_et = 1 THEN 'All' ELSE event_type END AS event_type,
         |  CASE WHEN g_ub = 1 THEN 'All' ELSE ubucket END AS ubucket,
         |  ROUND(v_sum, 6) AS v_sum,
         |  CASE WHEN k_sum <> 0 THEN vk_sum / k_sum ELSE 0.0 END AS v_wavg,
         |  CAST(TRUNC(CASE WHEN k_sum <> 0 THEN vk_sum / k_sum ELSE 0.0 END) AS BIGINT) AS v_wavg_int,
         |  is_high,
         |  CASE WHEN k_sum > 0 THEN v_sum * 100.0 / k_sum ELSE 0.0 END AS per_k
         |FROM g
         |WHERE NOT (g_et = 0 AND event_type = 'purchase')
         |ORDER BY d, event_type, ubucket""".stripMargin,

    "q07_spine" ->
      s"""WITH $dailyCte,
         |sparse AS (SELECT * FROM daily WHERE day(d) % 3 <> 0),
         |${spineCte("sparse")},
         |combos AS (SELECT DISTINCT event_type FROM sparse)
         |SELECT c.event_type, s.d, ROUND(COALESCE(sp.tss, 0.0), 6) AS tss
         |FROM spine s CROSS JOIN combos c
         |LEFT JOIN sparse sp ON sp.d = s.d AND sp.event_type = c.event_type
         |ORDER BY c.event_type, s.d""".stripMargin,

    "q08_dedup" ->
      s"""SELECT user_id, CAST(ts AS DATE) AS d, event_id, value FROM events
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY event_id) = 1
         |ORDER BY user_id, d""".stripMargin,

    "q09_ewma" ->
      s"""WITH RECURSIVE $filledCte,
         |numbered AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn FROM filled
         |),
         |rec AS (
         |  SELECT event_type, d, tss, rn,
         |    tss * $CI + 0.0 * $CD AS ctl,
         |    tss * $AI + 0.0 * $AD AS atl
         |  FROM numbered WHERE rn = 1
         |  UNION ALL
         |  SELECT f.event_type, f.d, f.tss, f.rn,
         |    f.tss * $CI + r.ctl * $CD,
         |    f.tss * $AI + r.atl * $AD
         |  FROM numbered f JOIN rec r ON f.event_type = r.event_type AND f.rn = r.rn + 1
         |)
         |SELECT event_type, d, tss, ROUND(ctl, 6) AS ctl, ROUND(atl, 6) AS atl,
         |  ROUND(ctl - atl, 6) AS tsb
         |FROM rec ORDER BY event_type, d""".stripMargin,

    "q10_rolling" ->
      s"""WITH $filledCte,
         |w AS (
         |  SELECT event_type, d, tss,
         |    count(tss) OVER win AS cnt,
         |    stddev_samp(tss) OVER win AS sd_raw,
         |    avg(tss) OVER win AS mean7,
         |    sum(tss) OVER win AS sum7
         |  FROM filled
         |  WINDOW win AS (PARTITION BY event_type ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         |)
         |SELECT event_type, d, ROUND(tss, 6) AS tss,
         |  ROUND(COALESCE(mean7 / (CASE WHEN cnt > 1 THEN GREATEST(0.01, sd_raw) END), 0.0), 4) AS monotony,
         |  ROUND(sum7 * COALESCE(mean7 / (CASE WHEN cnt > 1 THEN GREATEST(0.01, sd_raw) END), 0.0), 4) AS strain
         |FROM w ORDER BY event_type, d""".stripMargin,

    "q11_rollup" ->
      s"""WITH $dailyCte,
         |day2 AS (SELECT *, CAST(isoyear(d) AS VARCHAR) || '-' || CAST(weekofyear(d) AS VARCHAR) AS year_week FROM daily)
         |SELECT 'Week' AS period, event_type, year_week, max(d) AS week_end,
         |  ROUND(${dsum("tss")}, 6) AS tss,
         |  ${dsum("tss")} / COUNT(tss) AS tss_avg
         |FROM day2 GROUP BY event_type, year_week
         |ORDER BY event_type, year_week""".stripMargin,

    // SELF-CONTAINED twin of the Spark JSONL roundtrip: the same
    // fixture lines are inlined as VALUES (no dependency on any file
    // the Spark query wrote — oracle-only reruns and concurrent runs
    // are safe). json_valid drops the planted corrupt line exactly as
    // PERMISSIVE+quarantine excludes it; json_transform applies the
    // same explicit schema the Spark source declares.
    "q40_jsonl_roundtrip" -> {
      val values = Fixtures.q40DiaryLines
        .map(l => "    ('" + l.replace("'", "''") + "')")
        .mkString(",\n")
      s"""WITH raw(line) AS (VALUES
         |$values
         |),
         |rec AS (
         |  SELECT json_transform(line,
         |    '{"date":"VARCHAR","workouts":[{"activity":"VARCHAR","km":"DOUBLE","minutes":"BIGINT"}]}') AS r
         |  FROM raw WHERE json_valid(line)
         |),
         |x AS (SELECT CAST(r."date" AS DATE) AS d, unnest(r.workouts) AS w FROM rec)
         |SELECT d, w.activity AS activity, w.km AS km, w.minutes AS minutes
         |FROM x
         |ORDER BY d, activity""".stripMargin
    },

    // inverted index over raw 20-token window STRINGS (the Spark side
    // joins on xxhash64 of the window — identical pair set unless a
    // 64-bit collision, P ≈ (#windows)²/2⁶⁵); df-cap 2..16 mirrored
    "q42_substring_dedup" ->
      s"""WITH t AS (SELECT doc_id, $toksExpr AS toks FROM documents),
         |w AS (
         |  SELECT doc_id,
         |    unnest(list_distinct([array_to_string(toks[i:i+19], ' ') FOR i IN range(1, greatest(len(toks) - 19, 1) + 1)])) AS win
         |  FROM t
         |),
         |df AS (SELECT win, count(*) AS c FROM w GROUP BY win),
         |keep AS (SELECT w.doc_id, w.win FROM w JOIN df USING (win) WHERE df.c BETWEEN 2 AND 16)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_windows
         |FROM keep a JOIN keep b ON a.win = b.win AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin,

    // two UNROLLED exact Lloyd's iterations (k=8, dim=64): init = 8
    // lowest-id vectors; assignment = argmin of the per-term-quantized
    // squared distance (ties → lowest cell, the ORDER BY dist, cell
    // below ≡ Spark's left-associative <= reduce; squares are tie-free
    // under the scale-12 cast — even dyadic exponent — so HALF_UP vs
    // HALF_EVEN never diverges); means = 2^43-integer-scaled exact
    // sums divided as doubles (raw float values CAN tie at scale 12 —
    // 1625/2^13 does — so no decimal cast of raw values); empty cells
    // keep their centroid (the COALESCE) — bit-for-bit the
    // kmeansCentroidsExact recurrence
    "q44_kmeans_train" ->
      s"""WITH ${kmeansCtes("")}
         |SELECT cell, i - 1 AS pos, c2.c[i] AS c
         |FROM c2 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) u
         |ORDER BY cell, pos""".stripMargin,

    // the oracle asserts the EXACT distinct count and that the Spark
    // side's merged-HLL estimate landed within the ±5% bound (TRUE)
    "q45_hll_distinct" ->
      s"""SELECT lang, COUNT(DISTINCT text) AS exact_distinct, TRUE AS within_bounds
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q41_rollup_month" ->
      s"""WITH $dailyCte,
         |day2 AS (SELECT *, strftime(d, '%Y-%b') AS year_month FROM daily)
         |SELECT 'Month' AS period, event_type, year_month, max(d) AS month_end,
         |  ROUND(${dsum("tss")}, 6) AS tss,
         |  ${dsum("tss")} / COUNT(tss) AS tss_avg
         |FROM day2 GROUP BY event_type, year_month
         |ORDER BY event_type, year_month""".stripMargin,

    // q21's interpolation with every window PARTITION BY event_type —
    // the keyed form; interpolation arithmetic is op-for-op the same
    "q43_interp_keyed" ->
      s"""WITH td AS (
         |  SELECT CAST(ts AS DATE) AS d, event_type, ${dsum("value")} / COUNT(value) AS v
         |  FROM events GROUP BY 1, 2
         |),
         |obs AS (SELECT * FROM td WHERE day(d) % 7 = 3),
         |be AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
         |spine AS (SELECT CAST(u AS DATE) AS d FROM (SELECT unnest(generate_series((SELECT d0 FROM be), (SELECT d1 FROM be), INTERVAL 1 DAY)) AS u)),
         |combos AS (SELECT DISTINCT event_type FROM events),
         |grid AS (SELECT c.event_type, s.d FROM spine s CROSS JOIN combos c),
         |j AS (SELECT g.event_type, g.d, o.v FROM grid g
         |      LEFT JOIN obs o ON o.d = g.d AND o.event_type = g.event_type),
         |w AS (
         |  SELECT event_type, d, v,
         |    last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         |    last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         |    first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         |    first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
         |  FROM j
         |)
         |SELECT event_type, d, COALESCE(
         |  CASE WHEN v IS NOT NULL THEN v
         |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN pv + (nv - pv) * CAST(datediff('day', pd, d) AS DOUBLE) / CAST(datediff('day', pd, nd) AS DOUBLE)
         |       WHEN pv IS NOT NULL THEN pv
         |       ELSE NULL END, 0.0) AS v
         |FROM w ORDER BY event_type, d""".stripMargin,

    "q12_join_agg" ->
      s"""SELECT n_name,
         |  ROUND(${dsum("l_extendedprice * (1.0 - l_discount)")}, 6) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q13_topk" ->
      s"""SELECT o_custkey,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS "rank",
         |  o_orderkey, o_totalprice
         |FROM orders
         |QUALIFY "rank" <= 3
         |ORDER BY o_custkey, "rank"""".stripMargin,

    "q14_dedup_exact" ->
      s"""SELECT min(doc_id) AS keeper, count(*) AS n_copies FROM documents
         |GROUP BY sha256(text) ORDER BY keeper""".stripMargin,

    "q15_jaccard" ->
      s"""WITH ${shingleCte("(SELECT doc_id, text FROM documents WHERE doc_id < 200)")}
         |SELECT * FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, ${jaccardExpr("a.s", "b.s")} AS jaccard
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |) WHERE jaccard >= 0.02 ORDER BY id_a, id_b""".stripMargin,

    // shared verbatim by q169 (the b-bit-prefiltered path must emit
    // the identical verified pair set)
    "q16_minhash_lsh" -> minhashLshSql,
    "q169_bbit_minhash" -> minhashLshSql,

    "q17_cosine_topk" -> cosineTopKSql,

    // the quantized scan path is exactness-preserving (rigorous
    // error-bound band + decimal-exact re-score) — its answer IS
    // q17's, so the oracle IS q17's
    "q61_quantized_ann" -> cosineTopKSql,

    "q18_text" -> {
      val toks = "toks"
      def swCount(words: Seq[String]) =
        s"CAST(len(list_filter($toks, t -> t IN (${words.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)"
      val en = swCount(Seq("the", "and", "of", "is", "to"))
      val de = swCount(Seq("der", "und", "die", "ist", "das"))
      val fr = swCount(Seq("le", "la", "et", "est", "les"))
      val es = swCount(Seq("el", "los", "y", "es", "las"))
      val stop = swCount(graft.functions.Text.Stopwords)
      s"""WITH t AS (SELECT doc_id, text, $toksExpr AS toks FROM documents),
         |m AS (
         |  SELECT doc_id, text, toks,
         |    CAST(len(toks) AS BIGINT) AS token_count,
         |    CAST(list_sum([CAST(ceil(len(x) / 4.0) AS BIGINT) FOR x IN regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')]) AS BIGINT) AS bpeish_tokens,
         |    CAST($stop AS DOUBLE) / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS sr,
         |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / CAST(GREATEST(length(text), 1) AS DOUBLE) AS pr,
         |    CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS mwl,
         |    $en AS s_en, $de AS s_de, $fr AS s_fr, $es AS s_es
         |  FROM t
         |)
         |SELECT doc_id, token_count, bpeish_tokens,
         |  ROUND(sr, 6) AS stopword_ratio,
         |  ROUND(pr, 6) AS punct_ratio,
         |  ROUND(mwl, 6) AS mean_word_len,
         |  ROUND(LEAST(1.0, GREATEST(0.0, 0.2 + 2.0 * sr - 3.0 * pr + 0.05 * LEAST(mwl, 8.0) + CASE WHEN length(text) >= 200 THEN 0.1 ELSE 0.0 END)), 6) AS quality,
         |  CASE WHEN s_en + s_de + s_fr + s_es = 0 THEN 'und'
         |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr'
         |       ELSE 'es' END AS lang_pred
         |FROM m ORDER BY doc_id""".stripMargin
    },

    // 31-bit polynomial-hash simhash: per-token fingerprint recurrence
    // (the q19 expression applied per token), then sign-of-bit-sums
    "q23_simhash" ->
      s"""WITH t AS (SELECT doc_id, $toksExpr AS toks FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    [list_sum([CAST(ord(substr(tok, i, 1)) AS BIGINT) * CAST((i % 31) + 1 AS BIGINT) FOR i IN range(1, length(tok) + 1)]) % 2147483647 FOR tok IN toks] AS hs
         |  FROM t
         |)
         |SELECT doc_id,
         |  CAST(coalesce(list_sum([
         |    CASE WHEN list_sum([CASE WHEN (hh >> b) & 1 = 1 THEN 1 ELSE -1 END FOR hh IN hs]) > 0
         |      THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END
         |    FOR b IN range(0, 31)]), 0) AS BIGINT) AS simhash
         |FROM h ORDER BY doc_id""".stripMargin,

    "q19_fingerprint" ->
      s"""SELECT doc_id,
         |  CAST(list_sum([CAST(ord(substr(text, i, 1)) AS BIGINT) * CAST((i % 31) + 1 AS BIGINT) FOR i IN range(1, length(text) + 1)]) AS BIGINT) % 2147483647 AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q21_interp" ->
      s"""WITH clickd AS (
         |  SELECT CAST(ts AS DATE) AS d, ${dsum("value")} / COUNT(value) AS v
         |  FROM events WHERE event_type = 'click' GROUP BY 1
         |),
         |obs AS (SELECT * FROM clickd WHERE day(d) % 7 = 3),
         |be AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
         |spine AS (SELECT CAST(u AS DATE) AS d FROM (SELECT unnest(generate_series((SELECT d0 FROM be), (SELECT d1 FROM be), INTERVAL 1 DAY)) AS u)),
         |j AS (SELECT s.d, o.v FROM spine s LEFT JOIN obs o ON o.d = s.d),
         |w AS (
         |  SELECT d, v,
         |    last_value(v IGNORE NULLS) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         |    last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         |    first_value(v IGNORE NULLS) OVER (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         |    first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
         |  FROM j
         |)
         |SELECT d, COALESCE(
         |  CASE WHEN v IS NOT NULL THEN v
         |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN pv + (nv - pv) * CAST(datediff('day', pd, d) AS DOUBLE) / CAST(datediff('day', pd, nd) AS DOUBLE)
         |       WHEN pv IS NOT NULL THEN pv
         |       ELSE NULL END, 0.0) AS v
         |FROM w ORDER BY d""".stripMargin,

    "q22_physio_join" ->
      s"""WITH $filledCte,
         |clickd AS (
         |  SELECT CAST(ts AS DATE) AS d, ${dsum("value")} / COUNT(value) AS v
         |  FROM events WHERE event_type = 'click' GROUP BY 1
         |),
         |obs AS (SELECT * FROM clickd WHERE day(d) % 7 = 3),
         |j AS (SELECT s.d, o.v FROM spine s LEFT JOIN obs o ON o.d = s.d),
         |w AS (
         |  SELECT d, v,
         |    last_value(v IGNORE NULLS) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         |    last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         |    first_value(v IGNORE NULLS) OVER (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         |    first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
         |  FROM j
         |),
         |series AS (
         |  SELECT d, COALESCE(
         |    CASE WHEN v IS NOT NULL THEN v
         |         WHEN pv IS NOT NULL AND nv IS NOT NULL THEN pv + (nv - pv) * CAST(datediff('day', pd, d) AS DOUBLE) / CAST(datediff('day', pd, nd) AS DOUBLE)
         |         WHEN pv IS NOT NULL THEN pv
         |         ELSE NULL END, 0.0) AS physio
         |  FROM w
         |)
         |SELECT f.event_type, f.d, ROUND(f.tss, 6) AS tss, se.physio
         |FROM filled f LEFT JOIN series se ON se.d = f.d
         |ORDER BY f.event_type, f.d""".stripMargin,

    "q24_multimodal" ->
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         |  CAST(ord(substr(text, 1, 1)) AS BIGINT) AS first_byte
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q25_asof" ->
      s"""SELECT c.event_id, c.user_id, e.err_value
         |FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
         |      FROM events WHERE event_type = 'click') c
         |ASOF LEFT JOIN (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, value AS err_value
         |      FROM events WHERE event_type = 'error') e
         |ON c.user_id = e.user_id AND c.t >= e.t
         |ORDER BY c.event_id""".stripMargin,

    "q26_embed_dedup" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding,
         |    sqrt(CAST(list_sum([CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len(embedding) + 1)]) AS DOUBLE)) AS nrm
         |  FROM embeddings WHERE vec_id < 300
         |)
         |SELECT * FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    CASE WHEN a.nrm * b.nrm > 0 THEN
         |      CAST(list_sum([CAST(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len(a.embedding) + 1)]) AS DOUBLE) / (a.nrm * b.nrm)
         |    ELSE 0.0 END AS sim
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id
         |) WHERE sim >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    "q27_distinct" ->
      s"""SELECT event_type, COUNT(DISTINCT user_id) AS users, COUNT(*) AS n
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q28_tfidf" ->
      s"""WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
         |terms AS (
         |  SELECT doc_id, unnest($toksExpr) AS term FROM sub
         |),
         |tf AS (SELECT doc_id, term, COUNT(*) AS cnt FROM terms GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, COUNT(*) AS doc_len FROM terms GROUP BY doc_id),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT COUNT(*) AS n_docs FROM sub)
         |SELECT tf.doc_id, tf.term, tf.cnt, dfreq.df,
         |  CAST(tf.cnt AS DOUBLE) / CAST(dl.doc_len AS DOUBLE) AS tf,
         |  ROUND(CAST(tf.cnt AS DOUBLE) / CAST(dl.doc_len AS DOUBLE) *
         |    (ln(CAST((SELECT n_docs FROM n) + 1 AS DOUBLE) / (CAST(dfreq.df AS DOUBLE) + 1.0)) + 1.0), 6) AS tfidf
         |FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term)
         |ORDER BY doc_id, term""".stripMargin,

    // IVF with data-derived seeds: assignment = argmax exact cosine to
    // the 16 seed vectors (ties → lowest cell), queries probe their 4
    // nearest cells, candidates re-ranked by the exact cosine. All dot
    // products decimal-exact → bit-identical to the Spark plan.
    "q29_ivf" -> ivfSeededSql,

    // stored-index roundtrip: same oracle as q29 by construction
    "q104_ivf_index" -> ivfSeededSql,

    // sign-pattern LSH with data-derived hyperplanes: bit i of the
    // bucket = [v·seed_i >= 0] with the decimal-exact dot — engine-
    // reproducible, so candidates and the exact re-rank both oracle
    "q20_lsh_ann" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding,
         |    sqrt(CAST(list_sum([CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len(embedding) + 1)]) AS DOUBLE)) AS nrm
         |  FROM embeddings
         |),
         |s AS (
         |  SELECT embedding AS sv, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS bit
         |  FROM embeddings WHERE vec_id < 6
         |),
         |b AS (
         |  SELECT v.vec_id,
         |    SUM(CASE WHEN CAST(list_sum([CAST(CAST(v.embedding[i] AS DOUBLE) * CAST(s.sv[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len(v.embedding) + 1)]) AS DOUBLE) >= 0
         |      THEN (CAST(1 AS BIGINT) << s.bit) ELSE 0 END) AS bkt
         |  FROM n v CROSS JOIN s GROUP BY v.vec_id
         |),
         |scored AS (
         |  SELECT qb.vec_id AS query_id, cb.vec_id AS neighbor_id,
         |    CASE WHEN qn.nrm * cn.nrm > 0 THEN
         |      CAST(list_sum([CAST(CAST(qn.embedding[i] AS DOUBLE) * CAST(cn.embedding[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len(qn.embedding) + 1)]) AS DOUBLE) / (qn.nrm * cn.nrm)
         |    ELSE 0.0 END AS sim
         |  FROM b qb JOIN b cb ON qb.bkt = cb.bkt AND qb.vec_id <> cb.vec_id
         |  JOIN n qn ON qn.vec_id = qb.vec_id
         |  JOIN n cn ON cn.vec_id = cb.vec_id
         |  WHERE qb.vec_id < 50
         |)
         |SELECT query_id, neighbor_id, sim,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS "rank"
         |FROM scored
         |QUALIFY "rank" <= 5
         |ORDER BY query_id, "rank"""".stripMargin,

    // stratified sample: lang as in q36, fingerprint as in q19, rank
    // and stratum count as window functions — integer-only output
    "q39_stratified" -> {
      def sw(words: Seq[String]) =
        s"CAST(len(list_filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)"
      s"""WITH t AS (SELECT doc_id, text, $toksExpr AS toks FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    CAST(list_sum([CAST(ord(substr(text, i, 1)) AS BIGINT) * CAST((i % 31) + 1 AS BIGINT) FOR i IN range(1, length(text) + 1)]) AS BIGINT) % 2147483647 AS h,
         |    ${sw(Seq("the", "and", "of", "is", "to"))} AS s_en,
         |    ${sw(Seq("der", "und", "die", "ist", "das"))} AS s_de,
         |    ${sw(Seq("le", "la", "et", "est", "les"))} AS s_fr,
         |    ${sw(Seq("el", "los", "y", "es", "las"))} AS s_es
         |  FROM t
         |),
         |l AS (
         |  SELECT doc_id, h,
         |    CASE WHEN s_en + s_de + s_fr + s_es = 0 THEN 'und'
         |         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |         WHEN s_fr >= s_es THEN 'fr'
         |         ELSE 'es' END AS lang
         |  FROM m
         |)
         |SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY lang) AS n
         |  FROM l
         |) WHERE rn <= CEIL(n * 0.1)
         |ORDER BY doc_id""".stripMargin
    },

    // pivot as conditional aggregation; absent (day, type) cells are 0
    "q37_pivot" ->
      s"""SELECT CAST(ts AS DATE) AS d,
         |  COALESCE(CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE), 0.0) AS click,
         |  COALESCE(CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE), 0.0) AS view,
         |  COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE), 0.0) AS purchase,
         |  COALESCE(CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE), 0.0) AS error,
         |  COALESCE(CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE), 0.0) AS signup
         |FROM events GROUP BY 1 ORDER BY d""".stripMargin,

    // melt restated as union-of-selects over the pivoted CTE
    "q38_unpivot" -> {
      val types = Seq("click", "view", "purchase", "error", "signup")
      val piv = types.map(t =>
        s"COALESCE(CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE), 0.0) AS \"$t\"").mkString(",\n         |  ")
      val arms = types.map(t =>
        s"""SELECT d, '$t' AS event_type, "$t" AS total FROM wide""").mkString("\n         |UNION ALL ")
      s"""WITH wide AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |  $piv
         |  FROM events GROUP BY 1
         |)
         |$arms
         |ORDER BY d, event_type""".stripMargin
    },

    // per-language token-count distribution; lang-ID restated as in
    // q18; exact interpolated percentiles (quantile_cont == Spark
    // `percentile`'s 1+p·(n−1) definition), rounded 6dp for the
    // last-ulp interpolation-arithmetic difference
    "q36_profile" -> {
      def sw(words: Seq[String]) =
        s"CAST(len(list_filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)"
      s"""WITH t AS (SELECT doc_id, text, $toksExpr AS toks FROM documents),
         |m AS (
         |  SELECT CAST(len(toks) AS BIGINT) AS tok,
         |    ${sw(Seq("the", "and", "of", "is", "to"))} AS s_en,
         |    ${sw(Seq("der", "und", "die", "ist", "das"))} AS s_de,
         |    ${sw(Seq("le", "la", "et", "est", "les"))} AS s_fr,
         |    ${sw(Seq("el", "los", "y", "es", "las"))} AS s_es
         |  FROM t
         |),
         |l AS (
         |  SELECT tok,
         |    CASE WHEN s_en + s_de + s_fr + s_es = 0 THEN 'und'
         |         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |         WHEN s_fr >= s_es THEN 'fr'
         |         ELSE 'es' END AS lang
         |  FROM m
         |)
         |SELECT lang, COUNT(*) AS n_docs, MIN(tok) AS min_tok, MAX(tok) AS max_tok,
         |  ROUND(${dsum("tok")} / COUNT(tok), 6) AS avg_tok,
         |  ROUND(quantile_cont(tok, 0.5), 6) AS p50,
         |  ROUND(quantile_cont(tok, 0.9), 6) AS p90,
         |  ROUND(quantile_cont(tok, 0.99), 6) AS p99
         |FROM l GROUP BY lang ORDER BY lang""".stripMargin
    },

    // content-hash split: the q19 fingerprint expression mod 100 buckets
    // every doc deterministically; integer counts only
    "q35_split" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(list_sum([CAST(ord(substr(text, i, 1)) AS BIGINT) * CAST((i % 31) + 1 AS BIGINT) FOR i IN range(1, length(text) + 1)]) AS BIGINT) % 2147483647 % 100 AS h,
         |    CAST(len($toksExpr) AS BIGINT) AS tok
         |  FROM documents
         |)
         |SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'valid' ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS total_tokens
         |FROM f GROUP BY 1 ORDER BY split""".stripMargin,

    "q34_sessionize" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
         |  FROM events
         |),
         |flagged AS (
         |  SELECT event_id, user_id, t,
         |    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000000
         |      THEN 1 ELSE 0 END AS nw
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
         |),
         |sessioned AS (
         |  SELECT user_id, t,
         |    SUM(nw) OVER (PARTITION BY user_id ORDER BY t, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM flagged
         |)
         |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         |  COUNT(*) AS n_events, MIN(t) AS session_start,
         |  MAX(t) - MIN(t) AS duration_us
         |FROM sessioned GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,

    "q33_setops" ->
      s"""WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         |e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
         |SELECT user_id, 'click_and_purchase' AS tag FROM (SELECT * FROM c INTERSECT SELECT * FROM p)
         |UNION ALL
         |SELECT user_id, 'click_not_error' AS tag FROM (SELECT * FROM c EXCEPT SELECT * FROM e)
         |ORDER BY tag, user_id""".stripMargin,

    // q16's exact-Jaccard pair set (LSH recall argument documented
    // there), clustered by a recursive-CTE reachability: every vertex's
    // canonical id is the MIN reachable doc_id — integer-only, no FP
    // parity concerns
    "q32_components" -> componentsSql,

    // incremental fold ≡ from-scratch recompute, by contract
    "q105_incremental_components" -> componentsSql,

    // the binned range join is semantically the naive theta join — the
    // oracle states it directly
    "q31_range" ->
      s"""SELECT e.event_id AS error_id, c.event_id AS click_id, c.user_id
         |FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
         |      FROM events WHERE event_type = 'error') e
         |JOIN (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
         |      FROM events WHERE event_type = 'click') c
         |  ON c.user_id = e.user_id AND c.t BETWEEN e.t - 600000000 AND e.t
         |ORDER BY error_id, click_id""".stripMargin,

    // the salted two-phase sum is exactly associative (decimal
    // partials), so the oracle is the plain single-phase decimal sum
    "q30_salted" ->
      s"""SELECT event_type, ${dsum("value")} AS total
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // contamination scan over raw 10-token window STRINGS (the Spark
    // side semi-joins on xxhash64 of the window — q42 collision
    // argument); windows are distinct per doc, so count(*) IS the
    // distinct-window count
    "q46_contamination" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents)
         |),
         |w AS (
         |  SELECT doc_id,
         |    unnest(list_distinct([array_to_string(toks[i:i+9], ' ') FOR i IN range(1, greatest(len(toks) - 9, 1) + 1)])) AS win
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM corpus)
         |),
         |bench AS (
         |  SELECT DISTINCT
         |    unnest(list_distinct([array_to_string(toks[i:i+9], ' ') FOR i IN range(1, greatest(len(toks) - 9, 1) + 1)])) AS win
         |  FROM (SELECT $toksExpr AS toks FROM documents WHERE doc_id % 50 = 0)
         |)
         |SELECT w.doc_id, count(*) AS contaminated_windows
         |FROM w JOIN bench USING (win)
         |GROUP BY w.doc_id ORDER BY doc_id""".stripMargin,

    // SemDeDup: cell assignment = argmax exact cosine to the 8 seed
    // vectors (ties → lowest cell — q29's assignment recurrence);
    // dropped = has a smaller-id cell-mate at exact cosine ≥ 0.4
    "q47_semdedup" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${dotX("embedding", "embedding")}) AS nrm
         |  FROM embeddings
         |),
         |s AS (SELECT vec_id AS cell, embedding AS sv, nrm AS sn FROM n WHERE vec_id < 8),
         |cs AS (
         |  SELECT v.vec_id, s.cell,
         |    CASE WHEN v.nrm * s.sn > 0 THEN ${dotX("v.embedding", "s.sv")} / (v.nrm * s.sn)
         |    ELSE 0.0 END AS csim
         |  FROM n v CROSS JOIN s
         |),
         |assign AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
         |    FROM cs) WHERE rn = 1
         |),
         |w AS (SELECT a.vec_id, a.cell, n.embedding, n.nrm FROM assign a JOIN n USING (vec_id)),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM w a JOIN w b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE CASE WHEN a.nrm * b.nrm > 0 THEN ${dotX("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
         |    ELSE 0.0 END >= 0.4
         |)
         |SELECT w.vec_id, w.cell, (d.vec_id IS NULL) AS is_kept
         |FROM w LEFT JOIN dropped d ON d.vec_id = w.vec_id
         |ORDER BY w.vec_id""".stripMargin,

    // same planted-contact construction, RE2 regexes (the patterns sit
    // in the RE2 ∩ java.util.regex common dialect); DuckDB
    // regexp_replace needs the 'g' flag to match Spark's replace-all
    "q48_pii_redact" ->
      s"""WITH planted AS (
         |  SELECT doc_id,
         |    text ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS t
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '\\b555-[0-9]{4}\\b')) AS BIGINT) AS n_phones,
         |  sha256(regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '\\b555-[0-9]{4}\\b', '<PHONE>', 'g')) AS redacted_sha
         |FROM planted ORDER BY doc_id""".stripMargin,

    "q50_token_hist" ->
      s"""SELECT least(CAST(floor(len($toksExpr) / 10) AS BIGINT), 19) AS bucket,
         |  least(CAST(floor(len($toksExpr) / 10) AS BIGINT), 19) * 10 AS bucket_lo,
         |  COUNT(*) AS n_docs
         |FROM documents GROUP BY 1, 2 ORDER BY bucket""".stripMargin,

    // pow rounded at 6dp BEFORE the ratio (1-ulp cross-engine hazard);
    // the normalizer is a DECIMAL sum of the rounded values — exact and
    // order-independent
    "q51_lang_weights" ->
      s"""WITH pl AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
         |pw AS (
         |  SELECT lang, n_docs,
         |    ROUND(pow(CAST(n_docs AS DOUBLE) / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE), 0.3), 6) AS pw6
         |  FROM pl
         |),
         |ws AS (SELECT CAST(SUM(CAST(pw6 AS DECIMAL(38,6))) AS DOUBLE) AS wsum FROM pw)
         |SELECT lang, n_docs, ROUND(pw6 / (SELECT wsum FROM ws), 6) AS weight
         |FROM pw ORDER BY lang""".stripMargin,

    "q52_incremental_dedup" ->
      s"""WITH seen AS (SELECT sha256(text) AS h FROM documents WHERE doc_id < 100),
         |fresh AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id >= 100
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50
         |)
         |SELECT doc_id FROM fresh
         |WHERE sha256(text) NOT IN (SELECT h FROM seen)
         |ORDER BY doc_id""".stripMargin,

    // both ratios are exact integer divisions — bit-identical without
    // rounding; slice toks[i:i+1] is the inclusive-2-element 2-gram
    "q53_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksExpr AS toks FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) >= 2 THEN [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]
         |    ELSE [] END AS g2
         |  FROM t
         |),
         |d AS (
         |  SELECT doc_id,
         |    CASE WHEN len(g2) > 0 THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / CAST(len(g2) AS DOUBLE)
         |    ELSE 0.0 END AS dup_2gram_ratio
         |  FROM g
         |),
         |terms AS (SELECT doc_id, unnest(toks) AS term FROM t),
         |tf AS (SELECT doc_id, term, COUNT(*) AS cnt FROM terms GROUP BY doc_id, term),
         |p AS (SELECT doc_id, CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_token_ratio FROM tf GROUP BY doc_id)
         |SELECT d.doc_id, d.dup_2gram_ratio, p.top_token_ratio
         |FROM d JOIN p USING (doc_id) ORDER BY doc_id""".stripMargin,

    // q35's split recurrence × lang; token_share is an exact-int ratio
    "q54_mix_report" ->
      s"""WITH f AS (
         |  SELECT doc_id, lang,
         |    CAST(list_sum([CAST(ord(substr(text, i, 1)) AS BIGINT) * CAST((i % 31) + 1 AS BIGINT) FOR i IN range(1, length(text) + 1)]) AS BIGINT) % 2147483647 % 100 AS h,
         |    CAST(len($toksExpr) AS BIGINT) AS tok
         |  FROM documents
         |),
         |g AS (
         |  SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'valid' ELSE 'test' END AS split,
         |    lang, COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS total_tokens
         |  FROM f GROUP BY 1, 2
         |)
         |SELECT split, lang, n_docs, total_tokens,
         |  ROUND(CAST(total_tokens AS DOUBLE) /
         |    CAST(CAST(SUM(total_tokens) OVER (PARTITION BY split) AS BIGINT) AS DOUBLE), 6) AS token_share
         |FROM g ORDER BY split, lang""".stripMargin,

    // hour buckets are UTC (session tz pinned on both engines);
    // time_bucket ≡ window(ts, '1 hour').start
    "q56_tumbling" ->
      s"""SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS hour_start,
         |  event_type, COUNT(*) AS n, ${dsum("value")} AS total
         |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,

    // full frames only (start+15 ≤ len) — partial-frame clipping is
    // where engine substring semantics could diverge; md5 hex is
    // lowercase on both engines
    // DuckDB can neither slice BLOBs nor md5 them, so the oracle
    // slices and hashes the VARCHAR — identical bytes because the
    // corpus is pure ASCII (octet_length = length for every row at
    // every SF; a multibyte corpus would need a byte-capable oracle)
    "q57_frame_sample" ->
      s"""SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         |  md5(substring(text, CAST(frame_idx * 32 + 1 AS BIGINT), 16)) AS frame_md5
         |FROM documents CROSS JOIN (SELECT unnest(range(0, 4)) AS frame_idx) u
         |WHERE frame_idx * 32 + 16 <= octet_length(CAST(text AS BLOB))
         |ORDER BY doc_id, frame_idx""".stripMargin,

    // q47's assignment recurrence + the label column: majority label
    // per cell (ties → lowest label), exact-int purity
    "q55_cell_purity" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${dotX("embedding", "embedding")}) AS nrm
         |  FROM embeddings
         |),
         |s AS (SELECT vec_id AS cell, embedding AS sv, nrm AS sn FROM n WHERE vec_id < 8),
         |cs AS (
         |  SELECT v.vec_id, s.cell,
         |    CASE WHEN v.nrm * s.sn > 0 THEN ${dotX("v.embedding", "s.sv")} / (v.nrm * s.sn)
         |    ELSE 0.0 END AS csim
         |  FROM n v CROSS JOIN s
         |),
         |assign AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
         |    FROM cs) WHERE rn = 1
         |),
         |l AS (
         |  SELECT a.cell, e.label, COUNT(*) AS c
         |  FROM assign a JOIN embeddings e USING (vec_id) GROUP BY a.cell, e.label
         |),
         |tot AS (SELECT cell, CAST(SUM(c) AS BIGINT) AS n_vecs FROM l GROUP BY cell),
         |top AS (
         |  SELECT cell, label AS top_label, c FROM (
         |    SELECT cell, label, c,
         |      ROW_NUMBER() OVER (PARTITION BY cell ORDER BY c DESC, label) AS rn
         |    FROM l) WHERE rn = 1
         |)
         |SELECT t.cell, tot.n_vecs, t.top_label,
         |  CAST(t.c AS DOUBLE) / CAST(tot.n_vecs AS DOUBLE) AS purity
         |FROM top t JOIN tot USING (cell) ORDER BY t.cell""".stripMargin,

    // q32's reachability clustering, taken to the deliverable: keep
    // the MIN-id doc per component, with cluster size and the
    // survivor's token count
    "q49_dedup_e2e" ->
      s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents)
         |),
         |${shingleCte("corpus")},
         |pairs AS (
         |  SELECT * FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, ${jaccardExpr("a.s", "b.s")} AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  ) WHERE jaccard >= 0.5
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |),
         |reach(v, m) AS (
         |  SELECT doc_id, doc_id FROM corpus
         |  UNION
         |  SELECT e.dst, r.m FROM reach r JOIN edges e ON e.src = r.v
         |),
         |labels AS (SELECT v AS doc_id, MIN(m) AS canonical_id FROM reach GROUP BY v),
         |surv AS (SELECT canonical_id AS doc_id, COUNT(*) AS cluster_size FROM labels GROUP BY canonical_id)
         |SELECT s.doc_id, s.cluster_size,
         |  len(list_filter(string_split(c.text, ' '), x -> len(x) > 0)) AS token_count
         |FROM surv s JOIN corpus c ON c.doc_id = s.doc_id
         |ORDER BY s.doc_id""".stripMargin,

    // sketch values are merge-order-dependent, so (q45 HLL pattern)
    // the engine emits rank-error-bound booleans and the oracle
    // expects them all true; lang-ID restated as in q36
    "q58_quantile_sketch" -> {
      def sw(words: Seq[String]) =
        s"CAST(len(list_filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)"
      s"""WITH t AS (SELECT doc_id, text, $toksExpr AS toks FROM documents),
         |m AS (
         |  SELECT CAST(len(toks) AS BIGINT) AS tok,
         |    ${sw(Seq("the", "and", "of", "is", "to"))} AS s_en,
         |    ${sw(Seq("der", "und", "die", "ist", "das"))} AS s_de,
         |    ${sw(Seq("le", "la", "et", "est", "les"))} AS s_fr,
         |    ${sw(Seq("el", "los", "y", "es", "las"))} AS s_es
         |  FROM t
         |),
         |l AS (
         |  SELECT tok,
         |    CASE WHEN s_en + s_de + s_fr + s_es = 0 THEN 'und'
         |         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |         WHEN s_fr >= s_es THEN 'fr'
         |         ELSE 'es' END AS lang
         |  FROM m
         |)
         |SELECT lang, COUNT(*) AS n_docs,
         |  TRUE AS ok_p50, TRUE AS ok_p90, TRUE AS ok_p99
         |FROM l GROUP BY lang ORDER BY lang""".stripMargin
    },

    // bloom pre-filter is exactness-preserving (no false negatives +
    // exact anti-join backstop) — survivors are q52's, so the oracle
    // IS q52's
    "q59_bloom_incremental" ->
      s"""WITH seen AS (SELECT sha256(text) AS h FROM documents WHERE doc_id < 100),
         |fresh AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id >= 100
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50
         |)
         |SELECT doc_id FROM fresh
         |WHERE sha256(text) NOT IN (SELECT h FROM seen)
         |ORDER BY doc_id""".stripMargin,

    // stream-batch parity: the engine runs a REAL bounded stream
    // (file source → watermarked window agg → append file sink); the
    // oracle is the plain batch daily aggregation
    "q60_streaming_daily" ->
      s"""WITH $dailyCte
         |SELECT d, event_type, tss FROM daily
         |ORDER BY d, event_type""".stripMargin,

    // stream-batch dedup parity on the deterministic invariant: the
    // emitted content-hash SET (which duplicate ROW is emitted is
    // arrival-order-dependent, the hash set is not)
    "q62_streaming_dedup" ->
      s"""WITH fresh AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id >= 100
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50
         |)
         |SELECT DISTINCT sha256(text) AS h FROM fresh ORDER BY h""".stripMargin,

    // q09's recursive EWMA restricted to days PRESENT in the daily
    // aggregate: streaming emits only arriving rows; zero-filled gap
    // days decay state without emitting (and a zero state decayed
    // through leading spine days is still zero, so the recursions
    // agree on initial conditions)
    "q64_streaming_ewma" ->
      s"""WITH RECURSIVE $filledCte,
         |numbered AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn FROM filled
         |),
         |rec AS (
         |  SELECT event_type, d, tss, rn,
         |    tss * $CI + 0.0 * $CD AS ctl,
         |    tss * $AI + 0.0 * $AD AS atl
         |  FROM numbered WHERE rn = 1
         |  UNION ALL
         |  SELECT f.event_type, f.d, f.tss, f.rn,
         |    f.tss * $CI + r.ctl * $CD,
         |    f.tss * $AI + r.atl * $AD
         |  FROM numbered f JOIN rec r ON f.event_type = r.event_type AND f.rn = r.rn + 1
         |)
         |SELECT r.event_type, r.d, r.tss, ROUND(r.ctl, 6) AS ctl,
         |  ROUND(r.atl, 6) AS atl, ROUND(r.ctl - r.atl, 6) AS tsb
         |FROM rec r
         |WHERE EXISTS (SELECT 1 FROM daily dl
         |              WHERE dl.d = r.d AND dl.event_type = r.event_type)
         |ORDER BY r.event_type, r.d""".stripMargin,

    "q65_corpus_diff" ->
      s"""WITH v1 AS (
         |  SELECT doc_id, sha256(text) AS h FROM documents WHERE doc_id % 10 <> 0
         |),
         |v2 AS (
         |  SELECT doc_id,
         |    sha256(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS h
         |  FROM documents WHERE doc_id % 7 <> 0
         |)
         |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
         |  CASE WHEN v1.h IS NULL THEN 'added'
         |       WHEN v2.h IS NULL THEN 'removed'
         |       WHEN v1.h = v2.h THEN 'unchanged'
         |       ELSE 'changed' END AS status
         |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
         |ORDER BY doc_id""".stripMargin,

    // MERGE semantics replayed relationally: corrections overwrite
    // matched keys, arrivals insert, untouched days pass through the
    // UNION — any partition the Spark side clobbered or any coalesce
    // it got backwards shifts a day digest
    "q71_merge_upsert" ->
      s"""WITH e AS (
         |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
         |         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
         |  FROM events
         |),
         |day0 AS (SELECT MIN(d) AS d0 FROM e),
         |upd AS (
         |  SELECT event_id, ts, event_type, value + 10 AS value, d
         |  FROM e WHERE d = (SELECT d0 FROM day0) AND event_id % 7 = 0
         |  UNION ALL
         |  SELECT event_id + 1000000, ts, 'correction', 1.5, d
         |  FROM e WHERE d = (SELECT d0 FROM day0) AND event_id % 11 = 0
         |),
         |tgt AS (SELECT * FROM e WHERE d = (SELECT d0 FROM day0)),
         |merged AS (
         |  SELECT COALESCE(u.event_id, t.event_id) AS event_id,
         |         COALESCE(u.ts, t.ts) AS ts,
         |         COALESCE(u.event_type, t.event_type) AS event_type,
         |         COALESCE(u.value, t.value) AS value,
         |         COALESCE(t.d, u.d) AS d
         |  FROM tgt t FULL OUTER JOIN upd u ON t.event_id = u.event_id
         |),
         |final AS (
         |  SELECT event_id, ts, event_type, value, d
         |  FROM e WHERE d <> (SELECT d0 FROM day0)
         |  UNION ALL
         |  SELECT event_id, ts, event_type, value, d FROM merged
         |)
         |SELECT d, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  ${dsum("value")} AS total,
         |  CAST(SUM(epoch_us(ts)) AS BIGINT) AS ts_us_sum,
         |  CAST(SUM(event_id) AS BIGINT) AS id_sum
         |FROM final GROUP BY d ORDER BY d""".stripMargin,

    // re-derives the Morton key from the ORIGINAL parquet in pure
    // DuckDB bit ops (the staged spread16 magic-number interleave,
    // 16→32-bit variant) — a lossy clustered roundtrip OR any drift
    // in the engine's bit-interleave arithmetic fails the digest.
    // Every intermediate is BIGINT (the shifts overflow INT32).
    "q72_zorder_cluster" ->
      s"""WITH b AS (
         |  SELECT event_type, event_id, value,
         |    CAST(user_id % 65536 AS BIGINT) AS x,
         |    CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01') % 65536 AS BIGINT) AS y
         |  FROM events
         |),
         |s1 AS (SELECT *, ((x | (x << 8)) & 16711935) AS x1, ((y | (y << 8)) & 16711935) AS y1 FROM b),
         |s2 AS (SELECT *, ((x1 | (x1 << 4)) & 252645135) AS x2, ((y1 | (y1 << 4)) & 252645135) AS y2 FROM s1),
         |s3 AS (SELECT *, ((x2 | (x2 << 2)) & 858993459) AS x3, ((y2 | (y2 << 2)) & 858993459) AS y3 FROM s2),
         |s4 AS (SELECT *, ((x3 | (x3 << 1)) & 1431655765) AS x4, ((y3 | (y3 << 1)) & 1431655765) AS y4 FROM s3),
         |z AS (SELECT event_type, event_id, value, (x4 | (y4 << 1)) AS z FROM s4)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(z) AS BIGINT) AS z_sum,
         |  CAST(MIN(z) AS BIGINT) AS z_min,
         |  CAST(MAX(z) AS BIGINT) AS z_max,
         |  CAST(SUM(event_id) AS BIGINT) AS id_sum,
         |  ${dsum("value")} AS total
         |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin,

    // layout queries: the clustered/partitioned roundtrip must be
    // value-preserving, so the oracles are plain joins on the RAW
    // tables — any row lost or duplicated by the bucketed write or
    // the partition pruning fails the hash
    "q73_bucketed_join" ->
      s"""SELECT c_mktsegment,
         |  CAST(COUNT(*) AS BIGINT) AS n_orders,
         |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
         |  ${dsum("o_totalprice")} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q74_dpp" ->
      s"""SELECT event_type,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         |  ${dsum("value")} AS total
         |FROM events
         |WHERE (CAST(strftime(CAST(ts AS TIMESTAMP), '%d') AS INT) - 1) // 7 + 1 = 2
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Misra-Gries bound holds for ANY processing order, so the
    // booleans are deterministic even though the raw estimates are
    // not; the exact top-10 identities and counts are fully gated
    "q70_heavy_hitters" -> heavyHittersSql,

    // streamed Misra-Gries: same exact-count oracle by the mergeable bound
    "q106_streaming_heavyhitters" -> heavyHittersSql,

    // session_window semantics: a NEW session starts when the gap is
    // >= 30 min (STRICT — q34's batch lag-flag splits only at > 30
    // min); lag ties on equal t are diff-0 merges either way, so the
    // event_id tiebreak never changes a boundary
    "q69_streaming_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_id FROM events
         |),
         |m AS (
         |  SELECT user_id, t, event_id,
         |    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w >= 1800000000
         |         THEN 1 ELSE 0 END AS new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
         |),
         |s AS (
         |  SELECT user_id, t,
         |    SUM(new) OVER (PARTITION BY user_id ORDER BY t, event_id
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM m
         |)
         |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  MIN(t) AS session_start, MAX(t) - MIN(t) AS duration_us
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,

    // sliding = tumbling with an explicit 2-way fan-out: every event
    // lands in windows starting at hour_floor and hour_floor - 1h
    // (duration 2h / slide 1h, starts aligned to the slide grid —
    // Spark's window() alignment)
    "q68_sliding_windows" ->
      s"""WITH x AS (
         |  SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) - to_hours(k) AS ws,
         |    event_type, value
         |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
         |)
         |SELECT ws, event_type, COUNT(*) AS n, ${dsum("value")} AS total
         |FROM x GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    // the ORC hop must be lossless: the oracle aggregates the ORIGINAL
    // parquet; any encode/decode corruption through the engine's ORC
    // sink+source shows up in the digests
    "q66_orc_roundtrip" ->
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS chars,
         |  MIN(sha256(text)) AS min_h, MAX(sha256(text)) AS max_h
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // q40 fixture pattern: the oracle inlines the expected parse as
    // VALUES — four clean rows, one quarantined (Fixtures.q67CsvLines)
    "q67_csv_roundtrip" ->
      s"""SELECT * FROM (VALUES
         |  (DATE '2021-01-01', 'run',  10.5, CAST(62 AS BIGINT), CAST(1 AS BIGINT)),
         |  (DATE '2021-01-02', 'swim', 1.25, CAST(40 AS BIGINT), CAST(1 AS BIGINT)),
         |  (DATE '2021-01-03', 'bike', 40.0, CAST(95 AS BIGINT), CAST(1 AS BIGINT)),
         |  (DATE '2021-01-05', 'run',  5.0,  CAST(30 AS BIGINT), CAST(1 AS BIGINT))
         |) AS t(d, activity, km, minutes, n_quarantined)
         |ORDER BY d""".stripMargin,

    // q46's contaminated-id set (ids are unique per corpus row, so the
    // streaming emit-once output is exactly this set)
    "q63_streaming_contamination" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents)
         |),
         |w AS (
         |  SELECT doc_id,
         |    unnest(list_distinct([array_to_string(toks[i:i+9], ' ') FOR i IN range(1, greatest(len(toks) - 9, 1) + 1)])) AS win
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM corpus)
         |),
         |bench AS (
         |  SELECT DISTINCT
         |    unnest(list_distinct([array_to_string(toks[i:i+9], ' ') FOR i IN range(1, greatest(len(toks) - 9, 1) + 1)])) AS win
         |  FROM (SELECT $toksExpr AS toks FROM documents WHERE doc_id % 50 = 0)
         |)
         |SELECT DISTINCT w.doc_id
         |FROM w JOIN bench USING (win)
         |ORDER BY doc_id""".stripMargin,

    // BM25 (Lucene idf variant) — the score expression-tree mirrors
    // Queries.q75 token for token: per-term tf via list_filter, corpus
    // stats from a single-row CTE, terms summed left-associatively in
    // the same fixed order, rounded 6dp BEFORE the rank/filter
    "q75_bm25_retrieval" ->
      s"""WITH d AS (
         |  SELECT doc_id, $toksExpr AS toks, len($toksExpr) AS dl
         |  FROM documents
         |),
         |st AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(dl) AS DOUBLE) AS total_len,
         |    CAST(SUM(CASE WHEN list_contains(toks, 'spark')  THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
         |    CAST(SUM(CASE WHEN list_contains(toks, 'join')   THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
         |    CAST(SUM(CASE WHEN list_contains(toks, 'stream') THEN 1 ELSE 0 END) AS DOUBLE) AS df2
         |  FROM d
         |),
         |sc AS (
         |  SELECT doc_id, CAST(dl AS BIGINT) AS dl,
         |    ROUND(
         |      (CASE WHEN tf0 > 0.0 THEN (ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * (1.2 + 1.0))) / (tf0 + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (total_len / n)))) ELSE 0.0 END)
         |    + (CASE WHEN tf1 > 0.0 THEN (ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * (1.2 + 1.0))) / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (total_len / n)))) ELSE 0.0 END)
         |    + (CASE WHEN tf2 > 0.0 THEN (ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * (1.2 + 1.0))) / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (total_len / n)))) ELSE 0.0 END)
         |    , 6) AS score
         |  FROM (
         |    SELECT doc_id, dl,
         |      CAST(len(list_filter(toks, x -> x = 'spark'))  AS DOUBLE) AS tf0,
         |      CAST(len(list_filter(toks, x -> x = 'join'))   AS DOUBLE) AS tf1,
         |      CAST(len(list_filter(toks, x -> x = 'stream')) AS DOUBLE) AS tf2
         |    FROM d
         |  ) CROSS JOIN st
         |)
         |SELECT doc_id, dl, score FROM sc WHERE score > 0.0
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // naive theta-join twin of the deletion-neighborhood blocked join
    // (FuzzyJoin.editDistance1Pairs): every distinct-name pair within
    // Levenshtein 1 over the SAME planted-typo corpus. Both engines
    // implement classic unit-cost Levenshtein.
    "q76_fuzzy_join" ->
      s"""WITH names AS (
         |  SELECT DISTINCT p_name FROM part
         |),
         |corpus AS (
         |  SELECT p_name FROM names
         |  UNION
         |  SELECT 'x' || substr(p_name, 2) AS p_name FROM names
         |)
         |SELECT a.p_name AS a, b.p_name AS b,
         |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
         |FROM corpus a JOIN corpus b
         |  ON a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) <= 1
         |ORDER BY a, b""".stripMargin,

    // full recompute over ALL events — the gate proves the view+delta
    // partial merge (IncrementalAgg) is bit-identical to rebuilding
    // from scratch (decimal partial sums are exactly associative)
    "q77_incremental_agg" ->
      s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |  ${dsum("value")} AS total,
         |  MIN(value) AS vmin, MAX(value) AS vmax,
         |  MIN(CAST(ts AS DATE)) AS d_min, MAX(CAST(ts AS DATE)) AS d_max
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // sketch-state twin of q77: the oracle asserts the exact distinct
    // count and expects TRUE for both in-plan assertions — incremental
    // HLL estimate == full-rebuild estimate (union associativity,
    // through a parquet roundtrip of the view sketches) and the q45
    // ±5% envelope vs the exact count
    "q78_incremental_hll" ->
      s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |  COUNT(DISTINCT user_id) AS exact_distinct,
         |  TRUE AS incremental_equals_full, TRUE AS within_bounds,
         |  MIN(CAST(ts AS DATE)) AS d_min, MAX(CAST(ts AS DATE)) AS d_max
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // generated 20-term twin of the handwritten q75 SQL: per-term
    // CASE/tf/idf blocks emitted in Queries.Bm25MultiTerms order,
    // summed left-associatively — the exact expression tree the Spark
    // side reduces over the native tf vector
    "q79_bm25_multiterm" -> bm25Sql(graft.queries.Queries.Bm25MultiTerms, 30),

    // stream-stream interval join: an inner join's emitted set is a
    // pure function of the inputs, so the oracle is exactly the q31
    // batch theta join
    "q80_streaming_join" ->
      s"""SELECT e.event_id AS error_id, c.event_id AS click_id, c.user_id
         |FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
         |      FROM events WHERE event_type = 'error') e
         |JOIN (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
         |      FROM events WHERE event_type = 'click') c
         |  ON c.user_id = e.user_id AND c.t BETWEEN e.t - 600000000 AND e.t
         |ORDER BY error_id, click_id""".stripMargin,

    // compaction is pure layout: every column of every row must hash
    // identically through the shatter → compact → read-back roundtrip
    "q81_compaction" ->
      s"""SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
         |  user_id, event_type, value
         |FROM events ORDER BY event_id""".stripMargin,

    // quality cascade: same metrics as the q18 oracle, chained in the
    // same rule order — first failing rule names the verdict. All
    // predicates are exact integer/ratio comparisons, so no float
    // rounding can flip a verdict between engines.
    "q82_quality_cascade" -> qualityCascadeSql,

    // streaming quality cascade: stateless projection => stream == batch
    "q162_streaming_cascade" -> qualityCascadeSql,

    // TF-IDF keywords: tf/df rollups + the exact DECIMAL tf*idf9
    // product, token tiebreak, top-3 window
    "q161_tfidf_keywords" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($toksExpr) AS t FROM documents
         |),
         |tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM tk GROUP BY doc_id, t),
         |dfc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY t),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |sc AS (
         |  SELECT tf.doc_id, tf.t, tf.tf, dfc.df,
         |    CAST(tf.tf AS DECIMAL(20,0))
         |      * CAST(ROUND(ln(CAST(nn.n AS DOUBLE) / CAST(dfc.df AS DOUBLE)), 9)
         |             AS DECIMAL(18,9)) AS score_d
         |  FROM tf JOIN dfc USING (t) CROSS JOIN nn
         |),
         |r AS (
         |  SELECT doc_id, t, tf, df, score_d,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_d DESC, t) AS rnk
         |  FROM sc
         |)
         |SELECT doc_id, CAST(rnk AS INTEGER) AS rank, t AS token, tf, df,
         |  CAST(ROUND(score_d, 6) AS DOUBLE) AS score
         |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
  )

  /** q82/q162 shared SQL: the cascade's metric chain in rule order. */
  private lazy val qualityCascadeSql: String = {
      def swCount(words: Seq[String]) =
        s"CAST(len(list_filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)"
      val en = swCount(Seq("the", "and", "of", "is", "to"))
      val de = swCount(Seq("der", "und", "die", "ist", "das"))
      val fr = swCount(Seq("le", "la", "et", "est", "les"))
      val es = swCount(Seq("el", "los", "y", "es", "las"))
      val stop = swCount(graft.functions.Text.Stopwords)
      s"""WITH t AS (SELECT doc_id, text, $toksExpr AS toks FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS tc,
         |    CAST($stop AS DOUBLE) / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS sr,
         |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / CAST(GREATEST(length(text), 1) AS DOUBLE) AS pr,
         |    $en AS s_en, $de AS s_de, $fr AS s_fr, $es AS s_es
         |  FROM t
         |)
         |SELECT doc_id,
         |  CASE WHEN NOT (tc >= 20) THEN 'min_tokens'
         |       WHEN NOT (s_en + s_de + s_fr + s_es > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es) THEN 'lang_en'
         |       WHEN NOT (sr >= 0.04) THEN 'stopword'
         |       WHEN NOT (pr <= 0.2) THEN 'punct'
         |       ELSE 'pass' END AS verdict
         |FROM m ORDER BY doc_id""".stripMargin
  }

  private lazy val tailOracles: Map[String, String] = Map(
    // chunking: rebuild every 32-token/stride-24 chunk string — the
    // slice arithmetic, the stride cover, and the short tail chunk
    // all hash-compare
    "q83_chunking" ->
      s"""WITH t AS (SELECT doc_id, $toksExpr AS toks FROM documents),
         |n AS (SELECT doc_id, toks, CASE WHEN len(toks) <= 32 THEN 1 ELSE CAST(ceil((len(toks) - 32) / 24.0) AS BIGINT) + 1 END AS nch FROM t WHERE len(toks) > 0),
         |i AS (SELECT unnest(range(0, (SELECT max(nch) FROM n))) AS i),
         |c AS (
         |  SELECT doc_id, i.i AS chunk_idx,
         |    array_to_string(toks[i.i*24+1 : i.i*24+32], ' ') AS chunk
         |  FROM n CROSS JOIN i
         |  WHERE i.i < nch
         |)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk,
         |  CAST(len(list_filter(string_split(chunk, ' '), x -> len(x) > 0)) AS BIGINT) AS n_tokens
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    // packing: replay the greedy per-shard recurrence as a recursive
    // CTE — rn joins step k to k+1, so every sequence boundary and
    // position matches the engine's sequential fold decision-for-
    // decision
    "q84_packing" ->
      s"""WITH RECURSIVE
         |t AS (SELECT doc_id, $toksExpr AS toks FROM documents),
         |n AS (SELECT doc_id, toks, CASE WHEN len(toks) <= 32 THEN 1 ELSE CAST(ceil((len(toks) - 32) / 24.0) AS BIGINT) + 1 END AS nch FROM t WHERE len(toks) > 0),
         |iv AS (SELECT unnest(range(0, (SELECT max(nch) FROM n))) AS i),
         |ch AS (
         |  SELECT doc_id, iv.i AS chunk_idx,
         |    CAST(len(list_filter(string_split(array_to_string(toks[iv.i*24+1 : iv.i*24+32], ' '), ' '), x -> len(x) > 0)) AS BIGINT) AS n_tokens
         |  FROM n CROSS JOIN iv WHERE iv.i < nch
         |),
         |o AS (
         |  SELECT doc_id % 8 AS shard, doc_id, chunk_idx, n_tokens,
         |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id, chunk_idx) AS rn
         |  FROM ch
         |),
         |p AS (
         |  SELECT shard, rn, doc_id, chunk_idx, n_tokens,
         |    CAST(0 AS BIGINT) AS seq_idx, CAST(0 AS BIGINT) AS seq_pos, n_tokens AS used
         |  FROM o WHERE rn = 1
         |  UNION ALL
         |  SELECT c.shard, c.rn, c.doc_id, c.chunk_idx, c.n_tokens,
         |    CASE WHEN p.used > 0 AND p.used + c.n_tokens > 256 THEN p.seq_idx + 1 ELSE p.seq_idx END,
         |    CASE WHEN p.used > 0 AND p.used + c.n_tokens > 256 THEN 0 ELSE p.seq_pos + 1 END,
         |    CASE WHEN p.used > 0 AND p.used + c.n_tokens > 256 THEN c.n_tokens ELSE p.used + c.n_tokens END
         |  FROM o c JOIN p ON c.shard = p.shard AND c.rn = p.rn + 1
         |)
         |SELECT shard, doc_id, chunk_idx, n_tokens, seq_idx, seq_pos
         |FROM p ORDER BY shard, doc_id, chunk_idx""".stripMargin,

    // incremental near-dedup: the exact-Jaccard theta join over the
    // full corpus, restricted to pairs involving the delta (ids >= 400
    // — mutants carry +100000). history×history pairs are excluded:
    // the incremental contract says those were emitted at their own
    // ingest.
    "q85_incremental_neardup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents
         |        WHERE doc_id >= 350 AND doc_id < 450)
         |),
         |${shingleCte("corpus")}
         |SELECT * FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, ${jaccardExpr("a.s", "b.s")} AS jaccard
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |) WHERE jaccard >= 0.5 AND (id_a >= 400 OR id_b >= 400)
         |ORDER BY id_a, id_b""".stripMargin,

    // real-codec image roundtrip: the Spark side encodes a constant
    // (w, h, r, g, b) PNG per doc via javax.imageio and decodes it
    // back through ImageIoCodec; the oracle recomputes the planted
    // values arithmetically — equality proves the real encode→decode
    // path preserves header dims and per-channel pixel values.
    "q86_imageio_roundtrip" ->
      """SELECT doc_id,
        |       'png' AS fmt,
        |       4 + doc_id % 13 AS width,
        |       4 + doc_id % 7 AS height,
        |       (doc_id * 37) % 256 AS mean_r,
        |       (doc_id * 59) % 256 AS mean_g,
        |       (doc_id * 83) % 256 AS mean_b
        |FROM documents WHERE doc_id < 200
        |ORDER BY doc_id""".stripMargin,

    // real-codec audio roundtrip: the Spark side encodes a constant
    // |amplitude| square-wave PCM16 WAV per doc via javax.sound and
    // decodes it back through WavCodec; frame counts are multiples of
    // 8 so duration_ms = frames // 8 at 8 kHz is exact, and amplitude
    // < 2^15 makes the /32768 float normalization a lossless
    // power-of-two scale.
    "q87_wav_roundtrip" ->
      """SELECT doc_id,
        |       'wav' AS fmt,
        |       1 + doc_id % 2 AS channels,
        |       CAST(16 AS BIGINT) AS bits,
        |       (800 + (doc_id % 5) * 400) // 8 AS duration_ms,
        |       500 + (doc_id * 31) % 30000 AS amp
        |FROM documents WHERE doc_id < 200
        |ORDER BY doc_id""".stripMargin,

    // canonical-text dedup: the oracle rebuilds the SAME three planted
    // variants (precomposed / decomposed-uppercase / mixed) and
    // canonicalizes with DuckDB's independent Unicode stack
    // (utf8proc nfc_normalize + lower) — Spark's java.text.Normalizer
    // kernel must agree byte-for-byte through the sha256.
    "q88_textnorm_dedup" -> {
      val v1 = " café naïve mix"
      val v2 = " CAFÉ NAÏVE  MIX"
      val v3 = "  Café Naïve mix "
      s"""WITH v AS (
         |  SELECT doc_id + 100000 AS doc_id, text || '$v1' AS text
         |  FROM documents WHERE doc_id < 300
         |  UNION ALL
         |  SELECT doc_id + 200000, text || '$v2' FROM documents WHERE doc_id < 300
         |  UNION ALL
         |  SELECT doc_id + 300000, text || '$v3' FROM documents WHERE doc_id < 300
         |), c AS (
         |  SELECT doc_id,
         |         sha256(trim(regexp_replace(lower(nfc_normalize(text)),
         |                                    '[ \\t\\n\\r]+', ' ', 'g'))) AS canon_sha
         |  FROM v
         |)
         |SELECT min(doc_id) AS rep_id, count(*) AS n_variants, canon_sha
         |FROM c GROUP BY canon_sha ORDER BY rep_id""".stripMargin
    },

    // line-level boilerplate removal: df computed on exact line
    // strings (the operator uses 8-byte hashes — collision P
    // negligible); generate_subscripts/unnest zip to give ordered
    // lines, string_agg(ORDER BY pos) reassembles
    "q89_line_dedup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id,
         |         text || chr(10) || 'subscribe to our newsletter'
         |              || chr(10) || 'copyright 2021 example corp' AS text
         |  FROM documents
         |),
         |l AS (
         |  SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS line
         |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus)
         |),
         |hot AS (
         |  SELECT line FROM (
         |    SELECT line, count(DISTINCT doc_id) AS d FROM l GROUP BY line
         |  ) WHERE d > 50
         |),
         |kept AS (SELECT * FROM l WHERE line NOT IN (SELECT line FROM hot)),
         |re AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |         string_agg(line, chr(10) ORDER BY pos) AS cleaned
         |  FROM kept GROUP BY doc_id
         |),
         |tot AS (SELECT doc_id, count(*) AS n_total FROM l GROUP BY doc_id)
         |SELECT c.doc_id,
         |       coalesce(re.n_kept, 0) AS n_kept,
         |       tot.n_total - coalesce(re.n_kept, 0) AS n_removed,
         |       sha256(coalesce(re.cleaned, '')) AS clean_sha
         |FROM corpus c
         |JOIN tot USING (doc_id)
         |LEFT JOIN re USING (doc_id)
         |ORDER BY c.doc_id""".stripMargin,

    // split-leakage report: exact-Jaccard near-dup pairs × the q35
    // fingerprint split, rolled up by canonicalized split pair
    "q90_split_leakage" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents WHERE doc_id % 3 = 0)
         |),
         |${shingleCte("corpus")},
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'valid' ELSE 'test' END AS split
         |  FROM (
         |    SELECT doc_id,
         |      CAST(list_sum([CAST(ord(substr(text, i, 1)) AS BIGINT) * CAST((i % 31) + 1 AS BIGINT) FOR i IN range(1, length(text) + 1)]) AS BIGINT) % 2147483647 % 100 AS h
         |    FROM corpus
         |  )
         |),
         |p AS (
         |  SELECT * FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, ${jaccardExpr("a.s", "b.s")} AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  ) WHERE jaccard >= 0.5
         |),
         |j AS (
         |  SELECT least(sa.split, sb.split) AS split_a,
         |         greatest(sa.split, sb.split) AS split_b
         |  FROM p
         |  JOIN sp sa ON p.id_a = sa.doc_id
         |  JOIN sp sb ON p.id_b = sb.doc_id
         |)
         |SELECT split_a, split_b, count(*) AS n_pairs
         |FROM j GROUP BY split_a, split_b ORDER BY split_a, split_b""".stripMargin,

    // streaming near-dedup against the stored index: exact-Jaccard
    // pairs RESTRICTED to history (< 400) × delta (>= 400, mutants at
    // +100000) — history ids are all below delta ids, so id_a is the
    // history side under the canonical id_a < id_b ordering
    "q91_streaming_neardup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents
         |        WHERE doc_id >= 350 AND doc_id < 450)
         |),
         |${shingleCte("corpus")}
         |SELECT * FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, ${jaccardExpr("a.s", "b.s")} AS jaccard
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |) WHERE jaccard >= 0.5 AND id_a < 400 AND id_b >= 400
         |ORDER BY id_a, id_b""".stripMargin,

    // URL canonicalization: rebuild the two planted crawls and
    // canonicalize with regex component extraction — lower scheme+host,
    // keep path case, strip fragment and tracking params, drop an
    // emptied '?'. Cross-checks Spark's parse_url component semantics.
    "q92_url_canonical" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |         'HTTPS://Example.COM/Article/' || (doc_id % 50) || '?id=' || (doc_id % 50) || '&utm_source=feed#top' AS url
         |  FROM documents WHERE doc_id < 300
         |  UNION ALL
         |  SELECT doc_id + 10000,
         |         'https://example.com/Article/' || (doc_id % 50) || '?id=' || (doc_id % 50) || '&utm_campaign=x&fbclid=abc'
         |  FROM documents WHERE doc_id < 300
         |),
         |c AS (
         |  SELECT doc_id,
         |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://'
         |      || lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1))
         |      || regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)
         |      || CASE WHEN fq = '' THEN '' ELSE '?' || fq END AS canonical,
         |    ls[-2] || '.' || ls[-1] AS domain
         |  FROM (
         |    SELECT doc_id, url,
         |      array_to_string(list_filter(
         |        string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
         |        p -> NOT (p LIKE 'utm\\_%' ESCAPE '\\' OR p LIKE 'fbclid=%'
         |                  OR p LIKE 'gclid=%' OR p LIKE 'msclkid=%')), '&') AS fq,
         |      string_split(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)), '.') AS ls
         |    FROM u
         |  )
         |)
         |SELECT min(doc_id) AS keeper_id, count(*) AS n_urls, canonical, domain
         |FROM c GROUP BY canonical, domain ORDER BY keeper_id""".stripMargin,

    // bigram rarity: corpus bigram counts on exact strings (operator
    // uses 8-byte hashes — collision argument as everywhere), per-doc
    // rollup of bigrams with corpus count < 5
    "q93_bigram_rarity" ->
      s"""WITH t AS (SELECT doc_id, $toksExpr AS toks FROM documents),
         |bg AS (
         |  SELECT doc_id, unnest([toks[i] || ' ' || toks[i + 1] FOR i IN range(1, len(toks))]) AS b
         |  FROM t
         |),
         |cnt AS (SELECT b, count(*) AS c FROM bg GROUP BY b),
         |per AS (
         |  SELECT bg.doc_id, count(*) AS n_bigrams,
         |         sum(CASE WHEN cnt.c < 5 THEN 1 ELSE 0 END) AS n_rare
         |  FROM bg JOIN cnt USING (b) GROUP BY bg.doc_id
         |)
         |SELECT d.doc_id,
         |       coalesce(per.n_bigrams, 0) AS n_bigrams,
         |       CAST(coalesce(per.n_rare, 0) AS BIGINT) AS n_rare
         |FROM documents d LEFT JOIN per USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // hard negatives: q17's decimal-exact cosine machinery with the
    // label-mismatch predicate in the pair pass
    "q94_hard_negatives" ->
      s"""WITH n AS (
         |  SELECT vec_id, label, embedding,
         |    sqrt(${dotX("embedding", "embedding")}) AS nrm
         |  FROM embeddings
         |),
         |p AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${dotX("q.embedding", "c.embedding")} AS dt,
         |    q.nrm * c.nrm AS den
         |  FROM n q JOIN n c ON q.vec_id <> c.vec_id AND q.label <> c.label
         |  WHERE q.vec_id < 50
         |),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    CASE WHEN den > 0 THEN dt / den ELSE 0.0 END AS sim
         |  FROM p
         |)
         |SELECT query_id, neighbor_id, sim,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS "rank"
         |FROM scored
         |QUALIFY "rank" <= 5
         |ORDER BY query_id, "rank"""".stripMargin,

    // cluster-aware split: q32's recursive-CTE reachability gives the
    // canonical (min reachable) id; the q35 fingerprint of the
    // REPRESENTATIVE's text decides the whole cluster's split
    "q95_cluster_split" ->
      s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents WHERE doc_id % 3 = 0)
         |),
         |${shingleCte("corpus")},
         |pairs AS (
         |  SELECT * FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, ${jaccardExpr("a.s", "b.s")} AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  ) WHERE jaccard >= 0.5
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |),
         |reach(v, m) AS (
         |  SELECT doc_id, doc_id FROM corpus
         |  UNION
         |  SELECT e.dst, r.m FROM reach r JOIN edges e ON e.src = r.v
         |),
         |lab AS (SELECT v, MIN(m) AS comp FROM reach GROUP BY v),
         |reph AS (
         |  SELECT doc_id AS comp,
         |    CAST(list_sum([CAST(ord(substr(text, i, 1)) AS BIGINT) * CAST((i % 31) + 1 AS BIGINT) FOR i IN range(1, length(text) + 1)]) AS BIGINT) % 2147483647 % 100 AS h
         |  FROM corpus
         |)
         |SELECT lab.v AS doc_id, lab.comp AS canonical_id,
         |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'valid' ELSE 'test' END AS split
         |FROM lab JOIN reph USING (comp)
         |ORDER BY doc_id""".stripMargin,

    // script profile: same planted suffixes, counts via RE2 codepoint
    // classes (\x{...} ranges — RE2's spelling of Java's \uXXXX)
    "q96_script_profile" -> {
      val cyr = " привет мир"
      val cjk = " 你好世界"
      val ara = " مرحبا بالعالم"
      s"""WITH t AS (
         |  SELECT doc_id,
         |    text || CASE WHEN doc_id % 4 = 1 THEN '$cyr'
         |                 WHEN doc_id % 4 = 2 THEN '$cjk'
         |                 WHEN doc_id % 4 = 3 THEN '$ara'
         |                 ELSE '' END AS s
         |  FROM documents
         |)
         |SELECT doc_id,
         |  length(s) - length(regexp_replace(s, '[A-Za-z]', '', 'g')) AS n_latin,
         |  length(s) - length(regexp_replace(s, '[\\x{0400}-\\x{04FF}]', '', 'g')) AS n_cyrillic,
         |  length(s) - length(regexp_replace(s, '[\\x{4E00}-\\x{9FFF}]', '', 'g')) AS n_cjk,
         |  length(s) - length(regexp_replace(s, '[\\x{0600}-\\x{06FF}]', '', 'g')) AS n_arabic
         |FROM t ORDER BY doc_id""".stripMargin
    },

    // count-min point queries: exact counts carry the hash compare;
    // the sketch's never-undercount and ε·N-overcount guarantees ride
    // as booleans (q70's gating pattern for probabilistic summaries)
    "q97_countmin" ->
      s"""WITH t AS (SELECT unnest($toksExpr) AS tok FROM documents),
         |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY tok)
         |SELECT tok, cnt, TRUE AS ok_lower, TRUE AS ok_upper
         |FROM c ORDER BY cnt DESC, tok LIMIT 10""".stripMargin,

    // integer-exact PageRank: the oracle unrolls the operator's
    // scaled-BIGINT recurrence verbatim — `//` is DuckDB's truncating
    // integer division, identical to Spark's `div` on non-negatives
    "q98_pagerank" -> {
      val scale = 1000000000000L
      val base = 15L * scale / 100L
      val iters = 5
      val head =
        s"""WITH seq AS (
           |  SELECT event_type, ts, event_id, user_id,
           |    lag(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev
           |  FROM events
           |),
           |edges AS (
           |  SELECT DISTINCT CAST(prev AS BIGINT) AS src, CAST(user_id AS BIGINT) AS dst
           |  FROM seq WHERE prev IS NOT NULL AND prev <> user_id
           |),
           |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
           |verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
           |r0 AS (SELECT v, CAST($scale AS BIGINT) AS r FROM verts)""".stripMargin
      val rounds = (1 to iters).map { k =>
        s"""r$k AS (
           |  SELECT verts.v,
           |    CAST($base + (85 * COALESCE(x.inr, 0)) // 100 AS BIGINT) AS r
           |  FROM verts LEFT JOIN (
           |    SELECT e.dst AS v, SUM(p.r // g.d) AS inr
           |    FROM edges e JOIN r${k - 1} p ON p.v = e.src JOIN deg g ON g.src = e.src
           |    GROUP BY e.dst) x ON x.v = verts.v)""".stripMargin
      }
      (Seq(head) ++ rounds).mkString(",\n") +
        s"\nSELECT v, r AS rank_scaled FROM r$iters ORDER BY v"
    },

    // BPE training: the 12-round unroll ([[bpeUnrollCtes]]); the
    // merge table is the per-round argmax rows
    "q99_bpe_train" -> {
      val iters = 12
      val finals = (1 to iters).map(k =>
        s"""SELECT CAST($k AS INTEGER) AS rank, l AS "left", r AS "right", cnt AS freq FROM best$k""")
      bpeUnrollCtes(iters) + "\n" +
        finals.mkString("\nUNION ALL\n") + "\nORDER BY rank"
    },

    // train-then-apply: segment = the unroll's final word table;
    // subword corpus frequency = symbol occurrences × word freq
    "q102_bpe_vocab" -> (
      bpeUnrollCtes(12) + "\n" +
        s"""SELECT s AS subword, CAST(SUM(freq) AS BIGINT) AS freq
           |FROM (SELECT freq, unnest(syms) AS s FROM words12)
           |GROUP BY s ORDER BY freq DESC, subword LIMIT 100""".stripMargin),

    // export e2e: q82's predicates → first-wins dedup → q83's chunk
    // arithmetic → q84's greedy recurrence, composed over the same
    // corpus the Spark pipeline filters — the sink roundtrip on the
    // Spark side must be lossless for the tables to hash-match
    "q100_export_e2e" ->
      s"""$exportPkCtes
         |SELECT shard, doc_id, chunk_idx, n_tokens, seq_idx, seq_pos
         |FROM pk ORDER BY shard, doc_id, chunk_idx""".stripMargin,

    // training-export shard manifest: the same pipeline replay, rolled
    // up per shard with the order-independent md5-48 XOR digest
    "q135_export_manifest" ->
      s"""$exportPkCtes,
         |hh AS (
         |  SELECT shard,
         |    CAST(list_sum([
         |      CAST(strpos('0123456789abcdef', substr(md5(
         |        CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_idx AS VARCHAR) || ':' ||
         |        CAST(n_tokens AS VARCHAR) || ':' || CAST(seq_idx AS VARCHAR) || ':' ||
         |        CAST(seq_pos AS VARCHAR)), i, 1)) - 1 AS BIGINT)
         |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |      FOR i IN range(1, 13)]) AS BIGINT) AS h,
         |    doc_id, n_tokens
         |  FROM pk
         |)
         |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  bit_xor(h) AS content_fp
         |FROM hh GROUP BY shard ORDER BY shard""".stripMargin,

    // content-defined chunking: the q19/q23 per-token fingerprint
    // recurrence marks boundaries; chunk index = prefix count of
    // boundaries strictly before the token
    "q101_cdc_chunking" -> cdcChunkingSql,

    // streamed CDC: stateless projection ≡ batch, same oracle
    "q109_streaming_cdc" -> cdcChunkingSql,

    // KMV bottom-64 by the q19 fingerprint over distinct 3-gram
    // shingles: the sample rows and exact distinct count gate
    // exactly; the estimator envelope rides as a boolean (q45's
    // sketch-gating pattern)
    "q103_kmv_distinct" ->
      s"""WITH ${shingleCte("documents")},
         |d AS (SELECT DISTINCT unnest(s) AS sh FROM sh),
         |h AS (
         |  SELECT sh,
         |    CAST(list_sum([
         |      CAST(strpos('0123456789abcdef', substr(md5(sh), i, 1)) - 1 AS BIGINT)
         |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |      FOR i IN range(1, 13)]) AS BIGINT) AS h
         |  FROM d
         |),
         |b AS (SELECT sh, h FROM h ORDER BY h, sh LIMIT 64),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM h)
         |SELECT sh, h, st.nd AS n_distinct, TRUE AS ok_est
         |FROM b, st ORDER BY h, sh""".stripMargin,

    // random projection: sign(i,j) = +1 iff md5("i:j")'s first hex
    // digit is even (strpos is 1-based: even digit ⇔ strpos odd);
    // each component is the decimal-exact signed sum — the q17
    // dot-product parity mechanism with b = ±1
    "q107_random_projection" -> {
      val comps = (0 until 16).map { j =>
        s"""  ROUND(CAST(list_sum([
           |    CAST(CASE WHEN strpos('0123456789abcdef', substr(md5(CAST(i - 1 AS VARCHAR) || ':$j'), 1, 1)) % 2 = 1
           |         THEN CAST(embedding[i] AS DOUBLE) ELSE -CAST(embedding[i] AS DOUBLE) END AS DECIMAL(38,12))
           |    FOR i IN range(1, 65)]) AS DOUBLE), 6) AS p$j""".stripMargin
      }
      "SELECT vec_id,\n" + comps.mkString(",\n") +
        "\nFROM embeddings ORDER BY vec_id"
    },

    // weighted grouped sample: the window replay of the mergeable
    // bottom-k over Efraimidis-Spirakis keys — same md5-prefix
    // uniform as q103/q110, key integer-scaled so the gate is exact
    "q116_weighted_sample" ->
      s"""WITH h AS (
         |  SELECT lang, doc_id, GREATEST(n_chars, 1) AS w,
         |    CAST(list_sum([
         |      CAST(strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1 AS BIGINT)
         |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |      FOR i IN range(1, 13)]) AS BIGINT) AS h
         |  FROM documents
         |),
         |k AS (
         |  SELECT lang, doc_id,
         |    CAST(ROUND(-ln((CAST(h AS DOUBLE) + 1.0) / 281474976710656.0)
         |               / CAST(w AS DOUBLE) * 1000000000.0) AS BIGINT) AS k
         |  FROM h
         |)
         |SELECT lang, k, doc_id FROM (
         |  SELECT lang, k, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k, doc_id) AS rn
         |  FROM k) WHERE rn <= 5
         |ORDER BY lang, k, doc_id""".stripMargin,

    // grouped bottom-k sample: the window replay of the mergeable
    // aggregate — same md5-prefix hash arithmetic as q103
    "q110_grouped_sample" ->
      s"""WITH h AS (
         |  SELECT lang, doc_id,
         |    CAST(list_sum([
         |      CAST(strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1 AS BIGINT)
         |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |      FOR i IN range(1, 13)]) AS BIGINT) AS h
         |  FROM documents
         |)
         |SELECT lang, h, doc_id FROM (
         |  SELECT lang, h, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
         |  FROM h) WHERE rn <= 5
         |ORDER BY lang, h, doc_id""".stripMargin,

    // adaptive per-language length filter: interpolated [p5, p95]
    // band per lang (quantile_cont ≡ Spark percentile, both Type-7),
    // survivors + their band edges gated
    "q111_adaptive_length_filter" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, CAST(len($toksExpr) AS BIGINT) AS tok FROM documents
         |),
         |b AS (
         |  SELECT lang, ROUND(quantile_cont(tok, 0.05), 6) AS lo,
         |    ROUND(quantile_cont(tok, 0.95), 6) AS hi
         |  FROM d GROUP BY lang
         |)
         |SELECT d.doc_id, d.lang, d.tok, b.lo, b.hi
         |FROM d JOIN b ON d.lang = b.lang
         |WHERE CAST(d.tok AS DOUBLE) >= b.lo AND CAST(d.tok AS DOUBLE) <= b.hi
         |ORDER BY d.doc_id""".stripMargin,

    // perceptual image near-dup: the Spark side PNG-encodes planted
    // 9x8-cell gray grids, decodes them through ImageIO, area-averages
    // back to the exact integer cell values, dHashes, and finds all
    // pairs within Hamming 3 via 4-band pigeonhole (EXACT recall, so
    // the pair set is a pure function of the planted cells). The
    // oracle replays the cell formula (Queries.dhashFixtureCells) and
    // the 64 left-right comparisons arithmetically — no image stack.
    "q112_perceptual_neardup" ->
      """WITH ids AS MATERIALIZED (
        |  SELECT doc_id, doc_id % 100000 AS i, doc_id // 100000 AS tier FROM (
        |    SELECT doc_id FROM documents WHERE doc_id < 200
        |    UNION ALL SELECT doc_id + 100000 FROM documents WHERE doc_id < 100
        |    UNION ALL SELECT doc_id + 200000 FROM documents WHERE doc_id < 50)
        |),
        |grid AS (
        |  SELECT cy.g AS cy, cx.g AS cx
        |  FROM generate_series(0, 7) cy(g), generate_series(0, 8) cx(g)
        |),
        |cells AS MATERIALIZED (
        |  SELECT d.doc_id, g.cy, g.cx,
        |    CASE WHEN d.tier = 2 AND g.cy = 0 AND g.cx = 0 THEN
        |      CASE WHEN 20 + (d.i*37) % 200 <= 20 + (d.i*37 + 12 + d.i%13) % 200
        |           THEN 240 ELSE 10 END
        |    ELSE 20 + (d.i*37 + (g.cy*9+g.cx)*(g.cy*9+g.cx+11) + (d.i%13)*g.cx) % 200
        |         + CASE WHEN d.tier = 1 THEN 5 ELSE 0 END
        |    END AS v
        |  FROM ids d CROSS JOIN grid g
        |),
        |bits AS MATERIALIZED (
        |  SELECT a.doc_id, a.cy, a.cx, (a.v > b.v) AS bit
        |  FROM cells a JOIN cells b
        |    ON b.doc_id = a.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        |FROM bits a JOIN bits b
        |  ON a.cy = b.cy AND a.cx = b.cx AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // PSL registrable domain: the oracle re-runs the publicsuffix.org
    // matching algorithm IN SQL against the same rule entries the
    // planted hosts exercise (kind n=normal, w=wildcard base,
    // e=exception) — longest-match p, wildcard via the parent suffix,
    // exception priority, implicit default rule p=1, NULL when the
    // host IS a public suffix. Rule subset of Psl.snapshotLines.
    "q113_psl_domain" ->
      """WITH hosts AS MATERIALIZED (
        |  SELECT doc_id,
        |    CASE doc_id % 14
        |      WHEN 0 THEN 'example.com'
        |      WHEN 1 THEN 'www.example' || (doc_id % 7) || '.com'
        |      WHEN 2 THEN 'news.bbc.co.uk'
        |      WHEN 3 THEN 'a' || (doc_id % 5) || '.b.co.uk'
        |      WHEN 4 THEN 'user' || (doc_id % 11) || '.github.io'
        |      WHEN 5 THEN 'deep.sub.site' || (doc_id % 7) || '.com.au'
        |      WHEN 6 THEN 'www.ck'
        |      WHEN 7 THEN 'foo.www.ck'
        |      WHEN 8 THEN 'shop.bar' || (doc_id % 3) || '.ck'
        |      WHEN 9 THEN 'city.kawasaki.jp'
        |      WHEN 10 THEN 'sub.city.kawasaki.jp'
        |      WHEN 11 THEN 'blog.w' || (doc_id % 4) || '.kawasaki.jp'
        |      WHEN 12 THEN 'github.io'
        |      ELSE 'unknown' || (doc_id % 6) || '.zz'
        |    END AS host
        |  FROM documents WHERE doc_id < 400
        |),
        |rules(rule, kind) AS (VALUES
        |  ('com','n'), ('uk','n'), ('co.uk','n'), ('io','n'),
        |  ('github.io','n'), ('au','n'), ('com.au','n'), ('jp','n'),
        |  ('ck','w'), ('kawasaki.jp','w'),
        |  ('www.ck','e'), ('city.kawasaki.jp','e')
        |),
        |lab AS MATERIALIZED (
        |  SELECT doc_id, host, string_split(host, '.') AS ls,
        |         len(string_split(host, '.')) AS n
        |  FROM hosts
        |),
        |cand AS MATERIALIZED (
        |  SELECT l.doc_id, k.g AS k,
        |    array_to_string(list_slice(l.ls, l.n - k.g + 1, l.n), '.') AS sfx,
        |    array_to_string(list_slice(l.ls, l.n - k.g + 2, l.n), '.') AS parent
        |  FROM lab l JOIN generate_series(1, 6) k(g) ON k.g <= l.n
        |),
        |m AS MATERIALIZED (
        |  SELECT c.doc_id,
        |    COALESCE(MAX(CASE WHEN r.kind = 'e' AND r.rule = c.sfx
        |                      THEN c.k END), 0) AS exc_k,
        |    GREATEST(1,
        |      COALESCE(MAX(CASE WHEN r.kind = 'n' AND r.rule = c.sfx
        |                        THEN c.k END), 1),
        |      COALESCE(MAX(CASE WHEN r.kind = 'w' AND r.rule = c.parent
        |                        THEN c.k END), 1)) AS p
        |  FROM cand c LEFT JOIN rules r ON r.rule IN (c.sfx, c.parent)
        |  GROUP BY c.doc_id
        |)
        |SELECT l.doc_id, l.host,
        |  CASE WHEN m.exc_k > 0
        |         THEN array_to_string(list_slice(l.ls, l.n - m.exc_k + 1, l.n), '.')
        |       WHEN l.n <= m.p THEN NULL
        |       ELSE array_to_string(list_slice(l.ls, l.n - m.p, l.n), '.')
        |  END AS domain
        |FROM lab l JOIN m ON m.doc_id = l.doc_id
        |ORDER BY l.doc_id""".stripMargin,

    // CCNet-style perplexity filter: replay of bigram training
    // (Laplace add-one, context-normalized), 9-dp-rounded log-prob
    // scoring with exact DECIMAL sums, and the per-language p75 band
    // (quantile_cont ≡ Spark percentile)
    "q114_perplexity_filter" ->
      s"""WITH d AS MATERIALIZED (
         |  SELECT doc_id, lang, $toksExpr AS t FROM documents
         |),
         |bg AS MATERIALIZED (
         |  SELECT doc_id, lang,
         |    unnest(list_slice(t, 1, len(t) - 1)) AS w1,
         |    unnest(list_slice(t, 2, len(t))) AS w2
         |  FROM d WHERE len(t) >= 2
         |),
         |bgc AS MATERIALIZED (
         |  SELECT w1, w2, COUNT(*) AS cnt FROM bg
         |  WHERE doc_id % 10 < 8 GROUP BY w1, w2
         |),
         |ctx AS MATERIALIZED (SELECT w1, SUM(cnt) AS ctx FROM bgc GROUP BY w1),
         |v AS (
         |  SELECT COUNT(DISTINCT tok) AS v
         |  FROM (SELECT unnest(t) AS tok FROM d WHERE doc_id % 10 < 8)
         |),
         |ll AS MATERIALIZED (
         |  SELECT b.doc_id, b.lang,
         |    ROUND(ln(CAST(COALESCE(c.cnt, 0) + 1 AS DOUBLE) /
         |             CAST(COALESCE(x.ctx, 0) + (SELECT v FROM v) AS DOUBLE)), 9) AS ll
         |  FROM bg b
         |  LEFT JOIN bgc c ON b.w1 = c.w1 AND b.w2 = c.w2
         |  LEFT JOIN ctx x ON b.w1 = x.w1
         |),
         |scored AS MATERIALIZED (
         |  SELECT doc_id, lang, COUNT(*) AS n_bigrams,
         |    ROUND(exp(-(CAST(SUM(CAST(ll AS DECIMAL(38,9))) AS DOUBLE)
         |                / COUNT(*))), 6) AS ppl
         |  FROM ll GROUP BY doc_id, lang
         |),
         |bands AS (
         |  SELECT lang, ROUND(quantile_cont(ppl, 0.75), 6) AS p75
         |  FROM scored GROUP BY lang
         |)
         |SELECT s.doc_id, s.lang, s.n_bigrams, s.ppl, b.p75
         |FROM scored s JOIN bands b ON s.lang = b.lang
         |WHERE s.ppl <= b.p75
         |ORDER BY s.doc_id""".stripMargin,

    // interpolated Kneser-Ney: same bigram stream/train split as
    // q114; the probability is the SAME fixed IEEE tree as the Spark
    // side (dyadic D=0.75, continuation stats from distinct-bigram
    // row counts), ln rounded 9 dp before the exact DECIMAL mean
    "q150_kneser_ney_perplexity" ->
      s"""WITH d AS MATERIALIZED (
         |  SELECT doc_id, $toksExpr AS t FROM documents
         |),
         |bg AS MATERIALIZED (
         |  SELECT doc_id,
         |    unnest(list_slice(t, 1, len(t) - 1)) AS w1,
         |    unnest(list_slice(t, 2, len(t))) AS w2
         |  FROM d WHERE len(t) >= 2
         |),
         |bgc AS MATERIALIZED (
         |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg
         |  WHERE doc_id % 10 < 8 GROUP BY w1, w2
         |),
         |cx AS MATERIALIZED (
         |  SELECT w1, SUM(cnt) AS ctx, CAST(COUNT(*) AS BIGINT) AS n1f
         |  FROM bgc GROUP BY w1
         |),
         |bw AS MATERIALIZED (
         |  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b FROM bgc GROUP BY w2
         |),
         |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM bgc),
         |ll AS MATERIALIZED (
         |  SELECT b.doc_id,
         |    ROUND(ln(
         |      CASE WHEN x.ctx IS NOT NULL THEN
         |        GREATEST(CAST(COALESCE(c.cnt, 0) AS DOUBLE) - 0.75, 0.0)
         |          / CAST(x.ctx AS DOUBLE)
         |        + (0.75 * CAST(x.n1f AS DOUBLE) / CAST(x.ctx AS DOUBLE))
         |          * (CASE WHEN COALESCE(w.n1b, 0) > 0
         |             THEN CAST(w.n1b AS DOUBLE) / CAST((SELECT nb FROM nb) AS DOUBLE)
         |             ELSE 0.5 / CAST((SELECT nb FROM nb) AS DOUBLE) END)
         |      ELSE (CASE WHEN COALESCE(w.n1b, 0) > 0
         |            THEN CAST(w.n1b AS DOUBLE) / CAST((SELECT nb FROM nb) AS DOUBLE)
         |            ELSE 0.5 / CAST((SELECT nb FROM nb) AS DOUBLE) END)
         |      END), 9) AS ll
         |  FROM bg b
         |  LEFT JOIN bgc c ON b.w1 = c.w1 AND b.w2 = c.w2
         |  LEFT JOIN cx x ON b.w1 = x.w1
         |  LEFT JOIN bw w ON b.w2 = w.w2
         |)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |  ROUND(exp(-(CAST(SUM(CAST(ll AS DECIMAL(38,9))) AS DOUBLE)
         |              / COUNT(*))), 6) AS ppl
         |FROM ll GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // streaming LM perplexity: q114's scored table verbatim (no band
    // filter) — the stream's plan-constant kernel must be numerically
    // identical to the batch DECIMAL aggregation
    "q115_streaming_perplexity" ->
      s"""WITH d AS MATERIALIZED (
         |  SELECT doc_id, $toksExpr AS t FROM documents
         |),
         |bg AS MATERIALIZED (
         |  SELECT doc_id,
         |    unnest(list_slice(t, 1, len(t) - 1)) AS w1,
         |    unnest(list_slice(t, 2, len(t))) AS w2
         |  FROM d WHERE len(t) >= 2
         |),
         |bgc AS MATERIALIZED (
         |  SELECT w1, w2, COUNT(*) AS cnt FROM bg
         |  WHERE doc_id % 10 < 8 GROUP BY w1, w2
         |),
         |ctx AS MATERIALIZED (SELECT w1, SUM(cnt) AS ctx FROM bgc GROUP BY w1),
         |v AS (
         |  SELECT COUNT(DISTINCT tok) AS v
         |  FROM (SELECT unnest(t) AS tok FROM d WHERE doc_id % 10 < 8)
         |),
         |ll AS MATERIALIZED (
         |  SELECT b.doc_id,
         |    ROUND(ln(CAST(COALESCE(c.cnt, 0) + 1 AS DOUBLE) /
         |             CAST(COALESCE(x.ctx, 0) + (SELECT v FROM v) AS DOUBLE)), 9) AS ll
         |  FROM bg b
         |  LEFT JOIN bgc c ON b.w1 = c.w1 AND b.w2 = c.w2
         |  LEFT JOIN ctx x ON b.w1 = x.w1
         |)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  ROUND(exp(-(CAST(SUM(CAST(ll AS DECIMAL(38,9))) AS DOUBLE)
         |              / COUNT(*))), 6) AS ppl
         |FROM ll GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    // video near-dup: q112's arithmetic replay extended with the
    // frame dimension — per-frame dHash bits from the planted cell
    // formula, aligned-frame Hamming, clips matching on >=3 of 4
    // frames within radius 3 (per-frame recall is exact by pigeonhole)
    "q117_video_neardup" ->
      """WITH ids AS MATERIALIZED (
        |  SELECT doc_id, doc_id % 100000 AS i, doc_id // 100000 AS tier FROM (
        |    SELECT doc_id FROM documents WHERE doc_id < 120
        |    UNION ALL SELECT doc_id + 100000 FROM documents WHERE doc_id < 60
        |    UNION ALL SELECT doc_id + 200000 FROM documents WHERE doc_id < 30)
        |),
        |grid AS (
        |  SELECT f.g AS f, cy.g AS cy, cx.g AS cx
        |  FROM generate_series(0, 3) f(g), generate_series(0, 7) cy(g),
        |       generate_series(0, 8) cx(g)
        |),
        |cells AS MATERIALIZED (
        |  SELECT d.doc_id, g.f, g.cy, g.cx,
        |    CASE WHEN d.tier = 2 AND g.f = 0 AND g.cy = 0 AND g.cx = 0 THEN
        |      CASE WHEN 20 + (d.i*37) % 200 <= 20 + (d.i*37 + 12 + d.i%13) % 200
        |           THEN 240 ELSE 10 END
        |    ELSE 20 + (d.i*37 + g.f*17 + (g.cy*9+g.cx)*(g.cy*9+g.cx+11)
        |               + (d.i%13)*g.cx) % 200
        |         + CASE WHEN d.tier = 1 THEN 5 ELSE 0 END
        |    END AS v
        |  FROM ids d CROSS JOIN grid g
        |),
        |bits AS MATERIALIZED (
        |  SELECT a.doc_id, a.f, a.cy, a.cx, (a.v > b.v) AS bit
        |  FROM cells a JOIN cells b
        |    ON b.doc_id = a.doc_id AND b.f = a.f AND b.cy = a.cy
        |       AND b.cx = a.cx + 1
        |  WHERE a.cx < 8
        |),
        |fh AS MATERIALIZED (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.f,
        |         SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS ham
        |  FROM bits a JOIN bits b
        |    ON a.f = b.f AND a.cy = b.cy AND a.cx = b.cx AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3
        |)
        |SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS frames_matched
        |FROM fh WHERE ham <= 3
        |GROUP BY id_a, id_b
        |HAVING COUNT(*) >= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // DSIR importance resampling: full replay — hashed unigram+bigram
    // buckets (md5-48 % 1024), Laplace-smoothed log ratios (one
    // 9-dp-rounded ln over exact integer products), DECIMAL(38,9)
    // per-doc sums, md5-derived Gumbel keys, exact top-100
    "q118_dsir_select" ->
      s"""WITH d AS MATERIALIZED (
         |  SELECT doc_id, source, $toksExpr AS t FROM documents
         |),
         |bi AS (
         |  SELECT doc_id, source,
         |    unnest(list_slice(t, 1, len(t) - 1)) AS w1,
         |    unnest(list_slice(t, 2, len(t))) AS w2
         |  FROM d WHERE len(t) >= 2
         |),
         |ng AS (
         |  SELECT doc_id, source, ng FROM
         |    (SELECT doc_id, source, unnest(t) AS ng FROM d)
         |  UNION ALL
         |  SELECT doc_id, source, w1 || ' ' || w2 AS ng FROM bi
         |),
         |bk AS MATERIALIZED (
         |  SELECT doc_id, source,
         |    CAST(list_sum([
         |      CAST(strpos('0123456789abcdef', substr(md5(ng), i, 1)) - 1 AS BIGINT)
         |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |      FOR i IN range(1, 13)]) % 1024 AS BIGINT) AS bucket
         |  FROM ng
         |),
         |tc AS MATERIALIZED (
         |  SELECT bucket, COUNT(*) AS tc FROM bk
         |  WHERE source IN ('src0', 'src1') GROUP BY bucket
         |),
         |rc AS MATERIALIZED (
         |  SELECT bucket, COUNT(*) AS rc FROM bk
         |  WHERE source NOT IN ('src0', 'src1') GROUP BY bucket
         |),
         |tot AS (
         |  SELECT (SELECT SUM(tc) FROM tc) AS tt, (SELECT SUM(rc) FROM rc) AS rt
         |),
         |lam AS MATERIALIZED (
         |  SELECT b.doc_id,
         |    ROUND(ln(CAST((COALESCE(t.tc, 0) + 1) * (tot.rt + 1024) AS DOUBLE) /
         |             CAST((COALESCE(r.rc, 0) + 1) * (tot.tt + 1024) AS DOUBLE)), 9) AS lam
         |  FROM bk b LEFT JOIN tc t ON b.bucket = t.bucket
         |  LEFT JOIN rc r ON b.bucket = r.bucket, tot
         |  WHERE b.source NOT IN ('src0', 'src1')
         |),
         |w AS MATERIALIZED (
         |  SELECT doc_id, COUNT(*) AS n_ngrams,
         |    ROUND(CAST(SUM(CAST(lam AS DECIMAL(38,9))) AS DOUBLE), 6) AS logw
         |  FROM lam GROUP BY doc_id
         |),
         |uu AS (
         |  SELECT doc_id,
         |    (CAST(list_sum([
         |      CAST(strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1 AS BIGINT)
         |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |      FOR i IN range(1, 13)]) AS DOUBLE) + 0.5) / 281474976710656.0 AS u
         |  FROM documents WHERE source NOT IN ('src0', 'src1')
         |),
         |keyed AS (
         |  SELECT w.doc_id, w.n_ngrams, w.logw,
         |    -CAST(ROUND((w.logw - ln(-ln(uu.u))) * 1000000.0) AS BIGINT) AS key
         |  FROM w JOIN uu ON w.doc_id = uu.doc_id
         |)
         |SELECT k.doc_id, d2.source, k.n_ngrams, k.logw, k.key FROM (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY key, doc_id) AS rn FROM keyed) k
         |JOIN documents d2 ON k.doc_id = d2.doc_id
         |WHERE k.rn <= 100
         |ORDER BY k.key, k.doc_id""".stripMargin,

    // hybrid RRF: batch BM25 + exact dense top-30 fused with integer
    // reciprocal-rank contributions — see hybridRrfSql
    "q119_hybrid_rrf" ->
      hybridRrfSql(graft.queries.Queries.HybridQueries, kList = 30, kFused = 20, c = 60),

    // the same pipeline served from STORED indexes: both serves are
    // proven rank-identical to their scan twins, so q119's replay
    // gates the production composition verbatim
    "q230_hybrid_from_indexes" ->
      hybridRrfSql(graft.queries.Queries.HybridQueries, kList = 30, kFused = 20, c = 60),

    // the hybrid stack over LIVE indexes: both retrievers serve the
    // TRUE corpus after their append + tombstone lifecycles, so the
    // q119 replay still gates the fusion verbatim
    "q234_hybrid_live_indexes" ->
      hybridRrfSql(graft.queries.Queries.HybridQueries, kList = 30, kFused = 20, c = 60),

    // hybrid TIME TRAVEL: both tiers pinned to their pre-takedown
    // generation serve the TRUE corpora, so the q119 fused replay
    // gates the pinned composition verbatim too
    "q253_hybrid_time_travel" ->
      hybridRrfSql(graft.queries.Queries.HybridQueries, kList = 30, kFused = 20, c = 60),

    // interpolated trigram perplexity: q114's replay one order up —
    // tri/bi/uni counts + context row-sums, five left joins, the
    // fixed 0.6/0.3/0.1 λ-mix tree, 9-dp ln, DECIMAL(38,9) sums
    "q120_trigram_perplexity" ->
      s"""WITH d AS MATERIALIZED (
         |  SELECT doc_id, $toksExpr AS t FROM documents
         |),
         |tg AS MATERIALIZED (
         |  SELECT doc_id,
         |    unnest(list_slice(t, 1, len(t) - 2)) AS w1,
         |    unnest(list_slice(t, 2, len(t) - 1)) AS w2,
         |    unnest(list_slice(t, 3, len(t))) AS w3
         |  FROM d WHERE len(t) >= 3
         |),
         |tri AS MATERIALIZED (
         |  SELECT w1, w2, w3, COUNT(*) AS c3 FROM tg
         |  WHERE doc_id % 10 < 8 GROUP BY w1, w2, w3
         |),
         |bg AS MATERIALIZED (
         |  SELECT doc_id,
         |    unnest(list_slice(t, 1, len(t) - 1)) AS w1,
         |    unnest(list_slice(t, 2, len(t))) AS w2
         |  FROM d WHERE len(t) >= 2
         |),
         |bi AS MATERIALIZED (
         |  SELECT w1, w2, COUNT(*) AS c2 FROM bg
         |  WHERE doc_id % 10 < 8 GROUP BY w1, w2
         |),
         |uni AS MATERIALIZED (
         |  SELECT w, COUNT(*) AS c1
         |  FROM (SELECT doc_id, unnest(t) AS w FROM d) WHERE doc_id % 10 < 8
         |  GROUP BY w
         |),
         |tot AS (
         |  SELECT COUNT(*) AS t, COUNT(DISTINCT w) AS v
         |  FROM (SELECT unnest(t) AS w FROM d WHERE doc_id % 10 < 8)
         |),
         |ctx3 AS MATERIALIZED (SELECT w1, w2, SUM(c3) AS x3 FROM tri GROUP BY w1, w2),
         |ctx2 AS MATERIALIZED (SELECT w1, SUM(c2) AS x2 FROM bi GROUP BY w1),
         |ll AS MATERIALIZED (
         |  SELECT g.doc_id,
         |    ROUND(ln(
         |      0.6 * (CASE WHEN x.x3 IS NOT NULL
         |        THEN CAST(COALESCE(t3.c3, 0) AS DOUBLE) / CAST(x.x3 AS DOUBLE)
         |        ELSE 0.0 END)
         |      + 0.3 * (CASE WHEN y.x2 IS NOT NULL
         |        THEN CAST(COALESCE(b2.c2, 0) AS DOUBLE) / CAST(y.x2 AS DOUBLE)
         |        ELSE 0.0 END)
         |      + 0.1 * (CAST(COALESCE(u.c1, 0) + 1 AS DOUBLE) / CAST(tot.t + tot.v AS DOUBLE))
         |    ), 9) AS ll
         |  FROM tg g
         |  LEFT JOIN tri t3 ON g.w1 = t3.w1 AND g.w2 = t3.w2 AND g.w3 = t3.w3
         |  LEFT JOIN ctx3 x ON g.w1 = x.w1 AND g.w2 = x.w2
         |  LEFT JOIN bi b2 ON g.w2 = b2.w1 AND g.w3 = b2.w2
         |  LEFT JOIN ctx2 y ON g.w2 = y.w1
         |  LEFT JOIN uni u ON g.w3 = u.w, tot
         |)
         |SELECT doc_id, COUNT(*) AS n_trigrams,
         |  ROUND(exp(-(CAST(SUM(CAST(ll AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*))), 6) AS ppl
         |FROM ll GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    // streaming DSIR scoring: q118's scored table verbatim (no
    // resampling) — the stream's plan-constant kernel must be
    // numerically identical to the batch DECIMAL(38,9) aggregation
    "q121_streaming_dsir" ->
      s"""WITH d AS MATERIALIZED (
         |  SELECT doc_id, source, $toksExpr AS t FROM documents
         |),
         |bi AS (
         |  SELECT doc_id, source,
         |    unnest(list_slice(t, 1, len(t) - 1)) AS w1,
         |    unnest(list_slice(t, 2, len(t))) AS w2
         |  FROM d WHERE len(t) >= 2
         |),
         |ng AS (
         |  SELECT doc_id, source, ng FROM
         |    (SELECT doc_id, source, unnest(t) AS ng FROM d)
         |  UNION ALL
         |  SELECT doc_id, source, w1 || ' ' || w2 AS ng FROM bi
         |),
         |bk AS MATERIALIZED (
         |  SELECT doc_id, source,
         |    CAST(list_sum([
         |      CAST(strpos('0123456789abcdef', substr(md5(ng), i, 1)) - 1 AS BIGINT)
         |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |      FOR i IN range(1, 13)]) % 1024 AS BIGINT) AS bucket
         |  FROM ng
         |),
         |tc AS MATERIALIZED (
         |  SELECT bucket, COUNT(*) AS tc FROM bk
         |  WHERE source IN ('src0', 'src1') GROUP BY bucket
         |),
         |rc AS MATERIALIZED (
         |  SELECT bucket, COUNT(*) AS rc FROM bk
         |  WHERE source NOT IN ('src0', 'src1') GROUP BY bucket
         |),
         |tot AS (
         |  SELECT (SELECT SUM(tc) FROM tc) AS tt, (SELECT SUM(rc) FROM rc) AS rt
         |),
         |lam AS MATERIALIZED (
         |  SELECT b.doc_id,
         |    ROUND(ln(CAST((COALESCE(t.tc, 0) + 1) * (tot.rt + 1024) AS DOUBLE) /
         |             CAST((COALESCE(r.rc, 0) + 1) * (tot.tt + 1024) AS DOUBLE)), 9) AS lam
         |  FROM bk b LEFT JOIN tc t ON b.bucket = t.bucket
         |  LEFT JOIN rc r ON b.bucket = r.bucket, tot
         |  WHERE b.source NOT IN ('src0', 'src1')
         |)
         |SELECT doc_id, COUNT(*) AS n_ngrams,
         |  ROUND(CAST(SUM(CAST(lam AS DECIMAL(38,9))) AS DOUBLE), 6) AS logw
         |FROM lam GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    // temperature mixing: alpha-scaled shares (one POW per domain,
    // 9-dp scaled BIGINT), largest-remainder integer allocation,
    // md5-bottom-k draw — all replayed step for step
    "q122_temperature_mix" ->
      s"""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
         |w AS (
         |  SELECT lang, n,
         |    CAST(ROUND(POW(CAST(n AS DOUBLE), 0.3) * 1000000000.0) AS BIGINT) AS w
         |  FROM c
         |),
         |t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w),
         |q AS (
         |  SELECT lang, n, w, (100 * w) // tw AS q,
         |    100 * w - ((100 * w) // tw) * tw AS r
         |  FROM w, t
         |),
         |qs AS (SELECT CAST(SUM(q) AS BIGINT) AS qsum FROM q),
         |al AS (
         |  SELECT lang, n,
         |    CAST(LEAST(n, q + CASE WHEN ROW_NUMBER() OVER (ORDER BY r DESC, lang)
         |      <= 100 - (SELECT qsum FROM qs) THEN 1 ELSE 0 END) AS BIGINT) AS quota
         |  FROM q
         |),
         |h AS (
         |  SELECT lang, doc_id,
         |    CAST(list_sum([
         |      CAST(strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1 AS BIGINT)
         |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |      FOR i IN range(1, 13)]) AS BIGINT) AS h
         |  FROM documents
         |),
         |rk AS (
         |  SELECT lang, doc_id, h,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS pick
         |  FROM h
         |)
         |SELECT rk.lang, al.n, al.quota, CAST(rk.pick AS BIGINT) AS pick,
         |  rk.doc_id, rk.h
         |FROM rk JOIN al ON rk.lang = al.lang
         |WHERE rk.pick <= al.quota
         |ORDER BY rk.lang, pick""".stripMargin,

    // WordPiece greedy segmentation: re-derive the char-ngram piece
    // inventory, replay every longest-match decision with a recursive
    // CTE walking each distinct word, roll up piece frequencies
    "q123_wordpiece_vocab" ->
      s"""WITH RECURSIVE words AS MATERIALIZED (
         |  SELECT w, COUNT(*) AS freq
         |  FROM (SELECT unnest($toksExpr) AS w FROM documents) GROUP BY w
         |),
         |g1 AS (
         |  SELECT DISTINCT p FROM (
         |    SELECT unnest([substr(w, i, 1) FOR i IN range(1, len(w) + 1)]) AS p
         |    FROM words)
         |),
         |g2 AS (
         |  SELECT p FROM (
         |    SELECT p, ROW_NUMBER() OVER (ORDER BY f DESC, p) AS rn FROM (
         |      SELECT p, SUM(freq) AS f FROM (
         |        SELECT freq, unnest([substr(w, i, 2) FOR i IN range(1, len(w))]) AS p
         |        FROM words WHERE len(w) >= 2) GROUP BY p))
         |  WHERE rn <= 150
         |),
         |g3 AS (
         |  SELECT p FROM (
         |    SELECT p, ROW_NUMBER() OVER (ORDER BY f DESC, p) AS rn FROM (
         |      SELECT p, SUM(freq) AS f FROM (
         |        SELECT freq, unnest([substr(w, i, 3) FOR i IN range(1, len(w) - 1)]) AS p
         |        FROM words WHERE len(w) >= 3) GROUP BY p))
         |  WHERE rn <= 100
         |),
         |g4 AS (
         |  SELECT p FROM (
         |    SELECT p, ROW_NUMBER() OVER (ORDER BY f DESC, p) AS rn FROM (
         |      SELECT p, SUM(freq) AS f FROM (
         |        SELECT freq, unnest([substr(w, i, 4) FOR i IN range(1, len(w) - 2)]) AS p
         |        FROM words WHERE len(w) >= 4) GROUP BY p))
         |  WHERE rn <= 50
         |),
         |vlist AS MATERIALIZED (
         |  SELECT list(p) AS v FROM (
         |    SELECT DISTINCT p FROM (
         |      SELECT p FROM g1 UNION ALL SELECT p FROM g2
         |      UNION ALL SELECT p FROM g3 UNION ALL SELECT p FROM g4))
         |),
         |seg AS (
         |  SELECT w, freq, 0 AS pos, CAST([] AS VARCHAR[]) AS pieces FROM words
         |  UNION ALL
         |  SELECT w, freq, pos + ln_take, list_append(pieces, substr(w, pos + 1, ln_take))
         |  FROM (
         |    SELECT w, freq, pos, pieces,
         |      COALESCE(list_max([l FOR l IN [1, 2, 3, 4]
         |        IF pos + l <= len(w)
         |        AND list_contains(vl.v, substr(w, pos + 1, l))]), 1) AS ln_take
         |    FROM seg, vlist vl WHERE pos < len(w))
         |)
         |SELECT subword, CAST(SUM(freq) AS BIGINT) AS freq FROM (
         |  SELECT freq, unnest(pieces) AS subword FROM seg WHERE pos = len(w))
         |GROUP BY subword ORDER BY freq DESC, subword LIMIT 100""".stripMargin,

    // duplication profile: q32's reachability clustering rolled up
    // into the cluster-size histogram
    "q124_dup_profile" ->
      s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents)
         |),
         |${shingleCte("corpus")},
         |pairs AS (
         |  SELECT * FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, ${jaccardExpr("a.s", "b.s")} AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  ) WHERE jaccard >= 0.5
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |),
         |reach(v, m) AS (
         |  SELECT doc_id, doc_id FROM corpus
         |  UNION
         |  SELECT e.dst, r.m FROM reach r JOIN edges e ON e.src = r.v
         |),
         |comp AS (SELECT v, MIN(m) AS comp FROM reach GROUP BY v),
         |sizes AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM comp GROUP BY comp)
         |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(SUM(cluster_size) AS BIGINT) AS n_docs
         |FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,

    // corpus drift: Laplace-smoothed KL over the union vocabulary,
    // 9-dp ln over integer products, 12-dp contributions, exact total
    "q125_drift_report" ->
      s"""WITH ta AS MATERIALIZED (
         |  SELECT tok AS token, COUNT(*) AS cnt_a
         |  FROM (SELECT unnest($toksExpr) AS tok FROM documents) GROUP BY tok
         |),
         |tb AS MATERIALIZED (
         |  SELECT tok AS token, COUNT(*) AS cnt_b
         |  FROM (SELECT unnest($toksExpr) AS tok FROM documents WHERE lang <> 'zh')
         |  GROUP BY tok
         |),
         |j AS MATERIALIZED (
         |  SELECT COALESCE(ta.token, tb.token) AS token,
         |    COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
         |  FROM ta FULL OUTER JOIN tb ON ta.token = tb.token
         |),
         |tot AS (
         |  SELECT CAST(SUM(cnt_a) AS BIGINT) AS t_a, CAST(SUM(cnt_b) AS BIGINT) AS t_b,
         |    CAST(COUNT(*) AS BIGINT) AS v
         |  FROM j
         |),
         |sc AS MATERIALIZED (
         |  SELECT token, cnt_a, cnt_b,
         |    ROUND(CAST(cnt_a + 1 AS DOUBLE) / CAST(t_a + v AS DOUBLE) *
         |      ROUND(ln(CAST((cnt_a + 1) * (t_b + v) AS DOUBLE) /
         |               CAST((cnt_b + 1) * (t_a + v) AS DOUBLE)), 9), 12) AS contrib
         |  FROM j, tot
         |),
         |kl AS (
         |  SELECT ROUND(CAST(SUM(CAST(contrib AS DECIMAL(38,12))) AS DOUBLE), 12) AS kl_total
         |  FROM sc
         |)
         |SELECT token, cnt_a, cnt_b, contrib, (SELECT kl_total FROM kl) AS kl_total
         |FROM sc ORDER BY contrib DESC, token LIMIT 25""".stripMargin,

    // classifier calibration: q118's scoring machinery on an
    // even/odd train/held-out split, swept over five thresholds into
    // confusion counts + 6-dp precision/recall
    "q126_classifier_eval" ->
      s"""WITH d AS MATERIALIZED (
         |  SELECT doc_id, source, $toksExpr AS t FROM documents
         |),
         |bi AS (
         |  SELECT doc_id, source,
         |    unnest(list_slice(t, 1, len(t) - 1)) AS w1,
         |    unnest(list_slice(t, 2, len(t))) AS w2
         |  FROM d WHERE len(t) >= 2
         |),
         |ng AS (
         |  SELECT doc_id, source, ng FROM
         |    (SELECT doc_id, source, unnest(t) AS ng FROM d)
         |  UNION ALL
         |  SELECT doc_id, source, w1 || ' ' || w2 AS ng FROM bi
         |),
         |bk AS MATERIALIZED (
         |  SELECT doc_id, source,
         |    CAST(list_sum([
         |      CAST(strpos('0123456789abcdef', substr(md5(ng), i, 1)) - 1 AS BIGINT)
         |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |      FOR i IN range(1, 13)]) % 1024 AS BIGINT) AS bucket
         |  FROM ng
         |),
         |tc AS MATERIALIZED (
         |  SELECT bucket, COUNT(*) AS tc FROM bk
         |  WHERE doc_id % 2 = 0 AND source IN ('src0', 'src1') GROUP BY bucket
         |),
         |rc AS MATERIALIZED (
         |  SELECT bucket, COUNT(*) AS rc FROM bk
         |  WHERE doc_id % 2 = 0 AND source NOT IN ('src0', 'src1') GROUP BY bucket
         |),
         |tot AS (
         |  SELECT (SELECT SUM(tc) FROM tc) AS tt, (SELECT SUM(rc) FROM rc) AS rt
         |),
         |lam AS MATERIALIZED (
         |  SELECT b.doc_id,
         |    ROUND(ln(CAST((COALESCE(t.tc, 0) + 1) * (tot.rt + 1024) AS DOUBLE) /
         |             CAST((COALESCE(r.rc, 0) + 1) * (tot.tt + 1024) AS DOUBLE)), 9) AS lam
         |  FROM bk b LEFT JOIN tc t ON b.bucket = t.bucket
         |  LEFT JOIN rc r ON b.bucket = r.bucket, tot
         |  WHERE b.doc_id % 2 = 1
         |),
         |w AS MATERIALIZED (
         |  SELECT l.doc_id,
         |    ROUND(CAST(SUM(CAST(l.lam AS DECIMAL(38,9))) AS DOUBLE), 6) AS logw,
         |    MAX(CASE WHEN d2.source IN ('src0', 'src1') THEN 1 ELSE 0 END) AS pos
         |  FROM lam l JOIN documents d2 ON l.doc_id = d2.doc_id
         |  GROUP BY l.doc_id
         |),
         |thr AS (SELECT unnest([-20.0, -15.0, -10.0, -5.0, 0.0]) AS thr),
         |cm AS (
         |  SELECT thr,
         |    CAST(SUM(CASE WHEN pos = 1 AND logw >= thr THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(SUM(CASE WHEN pos = 0 AND logw >= thr THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(SUM(CASE WHEN pos = 1 AND logw < thr THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(SUM(CASE WHEN pos = 0 AND logw < thr THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM w, thr GROUP BY thr
         |)
         |SELECT thr, tp, fp, fn, tn,
         |  ROUND(CAST(tp AS DOUBLE) / CAST(GREATEST(tp + fp, 1) AS DOUBLE), 6) AS precision,
         |  ROUND(CAST(tp AS DOUBLE) / CAST(GREATEST(tp + fn, 1) AS DOUBLE), 6) AS recall
         |FROM cm ORDER BY thr""".stripMargin,

    // audio near-dup: the q112/q117 arithmetic-replay pattern for the
    // third modality — slice energies from the planted sample
    // formula, adjacent-delta sign bits, exact Hamming pair set
    "q127_audio_neardup" ->
      """WITH ids AS MATERIALIZED (
        |  SELECT doc_id, doc_id % 100000 AS i, doc_id // 100000 AS tier FROM (
        |    SELECT doc_id FROM documents WHERE doc_id < 150
        |    UNION ALL SELECT doc_id + 100000 FROM documents WHERE doc_id < 75
        |    UNION ALL SELECT doc_id + 200000 FROM documents WHERE doc_id < 40)
        |),
        |grid AS (
        |  SELECT f.g AS f, k.g AS k
        |  FROM generate_series(0, 64) f(g), generate_series(0, 15) k(g)
        |),
        |samp AS MATERIALIZED (
        |  SELECT d.doc_id, g.f, g.k,
        |    CASE WHEN d.tier = 2 AND g.f = 64 THEN 1
        |         WHEN g.f = 64 THEN (200 + d.i % 50)
        |           * (CASE WHEN d.tier = 1 THEN 2 ELSE 1 END)
        |         ELSE (40 + ((d.i * 29 + g.f * 13 + g.k * (g.k + 7)
        |           + (d.i % 11) * g.k) % 160))
        |           * (CASE WHEN d.tier = 1 THEN 2 ELSE 1 END)
        |    END AS v
        |  FROM ids d, grid g
        |),
        |en AS MATERIALIZED (
        |  SELECT doc_id, f, SUM(CAST(v AS BIGINT) * v) AS e
        |  FROM samp GROUP BY doc_id, f
        |),
        |bits AS MATERIALIZED (
        |  SELECT a.doc_id, a.f AS bit, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bv
        |  FROM en a JOIN en b ON b.doc_id = a.doc_id AND b.f = a.f + 1
        |  WHERE a.f < 64
        |),
        |fh AS (
        |  SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |    SUM(CASE WHEN x.bv <> y.bv THEN 1 ELSE 0 END) AS hamming
        |  FROM bits x JOIN bits y ON x.bit = y.bit AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM fh
        |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,

    // quality-aware survivor selection: the q32 clustering + q18
    // quality score + max-quality-then-min-id selection, all replayed
    "q128_quality_survivors" -> {
      val stop = graft.functions.Text.Stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents)
         |),
         |${shingleCte("corpus")},
         |pairs AS (
         |  SELECT * FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, ${jaccardExpr("a.s", "b.s")} AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  ) WHERE jaccard >= 0.5
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |),
         |reach(v, m) AS (
         |  SELECT doc_id, doc_id FROM corpus
         |  UNION
         |  SELECT e.dst, r.m FROM reach r JOIN edges e ON e.src = r.v
         |),
         |comp AS (SELECT v, MIN(m) AS comp FROM reach GROUP BY v),
         |qm AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE)
         |      / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS sr,
         |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
         |      / CAST(GREATEST(length(text), 1) AS DOUBLE) AS pr,
         |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
         |      / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS mwl,
         |    length(text) AS nc
         |  FROM (SELECT doc_id, text, $toksExpr AS toks FROM corpus)
         |),
         |q AS (
         |  SELECT doc_id,
         |    ROUND(LEAST(1.0, GREATEST(0.0, 0.2 + 2.0 * sr - 3.0 * pr
         |      + 0.05 * LEAST(mwl, 8.0)
         |      + CASE WHEN nc >= 200 THEN 0.1 ELSE 0.0 END)), 6) AS quality
         |  FROM qm
         |),
         |lab AS (
         |  SELECT c.comp, c.v AS doc_id, q.quality
         |  FROM comp c JOIN q ON q.doc_id = c.v
         |),
         |best AS (SELECT comp, MAX(quality) AS quality FROM lab GROUP BY comp),
         |sizes AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM lab GROUP BY comp)
         |SELECT b.comp, s.cluster_size, MIN(l.doc_id) AS survivor_id, b.quality
         |FROM best b
         |JOIN lab l ON l.comp = b.comp AND l.quality = b.quality
         |JOIN sizes s ON s.comp = b.comp
         |GROUP BY b.comp, b.quality, s.cluster_size
         |ORDER BY b.comp""".stripMargin
    },

    // sub-document duplication: per-doc duplicated-window ratio over
    // the corpus + mutants, replayed with window strings
    "q129_dup_window_ratio" ->
      s"""WITH corpus AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents)
         |),
         |t AS (SELECT doc_id, $toksExpr AS toks FROM corpus),
         |w AS MATERIALIZED (
         |  SELECT doc_id,
         |    unnest(list_distinct([array_to_string(toks[i:i+9], ' ')
         |      FOR i IN range(1, greatest(len(toks) - 9, 1) + 1)])) AS win
         |  FROM t
         |),
         |dfq AS (
         |  SELECT win FROM (SELECT win, COUNT(*) AS c FROM w GROUP BY win)
         |  WHERE c >= 2
         |),
         |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows FROM w GROUP BY doc_id),
         |d AS (
         |  SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS dup_windows
         |  FROM w JOIN dfq ON w.win = dfq.win GROUP BY w.doc_id
         |)
         |SELECT n.doc_id, n.n_windows,
         |  COALESCE(d.dup_windows, 0) AS dup_windows,
         |  ROUND(CAST(COALESCE(d.dup_windows, 0) AS DOUBLE)
         |    / CAST(n.n_windows AS DOUBLE), 6) AS dup_ratio
         |FROM n LEFT JOIN d ON d.doc_id = n.doc_id
         |ORDER BY n.doc_id""".stripMargin,

    // ExactSubstr removal: q129's window-df replay extended to
    // POSITIONAL coverage — removed token set = union of [pos,
    // pos+10) over duplicated windows, cleaned string rebuilt token
    // by token, span count = removed tokens with no removed
    // predecessor (window STRINGS here; the engine rides 8-byte
    // hashes — the q42 collision argument)
    "q146_exact_substr" ->
      s"""WITH corpus AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents)
         |)
         |${exactSubstrTail("")}""".stripMargin,

    // incremental ExactSubstr: incremental ≡ from-scratch — the
    // oracle IS the batch replay over history ∪ delta, restricted to
    // delta ids (q105's oracle discipline)
    "q148_incremental_exact_substr" ->
      s"""WITH corpus AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents
         |        WHERE doc_id >= 350 AND doc_id < 450)
         |)
         |${exactSubstrTail("WHERE doc_id >= 400")}""".stripMargin,

    // semantic contamination: nearest-benchmark argmax (exact cosine,
    // ties -> lowest bench id — q47's assignment recurrence) over the
    // corpus/eval split, thresholded at the exact >= 0.4; sim is the
    // raw exact-arithmetic double (bit-identical, no rounding)
    "q147_semantic_contamination" -> semanticContaminationSql,

    // streaming semantic contamination: stateless per-row projection
    // under the micro-batch runtime — stream ≡ batch, oracle is
    // q147's replay verbatim
    "q149_streaming_semantic_contamination" -> semanticContaminationSql,

    // KMV set-operation overlap: both snapshot sketches, the merged
    // k-set, and every estimate replayed with the md5-prefix hashes
    "q130_corpus_overlap" ->
      s"""WITH d AS MATERIALIZED (SELECT doc_id, $toksExpr AS toks FROM documents),
         |shl AS (
         |  SELECT doc_id,
         |    list_distinct([array_to_string(toks[i:i+2], ' ')
         |      FOR i IN range(1, greatest(len(toks) - 2, 1) + 1)]) AS s
         |  FROM d
         |),
         |a AS MATERIALIZED (SELECT DISTINCT unnest(s) AS sh FROM shl WHERE doc_id % 2 = 0),
         |b AS MATERIALIZED (SELECT DISTINCT unnest(s) AS sh FROM shl WHERE doc_id % 2 = 1),
         |ha AS (
         |  SELECT DISTINCT CAST(list_sum([
         |    CAST(strpos('0123456789abcdef', substr(md5(sh), i, 1)) - 1 AS BIGINT)
         |      * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |    FOR i IN range(1, 13)]) AS BIGINT) AS h
         |  FROM a
         |),
         |hb AS (
         |  SELECT DISTINCT CAST(list_sum([
         |    CAST(strpos('0123456789abcdef', substr(md5(sh), i, 1)) - 1 AS BIGINT)
         |      * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |    FOR i IN range(1, 13)]) AS BIGINT) AS h
         |  FROM b
         |),
         |ska AS MATERIALIZED (SELECT h FROM ha ORDER BY h LIMIT 128),
         |skb AS MATERIALIZED (SELECT h FROM hb ORDER BY h LIMIT 128),
         |mg AS MATERIALIZED (
         |  SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL SELECT h FROM skb)
         |  ORDER BY h LIMIT 128
         |),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_merged, MAX(h) AS h_k FROM mg),
         |nb AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_both
         |  FROM mg WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)
         |),
         |eu AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_union
         |  FROM (SELECT sh FROM a UNION SELECT sh FROM b)
         |),
         |ei AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_inter
         |  FROM (SELECT sh FROM a INTERSECT SELECT sh FROM b)
         |),
         |base AS (
         |  SELECT CAST(128 AS BIGINT) AS k, st.h_k,
         |    ROUND(CASE WHEN st.n_merged < 128 THEN CAST(st.n_merged AS DOUBLE)
         |      ELSE 127e0 * 281474976710656e0 / CAST(st.h_k AS DOUBLE) END, 6) AS union_est,
         |    ROUND(CAST(nb.n_both AS DOUBLE) / CAST(st.n_merged AS DOUBLE), 6) AS jaccard_est,
         |    eu.exact_union, ei.exact_inter
         |  FROM st, nb, eu, ei
         |)
         |SELECT k, h_k, union_est, jaccard_est,
         |  ROUND(jaccard_est * union_est, 6) AS intersection_est,
         |  exact_union, exact_inter,
         |  ABS(union_est - exact_union) <= exact_union * 0.25 AS union_within,
         |  ABS(ROUND(jaccard_est * union_est, 6) - exact_inter) <= exact_inter * 0.35 AS inter_within
         |FROM base""".stripMargin,

    // triangle counting: the naive canonical three-way join over the
    // same planted modular graph — exact integer twin of the
    // degree-ordered plan
    "q131_triangles" ->
      """WITH n AS (SELECT COUNT(*) AS n FROM documents),
        |raw AS (
        |  SELECT doc_id AS x, (doc_id * 7 + 3) % n.n AS y FROM documents, n
        |  UNION ALL SELECT doc_id, (doc_id * 13 + 5) % n.n FROM documents, n
        |  UNION ALL SELECT (doc_id * 7 + 3) % n.n, (doc_id * 13 + 5) % n.n
        |    FROM documents, n
        |),
        |e AS MATERIALIZED (
        |  SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b
        |  FROM raw WHERE x <> y
        |),
        |v AS (
        |  SELECT COUNT(DISTINCT vv) AS n_vertices
        |  FROM (SELECT a AS vv FROM e UNION ALL SELECT b FROM e)
        |),
        |t AS (
        |  SELECT COUNT(*) AS n_triangles
        |  FROM e ab JOIN e bc ON ab.b = bc.a
        |  JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
        |)
        |SELECT CAST(v.n_vertices AS BIGINT) AS n_vertices,
        |  CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
        |  CAST(t.n_triangles AS BIGINT) AS n_triangles
        |FROM v, t""".stripMargin,

    // ANN recall report: the q17 exact retriever and the q29 seeded
    // IVF retriever as CTEs, recall@5 per query + corpus mean
    "q132_ann_recall" ->
      s"""WITH n AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    sqrt(CAST(list_sum([CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len(embedding) + 1)]) AS DOUBLE)) AS nrm
         |  FROM embeddings
         |),
         |ex AS MATERIALIZED (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        CASE WHEN q.nrm * c.nrm > 0
         |          THEN ${dotX("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
         |          ELSE 0.0 END DESC, c.vec_id) AS rn
         |    FROM n q JOIN n c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < 50)
         |  WHERE rn <= 5
         |),
         |s AS (SELECT vec_id AS cell, embedding AS sv, nrm AS sn FROM n WHERE vec_id < 16),
         |cs AS MATERIALIZED (
         |  SELECT v.vec_id, v.nrm, s.cell,
         |    CASE WHEN v.nrm * s.sn > 0 THEN
         |      ${dotX("v.embedding", "s.sv")} / (v.nrm * s.sn)
         |    ELSE 0.0 END AS csim
         |  FROM n v CROSS JOIN s
         |),
         |assign AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
         |    FROM cs) WHERE rn = 1
         |),
         |probes AS (
         |  SELECT vec_id AS query_id, cell FROM (
         |    SELECT vec_id, cell,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
         |    FROM cs WHERE vec_id < 50) WHERE rn <= 4
         |),
         |iv AS MATERIALIZED (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT p.query_id, a.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
         |        CASE WHEN qn.nrm * cn.nrm > 0
         |          THEN ${dotX("qn.embedding", "cn.embedding")} / (qn.nrm * cn.nrm)
         |          ELSE 0.0 END DESC, a.vec_id) AS rn
         |    FROM probes p
         |    JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
         |    JOIN n qn ON qn.vec_id = p.query_id
         |    JOIN n cn ON cn.vec_id = a.vec_id)
         |  WHERE rn <= 5
         |),
         |m AS (
         |  SELECT ex.query_id,
         |    CAST(SUM(CASE WHEN iv.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
         |    CAST(COUNT(*) AS BIGINT) AS k
         |  FROM ex LEFT JOIN iv
         |    ON iv.query_id = ex.query_id AND iv.neighbor_id = ex.neighbor_id
         |  GROUP BY ex.query_id
         |),
         |mr AS (
         |  SELECT ROUND(CAST(SUM(n_matched) AS DOUBLE)
         |    / CAST(COUNT(*) * 5 AS DOUBLE), 6) AS mean_recall FROM m
         |)
         |SELECT query_id, n_matched,
         |  ROUND(CAST(n_matched AS DOUBLE) / CAST(k AS DOUBLE), 6) AS recall,
         |  (SELECT mean_recall FROM mr) AS mean_recall
         |FROM m ORDER BY query_id""".stripMargin,

    // LSH tuning: the closed-form S-curve per 32-hash factorization
    // plus the empirical expected recall over the q15 pair set,
    // binned 2 dp with scaled-integer expectation arithmetic
    "q133_lsh_tuning" ->
      s"""WITH ${shingleCte("(SELECT doc_id, text FROM documents WHERE doc_id < 200)")},
         |pj AS (
         |  SELECT ROUND(jaccard, 2) AS jb FROM (
         |    SELECT ${jaccardExpr("a.s", "b.s")} AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  ) WHERE jaccard >= 0.02
         |),
         |bins AS (SELECT jb, CAST(COUNT(*) AS BIGINT) AS cnt FROM pj GROUP BY jb),
         |f AS (
         |  SELECT CAST(b AS BIGINT) AS bands, CAST(32 // b AS BIGINT) AS rows_per_band
         |  FROM (SELECT unnest([1, 2, 4, 8, 16, 32]) AS b)
         |),
         |tp AS (
         |  SELECT f.bands, f.rows_per_band, bins.cnt,
         |    CAST(ROUND((1e0 - POW(1e0 - POW(jb, rows_per_band), bands)) * 1e9) AS BIGINT) AS ps
         |  FROM f, bins
         |),
         |agg AS (
         |  SELECT bands, rows_per_band, CAST(SUM(cnt * ps) AS BIGINT) AS s,
         |    CAST(SUM(cnt) AS BIGINT) AS n
         |  FROM tp GROUP BY bands, rows_per_band
         |)
         |SELECT bands, rows_per_band,
         |  ROUND(1e0 - POW(1e0 - POW(8e-1, rows_per_band), bands), 6) AS p_catch_high,
         |  ROUND(1e0 - POW(1e0 - POW(3e-1, rows_per_band), bands), 6) AS p_catch_low,
         |  ROUND(POW(1e0 / bands, 1e0 / rows_per_band), 6) AS s_midpoint,
         |  ROUND(CAST(s AS DOUBLE) / 1000000000.0 / CAST(n AS DOUBLE), 6) AS expected_catch,
         |  n AS n_pairs
         |FROM agg ORDER BY bands""".stripMargin,

    // ensemble dedup: text-jaccard pairs UNION SemDeDup cell-bounded
    // cosine pairs (q47's argmax cell assignment replayed — ties →
    // lowest cell; pairs only WITHIN a cell) feed the same
    // reachability fold
    "q134_ensemble_dedup" ->
      s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents)
         |),
         |${shingleCte("corpus")},
         |tpairs AS (
         |  SELECT * FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, ${jaccardExpr("a.s", "b.s")} AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  ) WHERE jaccard >= 0.5
         |),
         |nv AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    sqrt(${dotX("embedding", "embedding")}) AS nrm
         |  FROM embeddings
         |),
         |sd AS (SELECT vec_id AS cell, embedding AS sv, nrm AS sn FROM nv WHERE vec_id < 8),
         |cassign AS MATERIALIZED (
         |  SELECT vec_id, cell FROM (
         |    SELECT v.vec_id, sd.cell,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |        CASE WHEN v.nrm * sd.sn > 0 THEN ${dotX("v.embedding", "sd.sv")} / (v.nrm * sd.sn)
         |        ELSE 0.0 END DESC, sd.cell) AS rn
         |    FROM nv v CROSS JOIN sd) WHERE rn = 1
         |),
         |wc AS (SELECT c.vec_id, c.cell, n.embedding, n.nrm
         |       FROM cassign c JOIN nv n USING (vec_id)),
         |epairs AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |      CASE WHEN a.nrm * b.nrm > 0 THEN
         |        ${dotX("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
         |      ELSE 0.0 END AS sim
         |    FROM wc a JOIN wc b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  ) WHERE sim >= 0.4
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM tpairs
         |  UNION ALL SELECT id_b, id_a FROM tpairs
         |  UNION ALL SELECT id_a, id_b FROM epairs
         |  UNION ALL SELECT id_b, id_a FROM epairs
         |),
         |reach(v, m) AS (
         |  SELECT doc_id, doc_id FROM corpus
         |  UNION
         |  SELECT e.dst, r.m FROM reach r JOIN edges e ON e.src = r.v
         |)
         |SELECT v AS doc_id, MIN(m) AS comp
         |FROM reach GROUP BY v ORDER BY doc_id""".stripMargin,

    // Poisson-bootstrap CI: md5-uniform CDF inversion (thresholds are
    // the SAME Scala-printed doubles), weighted replicate means over
    // exact DECIMAL sums, order-statistic interval — full replay
    "q136_bootstrap_ci" -> {
      val stop = graft.functions.Text.Stopwords.map(w => s"'$w'").mkString(", ")
      val cdf = graft.operators.Bootstrap.PoissonCdf
      val wCase = cdf.zipWithIndex.reverse.foldLeft("6") {
        case (rest, (c, k)) => s"CASE WHEN u < $c THEN $k ELSE $rest END"
      }
      s"""WITH qm AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE)
         |      / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS sr,
         |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
         |      / CAST(GREATEST(length(text), 1) AS DOUBLE) AS pr,
         |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
         |      / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS mwl,
         |    length(text) AS nc
         |  FROM (SELECT doc_id, text, $toksExpr AS toks FROM documents)
         |),
         |sc AS MATERIALIZED (
         |  SELECT doc_id,
         |    ROUND(LEAST(1.0, GREATEST(0.0, 0.2 + 2.0 * sr - 3.0 * pr
         |      + 0.05 * LEAST(mwl, 8.0)
         |      + CASE WHEN nc >= 200 THEN 0.1 ELSE 0.0 END)), 6) AS q
         |  FROM qm
         |),
         |reps AS (
         |  SELECT sc.doc_id, sc.q, r.g AS r,
         |    (CAST(list_sum([
         |      CAST(strpos('0123456789abcdef', substr(md5(
         |        CAST(sc.doc_id AS VARCHAR) || ':' || CAST(r.g AS VARCHAR)), i, 1)) - 1 AS BIGINT)
         |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |      FOR i IN range(1, 13)]) AS DOUBLE) + 0.5) / 281474976710656.0 AS u
         |  FROM sc, generate_series(0, 31) r(g)
         |),
         |wm AS MATERIALIZED (
         |  SELECT r, CAST(SUM(CAST(q * CAST(($wCase) AS DOUBLE) AS DECIMAL(38,9))) AS DOUBLE)
         |    / CAST(SUM($wCase) AS DOUBLE) AS m
         |  FROM reps GROUP BY r
         |),
         |rk AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m, r) AS rk FROM wm),
         |base AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    ROUND(CAST(SUM(CAST(q AS DECIMAL(38,9))) AS DOUBLE) / COUNT(q), 6) AS mean
         |  FROM sc
         |)
         |SELECT base.n, base.mean,
         |  (SELECT ROUND(m, 6) FROM rk WHERE rk = 2) AS ci_lo,
         |  (SELECT ROUND(m, 6) FROM rk WHERE rk = 31) AS ci_hi
         |FROM base""".stripMargin
    },

    // budgeted selection: the oracle IS the global-window form of the
    // semantics — ORDER BY (q DESC, doc_id) running token sum ≤
    // budget; the engine's hierarchical refinement must reproduce it
    // id for id (quality formula = q136's replay)
    "q151_budget_select" -> {
      val stop = graft.functions.Text.Stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH qm AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE)
         |      / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS sr,
         |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
         |      / CAST(GREATEST(length(text), 1) AS DOUBLE) AS pr,
         |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
         |      / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS mwl,
         |    length(text) AS nc, len(toks) AS nt
         |  FROM (SELECT doc_id, text, $toksExpr AS toks FROM documents)
         |),
         |sc AS MATERIALIZED (
         |  SELECT doc_id,
         |    ROUND(LEAST(1.0, GREATEST(0.0, 0.2 + 2.0 * sr - 3.0 * pr
         |      + 0.05 * LEAST(mwl, 8.0)
         |      + CASE WHEN nc >= 200 THEN 0.1 ELSE 0.0 END)), 6) AS q,
         |    nt
         |  FROM qm
         |),
         |o AS (
         |  SELECT doc_id, q, nt,
         |    SUM(nt) OVER (ORDER BY q DESC, doc_id) AS cum
         |  FROM sc
         |)
         |SELECT doc_id, q AS quality, CAST(nt AS BIGINT) AS n_tokens
         |FROM o WHERE cum <= 12000 ORDER BY doc_id""".stripMargin
    },

    // source-reputation report: quality formula = q136's replay,
    // entropy = q142's DECIMAL-exact c·ln c at (source, lang)
    // granularity, flag vs the corpus-wide exact mean
    "q154_source_report" -> {
      val stop = graft.functions.Text.Stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH qm AS (
         |  SELECT doc_id, source, lang, len(toks) AS nt,
         |    CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE)
         |      / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS sr,
         |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
         |      / CAST(GREATEST(length(text), 1) AS DOUBLE) AS pr,
         |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
         |      / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS mwl,
         |    length(text) AS nc
         |  FROM (SELECT doc_id, source, lang, text, $toksExpr AS toks FROM documents)
         |),
         |sc AS MATERIALIZED (
         |  SELECT doc_id, source, lang, nt,
         |    ROUND(LEAST(1.0, GREATEST(0.0, 0.2 + 2.0 * sr - 3.0 * pr
         |      + 0.05 * LEAST(mwl, 8.0)
         |      + CASE WHEN nc >= 200 THEN 0.1 ELSE 0.0 END)), 6) AS q
         |  FROM qm
         |),
         |base AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(nt) AS BIGINT) AS total_tokens,
         |    ROUND(CAST(SUM(CAST(q AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 6) AS mean_quality
         |  FROM sc GROUP BY source
         |),
         |lc AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c FROM sc GROUP BY source, lang),
         |ent AS (
         |  SELECT source, SUM(c) AS n, CAST(COUNT(*) AS BIGINT) AS n_langs,
         |    SUM(CAST(ROUND(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9))
         |        * CAST(c AS DECIMAL(12,0))) AS scp
         |  FROM lc GROUP BY source
         |),
         |om AS (SELECT ROUND(CAST(SUM(CAST(q AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 6) AS m FROM sc)
         |SELECT b.source, b.n_docs, b.total_tokens, b.mean_quality,
         |  e.n_langs,
         |  ROUND(ROUND(ln(CAST(e.n AS DOUBLE)), 9)
         |    - CAST(e.scp AS DOUBLE) / CAST(e.n AS DOUBLE), 6) AS lang_entropy,
         |  b.mean_quality < (SELECT m FROM om) AS low_quality
         |FROM base b JOIN ent e USING (source)
         |ORDER BY b.source""".stripMargin
    },

    // containment dedup: the prefix-filter candidate rule is COMPLETE
    // (if none of A's floor((1-t)|A|)+1 rarest shingles hits B then
    // C(A in B) < t), so the oracle is the brute-force ALL-PAIRS
    // form, with shingle STRINGS (engine rides 8-byte hashes — q42
    // collision argument)
    "q153_containment_dedup" ->
      s"""WITH corpus AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 200000 AS doc_id, array_to_string(toks[3:14], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents)
         |  WHERE doc_id % 7 = 0
         |),
         |sh AS (
         |  SELECT doc_id,
         |    list_distinct([array_to_string(toks[i:i+4], ' ')
         |      FOR i IN range(1, greatest(len(toks) - 4, 1) + 1)]) AS s
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM corpus)
         |),
         |p AS (
         |  SELECT sa.doc_id AS id_a, sb.doc_id AS id_b,
         |    len(list_intersect(sa.s, sb.s)) AS inter,
         |    len(sa.s) AS na, len(sb.s) AS nb, sa.s AS s_a, sb.s AS s_b
         |  FROM sh sa JOIN sh sb ON sa.doc_id < sb.doc_id
         |)
         |SELECT id_a, id_b,
         |  CAST(inter AS DOUBLE) / CAST(GREATEST(na, 1) AS DOUBLE) AS c_a_in_b,
         |  CAST(inter AS DOUBLE) / CAST(GREATEST(nb, 1) AS DOUBLE) AS c_b_in_a,
         |  ${jaccardExpr("s_a", "s_b")} AS jaccard
         |FROM p
         |WHERE GREATEST(CAST(inter AS DOUBLE) / CAST(GREATEST(na, 1) AS DOUBLE),
         |               CAST(inter AS DOUBLE) / CAST(GREATEST(nb, 1) AS DOUBLE)) >= 0.9
         |ORDER BY id_a, id_b""".stripMargin,

    // cluster-aware k-folds: clustering replay + md5-48(comp) % 5
    // fold assignment + the spanning-cluster guarantee column
    "q137_cluster_folds" ->
      s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents)
         |),
         |${shingleCte("corpus")},
         |pairs AS (
         |  SELECT * FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, ${jaccardExpr("a.s", "b.s")} AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  ) WHERE jaccard >= 0.5
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |),
         |reach(v, m) AS (
         |  SELECT doc_id, doc_id FROM corpus
         |  UNION
         |  SELECT e.dst, r.m FROM reach r JOIN edges e ON e.src = r.v
         |),
         |lab AS MATERIALIZED (
         |  SELECT v, comp,
         |    CAST(list_sum([
         |      CAST(strpos('0123456789abcdef', substr(md5(CAST(comp AS VARCHAR)), i, 1)) - 1 AS BIGINT)
         |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |      FOR i IN range(1, 13)]) % 5 AS BIGINT) AS fold
         |  FROM (SELECT v, MIN(m) AS comp FROM reach GROUP BY v)
         |),
         |pf AS (
         |  SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(COUNT(DISTINCT comp) AS BIGINT) AS n_clusters
         |  FROM lab GROUP BY fold
         |),
         |sp AS (
         |  SELECT CAST(SUM(CASE WHEN nf > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS clusters_spanning_folds
         |  FROM (SELECT comp, COUNT(DISTINCT fold) AS nf FROM lab GROUP BY comp)
         |)
         |SELECT pf.fold, pf.n_docs, pf.n_clusters, sp.clusters_spanning_folds
         |FROM pf, sp ORDER BY pf.fold""".stripMargin,

    // snapshot diff: hash-only full-outer join over the derived
    // crawl-N+1 (drop %7, mutate %5 survivors, re-add %3 under new
    // ids), exact counts + one 6-dp share division
    "q138_snapshot_diff" ->
      s"""WITH base AS MATERIALIZED (
         |  SELECT doc_id, text, $toksExpr AS toks FROM documents
         |),
         |a AS (SELECT doc_id, md5(text) AS h FROM base),
         |b AS (
         |  SELECT doc_id,
         |    md5(CASE WHEN doc_id % 5 = 0
         |      THEN array_to_string(toks[2:len(toks)], ' ') ELSE text END) AS h
         |  FROM base WHERE doc_id % 7 <> 0
         |  UNION ALL
         |  SELECT doc_id + 200000 AS doc_id, md5(text) AS h FROM base
         |  WHERE doc_id % 3 = 0
         |),
         |d AS MATERIALIZED (
         |  SELECT CASE WHEN a.h IS NULL THEN 'added'
         |    WHEN b.h IS NULL THEN 'removed'
         |    WHEN a.h = b.h THEN 'unchanged' ELSE 'changed' END AS status
         |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
         |)
         |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  ROUND(CAST(COUNT(*) AS DOUBLE)
         |    / CAST((SELECT COUNT(*) FROM d) AS DOUBLE), 6) AS pct
         |FROM d GROUP BY status ORDER BY status""".stripMargin,

    // Zipf fit: top-300 token head, 9-dp ln, DECIMAL-exact OLS sums
    // and closed-form numerator/denominator; three final double
    // divisions mirrored cast-for-cast
    "q139_zipf_fit" ->
      s"""WITH t AS (SELECT unnest($toksExpr) AS tok FROM documents),
         |c AS MATERIALIZED (
         |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY tok
         |),
         |top AS (SELECT tok, cnt FROM c ORDER BY cnt DESC, tok LIMIT 300),
         |r AS (
         |  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank FROM top
         |),
         |xy AS (
         |  SELECT CAST(ROUND(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
         |         CAST(ROUND(ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
         |  FROM r
         |),
         |a AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
         |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
         |  FROM xy
         |),
         |f AS (
         |  SELECT n,
         |    CAST(CAST(sxy AS DECIMAL(24,18)) * CAST(n AS DECIMAL(7,0))
         |      - CAST(sx AS DECIMAL(18,9)) * CAST(sy AS DECIMAL(18,9)) AS DOUBLE) AS num,
         |    CAST(CAST(sxx AS DECIMAL(24,18)) * CAST(n AS DECIMAL(7,0))
         |      - CAST(sx AS DECIMAL(18,9)) * CAST(sx AS DECIMAL(18,9)) AS DOUBLE) AS denx,
         |    CAST(CAST(syy AS DECIMAL(24,18)) * CAST(n AS DECIMAL(7,0))
         |      - CAST(sy AS DECIMAL(18,9)) * CAST(sy AS DECIMAL(18,9)) AS DOUBLE) AS deny,
         |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
         |  FROM a
         |)
         |SELECT n AS n_fit, ROUND(num / denx, 6) AS slope,
         |  ROUND((syd - (num / denx) * sxd) / CAST(n AS DOUBLE), 6) AS intercept,
         |  ROUND((num * num) / (denx * deny), 6) AS r2
         |FROM f""".stripMargin,

    // ORC pruned-scan interchange: the oracle aggregates the ORIGINAL
    // parquet under the same partition + data predicates — the ORC hop
    // plus directory/stripe pruning must lose and invent nothing (the
    // md5-48 XOR fingerprint flips on any row delta)
    "q140_orc_pruned_scan" ->
      s"""WITH f AS (
         |  SELECT lang, n_chars,
         |    CAST(list_sum([
         |      CAST(strpos('0123456789abcdef', substr(md5(
         |        CAST(doc_id AS VARCHAR) || ':' || text), i, 1)) - 1 AS BIGINT)
         |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |      FOR i IN range(1, 13)]) AS BIGINT) AS h
         |  FROM documents
         |  WHERE lang IN ('en', 'de') AND n_chars >= 200
         |)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS chars,
         |  bit_xor(h) AS content_fp
         |FROM f GROUP BY lang ORDER BY lang""".stripMargin,

    // unigram-LM training: seed inventory + 2 hard-EM rounds fully
    // replayed — per-word Viterbi DP as a list_reduce fold over
    // integer-exact scaled costs, argmin ties to the longest piece,
    // add-one M-step; output = round-2 raw counts + final model
    "q141_unigram_train" ->
      (unigramHeadCtes + ",\n" + unigramRoundCtes(1, "m0") + ",\n" +
        unigramRoundCtes(2, "m1") + "\n" +
        s"""SELECT c.piece, c.c_raw AS freq, m.nlp AS nlp9
           |FROM cnt2 c JOIN m2 m USING (piece)
           |ORDER BY piece""".stripMargin),

    // unigram pruning: chars ∪ top-64 multi by round-2 usage, add-one
    // re-estimate over the pruned inventory, a third Viterbi pass
    "q152_unigram_prune" ->
      (unigramHeadCtes + ",\n" + unigramRoundCtes(1, "m0") + ",\n" +
        unigramRoundCtes(2, "m1") + ",\n" +
        s"""pr AS MATERIALIZED (
           |  SELECT piece FROM useed WHERE length(piece) = 1
           |  UNION ALL
           |  SELECT piece FROM (
           |    SELECT piece FROM cnt2 WHERE length(piece) > 1
           |    ORDER BY c_raw DESC, piece LIMIT 64)
           |),
           |mp AS MATERIALIZED (
           |  SELECT c.piece, CAST(ROUND(-ln(CAST(c.c_raw + 1 AS DOUBLE)
           |    / CAST((SELECT SUM(c2.c_raw + 1) FROM cnt2 c2
           |            JOIN pr p2 ON p2.piece = c2.piece) AS DOUBLE)) * 1e9) AS BIGINT) AS nlp
           |  FROM cnt2 c JOIN pr ON pr.piece = c.piece
           |)""".stripMargin + ",\n" +
        unigramRoundCtes(3, "mp", "pr") + "\n" +
        s"""SELECT c.piece, c.c_raw AS freq, m.nlp AS nlp9
           |FROM cnt3 c JOIN m3 m USING (piece)
           |ORDER BY piece""".stripMargin),

    // train-then-apply: a THIRD Viterbi pass under the replayed
    // round-2 model, rolled up corpus-frequency-weighted
    "q144_unigram_segment" ->
      (unigramHeadCtes + ",\n" + unigramRoundCtes(1, "m0") + ",\n" +
        unigramRoundCtes(2, "m1") + ",\n" + unigramRoundCtes(3, "m2") + "\n" +
        s"""SELECT piece AS subword, CAST(SUM(freq) AS BIGINT) AS freq
           |FROM pieces3 GROUP BY piece
           |ORDER BY freq DESC, subword LIMIT 100""".stripMargin),

    // token entropy: H = ln n - (sum c*ln c)/n per doc; c*ln c as
    // DECIMAL(18,9)*DECIMAL(12,0) exact products, zero-token docs
    // absent on both engines
    "q142_token_entropy" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksExpr) AS tok FROM documents),
         |tc AS MATERIALIZED (
         |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM t GROUP BY doc_id, tok
         |),
         |e AS (
         |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |    SUM(CAST(ROUND(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9))
         |      * CAST(c AS DECIMAL(12,0))) AS sc
         |  FROM tc GROUP BY doc_id
         |)
         |SELECT doc_id, n_tokens, n_distinct, entropy,
         |  entropy < 3.0 AS low_entropy
         |FROM (
         |  SELECT doc_id, n_tokens, n_distinct,
         |    ROUND(ROUND(ln(CAST(n_tokens AS DOUBLE)), 9)
         |      - CAST(sc AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS entropy
         |  FROM e
         |) ORDER BY doc_id""".stripMargin,

    // PMI collocations: exact counts, 9-dp ln of a ratio of exact
    // long products, min-count floor 5, top-40 with pair tie-break
    "q143_pmi_collocations" ->
      s"""WITH d AS MATERIALIZED (SELECT doc_id, $toksExpr AS t FROM documents),
         |bg AS (
         |  SELECT unnest(list_slice(t, 1, len(t) - 1)) AS w1,
         |         unnest(list_slice(t, 2, len(t))) AS w2
         |  FROM d WHERE len(t) >= 2
         |),
         |bc AS MATERIALIZED (
         |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM bg GROUP BY w1, w2 HAVING COUNT(*) >= 5
         |),
         |u AS MATERIALIZED (
         |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(t) AS w FROM d) GROUP BY w
         |),
         |tot AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS t
         |  FROM (SELECT unnest(t) AS w FROM d)
         |)
         |SELECT w1, w2, cnt,
         |  ROUND(ln(CAST(cnt * tot.t AS DOUBLE)
         |    / CAST(u1.c * u2.c AS DOUBLE)), 9) AS pmi
         |FROM bc JOIN u u1 ON bc.w1 = u1.w JOIN u u2 ON bc.w2 = u2.w, tot
         |ORDER BY pmi DESC, w1, w2 LIMIT 40""".stripMargin,

    // skew report: key histogram, frequency-of-frequencies exact
    // p99, TakeOrdered top-10, integer ceil-div salt suggestion
    "q145_skew_report" ->
      s"""WITH t AS (SELECT unnest($toksExpr) AS tok FROM documents),
         |c AS MATERIALIZED (
         |  SELECT tok AS key, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY tok
         |),
         |st AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         |    CAST(SUM(cnt) AS BIGINT) AS total_rows, MAX(cnt) AS max_cnt
         |  FROM c
         |),
         |ff AS (SELECT cnt, COUNT(*) AS nk FROM c GROUP BY cnt),
         |cum AS (
         |  SELECT cnt, SUM(nk) OVER (ORDER BY cnt
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM ff
         |),
         |p99 AS (
         |  SELECT MIN(cnt) AS p99_cnt FROM cum, st
         |  WHERE cum * 100 >= st.n_keys * 99
         |),
         |top AS (SELECT key, cnt FROM c ORDER BY cnt DESC, key LIMIT 10)
         |SELECT top.key, top.cnt,
         |  ROUND(CAST(top.cnt AS DOUBLE) / CAST(st.total_rows AS DOUBLE), 6) AS share,
         |  CAST((top.cnt + 999) // 1000 AS BIGINT) AS suggested_salt,
         |  st.n_keys, st.total_rows, st.max_cnt, p99.p99_cnt,
         |  ROUND(CAST(st.max_cnt AS DOUBLE) * CAST(st.n_keys AS DOUBLE)
         |    / CAST(st.total_rows AS DOUBLE), 6) AS skew_factor
         |FROM top, st, p99 ORDER BY top.cnt DESC, top.key""".stripMargin,

    // schema evolution: v1 rows (even ids) carry NULL for the column
    // they predate; v2 rows (odd ids) carry the computed value
    "q108_schema_evolution" ->
      s"""SELECT event_id, user_id, value,
         |  CASE WHEN event_id % 2 = 1 THEN ROUND(value * 2, 6) ELSE NULL END AS quality
         |FROM events ORDER BY event_id""".stripMargin,

    // PII redaction: the injection CASE and all three regexes are
    // shared verbatim with the engine (Redact's Java∩RE2 dialect);
    // counts are per-pass, replacements in the same order
    "q155_pii_redact" -> piiRedactSql,

    // streaming PII redaction: stateless projection ⇒ stream ≡ batch
    "q156_streaming_pii_redact" -> piiRedactSql,

    // markup normalization: tag strip → entity decode (&amp; LAST —
    // double-escaped text must surface single-escaped) → whitespace
    // collapse, replayed step for step
    "q157_html_normalize" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN
         |      '<p class="body">' || text || '</p>' || chr(10) ||
         |      '<a href="https://site.example/d' || CAST(doc_id AS VARCHAR) ||
         |      '">more</a> &amp;lt;kept&amp;gt; &nbsp;&quot;q&quot; &#39;s&#39;'
         |    ELSE text END AS text
         |  FROM documents
         |),
         |u AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '${HtmlClean.TagRe}')) AS INTEGER) AS n_tags,
         |    regexp_replace(text, '${HtmlClean.TagRe}', ' ', 'g') AS t
         |  FROM w
         |),
         |d AS (
         |  SELECT doc_id, n_tags,
         |    replace(replace(replace(replace(replace(replace(t,
         |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
         |      '&nbsp;', ' '), '&amp;', '&') AS t
         |  FROM u
         |)
         |SELECT doc_id, n_tags,
         |  trim(regexp_replace(t, '[ \\t\\n\\r]+', ' ', 'g')) AS clean_text
         |FROM d ORDER BY doc_id""".stripMargin,

    // seeded corpus shuffle: md5-48 key (the house strpos fold),
    // shard = key mod 32, per-shard count/range/XOR fingerprint
    "q158_corpus_shuffle" ->
      s"""WITH k AS (
         |  SELECT CAST(list_sum([
         |      CAST(strpos('0123456789abcdef', substr(md5(
         |        'graft-r14:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)
         |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
         |      FOR i IN range(1, 13)]) AS BIGINT) AS key
         |  FROM documents
         |)
         |SELECT key % 32 AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  MIN(key) AS min_key, MAX(key) AS max_key, bit_xor(key) AS member_fp
         |FROM k GROUP BY shard ORDER BY shard""".stripMargin,

    // eval-set novelty: per-benchmark-doc fraction of 8-token windows
    // found anywhere in the corpus (window STRINGS replay the
    // engine's 8-byte hashes — q42 collision argument)
    "q159_eval_novelty" ->
      s"""WITH bench AS (
         |  SELECT doc_id + 500000 AS bench_id, text
         |  FROM documents WHERE doc_id % 37 = 0
         |  UNION ALL
         |  SELECT doc_id + 600000 AS bench_id,
         |    array_to_string(toks[1:15], ' ') || ' qzx' ||
         |      CAST(doc_id AS VARCHAR) || ' vbn' AS text
         |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents)
         |  WHERE doc_id % 41 = 0
         |),
         |bw AS (
         |  SELECT bench_id,
         |    unnest(list_distinct([array_to_string(toks[i:i+7], ' ')
         |      FOR i IN range(1, greatest(len(toks) - 7, 1) + 1)])) AS win
         |  FROM (SELECT bench_id, $toksExpr AS toks FROM bench)
         |),
         |cw AS (
         |  SELECT DISTINCT
         |    unnest(list_distinct([array_to_string(toks[i:i+7], ' ')
         |      FOR i IN range(1, greatest(len(toks) - 7, 1) + 1)])) AS win
         |  FROM (SELECT $toksExpr AS toks FROM documents)
         |),
         |agg AS (
         |  SELECT b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         |    CAST(SUM(CASE WHEN c.win IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS seen_windows
         |  FROM bw b LEFT JOIN cw c USING (win) GROUP BY b.bench_id
         |)
         |SELECT bench_id, n_windows, seen_windows,
         |  ROUND(1.0 - CAST(seen_windows AS DOUBLE) / CAST(n_windows AS DOUBLE), 6)
         |    AS novelty,
         |  seen_windows = 0 AS clean
         |FROM agg ORDER BY bench_id""".stripMargin,

    // blocklist filter: suffix explosion + longest-match arg_max;
    // shared verbatim by q168 (the stateless streaming twin must
    // emit the identical table)
    "q160_blocklist_filter" -> blocklistFilterSql,
    "q168_streaming_blocklist" -> blocklistFilterSql,
  )

  private lazy val blocklistFilterSql: String =
      s"""WITH hosts AS MATERIALIZED (
         |  SELECT doc_id,
         |    CASE doc_id % 8
         |      WHEN 0 THEN 'ads.dom' || CAST(doc_id % 20 AS VARCHAR) || '.com'
         |      WHEN 1 THEN 'www.dom' || CAST(doc_id % 20 AS VARCHAR) || '.com'
         |      WHEN 2 THEN 'dom' || CAST(doc_id % 20 AS VARCHAR) || '.co.uk'
         |      WHEN 3 THEN 'deep.sub.dom' || CAST(doc_id % 20 AS VARCHAR) || '.org'
         |      WHEN 4 THEN 'Tracker.NET'
         |      WHEN 5 THEN 'cdn' || CAST(doc_id % 5 AS VARCHAR) || '.tracker.net.'
         |      WHEN 6 THEN 'safe' || CAST(doc_id % 9 AS VARCHAR) || '.example.org'
         |      ELSE 'blog.dom' || CAST(doc_id % 20 AS VARCHAR) || '.net'
         |    END AS host
         |  FROM documents
         |),
         |rules(rule) AS (VALUES ('dom3.com'), ('dom7.com'), ('dom5.co.uk'),
         |  ('tracker.net'), ('deep.sub.dom11.org'), ('dom13.net'), ('co.uk')),
         |lab AS (
         |  -- normalize like the engine: case-fold + strip one trailing dot
         |  SELECT doc_id, host,
         |    string_split(regexp_replace(lower(host), '\\.$$', ''), '.') AS ls,
         |    len(string_split(regexp_replace(lower(host), '\\.$$', ''), '.')) AS n
         |  FROM hosts
         |),
         |sufx AS (
         |  SELECT l.doc_id, k.g AS k,
         |    array_to_string(list_slice(l.ls, l.n - k.g + 1, l.n), '.') AS sfx
         |  FROM lab l JOIN generate_series(1, 8) k(g) ON k.g <= l.n
         |),
         |m AS (
         |  SELECT s.doc_id, arg_max(s.sfx, s.k) AS rule
         |  FROM sufx s JOIN rules r ON r.rule = s.sfx GROUP BY s.doc_id
         |)
         |SELECT l.doc_id, l.host, m.rule IS NOT NULL AS blocked, m.rule
         |FROM lab l LEFT JOIN m USING (doc_id) ORDER BY l.doc_id""".stripMargin

  /** Shared spectrum CTE chain (q163 + q165): decimal-exact moments,
    * 9-dp covariance, and the 25 power iterations UNROLLED as chained
    * CTEs (the bpeUnrollCtes precedent — DuckDB's binder cannot see
    * sibling CTEs from inside a recursive member's lateral): w{k}
    * applies the matrix with DECIMAL(18,9)-exact dots + 9-dp round,
    * it{k} takes the exact decimal norm and renormalizes (IEEE
    * divide, 9-dp round). Ends at `it25` (v, nrm); `px` keeps vec_id
    * for per-vector consumers.
    */
  private lazy val spectrumPrefix: String = {
    val iters = (1 to 25).map { k =>
      s"""w$k AS (
         |  SELECT [ROUND(CAST(list_sum([CAST(cm.mat[i][j] AS DECIMAL(18,9))
         |    * CAST(p.v[j] AS DECIMAL(18,9)) FOR j IN range(1, 65)]) AS DOUBLE), 9)
         |    FOR i IN range(1, 65)] AS w9
         |  FROM it${k - 1} p, cm
         |),
         |it$k AS (
         |  SELECT [ROUND(x.w9[i] / x.nrm, 9) FOR i IN range(1, 65)] AS v, x.nrm AS nrm
         |  FROM (
         |    SELECT w9, sqrt(CAST(list_sum([CAST(w9[i] AS DECIMAL(18,9))
         |      * CAST(w9[i] AS DECIMAL(18,9)) FOR i IN range(1, 65)]) AS DOUBLE)) AS nrm
         |    FROM w$k
         |  ) x
         |)""".stripMargin
    }.mkString(",\n")
    s"""ids AS (SELECT unnest(range(1, 65)) AS i),
       |px AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM px),
       |m AS MATERIALIZED (
       |  SELECT i.i AS j,
       |    ROUND(CAST(SUM(CAST(x[i.i] AS DECIMAL(38,12))) AS DOUBLE)
       |      / (SELECT n FROM nn), 9) AS m9
       |  FROM px CROSS JOIN ids i GROUP BY i.i
       |),
       |s2 AS MATERIALIZED (
       |  SELECT i.i AS i, j.i AS j,
       |    SUM(CAST(x[i.i] * x[j.i] AS DECIMAL(38,12))) AS s
       |  FROM px CROSS JOIN ids i CROSS JOIN ids j
       |  WHERE j.i >= i.i GROUP BY i.i, j.i
       |),
       |cc AS MATERIALIZED (
       |  SELECT s2.i, s2.j,
       |    ROUND(CAST(s2.s AS DOUBLE) / (SELECT n FROM nn) - mi.m9 * mj.m9, 9) AS c9
       |  FROM s2 JOIN m mi ON mi.j = s2.i JOIN m mj ON mj.j = s2.j
       |),
       |cf AS (
       |  SELECT i, j, c9 FROM cc
       |  UNION ALL
       |  SELECT j AS i, i AS j, c9 FROM cc WHERE i < j
       |),
       |cm AS MATERIALIZED (
       |  SELECT list(rw ORDER BY i) AS mat FROM (
       |    SELECT i, list(c9 ORDER BY j) AS rw FROM cf GROUP BY i
       |  )
       |),
       |tr AS (SELECT CAST(SUM(CAST(c9 AS DECIMAL(18,9))) AS DOUBLE) AS trace
       |       FROM cc WHERE i = j),
       |it0 AS (SELECT [CAST(1.0 AS DOUBLE) FOR q IN range(1, 65)] AS v),
       |$iters"""
      .stripMargin
  }

  /** q163: the full spectrum pipeline replayed — see [[spectrumPrefix]]. */
  private lazy val embeddingSpectrumSql: String =
    s"""WITH
       |$spectrumPrefix
       |SELECT CAST(i.i - 1 AS BIGINT) AS dim, m.m9 AS mean, s.v[i.i] AS loading,
       |  ROUND(s.nrm, 6) AS lambda1,
       |  ROUND((SELECT trace FROM tr), 6) AS trace,
       |  ROUND(s.nrm / (SELECT trace FROM tr), 6) AS explained_share
       |FROM ids i JOIN m ON m.j = i.i CROSS JOIN it25 s
       |ORDER BY dim""".stripMargin

  /** q165: per-vector all-but-the-top decomposition — same prefix,
    * then the engine's projection arithmetic verbatim: t = x − μ
    * (IEEE on the 9-dp means), proj/norm2 as DECIMAL(18,12)-quantized
    * product sums rounded to 9 dp, share in IEEE rounded to 6.
    */
  private lazy val removeTopSql: String =
    s"""WITH
       |$spectrumPrefix,
       |mv AS (SELECT list(m9 ORDER BY j) AS mu FROM m),
       |tt AS (
       |  SELECT px.vec_id, [px.x[i] - mv.mu[i] FOR i IN range(1, 65)] AS t
       |  FROM px, mv
       |),
       |pr AS (
       |  SELECT tt.vec_id,
       |    ROUND(CAST(list_sum([CAST(tt.t[i] * s.v[i] AS DECIMAL(18,12))
       |      FOR i IN range(1, 65)]) AS DOUBLE), 9) AS proj,
       |    ROUND(CAST(list_sum([CAST(tt.t[i] * tt.t[i] AS DECIMAL(18,12))
       |      FOR i IN range(1, 65)]) AS DOUBLE), 9) AS norm2
       |  FROM tt CROSS JOIN it25 s
       |)
       |SELECT vec_id, proj, norm2,
       |  CASE WHEN norm2 > 0 THEN ROUND(proj * proj / norm2, 6) END AS top_share
       |FROM pr ORDER BY vec_id""".stripMargin

  /** q164: the Aho–Corasick scan's naive form — a `contains` cross
    * join over the phrase list (exactly the cost the automaton
    * exists to avoid), same injection CASE, same lowercase fold.
    */
  private lazy val phraseScanSql: String =
    s"""WITH inj AS (
       |  SELECT doc_id, text || CASE
       |    WHEN doc_id % 7 = 0 THEN ' Buy CHEAP pills now online'
       |    WHEN doc_id % 11 = 0 THEN ' best casino bonus codes'
       |    WHEN doc_id % 13 = 0 THEN ' free crypto CASINO classification'
       |    ELSE '' END AS text
       |  FROM documents
       |),
       |ph(phrase) AS (VALUES ('cheap pills'), ('pills now'), ('casino'),
       |  ('casino bonus'), ('crypto'), ('ass')),
       |m AS (
       |  SELECT i.doc_id, p.phrase
       |  FROM inj i JOIN ph p ON contains(lower(i.text), p.phrase)
       |),
       |a AS (
       |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_banned,
       |    array_to_string(list(phrase ORDER BY phrase), ',') AS phrases
       |  FROM m GROUP BY doc_id
       |)
       |SELECT i.doc_id, COALESCE(a.n_banned, 0) AS n_banned,
       |  a.n_banned IS NOT NULL AS banned, a.phrases
       |FROM inj i LEFT JOIN a USING (doc_id) ORDER BY i.doc_id""".stripMargin

  /** q166: the subsampling fit + every per-occurrence md5-48 draw
    * replayed — frequency table, sqrt(t·total/cnt) thresholds in the
    * engine's IEEE evaluation order, and the q158 hex fold for the
    * uniform draws.
    */
  private lazy val tokenSubsampleSql: String =
    s"""WITH t AS (SELECT doc_id, $toksExpr AS toks FROM documents),
       |tot AS (SELECT CAST(SUM(len(toks)) AS BIGINT) AS total FROM t),
       |f AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok
       |),
       |p AS (
       |  SELECT doc_id, unnest(toks) AS tok,
       |    generate_subscripts(toks, 1) AS i
       |  FROM t
       |),
       |k AS (
       |  SELECT p.doc_id, p.i, p.tok,
       |    CAST(list_sum([
       |      CAST(strpos('0123456789abcdef', substr(md5(
       |        's166:' || CAST(p.doc_id AS VARCHAR) || ':' ||
       |        CAST(p.i AS VARCHAR)), j, 1)) - 1 AS BIGINT)
       |        * CAST(1::BIGINT << (4 * (12 - j)) AS BIGINT)
       |      FOR j IN range(1, 13)]) AS BIGINT) AS u48,
       |    sqrt(1e-3 * (SELECT total FROM tot) / f.cnt) AS thr
       |  FROM p JOIN f ON f.tok = p.tok
       |),
       |kept AS (
       |  SELECT doc_id, i, tok FROM k
       |  WHERE thr >= 1.0 OR CAST(u48 AS DOUBLE) / 281474976710656.0 < thr
       |),
       |a AS (
       |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_kept,
       |    array_to_string(list(tok ORDER BY i), ' ') AS sub_text
       |  FROM kept GROUP BY doc_id
       |)
       |SELECT t.doc_id, CAST(len(t.toks) AS INTEGER) AS n_tokens,
       |  COALESCE(a.n_kept, 0) AS n_kept, COALESCE(a.sub_text, '') AS sub_text
       |FROM t LEFT JOIN a USING (doc_id) ORDER BY t.doc_id""".stripMargin

  /** q167: q114's scored table + per-language exact interpolated
    * tertiles (cut points as CAST(1 AS DOUBLE)/3 — the same IEEE
    * value the engine's percentile call uses) + the CCNet
    * head/middle/tail CASE.
    */
  private lazy val ccnetBucketsSql: String =
    s"""WITH d AS MATERIALIZED (
       |  SELECT doc_id, lang, $toksExpr AS t FROM documents
       |),
       |bg AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    unnest(list_slice(t, 1, len(t) - 1)) AS w1,
       |    unnest(list_slice(t, 2, len(t))) AS w2
       |  FROM d WHERE len(t) >= 2
       |),
       |bgc AS MATERIALIZED (
       |  SELECT w1, w2, COUNT(*) AS cnt FROM bg
       |  WHERE doc_id % 10 < 8 GROUP BY w1, w2
       |),
       |ctx AS MATERIALIZED (SELECT w1, SUM(cnt) AS ctx FROM bgc GROUP BY w1),
       |v AS (
       |  SELECT COUNT(DISTINCT tok) AS v
       |  FROM (SELECT unnest(t) AS tok FROM d WHERE doc_id % 10 < 8)
       |),
       |ll AS MATERIALIZED (
       |  SELECT b.doc_id, b.lang,
       |    ROUND(ln(CAST(COALESCE(c.cnt, 0) + 1 AS DOUBLE) /
       |             CAST(COALESCE(x.ctx, 0) + (SELECT v FROM v) AS DOUBLE)), 9) AS ll
       |  FROM bg b
       |  LEFT JOIN bgc c ON b.w1 = c.w1 AND b.w2 = c.w2
       |  LEFT JOIN ctx x ON b.w1 = x.w1
       |),
       |scored AS MATERIALIZED (
       |  SELECT doc_id, lang, COUNT(*) AS n_bigrams,
       |    ROUND(exp(-(CAST(SUM(CAST(ll AS DECIMAL(38,9))) AS DOUBLE)
       |                / COUNT(*))), 6) AS ppl
       |  FROM ll GROUP BY doc_id, lang
       |),
       |bands AS (
       |  SELECT lang,
       |    ROUND(quantile_cont(ppl, CAST(1 AS DOUBLE)/3), 6) AS p33,
       |    ROUND(quantile_cont(ppl, CAST(2 AS DOUBLE)/3), 6) AS p66
       |  FROM scored GROUP BY lang
       |)
       |SELECT s.doc_id, s.lang, s.ppl, b.p33, b.p66,
       |  CASE WHEN s.ppl <= b.p33 THEN 'head'
       |       WHEN s.ppl <= b.p66 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM scored s JOIN bands b ON s.lang = b.lang
       |ORDER BY s.doc_id""".stripMargin

  private lazy val minhashLshSql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000 AS doc_id, array_to_string(toks[2:len(toks)], ' ') AS text
       |  FROM (SELECT doc_id, $toksExpr AS toks FROM documents)
       |),
       |${shingleCte("corpus")}
       |SELECT * FROM (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, ${jaccardExpr("a.s", "b.s")} AS jaccard
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |) WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin

  /** q170: host-template injection + the line-level doc-frequency
    * ratio + ordered reassembly, replayed with FILTERed list
    * aggregates.
    */
  private lazy val boilerplateStripSql: String =
    s"""WITH d AS MATERIALIZED (
       |  SELECT doc_id, 'h' || CAST(doc_id % 12 AS VARCHAR) AS host,
       |    'NAV h' || CAST(doc_id % 12 AS VARCHAR) ||
       |      ' home products contact' || chr(10) || text ||
       |    CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'subscribe to h' ||
       |      CAST(doc_id % 12 AS VARCHAR) || ' newsletter' ELSE '' END ||
       |    chr(10) || 'Copyright h' || CAST(doc_id % 12 AS VARCHAR) ||
       |      ' all rights reserved' AS text
       |  FROM documents
       |),
       |l AS MATERIALIZED (
       |  SELECT doc_id, host,
       |    unnest(string_split(text, chr(10))) AS line,
       |    generate_subscripts(string_split(text, chr(10)), 1) AS pos
       |  FROM d
       |),
       |hd AS (SELECT host, COUNT(DISTINCT doc_id) AS nd FROM d GROUP BY host),
       |lf AS (
       |  SELECT host, line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM l GROUP BY host, line
       |),
       |t AS (
       |  SELECT l.doc_id, l.host, l.line, l.pos,
       |    CAST(lf.df AS DOUBLE) / CAST(hd.nd AS DOUBLE) >= 0.5 AS boiler
       |  FROM l
       |  JOIN lf ON lf.host = l.host AND lf.line = l.line
       |  JOIN hd ON hd.host = l.host
       |)
       |SELECT doc_id, host, CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       |  COALESCE(array_to_string(
       |    list(line ORDER BY pos) FILTER (WHERE NOT boiler), chr(10)), '')
       |    AS clean_text
       |FROM t GROUP BY doc_id, host ORDER BY doc_id""".stripMargin

  /** q171: the Luhn-gated scan replayed — split/extract on the same
    * RE2 pattern, a mod-10 digit fold per candidate, and conditional
    * reassembly. Regex interpolates from [[graft.functions
    * .LuhnKernel]] so engine and oracle can never drift.
    */
  private lazy val luhnRedactSql: String = {
    val re = graft.functions.LuhnKernel.CcRe
    s"""WITH inj AS (
       |  SELECT doc_id, text || CASE
       |    WHEN doc_id % 6 = 0
       |      THEN ' pay with 4539148803436467 or 1234567890123456'
       |    WHEN doc_id % 10 = 0 THEN ' card 4539-1488-0343-6467 billed'
       |    WHEN doc_id % 15 = 0
       |      THEN ' ref 6011 0009 9013 9424 and order 79927398713'
       |    ELSE '' END AS text
       |  FROM documents
       |),
       |sp AS (
       |  SELECT doc_id,
       |    string_split_regex(text, '$re') AS parts,
       |    regexp_extract_all(text, '$re') AS cands
       |  FROM inj
       |),
       |lu AS (
       |  SELECT doc_id, parts, cands,
       |    [ (list_sum([
       |        CASE WHEN (length(dg) - j) % 2 = 1 THEN
       |          CASE WHEN CAST(substr(dg, j, 1) AS INTEGER) * 2 > 9
       |            THEN CAST(substr(dg, j, 1) AS INTEGER) * 2 - 9
       |            ELSE CAST(substr(dg, j, 1) AS INTEGER) * 2 END
       |        ELSE CAST(substr(dg, j, 1) AS INTEGER) END
       |        FOR j IN range(1, length(dg) + 1)]) % 10 = 0)
       |      FOR dg IN [regexp_replace(c, '[- ]', '', 'g') FOR c IN cands] ]
       |      AS ok
       |  FROM sp
       |)
       |SELECT doc_id,
       |  CAST(len(list_filter(ok, x -> x)) AS INTEGER) AS n_cc,
       |  CAST(len(list_filter(ok, x -> NOT x)) AS INTEGER) AS n_rejected,
       |  parts[1] || COALESCE(array_to_string(
       |    [CASE WHEN ok[i] THEN '<CC>' ELSE cands[i] END || parts[i + 1]
       |     FOR i IN range(1, len(cands) + 1)], ''), '') AS clean_text
       |FROM lu ORDER BY doc_id""".stripMargin
  }

  /** q173: the 12-round BPE training unroll (shared with q99/q102)
    * feeding per-language occurrence-weighted fertility ratios.
    */
  private lazy val tokenizerFertilitySql: String =
    bpeUnrollCtes(12) + ",\n" +
      s"""lw AS MATERIALIZED (
         |  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS freq
         |  FROM (SELECT lang, unnest($toksExpr) AS w FROM documents)
         |  GROUP BY lang, w
         |),
         |agg AS (
         |  SELECT lw.lang,
         |    CAST(SUM(lw.freq) AS BIGINT) AS n_words,
         |    CAST(SUM(lw.freq * len(w12.syms)) AS BIGINT) AS n_subwords,
         |    CAST(SUM(lw.freq * length(lw.w)) AS BIGINT) AS n_chars
         |  FROM lw JOIN words12 w12 ON w12.w = lw.w
         |  GROUP BY lw.lang
         |)
         |SELECT lang, n_words, n_subwords, n_chars,
         |  ROUND(CAST(n_subwords AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
         |    AS fertility,
         |  ROUND(CAST(n_chars AS DOUBLE) / CAST(n_subwords AS DOUBLE), 6)
         |    AS chars_per_token
         |FROM agg ORDER BY lang""".stripMargin

  /** q176/q177/q183 shared prefix: the LR distillation replayed
    * end-to-end — q82's feature/label arithmetic, 8 unrolled GD
    * iterations (decimal-quantized margin dot, IEEE sigmoid rounded
    * 9 dp, DECIMAL(38,12)-exact gradients, 9-dp weight updates), and
    * the scoring pass, ending at the `sc` (doc_id, label, score) CTE.
    */
  private lazy val qualityLrPrefix: String = {
    def swCount(words: Seq[String]) =
      s"CAST(len(list_filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)"
    val en = swCount(Seq("the", "and", "of", "is", "to"))
    val de = swCount(Seq("der", "und", "die", "ist", "das"))
    val fr = swCount(Seq("le", "la", "et", "est", "les"))
    val es = swCount(Seq("el", "los", "y", "es", "las"))
    val stop = swCount(graft.functions.Text.Stopwords)
    def margin(w: String): String =
      s"""ROUND(CAST(
         |      CAST(1.0 * $w.w0 AS DECIMAL(18,12)) +
         |      CAST(f.x1 * $w.w1 AS DECIMAL(18,12)) +
         |      CAST(f.x2 * $w.w2 AS DECIMAL(18,12)) +
         |      CAST(f.x3 * $w.w3 AS DECIMAL(18,12)) AS DOUBLE), 9)""".stripMargin
    val iters = (1 to 8).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT f.y, f.x1, f.x2, f.x3,
         |    ROUND(1 / (1 + exp(-(${margin("it")}))), 9) AS p
         |  FROM f, it${k - 1} it
         |),
         |g$k AS (
         |  SELECT
         |    CAST(SUM(CAST((y - p) * 1.0 AS DECIMAL(38,12))) AS DOUBLE) AS g0,
         |    CAST(SUM(CAST((y - p) * x1 AS DECIMAL(38,12))) AS DOUBLE) AS g1,
         |    CAST(SUM(CAST((y - p) * x2 AS DECIMAL(38,12))) AS DOUBLE) AS g2,
         |    CAST(SUM(CAST((y - p) * x3 AS DECIMAL(38,12))) AS DOUBLE) AS g3
         |  FROM p$k
         |),
         |it$k AS (
         |  SELECT
         |    ROUND(it.w0 + 0.5 * g.g0 / (SELECT n FROM nn), 9) AS w0,
         |    ROUND(it.w1 + 0.5 * g.g1 / (SELECT n FROM nn), 9) AS w1,
         |    ROUND(it.w2 + 0.5 * g.g2 / (SELECT n FROM nn), 9) AS w2,
         |    ROUND(it.w3 + 0.5 * g.g3 / (SELECT n FROM nn), 9) AS w3
         |  FROM it${k - 1} it, g$k g
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (SELECT doc_id, text, $toksExpr AS toks FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS tc,
       |    CAST($stop AS DOUBLE) / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS sr,
       |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / CAST(GREATEST(length(text), 1) AS DOUBLE) AS pr,
       |    $en AS s_en, $de AS s_de, $fr AS s_fr, $es AS s_es
       |  FROM t
       |),
       |f AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN tc >= 20
       |      AND (s_en + s_de + s_fr + s_es > 0 AND s_en >= s_de
       |           AND s_en >= s_fr AND s_en >= s_es)
       |      AND sr >= 0.04 AND pr <= 0.2
       |      THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS y,
       |    CAST(tc AS DOUBLE) / 100.0 AS x1, sr AS x2, pr AS x3
       |  FROM m
       |),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
       |it0 AS (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
       |               CAST(0 AS DOUBLE) AS w2, CAST(0 AS DOUBLE) AS w3),
       |$iters,
       |sc AS (
       |  SELECT f.doc_id, CAST(f.y AS INTEGER) AS label,
       |    ROUND(ROUND(1 / (1 + exp(-(${margin("it")}))), 9), 6) AS score
       |  FROM f, it8 it
       |)""".stripMargin
  }

  private lazy val qualityLrSql: String =
    qualityLrPrefix + "\n" +
      """SELECT doc_id, label, score, score >= 0.5 AS predicted
        |FROM sc ORDER BY doc_id""".stripMargin

  /** q183: decile reliability curve over the q176 scored table. */
  private lazy val lrCalibrationSql: String =
    qualityLrPrefix + "\n" +
      """SELECT LEAST(CAST(floor(score * 10) AS INTEGER), 9) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(CAST(SUM(CAST(score AS DECIMAL(38,6))) AS DOUBLE)
        |    / COUNT(score), 6) AS avg_score,
        |  ROUND(CAST(SUM(label) AS DOUBLE) / COUNT(*), 6) AS pass_rate
        |FROM sc GROUP BY 1 ORDER BY bin""".stripMargin

  /** q179: from-scratch boilerplate strip over base ∪ delta,
    * restricted to the delta ids — the incremental path must emit the
    * identical table (the q148 incremental ≡ scratch contract).
    */
  private lazy val incrementalBoilerplateSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, 'h' || CAST(doc_id % 12 AS VARCHAR) AS host,
       |    'NAV h' || CAST(doc_id % 12 AS VARCHAR) ||
       |      ' home products contact' || chr(10) || text ||
       |    CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'subscribe to h' ||
       |      CAST(doc_id % 12 AS VARCHAR) || ' newsletter' ELSE '' END ||
       |    chr(10) || 'Copyright h' || CAST(doc_id % 12 AS VARCHAR) ||
       |      ' all rights reserved' AS text
       |  FROM documents
       |),
       |dl AS (
       |  SELECT doc_id + 840000 AS doc_id,
       |    'h' || CAST((doc_id + 840000) % 12 AS VARCHAR) AS host,
       |    'NAV h' || CAST((doc_id + 840000) % 12 AS VARCHAR) ||
       |      ' home products contact' || chr(10) || text ||
       |    CASE WHEN (doc_id + 840000) % 5 = 0 THEN chr(10) || 'subscribe to h' ||
       |      CAST((doc_id + 840000) % 12 AS VARCHAR) || ' newsletter' ELSE '' END ||
       |    chr(10) || 'FLASH sale at h' ||
       |      CAST((doc_id + 840000) % 12 AS VARCHAR) || ' today' ||
       |    chr(10) || 'Copyright h' || CAST((doc_id + 840000) % 12 AS VARCHAR) ||
       |      ' all rights reserved' AS text
       |  FROM documents
       |),
       |d AS MATERIALIZED (SELECT * FROM b UNION ALL SELECT * FROM dl),
       |l AS MATERIALIZED (
       |  SELECT doc_id, host,
       |    unnest(string_split(text, chr(10))) AS line,
       |    generate_subscripts(string_split(text, chr(10)), 1) AS pos
       |  FROM d
       |),
       |hd AS (SELECT host, COUNT(DISTINCT doc_id) AS nd FROM d GROUP BY host),
       |lf AS (
       |  SELECT host, line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM l GROUP BY host, line
       |),
       |t AS (
       |  SELECT l.doc_id, l.host, l.line, l.pos,
       |    CAST(lf.df AS DOUBLE) / CAST(hd.nd AS DOUBLE) >= 0.5 AS boiler
       |  FROM l
       |  JOIN lf ON lf.host = l.host AND lf.line = l.line
       |  JOIN hd ON hd.host = l.host
       |)
       |SELECT doc_id, host, CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       |  COALESCE(array_to_string(
       |    list(line ORDER BY pos) FILTER (WHERE NOT boiler), chr(10)), '')
       |    AS clean_text
       |FROM t WHERE doc_id >= 840000
       |GROUP BY doc_id, host ORDER BY doc_id""".stripMargin

  /** q182: the Heaps fit replayed — first-occurrence per word,
    * integer-division checkpoints, and the q139 OLS arithmetic.
    */
  private lazy val heapsFitSql: String =
    s"""WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
       |ts AS (
       |  SELECT DISTINCT (i * ((SELECT m FROM mx) + 1)) // 10 AS thr
       |  FROM (SELECT unnest(range(1, 11)) AS i)
       |),
       |fd AS (
       |  SELECT tok, MIN(doc_id) AS fd
       |  FROM (SELECT doc_id, unnest($toksExpr) AS tok FROM documents)
       |  GROUP BY tok
       |),
       |vat AS (
       |  SELECT thr, CAST(COUNT(*) AS BIGINT) AS v
       |  FROM ts, fd WHERE fd.fd <= ts.thr GROUP BY thr
       |),
       |nat AS (
       |  SELECT thr, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM ts, documents d WHERE d.doc_id <= ts.thr GROUP BY thr
       |),
       |xy AS (
       |  SELECT CAST(ROUND(ln(CAST(nat.n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
       |         CAST(ROUND(ln(CAST(vat.v AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
       |  FROM nat JOIN vat USING (thr)
       |),
       |a AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
       |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
       |  FROM xy
       |),
       |f AS (
       |  SELECT n,
       |    CAST(CAST(sxy AS DECIMAL(24,18)) * CAST(n AS DECIMAL(7,0))
       |      - CAST(sx AS DECIMAL(18,9)) * CAST(sy AS DECIMAL(18,9)) AS DOUBLE) AS num,
       |    CAST(CAST(sxx AS DECIMAL(24,18)) * CAST(n AS DECIMAL(7,0))
       |      - CAST(sx AS DECIMAL(18,9)) * CAST(sx AS DECIMAL(18,9)) AS DOUBLE) AS denx,
       |    CAST(CAST(syy AS DECIMAL(24,18)) * CAST(n AS DECIMAL(7,0))
       |      - CAST(sy AS DECIMAL(18,9)) * CAST(sy AS DECIMAL(18,9)) AS DOUBLE) AS deny,
       |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
       |  FROM a
       |)
       |SELECT n AS n_fit,
       |  CASE WHEN denx <> 0 THEN ROUND(num / denx, 6) END AS slope,
       |  CASE WHEN denx <> 0 THEN
       |    ROUND((syd - (num / denx) * sxd) / CAST(n AS DOUBLE), 6) END AS intercept,
       |  CASE WHEN denx * deny <> 0 THEN
       |    ROUND((num * num) / (denx * deny), 6) END AS r2
       |FROM f""".stripMargin

  /** q186: per-line langId (the q18 CASE) + lag/sum island grouping
    * + ordered span reassembly.
    */
  private lazy val langSegmentsSql: String = {
    def swCount(words: Seq[String]) =
      s"CAST(len(list_filter(lt, t -> t IN (${words.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)"
    val en = swCount(Seq("the", "and", "of", "is", "to"))
    val de = swCount(Seq("der", "und", "die", "ist", "das"))
    val fr = swCount(Seq("le", "la", "et", "est", "les"))
    val es = swCount(Seq("el", "los", "y", "es", "las"))
    s"""WITH d AS (
       |  SELECT doc_id,
       |    'the and of is to item' || CAST(doc_id AS VARCHAR) || chr(10) ||
       |    'the of and is to part' || CAST(doc_id AS VARCHAR) || chr(10) ||
       |    'der und die ist das nummer' || CAST(doc_id AS VARCHAR) || chr(10) ||
       |    CASE WHEN doc_id % 3 = 0
       |      THEN 'le la et est les objet' || CAST(doc_id AS VARCHAR)
       |      ELSE 'der und die das ist ding' || CAST(doc_id AS VARCHAR) END AS text
       |  FROM documents
       |),
       |l AS (
       |  SELECT doc_id,
       |    unnest(string_split(text, chr(10))) AS line,
       |    generate_subscripts(string_split(text, chr(10)), 1) AS pos
       |  FROM d
       |),
       |m AS (
       |  SELECT doc_id, pos, line,
       |    CASE WHEN s_en + s_de + s_fr + s_es = 0 THEN 'und'
       |         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       |         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       |         WHEN s_fr >= s_es THEN 'fr'
       |         ELSE 'es' END AS lang
       |  FROM (
       |    SELECT doc_id, pos, line,
       |      $en AS s_en, $de AS s_de, $fr AS s_fr, $es AS s_es
       |    FROM (SELECT doc_id, pos, line,
       |      list_filter(string_split(line, ' '), x -> len(x) > 0) AS lt FROM l)
       |  )
       |),
       |flg AS (
       |  SELECT *, CASE WHEN lag(lang) OVER (PARTITION BY doc_id ORDER BY pos) = lang
       |    THEN 0 ELSE 1 END AS nw
       |  FROM m
       |),
       |runs AS (
       |  SELECT *, CAST(SUM(nw) OVER (
       |    PARTITION BY doc_id ORDER BY pos) - 1 AS BIGINT) AS span_idx
       |  FROM flg
       |)
       |SELECT doc_id, span_idx, MIN(lang) AS lang,
       |  CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  array_to_string(list(line ORDER BY pos), chr(10)) AS span_text
       |FROM runs GROUP BY doc_id, span_idx
       |ORDER BY doc_id, span_idx""".stripMargin
  }

  /** md5 48-bit prefix of `e` as BIGINT — DuckDB twin of
    * [[graft.operators.Dsir.bucketOf]]'s
    * `conv(substring(md5(ng), 1, 12), 16, 10)` (the q103/q118 idiom).
    */
  private def md548(e: String): String =
    s"""CAST(list_sum([
       |      CAST(strpos('0123456789abcdef', substr(md5($e), i, 1)) - 1 AS BIGINT)
       |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
       |      FOR i IN range(1, 13)]) AS BIGINT)""".stripMargin

  /** Shared CTEs for the trained lang-ID queries (q187/q191): the
    * flavored TRAIN corpus, char-3-gram hashed bucket counts per
    * language, totals, and 9-dp priors — the full NB fit replayed in
    * SQL. Flavor sentences interpolate from
    * [[graft.queries.Queries.LangNbFlavors]] so engine and oracle can
    * never drift.
    */
  private lazy val langNbFitCtes: String = {
    val flavors = graft.queries.Queries.LangNbFlavors.zipWithIndex
      .map { case ((l, s), i) => s"($i, '$l', '$s')" }.mkString(",\n       |  ")
    s"""fl(idx, lang, sent) AS (VALUES
       |  $flavors),
       |d AS MATERIALIZED (SELECT doc_id, $toksExpr AS t FROM documents),
       |train AS MATERIALIZED (
       |  SELECT d.doc_id, f.lang,
       |    f.sent || ' ' || array_to_string(list_slice(t, 1, 8), ' ') AS txt
       |  FROM d JOIN fl f ON f.idx = d.doc_id % 4
       |),
       |tng AS (
       |  SELECT lang, substr(txt, CAST(ii AS BIGINT), 3) AS ng FROM (
       |    SELECT lang, txt,
       |      unnest(range(1, greatest(length(txt) - 1, 1))) AS ii
       |    FROM train)
       |),
       |cnts AS MATERIALIZED (
       |  SELECT lang, CAST(${md548("ng")} % 1024 AS BIGINT) AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM tng GROUP BY 1, 2
       |),
       |tots AS MATERIALIZED (
       |  SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM cnts GROUP BY 1
       |),
       |dcs AS MATERIALIZED (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS dc FROM train GROUP BY 1
       |),
       |pri AS (
       |  SELECT lang, ROUND(ln(CAST(dc AS DOUBLE) /
       |    CAST((SELECT SUM(dc) FROM dcs) AS DOUBLE)), 9) AS prior
       |  FROM dcs
       |)""".stripMargin
  }

  /** q190: PQ pure-ADC ranking replay — seeded codebooks (sub-vectors
    * of vec_id < 16, codeword index = rank in vec_id order), decimal-
    * exact per-subspace assignment distances, decimal-exact LUT dots,
    * exact 4-term estimate sum, 6-dp rounded cosine rank, recall vs
    * the exact brute-force gold (q132's tail).
    */
  private lazy val pqRecallSql: String = pqRecallSqlWith(ivf = false)

  /** q196/q201: RESIDUAL-encoded IVF-PQ (IVFADC proper) replay —
    * seeded coarse cells (vec_id < 16), residual codebooks seeded
    * from the DISJOINT vec_id 16..31 set (codeword = book seed's
    * residual to its own assigned cell, index = rank in vec_id
    * order), corpus vectors encoded as residuals with decimal-exact
    * per-subspace assignment, and the ADC estimate = exact q·c_cell
    * (the probe's own decimal-exact dot) + the residual LUT sum —
    * every residual, code, estimate, and rank replayed; recall vs the
    * exact brute-force gold.
    */
  private lazy val pqIvfResidualRecallSql: String =
    pqIvfResidualRecallSqlWith("", pqIvfSeededScSql, nProbe = 4)

  /** The seeded coarse-cell model (q196/q201/q207): cells = the 16
    * lowest-id corpus vectors themselves.
    */
  private val pqIvfSeededScSql: String =
    "SELECT vec_id AS cell, embedding AS sv, nrm AS sn FROM n WHERE vec_id < 16"

  /** The CTE chain shared by every residual-IVFADC replay (q196/q201/
    * q206/q207/q208): norms, the coarse-cell model (`scSql` — seeded
    * corpus vectors or the k-means-trained float-cast centroids, any
    * SELECT producing (cell, sv DOUBLE-compatible list, sn)),
    * assignment, the query probes at `nProbe`, the disjoint book-seed
    * residual codebooks, corpus residual encoding, the query LUTs,
    * and the ADC estimate `dsum` (exact coarse term + residual LUT
    * sum). `leading` prepends extra CTEs (the q44 k-means chain for
    * q206) before everything.
    */
  private def pqIvfResidualPrefix(leading: String, scSql: String,
      nProbe: Int, where: String = ""): String = {
    // residual arrays are already DOUBLE — no per-element cast, matching
    // the engine's float-minus-float double subtraction feeding the
    // decimal-quantized kernels directly
    def subDistD(a: String, b: String) =
      s"""list_sum([CAST(($a[j.j*16 + i] - $b[j.j*16 + i])
         |      * ($a[j.j*16 + i] - $b[j.j*16 + i]) AS DECIMAL(18,12))
         |      FOR i IN range(1, 17)])""".stripMargin
    def subDotFD(a: String, b: String) =
      s"""CAST(list_sum([CAST(CAST($a[j.j*16 + i] AS DOUBLE)
         |      * $b[j.j*16 + i] AS DECIMAL(38,12))
         |      FOR i IN range(1, 17)]) AS DOUBLE)""".stripMargin
    s"""${leading}n AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    sqrt(CAST(list_sum([CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len(embedding) + 1)]) AS DOUBLE)) AS nrm
       |  FROM embeddings $where
       |),
       |sc AS ($scSql),
       |cvs AS MATERIALIZED (
       |  SELECT v.vec_id, s.cell, ${dotX("v.embedding", "s.sv")} AS qcdot,
       |    CASE WHEN v.nrm * s.sn > 0 THEN ${dotX("v.embedding", "s.sv")} / (v.nrm * s.sn)
       |    ELSE 0.0 END AS csim
       |  FROM n v CROSS JOIN sc s
       |),
       |assign AS MATERIALIZED (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
       |    FROM cvs) WHERE rn = 1
       |),
       |probes AS MATERIALIZED (
       |  SELECT vec_id AS query_id, cell, qcdot FROM (
       |    SELECT vec_id, cell, qcdot,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
       |    FROM cvs WHERE vec_id < 50) WHERE rn <= $nProbe
       |),
       |bs AS MATERIALIZED (
       |  SELECT vec_id, embedding, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c
       |  FROM embeddings WHERE vec_id >= 16 AND vec_id < 32
       |),
       |bsr AS MATERIALIZED (
       |  SELECT b.c,
       |    [CAST(b.embedding[i] AS DOUBLE) - CAST(s.sv[i] AS DOUBLE)
       |      FOR i IN range(1, 65)] AS rw
       |  FROM bs b JOIN assign a ON a.vec_id = b.vec_id
       |  JOIN sc s ON s.cell = a.cell
       |),
       |vr AS MATERIALIZED (
       |  SELECT v.vec_id, a.cell,
       |    [CAST(v.embedding[i] AS DOUBLE) - CAST(s.sv[i] AS DOUBLE)
       |      FOR i IN range(1, 65)] AS rv
       |  FROM embeddings v JOIN assign a ON a.vec_id = v.vec_id
       |  JOIN sc s ON s.cell = a.cell
       |),
       |ad AS MATERIALIZED (
       |  SELECT v.vec_id, j.j, b.c, ${subDistD("v.rv", "b.rw")} AS dist
       |  FROM vr v CROSS JOIN generate_series(0, 3) j(j) CROSS JOIN bsr b
       |),
       |code AS MATERIALIZED (
       |  SELECT vec_id, j, c FROM (
       |    SELECT vec_id, j, c,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn
       |    FROM ad) WHERE rn = 1
       |),
       |lut AS MATERIALIZED (
       |  SELECT q.vec_id AS query_id, j.j, b.c,
       |    ${subDotFD("q.embedding", "b.rw")} AS d
       |  FROM embeddings q CROSS JOIN generate_series(0, 3) j(j) CROSS JOIN bsr b
       |  WHERE q.vec_id < 50
       |),
       |est AS MATERIALIZED (
       |  SELECT l.query_id, cd.vec_id AS neighbor_id,
       |    CAST(CAST(p.qcdot AS DECIMAL(38,12))
       |      + SUM(CAST(l.d AS DECIMAL(38,12))) AS DOUBLE) AS dsum
       |  FROM code cd
       |  JOIN assign a ON a.vec_id = cd.vec_id
       |  JOIN lut l ON l.j = cd.j AND l.c = cd.c AND l.query_id <> cd.vec_id
       |  JOIN probes p ON p.query_id = l.query_id AND p.cell = a.cell
       |  GROUP BY 1, 2, p.qcdot
       |)""".stripMargin
  }

  /** The recall-report tail over the shared prefix: exact gold,
    * the rounded-then-ranked ADC top-5, per-query matched counts and
    * the mean.
    */
  /** The exact brute-force gold (top-5 cosine per query) and the
    * rounded-then-ranked ADC top-5 as reusable CTEs over the shared
    * prefix — referenced by the recall replays and the q221 sweep.
    */
  private lazy val pqIvfExAdcCtes: String =
    s"""ex AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |        CASE WHEN q.nrm * c.nrm > 0
       |          THEN ${dotX("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
       |          ELSE 0.0 END DESC, c.vec_id) AS rn
       |    FROM n q JOIN n c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id < 50)
       |  WHERE rn <= 5
       |),
       |adc AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT e.query_id, e.neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.query_id ORDER BY
       |        ROUND(CASE WHEN qn.nrm * cn.nrm > 0
       |          THEN e.dsum / (qn.nrm * cn.nrm) ELSE 0.0 END, 6) DESC,
       |        e.neighbor_id) AS rn
       |    FROM est e JOIN n qn ON qn.vec_id = e.query_id
       |    JOIN n cn ON cn.vec_id = e.neighbor_id)
       |  WHERE rn <= 5
       |)""".stripMargin

  private def pqIvfResidualRecallSqlWith(leading: String, scSql: String,
      nProbe: Int, where: String = ""): String =
    s"""WITH ${pqIvfResidualPrefix(leading, scSql, nProbe, where)},
       |$pqIvfExAdcCtes,
       |m AS (
       |  SELECT ex.query_id,
       |    CAST(SUM(CASE WHEN adc.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       |    CAST(COUNT(*) AS BIGINT) AS k
       |  FROM ex LEFT JOIN adc
       |    ON adc.query_id = ex.query_id AND adc.neighbor_id = ex.neighbor_id
       |  GROUP BY ex.query_id
       |),
       |mr AS (
       |  SELECT ROUND(CAST(SUM(n_matched) AS DOUBLE)
       |    / CAST(COUNT(*) * 5 AS DOUBLE), 6) AS mean_recall FROM m
       |)
       |SELECT query_id, n_matched,
       |  ROUND(CAST(n_matched AS DOUBLE) / CAST(k AS DOUBLE), 6) AS recall,
       |  (SELECT mean_recall FROM mr) AS mean_recall
       |FROM m ORDER BY query_id""".stripMargin

  /** q206: the trained-coarse sc — the q44 k-means chain (prefixed
    * `k` so its CTE names cannot collide with the replay's aliases)
    * feeds the trained centroids through a FLOAT32 cast (CAST AS
    * REAL — IEEE round-to-nearest, bit-identical to the engine's
    * .toFloat) and the exact-decimal norm.
    */
  private lazy val pqIvfTrainedRecallSql: String =
    pqIvfResidualRecallSqlWith(kmeansCtes("k") + ",\n",
      s"""SELECT cell, sv,
         |    sqrt(CAST(list_sum([CAST(sv[i] * sv[i] AS DECIMAL(38,12)) FOR i IN range(1, 65)]) AS DOUBLE)) AS sn
         |  FROM (SELECT cell, [CAST(CAST(c[i] AS REAL) AS DOUBLE) FOR i IN range(1, 65)] AS sv FROM kc2) tsc""".stripMargin,
      nProbe = 2)

  /** q221: the OPERATING-POINT SWEEP — one residual-IVFADC replay per
    * nProbe, each reduced to its mean recall@5 (intersection of the
    * ADC top-5 with the exact gold over all 50 queries), union'd into
    * the (n_probe, mean_recall) tuning table.
    */
  private lazy val pqIvfProbeSweepSql: String =
    Seq(1, 2, 4).map { p =>
      s"""SELECT CAST($p AS BIGINT) AS n_probe, mean_recall FROM (
         |  WITH ${pqIvfResidualPrefix("", pqIvfSeededScSql, p)},
         |  $pqIvfExAdcCtes
         |  SELECT ROUND(
         |      CAST((SELECT COUNT(*) FROM adc JOIN ex
         |              ON adc.query_id = ex.query_id
         |             AND adc.neighbor_id = ex.neighbor_id) AS DOUBLE)
         |    / CAST((SELECT COUNT(*) FROM ex) AS DOUBLE), 6) AS mean_recall
         |)""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY n_probe"

  /** q208: the RANKING tail — the streamed serve emits the candidate
    * rows themselves (est + rank), so the oracle replays the rounded
    * estimate and the per-query rank order, not just the recall
    * aggregate.
    */
  private lazy val pqIvfResidualRankSql: String =
    s"""WITH ${pqIvfResidualPrefix("", pqIvfSeededScSql, 4)}
       |SELECT query_id, neighbor_id, est, rank FROM (
       |  SELECT e.query_id, e.neighbor_id,
       |    ROUND(CASE WHEN qn.nrm * cn.nrm > 0
       |      THEN e.dsum / (qn.nrm * cn.nrm) ELSE 0.0 END, 6) AS est,
       |    ROW_NUMBER() OVER (PARTITION BY e.query_id ORDER BY
       |      ROUND(CASE WHEN qn.nrm * cn.nrm > 0
       |        THEN e.dsum / (qn.nrm * cn.nrm) ELSE 0.0 END, 6) DESC,
       |      e.neighbor_id) AS rank
       |  FROM est e JOIN n qn ON qn.vec_id = e.query_id
       |  JOIN n cn ON cn.vec_id = e.neighbor_id)
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Shared q190/q196 replay. `ivf = true` adds the seeded coarse
    * layer (q132's assign/probes CTEs) and restricts the ADC ranking
    * to candidates whose assigned cell is probed by the query.
    */
  private def pqRecallSqlWith(ivf: Boolean): String = {
    // sub-vector j of e: elements j*16+1 .. (j+1)*16
    def subDist(a: String, b: String) =
      s"""list_sum([CAST((CAST($a[j.j*16 + i] AS DOUBLE) - CAST($b[j.j*16 + i] AS DOUBLE))
         |      * (CAST($a[j.j*16 + i] AS DOUBLE) - CAST($b[j.j*16 + i] AS DOUBLE)) AS DECIMAL(18,12))
         |      FOR i IN range(1, 17)])""".stripMargin
    def subDot(a: String, b: String) =
      s"""CAST(list_sum([CAST(CAST($a[j.j*16 + i] AS DOUBLE)
         |      * CAST($b[j.j*16 + i] AS DOUBLE) AS DECIMAL(38,12))
         |      FOR i IN range(1, 17)]) AS DOUBLE)""".stripMargin
    val coarseCtes = if (!ivf) "" else
      s""",
         |sc AS (SELECT vec_id AS cell, embedding AS sv, nrm AS sn FROM n WHERE vec_id < 16),
         |cvs AS MATERIALIZED (
         |  SELECT v.vec_id, s.cell,
         |    CASE WHEN v.nrm * s.sn > 0 THEN ${dotX("v.embedding", "s.sv")} / (v.nrm * s.sn)
         |    ELSE 0.0 END AS csim
         |  FROM n v CROSS JOIN sc s
         |),
         |assign AS MATERIALIZED (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
         |    FROM cvs) WHERE rn = 1
         |),
         |probes AS MATERIALIZED (
         |  SELECT vec_id AS query_id, cell FROM (
         |    SELECT vec_id, cell,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
         |    FROM cvs WHERE vec_id < 50) WHERE rn <= 4
         |)""".stripMargin
    val estRestrict = if (!ivf) "" else
      s"""
         |    JOIN assign a ON a.vec_id = cd.vec_id
         |    JOIN probes p ON p.query_id = l.query_id AND p.cell = a.cell""".stripMargin
    s"""WITH n AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    sqrt(CAST(list_sum([CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,12)) FOR i IN range(1, len(embedding) + 1)]) AS DOUBLE)) AS nrm
       |  FROM embeddings
       |),
       |ex AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |        CASE WHEN q.nrm * c.nrm > 0
       |          THEN ${dotX("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
       |          ELSE 0.0 END DESC, c.vec_id) AS rn
       |    FROM n q JOIN n c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id < 50)
       |  WHERE rn <= 5
       |),
       |sd AS MATERIALIZED (
       |  SELECT embedding, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c
       |  FROM embeddings WHERE vec_id < 16
       |)$coarseCtes,
       |ad AS MATERIALIZED (
       |  SELECT v.vec_id, j.j, s.c, ${subDist("v.embedding", "s.embedding")} AS dist
       |  FROM embeddings v CROSS JOIN generate_series(0, 3) j(j) CROSS JOIN sd s
       |),
       |code AS MATERIALIZED (
       |  SELECT vec_id, j, c FROM (
       |    SELECT vec_id, j, c,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn
       |    FROM ad) WHERE rn = 1
       |),
       |lut AS MATERIALIZED (
       |  SELECT q.vec_id AS query_id, j.j, s.c,
       |    ${subDot("q.embedding", "s.embedding")} AS d
       |  FROM embeddings q CROSS JOIN generate_series(0, 3) j(j) CROSS JOIN sd s
       |  WHERE q.vec_id < 50
       |),
       |est AS MATERIALIZED (
       |  SELECT l.query_id, cd.vec_id AS neighbor_id,
       |    CAST(SUM(CAST(l.d AS DECIMAL(38,12))) AS DOUBLE) AS dsum
       |  FROM code cd JOIN lut l ON l.j = cd.j AND l.c = cd.c
       |    AND l.query_id <> cd.vec_id$estRestrict
       |  GROUP BY 1, 2
       |),
       |adc AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT e.query_id, e.neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.query_id ORDER BY
       |        ROUND(CASE WHEN qn.nrm * cn.nrm > 0
       |          THEN e.dsum / (qn.nrm * cn.nrm) ELSE 0.0 END, 6) DESC,
       |        e.neighbor_id) AS rn
       |    FROM est e JOIN n qn ON qn.vec_id = e.query_id
       |    JOIN n cn ON cn.vec_id = e.neighbor_id)
       |  WHERE rn <= 5
       |),
       |m AS (
       |  SELECT ex.query_id,
       |    CAST(SUM(CASE WHEN adc.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       |    CAST(COUNT(*) AS BIGINT) AS k
       |  FROM ex LEFT JOIN adc
       |    ON adc.query_id = ex.query_id AND adc.neighbor_id = ex.neighbor_id
       |  GROUP BY ex.query_id
       |),
       |mr AS (
       |  SELECT ROUND(CAST(SUM(n_matched) AS DOUBLE)
       |    / CAST(COUNT(*) * 5 AS DOUBLE), 6) AS mean_recall FROM m
       |)
       |SELECT query_id, n_matched,
       |  ROUND(CAST(n_matched AS DOUBLE) / CAST(k AS DOUBLE), 6) AS recall,
       |  (SELECT mean_recall FROM mr) AS mean_recall
       |FROM m ORDER BY query_id""".stripMargin
  }

  /** q187: train-corpus NB fit + test-corpus scoring, every per-doc
    * argmax and 6-dp score gated.
    */
  private lazy val langidNbSql: String =
    s"""WITH $langNbFitCtes,
       |test AS MATERIALIZED (
       |  SELECT d.doc_id, f.lang AS lang_true,
       |    f.sent || ' ' || array_to_string(list_slice(t, 9, 16), ' ') AS txt
       |  FROM d JOIN fl f ON f.idx = (d.doc_id + 1) % 4
       |),
       |sng AS (
       |  SELECT doc_id, substr(txt, CAST(ii AS BIGINT), 3) AS ng FROM (
       |    SELECT doc_id, txt,
       |      unnest(range(1, greatest(length(txt) - 1, 1))) AS ii
       |    FROM test)
       |),
       |sb AS MATERIALIZED (
       |  SELECT doc_id, CAST(${md548("ng")} % 1024 AS BIGINT) AS bucket FROM sng
       |),
       |lam AS MATERIALIZED (
       |  SELECT s.doc_id, t.lang,
       |    ROUND(ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) /
       |             CAST(t.tot + 1024 AS DOUBLE)), 9) AS lam
       |  FROM sb s CROSS JOIN tots t
       |  LEFT JOIN cnts c ON c.lang = t.lang AND c.bucket = s.bucket
       |),
       |sums AS MATERIALIZED (
       |  SELECT l.doc_id, l.lang,
       |    CAST(p.prior AS DECIMAL(38,9)) + SUM(CAST(l.lam AS DECIMAL(38,9))) AS total
       |  FROM lam l JOIN pri p ON p.lang = l.lang
       |  GROUP BY l.doc_id, l.lang, p.prior
       |),
       |best AS (
       |  SELECT doc_id, lang, total,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY total DESC, lang) AS rn
       |  FROM sums
       |)
       |SELECT b.doc_id, te.lang_true, b.lang AS lang_pred,
       |  ROUND(CAST(b.total AS DOUBLE), 6) AS score,
       |  (te.lang_true = b.lang) AS hit
       |FROM best b JOIN test te ON te.doc_id = b.doc_id
       |WHERE b.rn = 1 ORDER BY b.doc_id""".stripMargin

  /** q191: q186's segmentation with per-LINE NB scoring under the
    * q187 fit, then the lag/sum island arithmetic verbatim.
    */
  private lazy val langSegmentsNbSql: String =
    s"""WITH $langNbFitCtes,
       |doc AS (
       |  SELECT doc_id,
       |    'the and of is to item' || CAST(doc_id AS VARCHAR) || chr(10) ||
       |    'the of and is to part' || CAST(doc_id AS VARCHAR) || chr(10) ||
       |    'der und die ist das nummer' || CAST(doc_id AS VARCHAR) || chr(10) ||
       |    CASE WHEN doc_id % 3 = 0
       |      THEN 'le la et est les objet' || CAST(doc_id AS VARCHAR)
       |      ELSE 'der und die das ist ding' || CAST(doc_id AS VARCHAR) END AS text
       |  FROM documents
       |),
       |l AS MATERIALIZED (
       |  SELECT doc_id,
       |    unnest(string_split(text, chr(10))) AS line,
       |    generate_subscripts(string_split(text, chr(10)), 1) AS pos
       |  FROM doc
       |),
       |lng AS (
       |  SELECT doc_id, pos, substr(line, CAST(ii AS BIGINT), 3) AS ng FROM (
       |    SELECT doc_id, pos, line,
       |      unnest(range(1, greatest(length(line) - 1, 1))) AS ii
       |    FROM l)
       |),
       |lb AS MATERIALIZED (
       |  SELECT doc_id, pos, CAST(${md548("ng")} % 1024 AS BIGINT) AS bucket FROM lng
       |),
       |llam AS MATERIALIZED (
       |  SELECT s.doc_id, s.pos, t.lang,
       |    ROUND(ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) /
       |             CAST(t.tot + 1024 AS DOUBLE)), 9) AS lam
       |  FROM lb s CROSS JOIN tots t
       |  LEFT JOIN cnts c ON c.lang = t.lang AND c.bucket = s.bucket
       |),
       |lsum AS MATERIALIZED (
       |  SELECT x.doc_id, x.pos, x.lang,
       |    CAST(p.prior AS DECIMAL(38,9)) + SUM(CAST(x.lam AS DECIMAL(38,9))) AS total
       |  FROM llam x JOIN pri p ON p.lang = x.lang
       |  GROUP BY x.doc_id, x.pos, x.lang, p.prior
       |),
       |lbest AS (
       |  SELECT doc_id, pos, lang,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id, pos
       |      ORDER BY total DESC, lang) AS rn
       |  FROM lsum
       |),
       |m AS (
       |  SELECT l.doc_id, l.pos, l.line, b.lang
       |  FROM l JOIN lbest b ON b.doc_id = l.doc_id AND b.pos = l.pos AND b.rn = 1
       |),
       |flg AS (
       |  SELECT *, CASE WHEN lag(lang) OVER (PARTITION BY doc_id ORDER BY pos) = lang
       |    THEN 0 ELSE 1 END AS nw
       |  FROM m
       |),
       |runs AS (
       |  SELECT *, CAST(SUM(nw) OVER (
       |    PARTITION BY doc_id ORDER BY pos) - 1 AS BIGINT) AS span_idx
       |  FROM flg
       |)
       |SELECT doc_id, span_idx, MIN(lang) AS lang,
       |  CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  array_to_string(list(line ORDER BY pos), chr(10)) AS span_text
       |FROM runs GROUP BY doc_id, span_idx
       |ORDER BY doc_id, span_idx""".stripMargin

  val all: Map[String, String] = headOracles ++ tailOracles ++
    Map("q163_embedding_spectrum" -> embeddingSpectrumSql,
      // distributed-matvec spectrum: bit-identical to the driver path
      // by construction — same oracle IS the equivalence gate
      "q192_spectrum_power" -> embeddingSpectrumSql,
      // byte-level BPE: the standard 12-round unroll over the
      // byte-remapped word table (byteBpeHead), q99's finals tail
      "q193_byte_bpe_train" -> {
        val finals = (1 to 12).map(k =>
          s"""SELECT CAST($k AS INTEGER) AS rank, l AS "left", r AS "right", cnt AS freq FROM best$k""")
        bpeUnrollCtes(12, Some(byteBpeHead)) + "\n" +
          finals.mkString("\nUNION ALL\n") + "\nORDER BY rank"
      },
      // byte-level segmentation + roundtrip: the unroll's final word
      // table IS greedy segmentation (q102's equivalence); roundtrip
      // = pieces re-concatenate to the remapped word (bijection)
      "q194_byte_bpe_segment" -> (
        bpeUnrollCtes(12, Some(byteBpeHead)) + "\n" +
          s"""SELECT d.w, array_to_string(f.syms, ' ') AS segmented,
             |  CAST(len(f.syms) AS BIGINT) AS n_pieces,
             |  (array_to_string(f.syms, '') = d.rw) AS roundtrip_ok
             |FROM (SELECT DISTINCT w, rw FROM rm) d
             |JOIN words12 f ON f.w = d.rw
             |ORDER BY d.w""".stripMargin),
      "q164_phrase_scan" -> phraseScanSql,
      "q165_remove_top" -> removeTopSql,
      "q166_token_subsample" -> tokenSubsampleSql,
      "q172_streaming_subsample" -> tokenSubsampleSql,
      "q167_ccnet_buckets" -> ccnetBucketsSql,
      "q170_boilerplate_strip" -> boilerplateStripSql,
      "q179_incremental_boilerplate" -> incrementalBoilerplateSql,
      // negative sampling: unigram^(3/4) weights (two correctly-
      // rounded sqrts), exact-decimal cums over the lex order, md5-48
      // uniforms, first-reaching word = MIN(word) over cum >= t
      "q182_heaps_fit" -> heapsFitSql,
      "q186_lang_segments" -> langSegmentsSql,
      "q187_langid_nb" -> langidNbSql,
      // Avro roundtrip: the oracle aggregates the ORIGINAL parquet —
      // the roundtripped values must fingerprint identically
      "q188_avro_roundtrip" ->
        s"""WITH f AS (
           |  SELECT lang, n_chars,
           |    CAST(list_sum([
           |      CAST(strpos('0123456789abcdef', substr(md5(
           |        CAST(doc_id AS VARCHAR) || ':' || CAST(n_chars AS VARCHAR)), i, 1)) - 1 AS BIGINT)
           |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
           |      FOR i IN range(1, 13)]) AS BIGINT) AS h
           |  FROM documents
           |  WHERE n_chars >= 200
           |)
           |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS chars,
           |  bit_xor(h) AS content_fp
           |FROM f GROUP BY lang ORDER BY lang""".stripMargin,
      // PQ certified top-k: the Cauchy–Schwarz screen + exact
      // re-score make the output the exact brute-force answer — q17's
      // oracle verbatim (the q61 contract, third compression family)
      "q189_pq_ann" -> cosineTopKSql,
      // stored-index PQ: same certificate, same exact answer
      "q200_pq_stored_index" -> cosineTopKSql,
      // PQ pure-ADC recall report: seeded codebooks + decimal-exact
      // assignment/LUT replayed end to end, recall vs exact gold
      "q190_pq_recall" -> pqRecallSql,
      "q191_lang_segments_nb" -> langSegmentsNbSql,
      // stream ≡ batch for the stateless NB scoring projection
      "q195_streaming_langid" -> langidNbSql,
      // composed IVF-PQ, residual-encoded (IVFADC proper): coarse
      // layer + residual codebooks + exact coarse term, replayed
      "q196_pq_ivf_recall" -> pqIvfResidualRecallSql,
      // stored cell-partitioned IVF-PQ index: serving ≡ in-query
      "q201_ivfpq_stored_index" -> pqIvfResidualRecallSql,
      // streaming ANN serving: per-trigger certified screen + exact
      // re-score against the stored codes — stream ≡ exact brute force
      "q202_streaming_ann_serve" -> cosineTopKSql,
      // Avro evolution: defaults land on every record — the oracle
      // aggregates the original parquet with the defaults as literals
      "q197_avro_evolution" ->
        s"""SELECT lang, CAST('unscored' AS VARCHAR) AS quality_tier,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(COUNT(*) AS BIGINT) AS total_weight,
           |  CAST(SUM(n_chars) AS BIGINT) AS chars
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
      // Gopher repetition filters: line counts, gram windows, the
      // interval-union char coverage, and the threshold verdict
      "q198_gopher_repetition" -> gopherRepetitionSql,
      // stream ≡ batch for the zero-shuffle row-wise form
      "q199_streaming_repetition" -> gopherRepetitionSql,
      // Gopher FORMAT rules: planted single-rule fixtures, every
      // count/ratio/verdict replayed
      "q203_gopher_quality" -> gopherQualitySql,
      // long-doc guard: capped-prefix repetition metrics + truncated
      "q205_capped_repetition" -> cappedRepetitionSql,
      // stream ≡ batch for the stateless format projection
      "q204_streaming_gopher_quality" -> gopherQualitySql,
      // trained-coarse IVFADC: the q44 k-means chain composed with
      // the residual replay — training through recall in one statement
      "q206_trained_ivfpq" -> pqIvfTrainedRecallSql,
      // incremental append ≡ full rebuild: the served state is the
      // full true corpus, so q201's replay gates it verbatim
      "q207_ivfpq_append" -> pqIvfResidualRecallSql,
      // streaming IVFADC serving emits the ranking rows themselves:
      // est + rank per candidate under the residual replay
      "q208_streaming_ivfpq_serve" -> pqIvfResidualRankSql,
      // main-content extraction: block split, densities, both class
      // passes, and the kept-blocks reassembly replayed
      "q209_main_content" -> mainContentExtractSql,
      // the per-block diagnostics under the same replay
      "q210_main_content_blocks" -> mainContentBlocksSql,
      // stream ≡ batch for the zero-exchange extraction projection
      "q211_streaming_main_content" -> mainContentExtractSql,
      // stored trained-coarse index: serving ≡ q206's in-query report
      "q212_trained_ivfpq_stored" -> pqIvfTrainedRecallSql,
      // end-to-end web ingestion: main-content extraction chained
      // into the Gopher format tail (minWords tuned to the fixture)
      "q213_web_pipeline" -> webPipelineSql,
      // stream ≡ batch for the two composed stateless projections
      // (extraction + format filter) — q213's SQL verbatim
      "q218_streaming_web_pipeline" -> webPipelineSql,
      // C4 line filters: retention, reassembly, sentence count, and
      // the ordered page-rule verdict replayed
      "q215_c4_filter" -> c4FilterSql,
      // the complete Table A1 repetition half: paragraph duplicates,
      // top-{2,3,4}-gram fractions, dup-{5..10}-gram coverage — the
      // per-n CTEs are GENERATED from the operator's threshold tables
      "q217_full_repetition" -> fullRepetitionSql,
      // stream ≡ batch for the thirteen-metric per-row projection
      "q222_streaming_full_repetition" -> fullRepetitionSql,
      // stored inverted index: serving from bucket-pruned postings
      // must be bit-identical to the from-scratch BM25 scan
      "q219_stored_bm25_index" ->
        bm25Sql(Seq("spark", "join", "stream"), 20),
      // incremental index append ≡ full rebuild: serving over
      // base+delta gates against the FULL-corpus replay (summed
      // stats rows make N/avgdl/df the rebuild values exactly)
      "q220_bm25_index_append" ->
        bm25Sql(Seq("data", "table", "merge", "vector"), 20),
      // recall-vs-directories-read tuning table: one full IVFADC
      // replay per nProbe, reduced to mean recall@5
      "q221_ivfpq_probe_sweep" -> pqIvfProbeSweepSql,
      // multi-query serving from the stored index: eight per-query
      // BM25 replays (each over its own fixed term order, ranked and
      // 6-dp-scale-quantized exactly as the engine's bottom-k path)
      "q223_bm25_batch_serve" ->
        bm25BatchSql(graft.queries.Queries.HybridQueries, 10),
      // stream ≡ batch for index serving: per-query results are
      // batch-independent, so the streamed union replays identically
      "q224_streaming_bm25_serve" ->
        bm25BatchSql(graft.queries.Queries.HybridQueries, 10),
      // proximity from the positional index: min |posA - posB| over
      // the pair product, replayed from raw token positions
      "q229_proximity_from_index" -> proximityFromIndexSql,
      // re-crawl supersede on the BM25 index: serving over
      // (base \ re-ingested) ∪ delta IS the true corpus, so the
      // plain-corpus replay gates it — the stale-only query term
      // ("placeholder") must contribute zero everywhere
      "q231_bm25_index_reingest" ->
        bm25Sql(Seq("spark", "data", "placeholder"), 20),
      // positional append ≡ rebuild: q225's phrase replay verbatim
      // over the true corpus (stale texts planted the terms in the
      // WRONG order, so a failed supersede cannot hash-match)
      "q232_positional_index_append" -> phraseFromIndexSql(),
      // positional compaction invisible (and tombstones folded, not
      // dropped): q229's proximity replay verbatim
      "q233_positional_index_compact" -> proximityFromIndexSql,
      // streaming serve over the superseded index: per-trigger
      // stream-static reads run the tombstone filter + stats
      // correction; the served state is the true corpus, so the
      // batch replay gates the streamed union verbatim
      "q235_streaming_superseded_serve" ->
        bm25BatchSql(graft.queries.Queries.HybridQueries, 10),
      // streaming serve PINNED to a past generation: the as-of-gen-1
      // state is the true corpus, so the batch SQL gates the
      // streamed pinned serve verbatim
      "q254_streaming_time_travel_serve" ->
        bm25BatchSql(graft.queries.Queries.HybridQueries, 10),
      // IVF-PQ compaction invisible to serving: the appended index's
      // replay (= the full-rebuild replay) verbatim
      "q236_ivfpq_index_compact" -> pqIvfResidualRecallSql,
      // streaming crawl ingest: micro-batch appends under the
      // slice-commit protocol serve the true corpus exactly
      "q237_streaming_index_ingest" ->
        bm25Sql(Seq("table", "stream", "placeholder"), 20),
      // streaming ANN ingest: the served state is the true corpus,
      // so the q201/q207 recall replay gates it verbatim
      "q238_streaming_ann_ingest" -> pqIvfResidualRecallSql,
      // right-to-be-forgotten: deleted docs vanish from every
      // serving statistic, so the replay runs over documents MINUS
      // the deleted set
      "q239_index_delete" ->
        bm25Sql(Seq("spark", "row", "merge"), 20,
          where = "WHERE doc_id % 16 NOT IN (2, 4)"),
      "q240_positional_delete" ->
        phraseFromIndexSql(where = "WHERE doc_id % 16 <> 1"),
      // ANN delete: the whole CTE chain (norms, assignment, codes,
      // estimates, exact gold) replays over embeddings minus the
      // deleted set; queries (vec_id < 50) are untouched
      "q241_ann_delete" ->
        pqIvfResidualRecallSqlWith("", pqIvfSeededScSql, nProbe = 4,
          where = "WHERE NOT (vec_id >= 50 AND vec_id % 7 = 3)"),
      // time travel: the as-of-gen-1 state (post-re-crawl,
      // pre-delete) IS the true corpus, so the plain replay gates it
      "q242_time_travel_serve" ->
        bm25Sql(Seq("spark", "row", "merge"), 20),
      // positional time travel: the as-of-gen-1 state is the true
      // corpus, so q225's plain phrase replay gates it
      "q244_positional_time_travel" -> phraseFromIndexSql(),
      // ANN time travel: as-of-gen-1 is the true corpus — the
      // q201/q207 recall replay verbatim
      "q245_ann_time_travel" -> pqIvfResidualRecallSql,
      // ANN DESCRIBE HISTORY: generation counts recomputed from the
      // q241 fixture predicates over embeddings
      "q246_ann_index_history" ->
        s"""SELECT CAST(1 AS BIGINT) AS gen,
           |  CAST(NULL AS VARCHAR) AS batch_key,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs
           |FROM embeddings WHERE vec_id % 3 = 0
           |UNION ALL
           |SELECT CAST(2 AS BIGINT), CAST(NULL AS VARCHAR),
           |  CAST(COUNT(*) AS BIGINT)
           |FROM embeddings WHERE vec_id >= 50 AND vec_id % 7 = 3
           |ORDER BY gen""".stripMargin,
      // manifest health: counters recomputed from the q239 fixture
      // predicates (append = %4==0 ∪ %8==1, delete = %16 ∈ {2,4});
      // the compacted state folds every counter to zero
      "q247_index_health" ->
        s"""WITH touched AS (
           |  SELECT doc_id FROM documents WHERE doc_id % 4 = 0 OR doc_id % 8 = 1
           |  UNION ALL
           |  SELECT doc_id FROM documents WHERE doc_id % 16 IN (2, 4)
           |), ids AS (SELECT COUNT(DISTINCT doc_id) AS u FROM touched)
           |SELECT CAST(0 AS BIGINT) AS n_generations,
           |  CAST(0 AS BIGINT) AS max_gen,
           |  CAST(0 AS BIGINT) AS n_committed_slices,
           |  CAST(0 AS BIGINT) AS n_tombstone_rows,
           |  CAST(0 AS BIGINT) AS n_tombstoned_ids,
           |  CAST(0 AS BIGINT) AS est_broadcast_bytes,
           |  'compacted' AS state
           |UNION ALL
           |SELECT CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT),
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM touched),
           |  (SELECT CAST(u AS BIGINT) FROM ids),
           |  (SELECT CAST(24 * u AS BIGINT) FROM ids),
           |  'live'
           |ORDER BY state""".stripMargin,
      // positional DESCRIBE HISTORY (the last lifecycle ×
      // index-family cell): counts from the q240 fixture predicates
      "q248_positional_index_history" ->
        s"""SELECT CAST(1 AS BIGINT) AS gen,
           |  CAST(NULL AS VARCHAR) AS batch_key,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs
           |FROM documents WHERE doc_id % 4 = 0 OR doc_id % 8 = 1
           |UNION ALL
           |SELECT CAST(2 AS BIGINT), CAST(NULL AS VARCHAR),
           |  CAST(COUNT(*) AS BIGINT)
           |FROM documents WHERE doc_id % 16 = 1
           |ORDER BY gen""".stripMargin,
      // compaction lineage: history of the compacted index is ONE
      // generation-0 row — source's final gen (2) and its live doc
      // count (all docs minus the %16∈{2,4} takedowns)
      "q249_compaction_lineage" ->
        s"""SELECT CAST(0 AS BIGINT) AS gen,
           |  'compact:gen=2' AS batch_key,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs
           |FROM documents WHERE doc_id % 16 NOT IN (2, 4)""".stripMargin,
      // retention: the pinned as-of-gen-1 read from the retained
      // SOURCE path after compaction — q242's replay verbatim (the
      // gen-1 state is the true corpus)
      "q250_retention_time_travel" ->
        bm25Sql(Seq("spark", "row", "merge"), 20),
      // ANN manifest health: q241 fixture predicates (append =
      // %3==0, delete = vec_id≥50 ∧ %7==3)
      "q251_ann_index_health" ->
        s"""WITH touched AS (
           |  SELECT vec_id FROM embeddings WHERE vec_id % 3 = 0
           |  UNION ALL
           |  SELECT vec_id FROM embeddings
           |  WHERE vec_id >= 50 AND vec_id % 7 = 3
           |), ids AS (SELECT COUNT(DISTINCT vec_id) AS u FROM touched)
           |SELECT CAST(2 AS BIGINT) AS n_generations,
           |  CAST(2 AS BIGINT) AS max_gen,
           |  CAST(2 AS BIGINT) AS n_committed_slices,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM touched) AS n_tombstone_rows,
           |  (SELECT CAST(u AS BIGINT) FROM ids) AS n_tombstoned_ids,
           |  (SELECT CAST(24 * u AS BIGINT) FROM ids) AS est_broadcast_bytes""".stripMargin,
      // pointer flip: the alias resolves to the compacted index and
      // serving equals the full-corpus replay (q226's oracle — the
      // flip is invisible to every score)
      "q252_pointer_flip" -> bm25Sql(Seq("join", "hash", "row"), 20),
      // DESCRIBE HISTORY: the manifest's generation clock read back
      // as (gen, batch_key, docs touched), counts recomputed from
      // the fixture predicates
      "q243_index_history" ->
        s"""SELECT CAST(1 AS BIGINT) AS gen,
           |  CAST(NULL AS VARCHAR) AS batch_key,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs
           |FROM documents WHERE doc_id % 4 = 0 OR doc_id % 8 = 1
           |UNION ALL
           |SELECT CAST(2 AS BIGINT), CAST(NULL AS VARCHAR),
           |  CAST(COUNT(*) AS BIGINT)
           |FROM documents WHERE doc_id % 16 IN (2, 4)
           |ORDER BY gen""".stripMargin,
      // Dirichlet QL from the index: smoothed log-likelihood replay
      "q228_ql_from_index" ->
        qlFromIndexSql(Seq("spark", "join", "stream", "zzzunseen"), 20),
      // compaction is invisible to serving: full-corpus replay again
      "q226_bm25_index_compact" -> bm25Sql(Seq("join", "hash", "row"), 20),
      // df/cf heavy hitters replayed from raw tokens (df = docs
      // containing the term, cf = total occurrences), ranked
      // (df DESC, term) top-20 like the engine's index aggregate
      "q227_vocab_from_index" ->
        s"""WITH t AS (SELECT doc_id, $toksExpr AS tk FROM documents),
           |occ AS (SELECT doc_id, unnest(tk) AS term FROM t)
           |SELECT term,
           |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
           |  CAST(COUNT(*) AS BIGINT) AS cf
           |FROM occ GROUP BY term
           |ORDER BY df DESC, term LIMIT 20""".stripMargin,
      // positional-index phrase serve: position alignment over
      // whitespace tokens == counting the phrase's 3-grams in text
      "q225_phrase_from_index" -> phraseFromIndexSql(),
      // stream ≡ batch for the stateless line-filter projection
      "q216_streaming_c4_filter" -> c4FilterSql,
      // mergeable GK quantile sketch gated within its rank-error
      // bound (the q45 HLL within-bounds discipline)
      "q214_quantile_sketch" ->
        s"""WITH c AS (SELECT lang, n_chars, COUNT(*) AS c FROM documents GROUP BY 1, 2),
           |n AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_docs FROM c GROUP BY lang),
           |cum AS (
           |  SELECT lang, n_chars,
           |    SUM(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cumc
           |  FROM c
           |),
           |med AS (
           |  SELECT cum.lang, MIN(n_chars) AS exact_median
           |  FROM cum JOIN n USING (lang)
           |  WHERE cumc >= CAST(floor((n_docs + 1) / 2.0) AS BIGINT)
           |  GROUP BY cum.lang
           |)
           |SELECT lang, n_docs, exact_median, TRUE AS within_bounds
           |FROM n JOIN med USING (lang) ORDER BY lang""".stripMargin,

      // skip-gram pairs: offset fan-out + pair rollup
      "q181_skipgram_pairs" ->
        s"""WITH t AS (SELECT $toksExpr AS toks FROM documents),
           |p AS (
           |  SELECT toks, unnest(toks) AS center,
           |    generate_subscripts(toks, 1) AS i
           |  FROM t
           |),
           |o AS (SELECT unnest([-2, -1, 1, 2]) AS o),
           |x AS (
           |  SELECT p.center, p.toks[p.i + o.o] AS context
           |  FROM p JOIN o ON p.i + o.o >= 1 AND p.i + o.o <= len(p.toks)
           |)
           |SELECT center, context, CAST(COUNT(*) AS BIGINT) AS cnt
           |FROM x GROUP BY center, context
           |ORDER BY cnt DESC, center, context LIMIT 100""".stripMargin,
      "q180_negative_sampling" ->
        s"""WITH wc AS (
           |  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM (SELECT unnest($toksExpr) AS tok FROM documents)
           |  GROUP BY tok
           |),
           |v AS (
           |  SELECT word,
           |    ROUND(sqrt(CAST(cnt AS DOUBLE)) * sqrt(sqrt(CAST(cnt AS DOUBLE))), 9) AS w
           |  FROM wc
           |),
           |c AS MATERIALIZED (
           |  SELECT word,
           |    CAST(SUM(CAST(w AS DECIMAL(38,9))) OVER (ORDER BY word) AS DOUBLE) AS cum
           |  FROM v
           |),
           |tot AS (SELECT CAST(SUM(CAST(w AS DECIMAL(38,9))) AS DOUBLE) AS total FROM v),
           |d AS (
           |  SELECT k,
           |    CAST(list_sum([
           |      CAST(strpos('0123456789abcdef', substr(md5(
           |        's180:' || CAST(k AS VARCHAR)), j, 1)) - 1 AS BIGINT)
           |        * CAST(1::BIGINT << (4 * (12 - j)) AS BIGINT)
           |      FOR j IN range(1, 13)]) AS DOUBLE)
           |      / 281474976710656.0 * (SELECT total FROM tot) AS t
           |  FROM (SELECT unnest(range(1, 2001)) AS k)
           |)
           |SELECT d.k AS draw, MIN(c.word) AS word
           |FROM d JOIN c ON c.cum >= d.t
           |GROUP BY d.k ORDER BY draw""".stripMargin,
      "q171_luhn_redact" -> luhnRedactSql,
      // stream ≡ batch for the stateless Luhn projection
      "q184_streaming_luhn" -> luhnRedactSql,
      // cross-source KMV overlap: per-source bottom-64 shingle-hash
      // sketches, pair merge, SIGMOD'07 estimators
      "q185_source_overlap" ->
        s"""WITH corpus AS (
           |  SELECT doc_id, source, text FROM documents
           |  UNION ALL
           |  SELECT doc_id, 'mirror' AS source, text FROM documents
           |  WHERE doc_id % 4 = 0
           |),
           |t AS (SELECT source, $toksExpr AS toks FROM corpus),
           |shw AS (
           |  SELECT DISTINCT source,
           |    unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
           |      FOR i IN range(1, greatest(len(toks) - 2, 1) + 1)])) AS v
           |  FROM t
           |),
           |hh AS (
           |  SELECT DISTINCT source,
           |    CAST(list_sum([
           |      CAST(strpos('0123456789abcdef', substr(md5(v), i, 1)) - 1 AS BIGINT)
           |        * CAST(1::BIGINT << (4 * (12 - i)) AS BIGINT)
           |      FOR i IN range(1, 13)]) AS BIGINT) AS h
           |  FROM shw
           |),
           |b AS (
           |  SELECT source, h FROM (
           |    SELECT source, h,
           |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
           |    FROM hh
           |  ) WHERE rk <= 64
           |),
           |g AS (SELECT DISTINCT source FROM corpus),
           |pairs AS (
           |  SELECT a.source AS grp_a, b2.source AS grp_b
           |  FROM g a JOIN g b2 ON a.source < b2.source
           |),
           |m0 AS (
           |  SELECT p.grp_a, p.grp_b, x.h,
           |    MAX(CASE WHEN x.source = p.grp_a THEN 1 ELSE 0 END) AS ina,
           |    MAX(CASE WHEN x.source = p.grp_b THEN 1 ELSE 0 END) AS inb
           |  FROM pairs p JOIN b x ON x.source = p.grp_a OR x.source = p.grp_b
           |  GROUP BY p.grp_a, p.grp_b, x.h
           |),
           |mk AS (
           |  SELECT * FROM (
           |    SELECT m0.*, ROW_NUMBER() OVER (
           |      PARTITION BY grp_a, grp_b ORDER BY h) AS rk
           |    FROM m0
           |  ) WHERE rk <= 64
           |),
           |agg AS (
           |  SELECT grp_a, grp_b, CAST(COUNT(*) AS BIGINT) AS n_merged,
           |    CAST(SUM(ina * inb) AS BIGINT) AS n_both, MAX(h) AS h_k
           |  FROM mk GROUP BY grp_a, grp_b
           |)
           |SELECT grp_a, grp_b, n_merged, n_both, h_k,
           |  ROUND(CASE WHEN n_merged < 64 THEN CAST(n_merged AS DOUBLE)
           |    ELSE CAST(63 AS DOUBLE) * 281474976710656.0
           |      / CAST(h_k AS DOUBLE) END, 6) AS union_est,
           |  ROUND(CAST(n_both AS DOUBLE) / CAST(n_merged AS DOUBLE), 6)
           |    AS jaccard_est,
           |  ROUND(ROUND(CAST(n_both AS DOUBLE) / CAST(n_merged AS DOUBLE), 6)
           |    * ROUND(CASE WHEN n_merged < 64 THEN CAST(n_merged AS DOUBLE)
           |        ELSE CAST(63 AS DOUBLE) * 281474976710656.0
           |          / CAST(h_k AS DOUBLE) END, 6), 6) AS intersection_est
           |FROM agg ORDER BY grp_a, grp_b""".stripMargin,
      "q173_tokenizer_fertility" -> tokenizerFertilitySql,
      // stream ≡ batch for the stateless AC projection
      "q175_streaming_phrase_scan" -> phraseScanSql,
      "q176_quality_lr" -> qualityLrSql,
      "q177_streaming_lr_score" -> qualityLrSql,
      "q183_lr_calibration" -> lrCalibrationSql,
      // streaming drift monitor: windowing + Laplace-smoothed KL vs
      // the corpus reference, the klDrift integer-ratio arithmetic
      "q178_streaming_drift" ->
        s"""WITH e AS (
           |  SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS h,
           |    event_type AS t
           |  FROM events
           |),
           |g AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS ct FROM e GROUP BY t),
           |tv AS (SELECT CAST(SUM(ct) AS BIGINT) AS nr,
           |              CAST(COUNT(*) AS BIGINT) AS v FROM g),
           |w AS (SELECT h, t, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY h, t),
           |tot AS (SELECT h, CAST(SUM(c) AS BIGINT) AS ntot FROM w GROUP BY h),
           |nw AS (SELECT h, CAST(SUM(c) AS BIGINT) AS nw FROM w
           |       WHERE t IN (SELECT t FROM g) GROUP BY h),
           |x AS (
           |  SELECT nw.h, nw.nw, g.ct, g.t, COALESCE(w.c, 0) AS c
           |  FROM nw CROSS JOIN g
           |  LEFT JOIN w ON w.h = nw.h AND w.t = g.t
           |),
           |sc AS (
           |  SELECT h, nw,
           |    ROUND(CAST(c + 1 AS DOUBLE) / CAST(nw + (SELECT v FROM tv) AS DOUBLE)
           |      * ROUND(ln(
           |          CAST((c + 1) * ((SELECT nr FROM tv) + (SELECT v FROM tv)) AS DOUBLE) /
           |          CAST((ct + 1) * (nw + (SELECT v FROM tv)) AS DOUBLE)), 9),
           |      12) AS contrib
           |  FROM x
           |)
           |SELECT sc.h AS hour_start, sc.nw AS n_events,
           |  CAST(tot.ntot - sc.nw AS BIGINT) AS oov_events,
           |  ROUND(CAST(SUM(CAST(contrib AS DECIMAL(38,12))) AS DOUBLE), 12) AS kl
           |FROM sc JOIN tot ON tot.h = sc.h
           |GROUP BY sc.h, sc.nw, tot.ntot ORDER BY hour_start""".stripMargin,
      "q174_good_turing" ->
        s"""WITH wc AS (
           |  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
           |  FROM (SELECT lang, unnest($toksExpr) AS tok FROM documents)
           |  GROUP BY lang, tok
           |)
           |SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
           |  CAST(COUNT(*) AS BIGINT) AS vocab,
           |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           |  CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
           |  ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           |    / CAST(SUM(c) AS DOUBLE), 6) AS p_unseen
           |FROM wc GROUP BY lang ORDER BY lang""".stripMargin)

  /** q203/q204: Gopher Table A1 FORMAT rules replay — the planted
    * fixture itself is rebuilt from the SAME
    * [[graft.queries.Queries.GopherQualityBranches]] segments (doc-id
    * spliced between them), then every count (tokens, '#' chars,
    * greedy non-overlapping '...' + '…' occurrences, bullet/ellipsis
    * lines, alpha-bearing words, distinct stop words), every 6-dp
    * ratio, and the eight-way conjunction verdict.
    */
  /** q209/q210/q211: main-content extraction replay — the planted
    * page fixtures (CASE over Queries.MainContentBranches, the shared
    * segments), the block split / tag strip / anchor capture with the
    * SAME regex constants the engine uses (Java∩RE2-agreeing subset),
    * per-block word counts and 6-dp link/stop densities, the
    * threshold classes, the neighbor context pass, and the kept-
    * blocks reassembly. DuckDB 1-based list indexing out-of-range
    * yields NULL, which the guarded AND/OR conditions treat exactly
    * as the engine's coalesce('') does.
    */
  private lazy val mainContentCtes: String = {
    def sqlLit(s: String): String =
      s.split("\n", -1).map(p => "'" + p.replace("'", "''") + "'")
        .mkString(" || chr(10) || ")
    def branchExpr(segs: Seq[String]): String =
      segs.map(sqlLit).mkString(" || CAST(doc_id AS VARCHAR) || ")
    val cases = graft.queries.Queries.MainContentBranches.zipWithIndex
      .map { case (segs, i) => s"WHEN $i THEN ${branchExpr(segs)}" }
      .mkString("\n      ")
    val splitPat = graft.operators.MainContent.BlockSplitPattern
    val anchorPat = graft.operators.MainContent.AnchorPattern
    val ws = "[ \t\n\r]+"
    val stops = graft.operators.MainContent.StopWords
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val mld = graft.operators.MainContent.DefaultMaxLinkDensity
    val mw = graft.operators.MainContent.DefaultMinWords
    val sh = graft.operators.MainContent.DefaultStopHigh
    val sl = graft.operators.MainContent.DefaultStopLow
    s"""d AS MATERIALIZED (
       |  SELECT doc_id, CASE doc_id % 6
       |      $cases
       |    END AS html
       |  FROM documents
       |),
       |bk AS (
       |  SELECT doc_id, regexp_split_to_array(html, '$splitPat') AS bka FROM d
       |),
       |st AS MATERIALIZED (
       |  SELECT doc_id,
       |    [trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' ', 'g'), '$ws', ' ', 'g')) FOR b IN bka] AS ta,
       |    [COALESCE(list_sum([CAST(len(trim(regexp_replace(a, '$ws', ' ', 'g'))) AS BIGINT) FOR a IN regexp_extract_all(b, '$anchorPat', 1)]), 0) FOR b IN bka] AS la
       |  FROM bk
       |),
       |flt AS MATERIALIZED (
       |  SELECT doc_id,
       |    [ta[i] FOR i IN range(1, len(ta) + 1) IF len(ta[i]) > 0] AS bt,
       |    [la[i] FOR i IN range(1, len(ta) + 1) IF len(ta[i]) > 0] AS lc
       |  FROM st
       |),
       |met AS MATERIALIZED (
       |  SELECT doc_id, bt,
       |    [CAST(len(string_split(t, ' ')) AS BIGINT) FOR t IN bt] AS nw,
       |    [ROUND(CAST(len([w FOR w IN string_split(t, ' ') IF list_contains($stops, lower(w))]) AS DOUBLE)
       |       / CAST(len(string_split(t, ' ')) AS DOUBLE), 6) FOR t IN bt] AS sf,
       |    [ROUND(CAST(lc[i] AS DOUBLE) / CAST(len(bt[i]) AS DOUBLE), 6) FOR i IN range(1, len(bt) + 1)] AS ld
       |  FROM flt
       |),
       |cl AS MATERIALIZED (
       |  SELECT doc_id, bt, nw, sf, ld,
       |    [CASE WHEN ld[i] > $mld THEN 'bad'
       |          WHEN nw[i] < $mw THEN 'short'
       |          WHEN sf[i] >= $sh THEN 'good'
       |          WHEN sf[i] >= $sl THEN 'near_good'
       |          ELSE 'bad' END FOR i IN range(1, len(bt) + 1)] AS cls
       |  FROM met
       |),
       |fin AS MATERIALIZED (
       |  SELECT doc_id, bt, nw, sf, ld, cls,
       |    [CASE WHEN cls[i] = 'good' THEN 'good'
       |          WHEN cls[i] = 'bad' THEN 'bad'
       |          WHEN (i > 1 AND cls[i-1] = 'good')
       |            OR (i < len(cls) AND cls[i+1] = 'good') THEN 'good'
       |          ELSE 'bad' END FOR i IN range(1, len(cls) + 1)] AS fn
       |  FROM cl
       |)""".stripMargin
  }

  /** q215/q216: the C4 line-filter replay — the planted pages (CASE
    * over Queries.C4Branches), line retention (terminal punctuation,
    * ≥5 words, no "javascript"), the kept-text reassembly, the
    * terminal-mark sentence count, and the ordered page-rule verdict.
    */
  private lazy val c4FilterSql: String = {
    def sqlLit(s: String): String =
      s.split("\n", -1).map(p => "'" + p.replace("'", "''") + "'")
        .mkString(" || chr(10) || ")
    def branchExpr(segs: Seq[String]): String =
      segs.map(sqlLit).mkString(" || CAST(doc_id AS VARCHAR) || ")
    val cases = graft.queries.Queries.C4Branches.zipWithIndex
      .map { case (segs, i) => s"WHEN $i THEN ${branchExpr(segs)}" }
      .mkString("\n      ")
    s"""WITH d AS MATERIALIZED (
       |  SELECT doc_id, CASE doc_id % 5
       |      $cases
       |    END AS text
       |  FROM documents
       |),
       |k AS MATERIALIZED (
       |  SELECT doc_id, text,
       |    list_filter(string_split(text, chr(10)), l ->
       |      (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!')
       |        OR ends_with(rtrim(l), '?') OR ends_with(rtrim(l), '."')
       |        OR ends_with(rtrim(l), '!"') OR ends_with(rtrim(l), '?"'))
       |      AND len(list_filter(string_split(trim(l), ' '), w -> len(w) > 0)) >= 5
       |      AND NOT contains(lower(l), 'javascript')) AS kl
       |  FROM d
       |),
       |f AS (
       |  SELECT doc_id, text,
       |    COALESCE(array_to_string(kl, chr(10)), '') AS kept_text,
       |    CAST(len(kl) AS BIGINT) AS n_lines_kept
       |  FROM k
       |),
       |s AS (
       |  SELECT doc_id, kept_text, n_lines_kept,
       |    CAST(length(kept_text) - length(translate(kept_text, '.!?', ''))
       |      AS BIGINT) AS n_sentences,
       |    CASE WHEN length(kept_text) - length(translate(kept_text, '.!?', '')) < 3
       |           THEN 'too_few_sentences'
       |         WHEN contains(lower(text), 'lorem ipsum') THEN 'lorem_ipsum'
       |         WHEN contains(text, '{') THEN 'curly_brace'
       |         ELSE '' END AS drop_reason
       |  FROM f
       |)
       |SELECT doc_id, kept_text, n_lines_kept, n_sentences,
       |  (drop_reason = '') AS keep_doc, drop_reason
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** q213: the extraction chained into the Gopher format tail — one
    * statement from raw fixture HTML to the conjunction verdict.
    */
  private lazy val webPipelineSql: String =
    gopherMetricSql(mainContentCtes + ",\n",
      s"""SELECT doc_id,
         |    COALESCE(array_to_string([bt[i] FOR i IN range(1, len(bt) + 1) IF fn[i] = 'good'], chr(10)), '') AS text
         |  FROM fin""".stripMargin,
      minWords = 8L)

  private lazy val mainContentExtractSql: String =
    s"""WITH $mainContentCtes
       |SELECT doc_id, CAST(len(bt) AS BIGINT) AS n_blocks,
       |  CAST(len([x FOR x IN fn IF x = 'good']) AS BIGINT) AS n_kept,
       |  COALESCE(array_to_string([bt[i] FOR i IN range(1, len(bt) + 1) IF fn[i] = 'good'], chr(10)), '') AS content
       |FROM fin ORDER BY doc_id""".stripMargin

  private lazy val mainContentBlocksSql: String =
    s"""WITH $mainContentCtes,
       |ix AS (SELECT doc_id, unnest(range(1, len(bt) + 1)) AS bi FROM fin)
       |SELECT doc_id, CAST(ix.bi AS BIGINT) AS block_idx,
       |  f.nw[ix.bi] AS n_words, f.ld[ix.bi] AS link_density,
       |  f.sf[ix.bi] AS stop_frac, f.cls[ix.bi] AS cls, f.fn[ix.bi] AS "final"
       |FROM ix JOIN fin f USING (doc_id)
       |ORDER BY doc_id, block_idx""".stripMargin

  private lazy val gopherQualitySql: String = {
    def sqlLit(s: String): String =
      s.split("\n", -1).map(p => "'" + p.replace("'", "''") + "'")
        .mkString(" || chr(10) || ")
    def branchExpr(segs: Seq[String]): String =
      segs.map(sqlLit).mkString(" || CAST(doc_id AS VARCHAR) || ")
    val cases = graft.queries.Queries.GopherQualityBranches.zipWithIndex
      .map { case (segs, i) => s"WHEN $i THEN ${branchExpr(segs)}" }
      .mkString("\n      ")
    gopherMetricSql("",
      s"""SELECT doc_id, CASE doc_id % 9
         |      $cases
         |    END AS text
         |  FROM documents""".stripMargin)
  }

  /** The generic Gopher Table A1 FORMAT-metric tail over any
    * `(doc_id, text)` input CTE (`gdSql`; `leading` prepends extra
    * CTEs — q213 chains the main-content extraction in front).
    * `minWords` mirrors the engine's tunable threshold (q213 tunes it
    * to the fixture's content size; everything else at the defaults).
    */
  private def gopherMetricSql(leading: String, gdSql: String,
      minWords: Long = 50L): String =
    s"""WITH ${leading}gd AS MATERIALIZED (
       |  $gdSql
       |),
       |t AS MATERIALIZED (
       |  SELECT doc_id, text,
       |    string_split(text, chr(10)) AS ln,
       |    list_filter(string_split(replace(text, chr(10), ' '), ' '),
       |      x -> len(x) > 0) AS tk
       |  FROM gd
       |),
       |m AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(tk) AS BIGINT) AS n_words,
       |    CAST(COALESCE(list_sum([length(x) FOR x IN tk]), 0) AS BIGINT) AS tok_chars,
       |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hashes,
       |    CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT)
       |      + CAST(length(text) - length(replace(text, '…', '')) AS BIGINT) AS ellipses,
       |    CAST(len(ln) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(ln, l -> starts_with(ltrim(l), '• ')
       |      OR starts_with(ltrim(l), '- ')
       |      OR starts_with(ltrim(l), '* '))) AS BIGINT) AS bullet_lines,
       |    CAST(len(list_filter(ln, l -> ends_with(rtrim(l), '...')
       |      OR ends_with(rtrim(l), '…'))) AS BIGINT) AS ell_lines,
       |    CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
       |    CAST(len(list_intersect(list_distinct([lower(x) FOR x IN tk]),
       |      ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits
       |  FROM t
       |)
       |SELECT doc_id, n_words, mean_word_len, hash_word_ratio,
       |  ellipsis_word_ratio, bullet_line_frac, ellipsis_line_frac,
       |  alpha_word_frac, stop_hits,
       |  (n_words >= $minWords AND n_words <= 100000
       |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |   AND hash_word_ratio <= 0.1 AND ellipsis_word_ratio <= 0.1
       |   AND bullet_line_frac <= 0.90 AND ellipsis_line_frac <= 0.30
       |   AND alpha_word_frac >= 0.80 AND stop_hits >= 2) AS pass
       |FROM (
       |  SELECT doc_id, n_words,
       |    CASE WHEN n_words > 0 THEN ROUND(CAST(tok_chars AS DOUBLE) / CAST(n_words AS DOUBLE), 6) ELSE 0.0 END AS mean_word_len,
       |    CASE WHEN n_words > 0 THEN ROUND(CAST(hashes AS DOUBLE) / CAST(n_words AS DOUBLE), 6) ELSE 0.0 END AS hash_word_ratio,
       |    CASE WHEN n_words > 0 THEN ROUND(CAST(ellipses AS DOUBLE) / CAST(n_words AS DOUBLE), 6) ELSE 0.0 END AS ellipsis_word_ratio,
       |    ROUND(CAST(bullet_lines AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) AS bullet_line_frac,
       |    ROUND(CAST(ell_lines AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) AS ellipsis_line_frac,
       |    CASE WHEN n_words > 0 THEN ROUND(CAST(alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE), 6) ELSE 0.0 END AS alpha_word_frac,
       |    stop_hits
       |  FROM m
       |)
       |ORDER BY doc_id""".stripMargin

  /** q205: the capped-prefix repetition replay — q198's corpus plus
    * planted spam/extra-line docs, lines sliced to 4 FIRST, tokens of
    * the line-capped text sliced to 64 SECOND, the q198 metrics over
    * those prefixes, and the `truncated` flag from the uncapped
    * counts.
    */
  private lazy val cappedRepetitionSql: String =
    s"""WITH d0 AS MATERIALIZED (
       |  SELECT doc_id,
       |    'nav home about contact' || chr(10) || text || chr(10) ||
       |    CASE WHEN doc_id % 4 = 0 THEN 'nav home about contact'
       |         ELSE 'footer f' || CAST(doc_id AS VARCHAR) END || chr(10) ||
       |    CASE WHEN doc_id % 5 = 0
       |         THEN 'buy now buy now buy now buy now buy now buy now'
       |         ELSE 'tail t' || CAST(doc_id AS VARCHAR) END ||
       |    CASE WHEN doc_id % 7 = 0 THEN ' ' || rtrim(repeat('spam token ', 60))
       |         ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 0
       |         THEN chr(10) || 'extra alpha line' || chr(10) || 'extra beta line'
       |         ELSE '' END AS text
       |  FROM documents
       |),
       |dc AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_slice(string_split(text, chr(10)), 1, 4) AS lnc,
       |    len(string_split(text, chr(10))) AS n_lines_all
       |  FROM d0
       |),
       |t AS MATERIALIZED (
       |  SELECT doc_id, lnc,
       |    array_to_string(lnc, chr(10)) AS text,
       |    list_slice(tk_all, 1, 64) AS tk,
       |    (n_lines_all > 4 OR len(tk_all) > 64) AS truncated
       |  FROM (
       |    SELECT doc_id, lnc, n_lines_all,
       |      list_filter(string_split(replace(array_to_string(lnc, chr(10)),
       |        chr(10), ' '), ' '), x -> len(x) > 0) AS tk_all
       |    FROM dc)
       |),
       |l AS (SELECT doc_id, unnest(lnc) AS line FROM dc),
       |lc AS MATERIALIZED (
       |  SELECT doc_id, line, CAST(COUNT(*) AS BIGINT) AS c FROM l GROUP BY 1, 2
       |),
       |lm AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(SUM(c) AS BIGINT) AS n_lines,
       |    ROUND(CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS dup_line_frac,
       |    CASE WHEN SUM(c * length(line)) > 0 THEN
       |      ROUND(CAST(SUM(CASE WHEN c >= 2 THEN c * length(line) ELSE 0 END) AS DOUBLE) /
       |            CAST(SUM(c * length(line)) AS DOUBLE), 6)
       |    ELSE 0.0 END AS dup_line_char_frac
       |  FROM lc GROUP BY doc_id
       |),
       |g2 AS (
       |  SELECT doc_id,
       |    array_to_string(tk[CAST(i AS BIGINT):CAST(i + 1 AS BIGINT)], ' ') AS g
       |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM t)
       |),
       |g2c AS MATERIALIZED (
       |  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM g2 GROUP BY 1, 2
       |),
       |top2 AS MATERIALIZED (
       |  SELECT x.doc_id,
       |    ROUND(CAST(x.c * length(x.g) AS DOUBLE) /
       |          CAST(length(t2.text) AS DOUBLE), 6) AS top2
       |  FROM (SELECT doc_id, g, c,
       |          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
       |        FROM g2c) x
       |  JOIN t t2 ON t2.doc_id = x.doc_id
       |  WHERE x.rn = 1
       |),
       |g5 AS MATERIALIZED (
       |  SELECT doc_id, i,
       |    array_to_string(tk[CAST(i AS BIGINT):CAST(i + 4 AS BIGINT)], ' ') AS w
       |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 3)) AS i FROM t)
       |),
       |g5d AS MATERIALIZED (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, w, COUNT(*) AS c FROM g5 GROUP BY 1, 2) WHERE c >= 2
       |),
       |cpos AS MATERIALIZED (
       |  SELECT DISTINCT g5.doc_id, g5.i + o.off AS pos
       |  FROM g5 JOIN g5d ON g5d.doc_id = g5.doc_id AND g5d.w = g5.w
       |  CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS off) o
       |),
       |cov AS MATERIALIZED (
       |  SELECT c.doc_id,
       |    CAST(SUM(length(t.tk[CAST(c.pos AS BIGINT)])) AS BIGINT) AS cc
       |  FROM cpos c JOIN t ON t.doc_id = c.doc_id GROUP BY 1
       |),
       |tkc AS (
       |  SELECT doc_id,
       |    CAST(COALESCE(list_sum([length(x) FOR x IN tk]), 0) AS BIGINT) AS n
       |  FROM t
       |)
       |SELECT doc_id, n_lines, dup_line_frac, dup_line_char_frac,
       |  top_2gram_char_frac, dup_5gram_char_frac, truncated,
       |  (dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
       |   AND top_2gram_char_frac <= 0.20
       |   AND dup_5gram_char_frac <= 0.15) AS pass
       |FROM (
       |  SELECT lm.doc_id, lm.n_lines, lm.dup_line_frac, lm.dup_line_char_frac,
       |    COALESCE(top2.top2, 0.0) AS top_2gram_char_frac,
       |    CASE WHEN tkc.n > 0 THEN
       |      ROUND(CAST(COALESCE(cov.cc, 0) AS DOUBLE) / CAST(tkc.n AS DOUBLE), 6)
       |    ELSE 0.0 END AS dup_5gram_char_frac,
       |    tr.truncated
       |  FROM lm JOIN tkc ON tkc.doc_id = lm.doc_id
       |  JOIN (SELECT doc_id, truncated FROM t) tr ON tr.doc_id = lm.doc_id
       |  LEFT JOIN top2 ON top2.doc_id = lm.doc_id
       |  LEFT JOIN cov ON cov.doc_id = lm.doc_id
       |)
       |ORDER BY doc_id""".stripMargin

  private lazy val gopherRepetitionSql: String =
    s"""WITH d AS MATERIALIZED (
           |  SELECT doc_id,
           |    'nav home about contact' || chr(10) || text || chr(10) ||
           |    CASE WHEN doc_id % 4 = 0 THEN 'nav home about contact'
           |         ELSE 'footer f' || CAST(doc_id AS VARCHAR) END || chr(10) ||
           |    CASE WHEN doc_id % 5 = 0
           |         THEN 'buy now buy now buy now buy now buy now buy now'
           |         ELSE 'tail t' || CAST(doc_id AS VARCHAR) END AS text
           |  FROM documents
           |),
           |l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM d),
           |lc AS MATERIALIZED (
           |  SELECT doc_id, line, CAST(COUNT(*) AS BIGINT) AS c FROM l GROUP BY 1, 2
           |),
           |lm AS MATERIALIZED (
           |  SELECT doc_id,
           |    CAST(SUM(c) AS BIGINT) AS n_lines,
           |    ROUND(CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS dup_line_frac,
           |    CASE WHEN SUM(c * length(line)) > 0 THEN
           |      ROUND(CAST(SUM(CASE WHEN c >= 2 THEN c * length(line) ELSE 0 END) AS DOUBLE) /
           |            CAST(SUM(c * length(line)) AS DOUBLE), 6)
           |    ELSE 0.0 END AS dup_line_char_frac
           |  FROM lc GROUP BY doc_id
           |),
           |t AS MATERIALIZED (
           |  SELECT doc_id, text,
           |    list_filter(string_split(replace(text, chr(10), ' '), ' '),
           |      x -> len(x) > 0) AS tk
           |  FROM d
           |),
           |g2 AS (
           |  SELECT doc_id,
           |    array_to_string(tk[CAST(i AS BIGINT):CAST(i + 1 AS BIGINT)], ' ') AS g
           |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM t)
           |),
           |g2c AS MATERIALIZED (
           |  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM g2 GROUP BY 1, 2
           |),
           |top2 AS MATERIALIZED (
           |  SELECT x.doc_id,
           |    ROUND(CAST(x.c * length(x.g) AS DOUBLE) /
           |          CAST(length(t2.text) AS DOUBLE), 6) AS top2
           |  FROM (SELECT doc_id, g, c,
           |          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
           |        FROM g2c) x
           |  JOIN t t2 ON t2.doc_id = x.doc_id
           |  WHERE x.rn = 1
           |),
           |g5 AS MATERIALIZED (
           |  SELECT doc_id, i,
           |    array_to_string(tk[CAST(i AS BIGINT):CAST(i + 4 AS BIGINT)], ' ') AS w
           |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 3)) AS i FROM t)
           |),
           |g5d AS MATERIALIZED (
           |  SELECT doc_id, w FROM (
           |    SELECT doc_id, w, COUNT(*) AS c FROM g5 GROUP BY 1, 2) WHERE c >= 2
           |),
           |cpos AS MATERIALIZED (
           |  SELECT DISTINCT g5.doc_id, g5.i + o.off AS pos
           |  FROM g5 JOIN g5d ON g5d.doc_id = g5.doc_id AND g5d.w = g5.w
           |  CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS off) o
           |),
           |cov AS MATERIALIZED (
           |  SELECT c.doc_id,
           |    CAST(SUM(length(t.tk[CAST(c.pos AS BIGINT)])) AS BIGINT) AS cc
           |  FROM cpos c JOIN t ON t.doc_id = c.doc_id GROUP BY 1
           |),
           |tkc AS (
           |  SELECT doc_id,
           |    CAST(COALESCE(list_sum([length(x) FOR x IN tk]), 0) AS BIGINT) AS n
           |  FROM t
           |)
           |SELECT doc_id, n_lines, dup_line_frac, dup_line_char_frac,
           |  top_2gram_char_frac, dup_5gram_char_frac,
           |  (dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
           |   AND top_2gram_char_frac <= 0.20
           |   AND dup_5gram_char_frac <= 0.15) AS pass
           |FROM (
           |  SELECT lm.doc_id, lm.n_lines, lm.dup_line_frac, lm.dup_line_char_frac,
           |    COALESCE(top2.top2, 0.0) AS top_2gram_char_frac,
           |    CASE WHEN tkc.n > 0 THEN
           |      ROUND(CAST(COALESCE(cov.cc, 0) AS DOUBLE) / CAST(tkc.n AS DOUBLE), 6)
           |    ELSE 0.0 END AS dup_5gram_char_frac
           |  FROM lm JOIN tkc ON tkc.doc_id = lm.doc_id
           |  LEFT JOIN top2 ON top2.doc_id = lm.doc_id
           |  LEFT JOIN cov ON cov.doc_id = lm.doc_id
           |)
           |ORDER BY doc_id""".stripMargin

  /** q217: the COMPLETE Table A1 repetition replay — q198's line/
    * gram machinery widened to paragraphs, top-{2,3,4} and
    * dup-{5..10}; the per-n CTE families are generated from the SAME
    * (n, threshold) tables [[graft.operators.Repetition]] uses, so
    * operator and oracle cannot drift on n ranges or thresholds.
    */
  private lazy val fullRepetitionSql: String = {
    val ten = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val topNs = graft.operators.Repetition.TopNGramThresholds
    val dupNs = graft.operators.Repetition.DupNGramThresholds
    val nn = "chr(10) || chr(10)"
    val fixture =
      s"""d AS MATERIALIZED (
         |  SELECT doc_id,
         |    'intro ' || text || $nn ||
         |    CASE WHEN doc_id % 3 = 0 THEN 'shared paragraph body repeated'
         |         ELSE 'solo para ' || CAST(doc_id AS VARCHAR) END || $nn ||
         |    CASE WHEN doc_id % 3 = 0 THEN 'shared paragraph body repeated'
         |         ELSE 'other para ' || CAST(doc_id AS VARCHAR) END || $nn ||
         |    CASE WHEN doc_id % 7 = 0 THEN '$ten $ten'
         |         ELSE 'tail ten ' || CAST(doc_id AS VARCHAR) END || $nn ||
         |    CASE WHEN doc_id % 5 = 0
         |         THEN 'buy now buy now buy now buy now buy now buy now'
         |         ELSE 'end e' || CAST(doc_id AS VARCHAR) END AS text
         |  FROM documents
         |)""".stripMargin
    def dupGroupCtes(src: String, unit: String, cn: String,
        mn: String): String =
      s"""${cn} AS MATERIALIZED (
         |  SELECT doc_id, $unit, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM $src GROUP BY 1, 2
         |),
         |$mn AS MATERIALIZED (
         |  SELECT doc_id,
         |    CAST(SUM(c) AS BIGINT) AS n_units,
         |    ROUND(CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS dup_frac,
         |    CASE WHEN SUM(c * length($unit)) > 0 THEN
         |      ROUND(CAST(SUM(CASE WHEN c >= 2 THEN c * length($unit) ELSE 0 END) AS DOUBLE) /
         |            CAST(SUM(c * length($unit)) AS DOUBLE), 6)
         |    ELSE 0.0 END AS dup_char_frac
         |  FROM $cn GROUP BY doc_id
         |)""".stripMargin
    def gramSrc(n: Int, outCol: String): String =
      s"""(
         |  SELECT doc_id, i,
         |    array_to_string(tk[CAST(i AS BIGINT):CAST(i + ${n - 1} AS BIGINT)], ' ') AS $outCol
         |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - ${n - 2})) AS i FROM t)
         |)""".stripMargin
    val topCtes = topNs.map { case (n, _) =>
      s"""g${n}c AS MATERIALIZED (
         |  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM ${gramSrc(n, "g")} GROUP BY 1, 2
         |),
         |top$n AS MATERIALIZED (
         |  SELECT x.doc_id,
         |    ROUND(CAST(x.c * length(x.g) AS DOUBLE) /
         |          CAST(length(t2.text) AS DOUBLE), 6) AS v
         |  FROM (SELECT doc_id, g, c,
         |          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
         |        FROM g${n}c) x
         |  JOIN t t2 ON t2.doc_id = x.doc_id
         |  WHERE x.rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    val dupCtes = dupNs.map { case (n, _) =>
      s"""w$n AS MATERIALIZED (
         |  SELECT doc_id, i, w FROM ${gramSrc(n, "w")}
         |),
         |w${n}d AS MATERIALIZED (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id, w, COUNT(*) AS c FROM w$n GROUP BY 1, 2) WHERE c >= 2
         |),
         |cp$n AS MATERIALIZED (
         |  SELECT DISTINCT w$n.doc_id, w$n.i + o.off AS pos
         |  FROM w$n JOIN w${n}d ON w${n}d.doc_id = w$n.doc_id AND w${n}d.w = w$n.w
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${n - 1})) AS off) o
         |),
         |cov$n AS MATERIALIZED (
         |  SELECT c.doc_id,
         |    CAST(SUM(length(t.tk[CAST(c.pos AS BIGINT)])) AS BIGINT) AS cc
         |  FROM cp$n c JOIN t ON t.doc_id = c.doc_id GROUP BY 1
         |)""".stripMargin
    }.mkString(",\n")
    val topSel = topNs.map { case (n, _) =>
      s"COALESCE(top$n.v, 0.0) AS top_${n}gram_char_frac" }.mkString(",\n    ")
    val dupSel = dupNs.map { case (n, _) =>
      s"""CASE WHEN tkc.n > 0 THEN
         |      ROUND(CAST(COALESCE(cov$n.cc, 0) AS DOUBLE) / CAST(tkc.n AS DOUBLE), 6)
         |    ELSE 0.0 END AS dup_${n}gram_char_frac""".stripMargin
    }.mkString(",\n    ")
    val joins = (topNs.map { case (n, _) =>
      s"LEFT JOIN top$n ON top$n.doc_id = lm.doc_id" } ++
      dupNs.map { case (n, _) =>
        s"LEFT JOIN cov$n ON cov$n.doc_id = lm.doc_id" }).mkString("\n  ")
    val metricCols = (Seq("n_paras", "dup_para_frac", "dup_para_char_frac") ++
      topNs.map { case (n, _) => s"top_${n}gram_char_frac" } ++
      dupNs.map { case (n, _) => s"dup_${n}gram_char_frac" }).mkString(", ")
    val pass = (Seq(
      s"dup_line_frac <= ${Repetition.MaxDupLineFrac}",
      s"dup_line_char_frac <= ${Repetition.MaxDupLineCharFrac}",
      s"dup_para_frac <= ${Repetition.MaxDupParaFrac}",
      s"dup_para_char_frac <= ${Repetition.MaxDupParaCharFrac}") ++
      topNs.map { case (n, t) => s"top_${n}gram_char_frac <= $t" } ++
      dupNs.map { case (n, t) => s"dup_${n}gram_char_frac <= $t" })
      .mkString("\n   AND ")
    s"""WITH $fixture,
       |l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS u FROM d),
       |${dupGroupCtes("l", "u", "lcnt", "lmet")},
       |p AS (
       |  SELECT doc_id, u FROM (
       |    SELECT doc_id, unnest(string_split(text, $nn)) AS u FROM d)
       |  WHERE length(u) > 0
       |),
       |${dupGroupCtes("p", "u", "pcnt", "pmet")},
       |lm AS (
       |  SELECT doc_id, n_units AS n_lines, dup_frac AS dup_line_frac,
       |    dup_char_frac AS dup_line_char_frac
       |  FROM lmet
       |),
       |pm AS (
       |  SELECT doc_id, n_units AS n_paras, dup_frac AS dup_para_frac,
       |    dup_char_frac AS dup_para_char_frac
       |  FROM pmet
       |),
       |t AS MATERIALIZED (
       |  SELECT doc_id, text,
       |    list_filter(string_split(replace(text, chr(10), ' '), ' '),
       |      x -> len(x) > 0) AS tk
       |  FROM d
       |),
       |tkc AS (
       |  SELECT doc_id,
       |    CAST(COALESCE(list_sum([length(x) FOR x IN tk]), 0) AS BIGINT) AS n
       |  FROM t
       |),
       |$topCtes,
       |$dupCtes
       |SELECT doc_id, n_lines, dup_line_frac, dup_line_char_frac,
       |  $metricCols,
       |  ($pass) AS pass
       |FROM (
       |  SELECT lm.doc_id, lm.n_lines, lm.dup_line_frac, lm.dup_line_char_frac,
       |    COALESCE(pm.n_paras, 0) AS n_paras,
       |    COALESCE(pm.dup_para_frac, 0.0) AS dup_para_frac,
       |    COALESCE(pm.dup_para_char_frac, 0.0) AS dup_para_char_frac,
       |    $topSel,
       |    $dupSel
       |  FROM lm JOIN tkc ON tkc.doc_id = lm.doc_id
       |  LEFT JOIN pm ON pm.doc_id = lm.doc_id
       |  $joins
       |)
       |ORDER BY doc_id""".stripMargin
  }
}
