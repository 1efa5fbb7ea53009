package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.Unigram

/** Unigram-LM tokenizer keys (Kudo 1804.10959, hard-EM re-expression —
  * see [[graft.pipeline.Unigram]]). Both keys are FULL hash-match: the
  * frozen integer micro-nat costs make every training round and the
  * final Viterbi encode exact, and the oracle replays the whole loop —
  * seed substring counts, two hard-EM rounds (each as a recursive-CTE
  * enumeration of all segmentations per distinct word, ranked by
  * `(cost, zero-padded reversed-starts key)` — provably the DP's
  * smallest-last-start tie rule), the final prune, and the per-document
  * pipe-framed rendering. The enumeration is bounded by the
  * `MaxWordLen = 24` training cap (compositions with parts ≤ 5), and the
  * word frame is DISTINCT words — tiny at any corpus scale.
  */
object UnigramQueries {

  private val L = Unigram.DefaultMaxPieceLen
  private val S = Unigram.DefaultSeedSize
  private val V = Unigram.DefaultVocabSize
  private val W = Unigram.MaxWordLen
  private val Unk = graft.functions.UnigramCosts.UnkCost
  private val ws = """[ \t\n\x0b\f\r]+"""

  val defs: Map[String, Q] = Map(
    // Final vocabulary after seed → 2 hard-EM rounds → prune: one row
    // per piece with its usage count and frozen micro-nat cost.
    "unigram_vocab" -> ((s, dir) => {
      import s.implicits._
      Unigram.fitFor(s, dir).toDF("piece", "cnt", "cost_micro")
    }),

    // Viterbi encode of every document under the trained vocabulary:
    // one narrow codegen kernel pass, pipe-framed per word.
    "unigram_encode" -> ((s, dir) =>
      Unigram.encode(table(s, dir, "documents"), "doc_id", "text",
        Unigram.fitFor(s, dir))))

  /** One segmentation round: enumerate all compositions of each distinct
    * word into pieces of length ≤ L (recursive CTE), cost from
    * `$costCte` with the UNK fallback, winner per word by
    * `(cost, reversed-starts key)`, piece usage weighted by word freq. */
  private def segBlock(name: String, costCte: String): String =
    s"""$name(word, freq, pos, cost, starts) AS (
       |  SELECT word, freq, 0, CAST(0 AS BIGINT), CAST([] AS BIGINT[]) FROM uw
       |  UNION ALL
       |  SELECT p.word, p.freq, CAST(p.pos + ls.l AS INT),
       |         p.cost + coalesce(c.cost, CAST($Unk AS BIGINT) * ls.l),
       |         list_append(p.starts, CAST(p.pos AS BIGINT))
       |  FROM $name p
       |  JOIN (SELECT unnest(generate_series(1, $L)) AS l) ls ON p.pos + ls.l <= length(p.word)
       |  LEFT JOIN $costCte c ON c.piece = substring(p.word, CAST(p.pos + 1 AS INT), CAST(ls.l AS INT))),
       |${name}_win AS MATERIALIZED (
       |  SELECT word, freq, starts FROM (
       |    SELECT word, freq, starts, row_number() OVER (PARTITION BY word ORDER BY cost,
       |      array_to_string(list_transform(list_reverse(starts), x -> lpad(CAST(x AS VARCHAR), 2, '0')), '')) AS rn
       |    FROM $name WHERE pos = length(word)) WHERE rn = 1),
       |${name}_u AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT word, freq, unnest(list_transform(generate_series(1, len(starts)),
       |      i -> substring(word, CAST(starts[i] + 1 AS INT),
       |        CAST((CASE WHEN i = len(starts) THEN length(word) ELSE starts[i + 1] END) - starts[i] AS INT)))) AS piece
       |    FROM ${name}_win)
       |  GROUP BY piece)""".stripMargin

  /** Frozen micro-nat costs of a `(piece, cnt)` vocabulary CTE. */
  private def costBlock(name: String, vocabCte: String): String =
    s"""$name AS MATERIALIZED (SELECT piece,
       |  CAST(floor(ln(CAST(t.t AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
       |    - CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS cost
       |  FROM $vocabCte, (SELECT sum(cnt) AS t FROM $vocabCte) t)""".stripMargin

  /** Shared training replay: words → seed → round 1 → round 2 → prune. */
  private val trainCtes: String =
    s"""uw AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '$ws'), x -> x != '')) AS word
       |    FROM documents)
       |  WHERE length(word) <= $W AND word NOT LIKE '%|%' GROUP BY word),
       |usub AS MATERIALIZED (
       |  SELECT substring(word, CAST(i AS INT), CAST(l AS INT)) AS piece,
       |         CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (SELECT word, freq, unnest(generate_series(1, length(word))) AS i FROM uw) wi,
       |       (SELECT unnest(generate_series(1, $L)) AS l) ls
       |  WHERE i + l - 1 <= length(wi.word) GROUP BY 1),
       |usingles AS MATERIALIZED (SELECT piece, cnt FROM usub WHERE length(piece) = 1),
       |useed AS MATERIALIZED (
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
       |    FROM usub WHERE length(piece) >= 2) WHERE rn <= $S
       |  UNION ALL SELECT piece, cnt FROM usingles),
       |${costBlock("uc0", "useed")},
       |${segBlock("useg1", "uc0")},
       |uv1 AS MATERIALIZED (SELECT piece, cnt FROM useg1_u
       |        UNION ALL SELECT s.piece, CAST(1 AS BIGINT) FROM usingles s
       |        WHERE s.piece NOT IN (SELECT piece FROM useg1_u)),
       |${costBlock("uc1", "uv1")},
       |${segBlock("useg2", "uc1")},
       |uv2raw AS MATERIALIZED (SELECT piece, cnt FROM useg2_u
       |           UNION ALL SELECT s.piece, CAST(1 AS BIGINT) FROM usingles s
       |           WHERE s.piece NOT IN (SELECT piece FROM useg2_u)),
       |uv2 AS MATERIALIZED (
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
       |    FROM uv2raw WHERE length(piece) >= 2) WHERE rn <= $V
       |  UNION ALL SELECT piece, cnt FROM uv2raw WHERE length(piece) = 1),
       |${costBlock("uc2", "uv2")}""".stripMargin

  val oracles: Map[String, String] = Map(
    "unigram_vocab" ->
      s"""WITH RECURSIVE $trainCtes
         |SELECT v.piece, v.cnt, c.cost AS cost_micro
         |FROM uv2 v JOIN uc2 c USING (piece)""".stripMargin,

    "unigram_encode" ->
      s"""WITH RECURSIVE $trainCtes,
         |${segBlock("useg3", "uc2")},
         |uren AS MATERIALIZED (
         |  SELECT word, '|' || array_to_string(list_transform(generate_series(1, len(starts)),
         |    i -> substring(word, CAST(starts[i] + 1 AS INT),
         |      CAST((CASE WHEN i = len(starts) THEN length(word) ELSE starts[i + 1] END) - starts[i] AS INT))), '||') || '|' AS ren
         |  FROM useg3_win),
         |udtok AS MATERIALIZED (
         |  SELECT doc_id, ti, toks[ti] AS tok FROM (
         |    SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS ti FROM (
         |      SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '$ws'), x -> x != '') AS toks
         |      FROM documents))),
         |udrend AS (
         |  SELECT k.doc_id, k.ti,
         |    CASE WHEN length(k.tok) > $W THEN '|' || k.tok || '|' ELSE w.ren END AS ren
         |  FROM udtok k LEFT JOIN uren w ON w.word = k.tok
         |  WHERE k.tok NOT LIKE '%|%')
         |SELECT d.doc_id, coalesce(e.encoded, '') AS encoded
         |FROM documents d LEFT JOIN
         |  (SELECT doc_id, string_agg(ren, ' ' ORDER BY ti) AS encoded
         |   FROM udrend GROUP BY doc_id) e USING (doc_id)""".stripMargin)
}
