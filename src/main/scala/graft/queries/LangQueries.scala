package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.LangId

/** Trained language-ID keys (r12 verdict Next #4). The corpus's own
  * `lang` labels are uncorrelated with its synthetic text (measured:
  * NB accuracy 0.44 vs 0.43 majority baseline), so the gate runs on the
  * planted-fixture discipline instead: [[LangId.fixtureTable]] derives a
  * deterministic 4-language corpus from `documents` (class = id % 4,
  * words drawn from overlapping 12-letter class alphabets — every byte
  * md5-derived, both engines rebuild identical strings), trains the
  * hashed-trigram Naive-Bayes model on the id%8<4 half, and predicts every
  * row. `lang_id` full hash-match replays TRAINING (per-class bucket
  * grid, Laplace micro-nat freeze) and SCORING (integer sums, argmax
  * with the asc-name tie) end-to-end in SQL; `lang_id_accuracy` gates
  * held-out (id%8>=4) generalization at 0.95.
  */
object LangQueries {

  private val B = 1024

  private val fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()
  private def fixtureFor(s: org.apache.spark.sql.SparkSession, dir: String) =
    fixtures.computeIfAbsent(sessionKey(s, dir),
      _ => LangId.fixtureTable(table(s, dir, "documents")).localCheckpoint(true))

  private val models =
    new java.util.concurrent.ConcurrentHashMap[String, LangId.Model]()
  private def modelFor(s: org.apache.spark.sql.SparkSession, dir: String) =
    models.computeIfAbsent(dir,
      _ => LangId.fit(fixtureFor(s, dir), "text", "lang_label", buckets = B))

  val defs: Map[String, Q] = Map(
    // Train + predict, both replayed by the oracle: any drift in the
    // gram extraction, bucket hash, Laplace freeze, prior, integer
    // summation or tie rule breaks the hash.
    "lang_id" -> ((s, dir) =>
      LangId.classify(fixtureFor(s, dir), "doc_id", "text", modelFor(s, dir))),

    // Held-out accuracy gate (driver-checked recall_frame shape): the
    // model must actually discriminate the four planted languages on
    // rows it never trained on.
    "lang_id_accuracy" -> ((s, dir) => {
      val preds = LangId.classify(fixtureFor(s, dir), "doc_id", "text",
        modelFor(s, dir))
      val heldout = fixtureFor(s, dir).filter(col("lang_label").isNull)
        .select(col("doc_id"), col("lang_true"))
      heldout.join(preds, Seq("doc_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lang_pred") === col("lang_true"), 1L).otherwise(0L)).as("hits"))
        .select(col("n_docs"), lit(0.95).as("acc_floor"),
          (col("n_docs") > 0 &&
            col("hits").cast("double") >= lit(0.95) * col("n_docs")).as("acc_ok"))
    }))

  /** Fixture text + gram + model-training replay ending in
    * `lpick(doc_id, c, micro, rn)`. */
  private val langCtes =
    s"""ffx AS (SELECT doc_id, CAST(doc_id % 4 AS INT) AS c,
       |          (doc_id % 8 < 4) AS labeled FROM documents),
       |ftext AS (
       |  SELECT doc_id, c, labeled,
       |    array_to_string(list_transform(generate_series(0, 39), j ->
       |      array_to_string(list_transform(generate_series(0,
       |          2 + CAST(('0x' || substring(md5('wl:' || CAST(doc_id AS VARCHAR) || ':' ||
       |            CAST(j AS VARCHAR)), 1, 2)) AS BIGINT) % 4), k ->
       |        chr(CAST(97 + 4 * c +
       |          CAST(('0x' || substring(md5('ch:' || CAST(doc_id AS VARCHAR) || ':' ||
       |            CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 2)) AS BIGINT) % 12
       |          AS INT))), '')), ' ') AS text
       |  FROM ffx),
       |fg AS (SELECT doc_id, c, labeled,
       |         unnest(list_transform(generate_series(1, greatest(length(text) - 2, 0)),
       |           i -> substring(text, CAST(i AS INT), 3))) AS g
       |       FROM ftext),
       |fb AS (SELECT doc_id, c, labeled,
       |         CAST(('0x' || substring(md5(g), 1, 4)) AS BIGINT) % $B AS b
       |       FROM fg),
       |lcnt AS (SELECT c, b, count(*) AS n FROM fb WHERE labeled GROUP BY c, b),
       |ltot AS (SELECT c, sum(n) AS t FROM lcnt GROUP BY c),
       |ldocs AS (SELECT c, count(*) AS dn FROM ffx WHERE labeled GROUP BY c),
       |lgrid AS (SELECT t.c, gb.b FROM ltot t,
       |            (SELECT unnest(generate_series(0, ${B - 1})) AS b) gb),
       |lw AS (SELECT g.c, g.b,
       |         CAST(floor(ln((coalesce(n.n, 0) + 1.0) / (t.t + $B)) * 1e6 + 0.5) AS BIGINT) AS wm
       |       FROM lgrid g
       |       LEFT JOIN lcnt n ON n.c = g.c AND n.b = g.b
       |       JOIN ltot t ON t.c = g.c),
       |lpr AS (SELECT c, CAST(floor(ln(CAST(dn AS DOUBLE) /
       |          (SELECT sum(dn) FROM ldocs)) * 1e6 + 0.5) AS BIGINT) AS pm
       |        FROM ldocs),
       |lgs AS (SELECT fb.doc_id, w.c AS pc, w.wm
       |        FROM fb JOIN lw w ON w.b = fb.b),
       |lds AS (SELECT doc_id, pc, sum(wm) AS s FROM lgs GROUP BY doc_id, pc),
       |lsc AS (SELECT f.doc_id, p.c AS pc,
       |          CAST(p.pm + coalesce(d.s, 0) AS BIGINT) AS micro
       |        FROM (SELECT DISTINCT doc_id FROM ffx) f
       |        CROSS JOIN lpr p
       |        LEFT JOIN lds d ON d.doc_id = f.doc_id AND d.pc = p.c),
       |lpick AS (SELECT doc_id, pc AS c, micro,
       |            row_number() OVER (PARTITION BY doc_id
       |              ORDER BY micro DESC, pc ASC) AS rn
       |          FROM lsc)""".stripMargin

  val oracles: Map[String, String] = Map(
    "lang_id" ->
      s"""WITH $langCtes
         |SELECT doc_id, 'lng' || CAST(c AS VARCHAR) AS lang_pred,
         |       micro AS best_micro
         |FROM lpick WHERE rn = 1""".stripMargin,

    "lang_id_accuracy" ->
      """SELECT count(*) AS n_docs, CAST(0.95 AS DOUBLE) AS acc_floor,
        |       TRUE AS acc_ok
        |FROM documents WHERE doc_id % 8 >= 4""".stripMargin)
}
