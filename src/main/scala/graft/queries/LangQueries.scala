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

    // The e2e chain with BOTH trained classifiers deployed (r13 verdict
    // Next #2): stage 1 gates on the model-based quality score
    // (micro >= 0, the CCNet shape) AND the TRAINED language-ID's
    // prediction over the corpus frame (fixture-trained model, scored
    // inline — no join), replacing the stopword heuristic in a composed
    // key; then the standard dedup → decontamination → per-source quota
    // stages. The oracle replays language-model training, corpus
    // scoring, quality-weight estimation, quality scoring AND the
    // 4-stage chain — the full trained path, end to end.
    "pipeline_e2e_langid" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val w = PipelineQueries.qualityWeightsFor(s, dir)
      val (pred, _) = LangId.scoreCols(col("text"), modelFor(s, dir))
      val profiled = d.select(col("doc_id"), col("source"), col("text"))
        .withColumn("micro", graft.pipeline.Dsir.microScore(col("text"), w))
        .withColumn("lang_pred", pred)
        .localCheckpoint(true)
      val gated = profiled.filter(col("micro") >= 0L && col("lang_pred") === "lng3")
      val deduped = graft.pipeline.Dedup.exact(gated, "doc_id", "text")
      val decon = graft.pipeline.Decontamination.decontaminate(
        deduped.filter(col("doc_id") % 10 =!= 0),
        d.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", shingleSize = 3, minOverlap = 5)
      graft.pipeline.CorpusSampling.quotaSample(decon, "source", "doc_id",
          quota = 10, salt = "e2e", prefilterMargin = Some(4.0))
        .select(col("doc_id"), col("source"), col("lang_pred"),
          round(col("micro").cast("double") / 1e6, 6).as("q_model"))
    }),

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

  /** Corpus-frame scoring replay: trigrams of `documents.text` scored
    * against the fixture-trained `lw`/`lpr` model CTEs, ending in
    * `cpred(doc_id, lang_pred)`. */
  private val corpusScoreCtes =
    s"""cg AS (SELECT doc_id,
       |        unnest(list_transform(generate_series(1, greatest(length(text) - 2, 0)),
       |          i -> substring(text, CAST(i AS INT), 3))) AS g
       |      FROM documents),
       |cb AS (SELECT doc_id, CAST(('0x' || substring(md5(g), 1, 4)) AS BIGINT) % $B AS b
       |       FROM cg),
       |cgs AS (SELECT cb.doc_id, w.c AS pc, w.wm FROM cb JOIN lw w ON w.b = cb.b),
       |cds AS (SELECT doc_id, pc, sum(wm) AS s FROM cgs GROUP BY doc_id, pc),
       |csc AS (SELECT f.doc_id, p2.c AS pc,
       |          CAST(p2.pm + coalesce(d2.s, 0) AS BIGINT) AS micro
       |        FROM (SELECT doc_id FROM documents) f
       |        CROSS JOIN lpr p2
       |        LEFT JOIN cds d2 ON d2.doc_id = f.doc_id AND d2.pc = p2.c),
       |cpred AS (SELECT doc_id, 'lng' || CAST(c AS VARCHAR) AS lang_pred
       |          FROM (SELECT doc_id, pc AS c, row_number() OVER (
       |                  PARTITION BY doc_id ORDER BY micro DESC, pc ASC) AS rn
       |                FROM csc) z
       |          WHERE rn = 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "lang_id" ->
      s"""WITH $langCtes
         |SELECT doc_id, 'lng' || CAST(c AS VARCHAR) AS lang_pred,
         |       micro AS best_micro
         |FROM lpick WHERE rn = 1""".stripMargin,

    // the trained-classifier e2e: language model training (lw/lpr) +
    // corpus scoring (cpred) + quality model (qsc) + the 4-stage chain
    "pipeline_e2e_langid" ->
      s"""WITH $langCtes,
         |$corpusScoreCtes,
         |${PipelineQueries.qualityModelCtes},
         |eq AS (SELECT d.doc_id, d.source, d.text, s.micro, p.lang_pred
         |       FROM documents d
         |       JOIN qsc s ON s.doc_id = d.doc_id
         |       JOIN cpred p ON p.doc_id = d.doc_id),
         |ekept AS (SELECT doc_id, source, text, micro, lang_pred FROM eq
         |          WHERE micro >= 0 AND lang_pred = 'lng3'),
         |edd AS (SELECT k.doc_id, k.source, k.text, k.micro, k.lang_pred FROM ekept k
         |        JOIN (SELECT min(doc_id) AS doc_id FROM ekept GROUP BY md5(text)) m
         |          ON k.doc_id = m.doc_id),
         |etr AS (SELECT doc_id AS tid, unnest(${PipelineQueries.shSql("text")}) AS tok
         |        FROM edd WHERE doc_id % 10 != 0),
         |eev AS (SELECT doc_id AS eid, unnest(${PipelineQueries.shSql("text")}) AS tok
         |        FROM documents WHERE doc_id % 10 = 0),
         |eov AS (SELECT tid, eid, count(*) AS ov FROM etr JOIN eev USING (tok)
         |        GROUP BY tid, eid),
         |ebad AS (SELECT tid FROM eov GROUP BY tid HAVING max(ov) >= 5),
         |edecon AS (SELECT doc_id, source, micro, lang_pred FROM edd
         |           WHERE doc_id % 10 != 0
         |             AND doc_id NOT IN (SELECT tid FROM ebad))
         |SELECT doc_id, source, lang_pred,
         |  round(CAST(micro AS DOUBLE) / 1e6, 6) AS q_model
         |FROM (SELECT doc_id, source, micro, lang_pred, row_number() OVER (
         |    PARTITION BY source
         |    ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':e2e'),1,15)) AS BIGINT)
         |      / CAST(1152921504606846976 AS DOUBLE), doc_id) AS rn
         |  FROM edecon)
         |WHERE rn <= 10""".stripMargin,

    "lang_id_accuracy" ->
      """SELECT count(*) AS n_docs, CAST(0.95 AS DOUBLE) AS acc_floor,
        |       TRUE AS acc_ok
        |FROM documents WHERE doc_id % 8 >= 4""".stripMargin)
}
