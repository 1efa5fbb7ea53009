package graft.queries

import org.apache.spark.sql.functions._

import graft.meta.Tags

/** Tag-dictionary query surface (SURVEY §2.2 tag predicates, §2.3 tag
  * broadcast join, VectorTags.cs). The dictionary is built distributed from
  * the documents' lang/source strings (sorted-order ids — declared
  * normalization), then joined back through encode and exploded into the
  * inverted index.
  */
object MetaQueries {

  val defs: Map[String, Q] = Map(
    // Encode both string columns through one shared dictionary (broadcast
    // joins), the distributed GetId path.
    "tag_lookup" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val dict = Tags.dictionaryFromColumns(d, col("lang"), col("source"))
      val enc1 = Tags.encode(d, col("lang"), dict, "lang_id")
      Tags.encode(enc1, col("source"), dict, "source_id")
        .select(col("doc_id"), col("lang_id"), col("source_id"))
    }),

    // tags SHORT[] membership predicate on a vector table —
    // array_contains is the distributed form of the reference's tag filter
    // (VectorTags.cs:171-194; SURVEY §2.2 tenancy/tag predicates).
    "tag_member" -> ((s, dir) =>
      table(s, dir, "embeddings")
        .withColumn("tags", array(
          (col("label") % 5).cast("short"), (col("vec_id") % 11).cast("short")))
        .filter(array_contains(col("tags"), lit(3.toShort)))
        .select(col("vec_id"), col("label"))),

    // Inverted tagId → ids map derived by explode (VectorTags.cs:171-194),
    // reduced to per-tag aggregates for an engine-stable result.
    "tag_inverted" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val dict = Tags.dictionaryFromColumns(d, col("lang"), col("source"))
      val enc = Tags.encode(
        Tags.encode(d, col("lang"), dict, "lang_id"), col("source"), dict, "source_id")
        .withColumn("tags", array(col("lang_id"), col("source_id")))
      Tags.invertedIndex(enc, "doc_id", "tags")
        .groupBy(col("tag_id"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
    }))

  private val dictCte =
    """dict AS (SELECT CAST(row_number() OVER (ORDER BY tag) AS SMALLINT) AS tag_id, tag
      |         FROM (SELECT DISTINCT lower(trim(lang)) AS tag FROM documents
      |               UNION SELECT DISTINCT lower(trim(source)) FROM documents))""".stripMargin

  val oracles: Map[String, String] = Map(
    "tag_lookup" ->
      s"""WITH $dictCte
         |SELECT d.doc_id AS doc_id, tl.tag_id AS lang_id, ts.tag_id AS source_id
         |FROM documents d
         |JOIN dict tl ON tl.tag = lower(trim(d.lang))
         |JOIN dict ts ON ts.tag = lower(trim(d.source))""".stripMargin,

    "tag_member" ->
      """SELECT vec_id, label FROM embeddings
        |WHERE list_contains([CAST(label % 5 AS SMALLINT), CAST(vec_id % 11 AS SMALLINT)],
        |                    CAST(3 AS SMALLINT))""".stripMargin,

    "tag_inverted" ->
      s"""WITH $dictCte,
         |enc AS (SELECT d.doc_id AS doc_id, tl.tag_id AS lang_id, ts.tag_id AS source_id
         |        FROM documents d
         |        JOIN dict tl ON tl.tag = lower(trim(d.lang))
         |        JOIN dict ts ON ts.tag = lower(trim(d.source))),
         |inv AS (SELECT lang_id AS tag_id, doc_id FROM enc
         |        UNION ALL SELECT source_id, doc_id FROM enc)
         |SELECT tag_id, count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM inv GROUP BY tag_id""".stripMargin)
}
