package graft.meta

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tag dictionary (reference: Neighborly/VectorTags.cs).
  *
  * Semantics reproduced: tags normalize to `trim.toLowerCase`
  * (VectorTags.cs:27,53), ids are 1-based SMALLINTs (`:60-62`, capped at
  * Short.MaxValue `:48-51`), duplicate adds return the existing id
  * (`:53-56`), missing lookups return -1 (`:26-34`); the inverted
  * tagId → vector-ids map (`:171-194`) is a derived `explode`, not stored.
  *
  * Two forms, same semantics:
  *  - `TagDictionary` — the driver-side mutable dictionary backing the
  *    facade's add/encode/decode verbs (it is dimension-table sized);
  *  - `toDF`/`encode`/`decode` — the broadcast-join form used inside
  *    distributed plans. At 100 TB the dictionary stays broadcast-able by
  *    construction (≤ 32767 entries).
  *
  * Normalization for set-derived builds (declared): `fromColumn` assigns
  * ids by sorted tag order — insertion order is not well-defined for a
  * distributed distinct.
  */
final class TagDictionary private (initial: Seq[String]) extends Serializable {
  private val byTag = scala.collection.mutable.LinkedHashMap[String, Short]()
  initial.foreach(add)

  private def norm(tag: String): String = tag.trim.toLowerCase

  def add(tag: String): Short = {
    require(byTag.size < Short.MaxValue, "Maximum number of tags reached")
    byTag.get(norm(tag)) match {
      case Some(id) => id
      case None =>
        val nid = (byTag.size + 1).toShort
        require(!byTag.values.exists(_ == nid),
          s"tag id $nid already in use after a removal (VectorTags.Add parity: Dictionary.Add throws)")
        byTag.update(norm(tag), nid); nid
    }
  }

  /** -1 when absent (VectorTags.cs:26-34). */
  def getId(tag: String): Short = byTag.getOrElse(norm(tag), (-1).toShort)
  def getIdRange(tags: Seq[String]): Seq[Short] = tags.map(getId)
  def apply(tagId: Short): String = byTag.find(_._2 == tagId)
    .getOrElse(throw new NoSuchElementException(s"tag id $tagId"))._1
  def getRange(tagIds: Seq[Short]): Seq[String] = tagIds.map(apply)
  def contains(tag: String): Boolean = byTag.contains(norm(tag))
  def count: Int = byTag.size
  def entries: Seq[(Short, String)] = byTag.toSeq.map { case (t, i) => (i, t) }
  def all: Seq[String] = byTag.keys.toSeq

  /** Remove by id (VectorTags.cs:205-210). Quirk preserved: ids are
    * allocated as `count + 1` (VectorTags.cs:61), so an add AFTER a remove
    * can collide with a live id — the reference's `Dictionary.Add` throws
    * there, and so does `add` here. */
  def remove(tagId: Short): Boolean =
    byTag.find(_._2 == tagId) match {
      case Some((t, _)) => byTag.remove(t); true
      case None => false
    }

  /** Dimension-table form: (tag_id SMALLINT, tag STRING). */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toDF("tag_id", "tag")
  }
}

object TagDictionary {
  def empty: TagDictionary = new TagDictionary(Seq.empty)
  def fromStrings(tags: Seq[String]): TagDictionary = new TagDictionary(tags)
}

object Tags {

  /** Distributed dictionary build from a string column: distinct normalized
    * tags, ids 1..n in sorted order (declared normalization — see above). */
  def dictionaryFromColumns(df: DataFrame, cols: Column*): DataFrame = {
    val tags = cols.map(c => df.select(lower(trim(c)).as("tag")))
      .reduce(_ union _).distinct()
    tags.withColumn("tag_id",
      row_number().over(Window.orderBy(col("tag"))).cast("short"))
      .select(col("tag_id"), col("tag"))
  }

  /** Encode a scalar tag column to its id via broadcast join; unknown tags
    * get -1 (GetId parity). `dict` is (tag_id, tag). */
  def encode(df: DataFrame, tagCol: Column, dict: DataFrame, outCol: String): DataFrame =
    df.join(broadcast(dict.withColumnRenamed("tag", "_t")),
        lower(trim(tagCol)) === col("_t"), "left")
      .withColumn(outCol, coalesce(col("tag_id"), lit((-1).toShort)))
      .drop("tag_id", "_t")

  /** Decode a tag-id column back to the string via broadcast join. */
  def decode(df: DataFrame, idCol: Column, dict: DataFrame, outCol: String): DataFrame =
    df.join(broadcast(dict.withColumnRenamed("tag_id", "_i")), idCol === col("_i"), "left")
      .withColumnRenamed("tag", outCol)
      .drop("_i")

  /** Derived inverted index (VectorTags.cs:171-194): one (tag_id, id) row
    * per membership. */
  def invertedIndex(vectors: DataFrame, idCol: String, tagsCol: String): DataFrame =
    vectors.select(col(idCol), explode(col(tagsCol)).as("tag_id"))
      .select(col("tag_id"), col(idCol))
}
