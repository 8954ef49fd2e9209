package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** The DataFrame carrier for flod-style tags (SURVEY.md §1.4 mapping):
  * [[TagChain]] reproduces the reference's scoping/onChange semantics as
  * a chain-side store (metadata.d:102-116); this wires the VALUES into
  * real plans so a tag set upstream is readable after Dataset
  * transforms, the way flod tags ride the stream (metadata.d:365-385).
  *
  * Two carriers, matching the two lifetimes flod tags have:
  *
  *  - **Plan-constant tags** (one value for the whole stream):
  *    StructField.metadata on the tagged column. Zero runtime cost —
  *    the value lives in the schema and survives select / filter / join
  *    / repartition untouched, because Catalyst propagates attribute
  *    metadata with the attribute. Setting again overwrites — the
  *    nearest-upstream-setter rule collapses to last-setter-wins on a
  *    linear Dataset chain.
  *  - **Mid-stream-changing tags** (flod's onChange case, e.g. "name of
  *    the file this chunk came from"): a per-row map column `_tags`.
  *    Values ride WITH the rows through shuffles — the only carrier
  *    that stays correct when partitions interleave multiple sources at
  *    100 TB; cost is one map column, pruned away the moment it stops
  *    being selected.
  */
object Tags {

  private val prefix = "graft.tag."

  /** Set a plan-constant tag on `column` (schema metadata carrier). */
  def setTag(df: DataFrame, column: String, key: String, value: String): DataFrame = {
    val field = df.schema(column)
    val meta = new MetadataBuilder().withMetadata(field.metadata)
      .putString(prefix + key, value).build()
    df.withColumn(column, df(column).as(column, meta))
  }

  /** Read a plan-constant tag as seen at this point of the chain. */
  def getTag(df: DataFrame, column: String, key: String): Option[String] = {
    val m = df.schema(column).metadata
    if (m.contains(prefix + key)) Some(m.getString(prefix + key)) else None
  }

  /** All tags visible on a column (for diagnostics/lineage dumps).
    * Metadata has no key-enumeration API; parse its JSON form. */
  def tags(df: DataFrame, column: String): Map[String, String] =
    org.json4s.jackson.JsonMethods.parse(df.schema(column).metadata.json) match {
      case org.json4s.JObject(fields) =>
        fields.collect { case (k, org.json4s.JString(v)) if k.startsWith(prefix) =>
          k.stripPrefix(prefix) -> v
        }.toMap
      case _ => Map.empty
    }

  // ---- row-envelope carrier (mid-stream-changing tags) ----

  private val envCol = "_tags"

  /** Set a per-row tag: `value` may be any expression (a literal, a
    * source-file column, ...). Creates or extends the `_tags` map. */
  def setRowTag(df: DataFrame, key: String, value: Column): DataFrame = {
    val entry = map(lit(key), value.cast("string"))
    // guard NULL envelopes (outer joins / allowMissingColumns unions
    // leave _tags NULL on some rows; map_concat(NULL, …) is NULL and
    // would silently drop the write)
    if (df.columns.contains(envCol))
      df.withColumn(envCol, when(col(envCol).isNull, entry).otherwise(
        map_concat(map_filter(col(envCol), (k, _) => k =!= key), entry)))
    else df.withColumn(envCol, entry)
  }

  /** Read a per-row tag downstream. */
  def rowTag(key: String): Column = col(envCol).getItem(key)

  /** Drop the envelope once tags are no longer needed (column pruning
    * does this automatically for anything downstream that never selects
    * `_tags`). */
  def dropRowTags(df: DataFrame): DataFrame = df.drop(envCol)
}
