package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.OpCache.TrackedPersist

/** CSV / JSON-lines ingestion for corpus-shaped data — the source
  * formats a training-data pipeline meets besides parquet (reference
  * O1 reads one JSON document; at 100 TB the inputs are splittable
  * line-oriented files).
  *
  * Design rules, both formats:
  *  - EXPLICIT schema, never inference — schema inference is a full
  *    extra pass over 100 TB and non-deterministic under sampling.
  *  - PERMISSIVE mode with a quarantine column: a corrupt line must
  *    neither kill the job (FAILFAST) nor vanish silently (DROPMALFORMED
  *    — silent data loss at corpus scale). Malformed rows surface in
  *    `_corrupt` for a quarantine sink; [[quarantine]] splits them off.
  *  - Line-oriented (multiLine off) so files split across tasks.
  */
object DelimitedSource {

  val CorruptCol = "_corrupt"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(StructField(CorruptCol, StringType, nullable = true))

  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", header)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** (clean rows without the quarantine column, corrupt raw lines).
    * The parsed frame is persisted first: Spark refuses plans that
    * read ONLY the corrupt column from a raw file scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    * two branches would otherwise re-parse the files anyway.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.persistTracked
    (parsed.filter(col(CorruptCol).isNull).drop(CorruptCol),
      parsed.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw")))
  }
}
