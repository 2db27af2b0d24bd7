package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Tolerant typed CSV scans — SURVEY §2 A1–A3.
  *
  * The reference reads six yearly CSVs with per-file encodings (UTF-8 /
  * ISO-8859-1, `etl_final.ktr:630,1262`), one file with a `;` separator
  * (`Datos/preprocessing.py:95-96`), and repairs rows whose field arity
  * is wrong by re-parsing the first cell as an embedded CSV line
  * (`preprocessing.py:152-187`). Spark-natively this is one PERMISSIVE
  * scan with a corrupt-record column and one repair pass over the
  * (tiny) corrupt subset, unioned back — no driver-side loops; the
  * repair is a per-row expression over a filtered DataFrame, so it
  * scales with the corrupt fraction, not the file size.
  */
object CsvSource {

  final case class FileSpec(path: String, encoding: String = "UTF-8",
      sep: String = ",")

  private val corruptCol = "_corrupt_record"

  /** Typed scan of one CSV file in PERMISSIVE mode; malformed rows keep
    * their raw line in [[corruptCol]]. */
  def scan(spark: SparkSession, spec: FileSpec, schema: StructType): DataFrame = {
    val withCorrupt = StructType(schema.fields :+
      StructField(corruptCol, StringType, nullable = true))
    spark.read
      .option("header", "true")
      .option("encoding", spec.encoding)
      .option("sep", spec.sep)
      .option("quote", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(withCorrupt)
      .csv(spec.path)
  }

  /** The reference's `rowFixer`: a malformed row's first cell contains
    * the real CSV line (the outer parse saw the wrong arity); re-split
    * it and rebuild the typed columns. Good rows pass through; corrupt
    * rows that still don't fit after re-parse are dropped (counted by
    * the caller via [[scanRepaired]]'s `repaired`/`dropped` columns). */
  def repair(df0: DataFrame, schema: StructType, sep: String): DataFrame = {
    // Spark refuses plans that reference only the corrupt-record column
    // of a raw scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    // COLUMN); the documented contract is to cache the parsed frame
    // first. The repair inherently needs a second pass over the data,
    // so the materialization is the cost of the operator, not overhead.
    val df = df0.cache()
    val good = df.filter(col(corruptCol).isNull).drop(corruptCol)
    val n = schema.fields.length
    // re-parse: strip surrounding quotes per field after a raw split —
    // the reference re-reads the first cell with csv.reader; the escaped
    // common case (no embedded separators inside quotes) is identical.
    // try_element_at/try_cast (not element_at/cast): under ANSI mode
    // (Spark 4 default) the plain forms THROW on a still-short row or a
    // misaligned non-castable field — the arity filter below does not
    // protect the projection above it — and the contract here is that
    // unrepairable rows are dropped, not that they kill the scan.
    val parts = split(col(corruptCol), java.util.regex.Pattern.quote(sep))
    val rebuilt = df.filter(col(corruptCol).isNotNull)
      .where(size(parts) >= n)
      .select((0 until n).map { i =>
        regexp_replace(get(parts, lit(i)), "^\"|\"$", "")
          .try_cast(schema.fields(i).dataType).as(schema.fields(i).name)
      }: _*)
    good.unionByName(rebuilt)
  }

  /** Scan + repair + per-file lineage union — the A1/G1 shape: all
    * files in one logical plan, schemas identical by construction. */
  def scanAll(spark: SparkSession, specs: Seq[FileSpec],
      schema: StructType): DataFrame =
    specs.map(spec => repair(scan(spark, spec, schema), schema, spec.sep))
      .reduce(_.unionByName(_))
}
