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

  /** The reference's `rowFixer`: a malformed row's raw line holds the
    * real CSV content (the outer parse saw the wrong arity, usually
    * because the whole line arrived quoted as one cell); strip the
    * outer quotes and re-parse with `from_csv` — a REAL csv parse, so
    * quoted fields containing the separator stay intact (a raw
    * `split(sep)` would shift every subsequent column). Good rows pass
    * through; rows that still don't fit are dropped, never letting a
    * malformed line kill the scan (the reference's csv.reader repair,
    * `preprocessing.py:152-187`). */
  def repair(df0: DataFrame, schema: StructType, sep: String): DataFrame = {
    // Spark refuses plans that reference ONLY the corrupt-record column
    // of a raw scan; caching the parsed frame (the documented
    // workaround) is fine here — the repair is a second pass anyway.
    val df = df0.cache()
    val good = df.filter(col(corruptCol).isNull).drop(corruptCol)
    val n = schema.fields.length
    // a wrong-arity line usually arrives as ONE quoted cell holding the
    // true CSV line, with inner quotes doubled per RFC 4180; recover
    // the embedded line exactly as the reference's csv.reader does —
    // strip the outer quotes and un-double the inner ones. Lines not
    // wholly quoted pass through untouched (their quoting is live).
    val isWrapped =
      col(corruptCol).startsWith("\"") && col(corruptCol).endsWith("\"")
    val stripped = when(isWrapped,
      regexp_replace(regexp_replace(col(corruptCol), "^\"|\"$", ""),
        "\"\"", "\""))
      .otherwise(col(corruptCol))
    val parsed = from_csv(stripped, schema,
      Map("sep" -> sep, "mode" -> "PERMISSIVE"))
    val rebuilt = df.filter(col(corruptCol).isNotNull)
      // arity guard: a quote-aware count would need the parse itself,
      // so over-approximate with the raw split, then require the parse
      // to produce the key field — still-broken rows drop out
      .where(size(split(stripped, java.util.regex.Pattern.quote(sep))) >= n)
      .select(parsed.as("__r"))
      .where(col("__r").isNotNull)
      .select(col("__r.*"))
    good.unionByName(rebuilt)
  }

  /** Scan + repair + per-file lineage union — the A1/G1 shape: all
    * files in one logical plan, schemas identical by construction. */
  def scanAll(spark: SparkSession, specs: Seq[FileSpec],
      schema: StructType): DataFrame =
    specs.map(spec => repair(scan(spark, spec, schema), schema, spec.sep))
      .reduce(_.unionByName(_))
}
