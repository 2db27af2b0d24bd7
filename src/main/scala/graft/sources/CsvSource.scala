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
    // still-broken detection: from_csv in PERMISSIVE mode never returns
    // a null struct, so "parse failed" must be read off a corrupt-record
    // field INSIDE a re-parse. That check runs against an ALL-STRING
    // schema: with strings no type conversion can fail, so the corrupt
    // field flags exactly token-count mismatches (over- OR under-arity)
    // and live-quote damage — while the typed parse below stays free to
    // null out individual unconvertible fields without losing the row
    // (arity wrong ⇒ drop the row; value untypeable ⇒ null the field).
    val innerBad = "__graft_bad"
    val arityProbe = StructType(
      schema.fields.map(f => StructField(f.name, StringType)) :+
        StructField(innerBad, StringType, nullable = true))
    val arityOk = from_csv(stripped, arityProbe,
      Map("sep" -> sep, "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> innerBad))(innerBad).isNull
    val parsed = from_csv(stripped, schema,
      Map("sep" -> sep, "mode" -> "PERMISSIVE"))
    val rebuilt = df.filter(col(corruptCol).isNotNull)
      // cheap pre-filter: the raw split over-approximates arity (never
      // under-counts — quoted separators only inflate it), so < n means
      // certainly unrecoverable; the exact check is the string re-parse
      .where(size(split(stripped, java.util.regex.Pattern.quote(sep))) >= n)
      .where(arityOk)
      .select(parsed.as("__r"))
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
