package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the scrubbing pass a training corpus runs before
  * anything ships: regex families (emails, IPv4s, long digit runs —
  * ids, phone numbers, account numbers) are replaced with typed
  * placeholder tokens and the per-row hit counts are kept as columns,
  * because the redaction RATE is itself a curation signal (a document
  * that is mostly PII placeholders is dropped, not published).
  *
  * All map-side: `regexp_replace`/`regexp_count` are codegen'd
  * expressions, zero shuffle at any scale. Patterns are RE2-safe (no
  * backreferences, no lookaround) so external engines running the same
  * pattern — DuckDB's RE2, the q62 oracle — agree byte-for-byte with
  * Java's regex on these character-class constructs.
  */
object Redact {

  /** (name, pattern, replacement) redaction families, applied in order. */
  val email: (String, String, String) =
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>")
  val ipv4: (String, String, String) =
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>")
  val digitRun: (String, String, String) =
    ("num", "[0-9]{6,}", "<NUM>")

  val defaultPatterns: Seq[(String, String, String)] = Seq(email, ipv4, digitRun)

  /** `textCol` scrubbed of every pattern family, plus one `n_<name>`
    * count column per family (counted BEFORE replacement — families are
    * applied in sequence, so an earlier replacement must not eat a
    * later family's count). */
  def scrub(df: DataFrame, textCol: String,
      patterns: Seq[(String, String, String)] = defaultPatterns,
      outCol: String = "redacted"): DataFrame = {
    val counted = patterns.foldLeft(df) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name", regexp_count(col(textCol), lit(pat)))
    }
    val scrubbed = patterns.foldLeft(col(textCol)) { case (c, (_, pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
    counted.withColumn(outCol, scrubbed)
  }

  /** Total redactions per row for the given families. */
  def totalRedactions(patterns: Seq[(String, String, String)] = defaultPatterns): Column =
    patterns.map { case (name, _, _) => col(s"n_$name").cast("long") }
      .reduce(_ + _)
}
