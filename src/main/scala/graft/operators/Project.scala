package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, try_parse_json, try_variant_get, when}
import org.apache.spark.sql.types.DataType

/** Projection to a declared schema (SURVEY §2.1 P1): the reference keeps
  * only keys present in the stream's JSON-Schema and silently drops the
  * rest (`tap_wrike/utility.py:283`). In Spark this is a plain `select`,
  * which Catalyst turns into column pruning pushed all the way into the
  * parquet scan (`ReadSchema` lists only the declared columns).
  */
object Project {
  /** Keep exactly `declared` columns, in that order. Unknown names raise —
    * the declared schema is a contract, not a hint. */
  def toDeclared(df: DataFrame, declared: Seq[String]): DataFrame =
    df.select(declared.map(col): _*)

  /** Lenient variant: intersect with what's actually present (the
    * reference's drop-extras behavior when rows carry unknown keys). */
  def toDeclaredLenient(df: DataFrame, declared: Seq[String]): DataFrame = {
    val present = df.columns.toSet
    df.select(declared.filter(present.contains).map(col): _*)
  }

  /** Malformed-record quarantine (x76) — the validation stage between a
    * raw landing and the declared-schema projection: classify every
    * record's JSON payload against the required fields instead of
    * silently nulling bad rows (the P1 projection's failure mode) or
    * failing the job (ANSI's). Verdicts, in precedence order:
    *
    *   - `not_json` — the payload does not parse at all;
    *   - `missing_required:<field>` — first declared field absent;
    *   - `wrong_type:<field>` — first declared field present but not
    *     castable to its declared type;
    *   - `ok`.
    *
    * The ingest split is then one filter per route (`verdict = 'ok'` vs
    * the quarantine sink, which keeps the raw payload for replay after
    * a schema fix). Pure per-row projection, zero shuffles — so it runs
    * unchanged as a stateless pre-stage in a streaming ingest, like the
    * corpus gates.
    *
    * The payload is parsed exactly ONCE per row, into a Spark 4
    * `variant` (`try_parse_json`) — at 100 TB of raw JSON ingest the
    * parse is the dominant per-row cost, so validation must not pay it
    * twice (the earlier `json_tuple` + `get_json_object` formulation
    * did). Every declared field is then a cheap binary traversal of the
    * variant, with semantics identical to `json_tuple`'s: string-cast
    * extraction is SQL NULL exactly when the key is absent OR its value
    * is JSON null; strings come out unquoted; nested objects come out
    * as their JSON text (so a non-castable object is `wrong_type`, not
    * missing). `try_parse_json` is SQL NULL only for malformed
    * payloads — the JSON scalar `null` parses to a non-null variant, so
    * it is a VALID payload (missing its required fields), not
    * `not_json`, matching engines whose JSON cast accepts it.
    * `try_cast`'s null-on-miscast (not ANSI `cast`, which throws under
    * Spark 4's default ANSI mode) is what makes the verdict
    * expressible — and oracle-checkable — as data instead of a crash.
    *
    * `keepParsedAs`: optionally retain the parsed variant as a named
    * column, so downstream field extraction (the ok-route's projection
    * to the declared schema) reuses THIS parse instead of re-parsing
    * the payload. Field names are top-level keys addressed as `$.name`
    * variant paths (names with path metacharacters are out of scope,
    * as they were for `json_tuple`). `_qv` is reserved as the working
    * column name: an input column named `_qv` would be overwritten. */
  def quarantineJson(df: DataFrame, jsonCol: String,
                     required: Seq[(String, DataType)],
                     keepParsedAs: Option[String] = None): DataFrame = {
    require(required.nonEmpty, "declare at least one required field")
    // JSON parsing is the per-row cost, so spread a single-split local
    // input across cores like the other per-row-expensive projections;
    // streaming inputs pass through (repartition is semantics-neutral)
    val spread = if (df.isStreaming) df else graft.functions.Par.spread(df)
    val withV = spread.withColumn("_qv", try_parse_json(col(jsonCol)))
    val checks = required.map { case (name, dt) =>
      val raw = try_variant_get(col("_qv"), s"$$.$name", "string")
      (name, raw, raw.try_cast(dt))
    }
    val wrongType = checks.foldRight(lit("ok"): Column) {
      case ((name, raw, casted), acc) =>
        when(raw.isNotNull && casted.isNull, lit(s"wrong_type:$name"))
          .otherwise(acc)
    }
    val missing = checks.foldRight(wrongType) {
      case ((name, raw, _), acc) =>
        when(raw.isNull, lit(s"missing_required:$name")).otherwise(acc)
    }
    val out = withV.withColumn("verdict",
      when(col("_qv").isNull, lit("not_json")).otherwise(missing))
    keepParsedAs match {
      case Some(n) => out.withColumnRenamed("_qv", n)
      case None    => out.drop("_qv")
    }
  }
}
