package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, get_json_object, json_tuple, lit, trim, when}
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
    * corpus gates. All declared fields (top-level keys) come out of ONE
    * `json_tuple` parse of the payload; `try_cast`'s null-on-miscast
    * (not ANSI `cast`, which throws under Spark 4's default ANSI mode)
    * is what makes the verdict expressible — and oracle-checkable — as
    * data instead of as a crash. The JSON scalar `null` is a VALID
    * payload (missing its required fields), not `not_json` — matching
    * engines whose JSON cast accepts it. */
  def quarantineJson(df: DataFrame, jsonCol: String,
                     required: Seq[(String, DataType)]): DataFrame = {
    require(required.nonEmpty, "declare at least one required field")
    // JSON parsing is the per-row cost, so spread a single-split local
    // input across cores like the other per-row-expensive projections;
    // streaming inputs pass through (repartition is semantics-neutral)
    val spread = if (df.isStreaming) df else graft.functions.Par.spread(df)
    val rawNames = required.indices.map(i => s"_q$i")
    val withRaw = spread.select(col("*"),
      json_tuple(col(jsonCol), required.map(_._1): _*)
        .as(rawNames))
    // get_json_object('$') is SQL NULL both for malformed payloads and
    // for the valid JSON scalar `null` — disambiguate the latter (the
    // isNotNull guard keeps a SQL-NULL payload out of three-valued ||)
    val isJson = get_json_object(col(jsonCol), "$").isNotNull ||
      (col(jsonCol).isNotNull && trim(col(jsonCol)) === "null")
    val checks = required.zip(rawNames).map { case ((name, dt), rn) =>
      (name, col(rn), col(rn).try_cast(dt))
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
    withRaw.withColumn("verdict",
      when(!isJson, lit("not_json")).otherwise(missing))
      .drop(rawNames: _*)
  }
}
