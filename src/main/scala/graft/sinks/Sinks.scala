package graft.sinks

import java.sql.Connection

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.Upsert

/** Sink layer (SURVEY §2.1 K1/K2, §7.1 step 6).
  *
  * The reference lands every stream through `pipelinewise-target-postgres`,
  * which upserts on the stream's `key_properties`. Spark has no MERGE for
  * plain JDBC targets, so the upsert contract is: (1) dedup the batch to
  * the latest row per key, (2) write to a staging table, (3) one
  * `INSERT ... SELECT ... ON CONFLICT (pk) DO UPDATE` statement server-side.
  * Idempotent under replays — the at-least-once + upsert contract that
  * makes the reference's post-hoc state write safe (wrike
  * `runner/__init__.py:189-193`).
  *
  * No live Postgres exists in this environment, so `upsertSql`/`ddlFor`
  * (pure) are unit-tested and `writeJdbcUpsert` is exercised only up to
  * the JDBC boundary.
  */
object Sinks {

  /** Upsert statement executed after the staging load (step 3). */
  def upsertSql(table: String, staging: String, columns: Seq[String],
                keyCols: Seq[String]): String = {
    val collist = columns.map(q).mkString(", ")
    val updates = columns.filterNot(keyCols.contains)
      .map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
    val action =
      if (updates.isEmpty) "DO NOTHING" else s"DO UPDATE SET $updates"
    s"INSERT INTO ${qq(table)} ($collist) SELECT $collist FROM ${qq(staging)} " +
      s"ON CONFLICT (${keyCols.map(q).mkString(", ")}) $action"
  }

  /** CREATE TABLE DDL from the DataFrame schema (K2 — the reference's
    * SCHEMA-message-driven DDL). */
  def ddlFor(table: String, df: DataFrame, keyCols: Seq[String]): String = {
    val cols = df.schema.fields.map { f =>
      val t = f.dataType.typeName match {
        case "string" => "TEXT"
        case "long" => "BIGINT"
        case "integer" => "INTEGER"
        case "double" => "DOUBLE PRECISION"
        case "boolean" => "BOOLEAN"
        case "timestamp" | "timestamp_ntz" => "TIMESTAMP"
        case "date" => "DATE"
        case "binary" => "BYTEA"
        case other => sys.error(s"no JDBC mapping for $other")
      }
      s"${q(f.name)} $t"
    }
    val pk = if (keyCols.nonEmpty)
      s", PRIMARY KEY (${keyCols.map(q).mkString(", ")})" else ""
    s"CREATE TABLE IF NOT EXISTS ${qq(table)} (${cols.mkString(", ")}$pk)"
  }

  private def q(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
  private def qq(table: String): String = table.split('.').map(q).mkString(".")

  /** Full upsert write: batch-dedup -> staging via Spark JDBC -> one
    * server-side merge statement on a driver connection. */
  def writeJdbcUpsert(df: DataFrame, jdbcUrl: String, table: String,
                      keyCols: Seq[String], orderCol: String,
                      props: java.util.Properties,
                      connect: () => Connection): Unit = {
    val deduped = Upsert.latestPerKey(df, keyCols, orderCol)
    val staging = table.replace('.', '_') + "_staging"
    deduped.write.mode("overwrite").jdbc(jdbcUrl, staging, props)
    val conn = connect()
    try {
      val st = conn.createStatement()
      try {
        st.execute(ddlFor(table, deduped, keyCols))
        st.execute(upsertSql(table, staging, deduped.columns.toSeq, keyCols))
        st.execute(s"DROP TABLE IF EXISTS ${qq(staging)}")
      } finally st.close()
    } finally conn.close()
  }

  /** Parquet landing sink, partitioned for pruning at read time. */
  def writeParquet(df: DataFrame, path: String,
                   partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }
}
