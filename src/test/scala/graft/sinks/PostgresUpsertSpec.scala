package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

/** The ON CONFLICT branch against a REAL PostgreSQL: boots a throwaway
  * local cluster (initdb + pg_ctl, unix-socket only, trust auth) and
  * executes the exact statement sequence `Sinks.upsertStatements(...,
  * "postgres", ...)` emits — CREATE TABLE, INSERT ... ON CONFLICT DO
  * UPDATE, DROP staging — via psql, asserting insert, replay
  * idempotence and update-wins. This closes the sink-fidelity gap the
  * Derby integration test (ANSI MERGE branch) cannot: the reference's
  * actual target dialect is PostgreSQL (`pipelinewise-target-postgres`,
  * pyproject.toml:25). The staging LOAD stays JDBC-proven on Derby;
  * here the staging rows are seeded with plain INSERTs because the
  * statement under test is the server-side merge, not the batch copy.
  *
  * Gated: cancels (not fails) when no usable initdb/pg_ctl/psql is on
  * PATH or the cluster fails to boot (e.g. running as a user Postgres
  * refuses, or a hardened container). */
class PostgresUpsertSpec extends SparkSpec {
  import scala.sys.process._

  // Postgres refuses to run as root; in a root container every server
  // command runs as the `postgres` system user via runuser (the data
  // dir is chowned to it first).
  private val isRoot = System.getProperty("user.name") == "root"
  private def wrap(cmd: Seq[String]): Seq[String] =
    if (isRoot) Seq("runuser", "-u", "postgres", "--") ++ cmd else cmd

  private def haveBinaries: Boolean =
    Seq("initdb", "pg_ctl", "psql").forall(b =>
      Seq("bash", "-c", s"command -v $b").!(ProcessLogger(_ => ())) == 0) &&
      (!isRoot ||
        Seq("bash", "-c", "id postgres").!(ProcessLogger(_ => ())) == 0)

  test("upsertStatements(postgres): insert, replay idempotence, " +
      "update-wins against real ON CONFLICT") {
    assume(haveBinaries, "no local PostgreSQL binaries; skipping")
    val base = Files.createTempDirectory("graft_pg").toFile
    val data = new java.io.File(base, "data").getAbsolutePath
    val sock = new java.io.File(base, "sock"); sock.mkdirs()
    val port = "54937"
    val quiet = ProcessLogger(_ => (), _ => ())
    if (isRoot) Seq("chown", "-R", "postgres:postgres",
      base.getAbsolutePath).!(quiet)
    // cwd = the (postgres-owned) temp dir: runuser keeps the caller's
    // cwd, which the postgres user may not be able to read
    def run(cmd: Seq[String]): Int = Process(wrap(cmd), base).!(quiet)
    val initRc = run(Seq("initdb", "-D", data, "-U", "graft", "-A", "trust"))
    assume(initRc == 0, s"initdb failed (rc=$initRc); skipping")
    val startRc = run(Seq("pg_ctl", "-D", data, "-w", "-t", "30", "-o",
      s"-p $port -k ${sock.getAbsolutePath} -c listen_addresses=",
      "-l", s"$base/pg.log", "start"))
    assume(startRc == 0, s"postgres failed to start (rc=$startRc); skipping")
    try {
      def psql(sql: String): String = {
        val out = new StringBuilder
        val err = new StringBuilder
        val rc = Process(wrap(Seq("psql", "-h", sock.getAbsolutePath,
          "-p", port, "-U", "graft", "-d", "postgres",
          "-v", "ON_ERROR_STOP=1", "-At", "-c", sql)), base)
          .!(ProcessLogger(l => out.append(l).append('\n'),
            l => err.append(l).append('\n')))
        assert(rc == 0, s"psql rc=$rc for [$sql]: $out$err")
        out.toString.trim
      }
      import spark.implicits._
      val df = Seq((1L, "a", 10L)).toDF("id", "name", "v")

      // round 1: fresh target, two staging rows
      psql(Sinks.ddlFor("public.staging", df, Nil))
      psql("INSERT INTO \"public\".\"staging\" VALUES (1,'a',10),(2,'b',20)")
      Sinks.upsertStatements(df, "public.target", "public.staging",
        Seq("id"), "postgres", tableExists = false).foreach(psql)
      assert(psql("SELECT count(*) FROM \"public\".\"target\"") == "2")

      // round 2: REPLAY row 2 with new values + a fresh row 3 —
      // ON CONFLICT must update 2 in place (update-wins) and insert 3
      psql(Sinks.ddlFor("public.staging", df, Nil))
      psql("INSERT INTO \"public\".\"staging\" VALUES (2,'B',21),(3,'c',30)")
      Sinks.upsertStatements(df, "public.target", "public.staging",
        Seq("id"), "postgres", tableExists = true).foreach(psql)
      val rows = psql("SELECT id || ':' || name || ':' || v " +
        "FROM \"public\".\"target\" ORDER BY id")
      assert(rows == "1:a:10\n2:B:21\n3:c:30")

      // exact replay of the same batch is a no-op (idempotence)
      psql(Sinks.ddlFor("public.staging", df, Nil))
      psql("INSERT INTO \"public\".\"staging\" VALUES (2,'B',21),(3,'c',30)")
      Sinks.upsertStatements(df, "public.target", "public.staging",
        Seq("id"), "postgres", tableExists = true).foreach(psql)
      assert(psql("SELECT id || ':' || name || ':' || v " +
        "FROM \"public\".\"target\" ORDER BY id") == rows)
    } finally {
      run(Seq("pg_ctl", "-D", data, "-m", "immediate", "stop"))
    }
  }
}
