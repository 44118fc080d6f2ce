package graft.runner

import java.nio.file.Path
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Watermark
import graft.state.Bookmarks

/** Orchestration layer (SURVEY §2.1 O1/O2/W3, §7.1 step 8): the analog of
  * `scheduler.py`'s sequential pipeline loop, collapsed into one driver
  * process — extract → transform → sink per stream, state merged and
  * persisted only after every sink write succeeded, then the model layer
  * refresh, then sleep.
  */
object Orchestrator {

  /** One incremental stream job. `extract` receives the stream's current
    * bookmark (None on first run); `sink` must be idempotent (upsert).
    * `keyProperties`/`schemaDdl` feed catalog discovery ([[Catalog]]). */
  final case class StreamJob(
      name: String,
      tsCol: String,
      extract: (SparkSession, Option[String]) => DataFrame,
      sink: DataFrame => Unit,
      /** W3: most streams advance to run start; analytics to max seen. */
      advanceToMaxSeen: Boolean = false,
      /** Primary-key columns, surfaced in the discovered catalog. */
      keyProperties: Seq[String] = Seq.empty,
      /** Declared schema (StructType.toDDL), surfaced in the catalog. */
      schemaDdl: Option[String] = None)

  final case class Pipeline(system: String, jobs: Seq[StreamJob])

  /** Run every job of every pipeline once; returns the advanced state.
    * Jobs inside a pipeline are independent Spark actions; with
    * `parallelism > 1` they run concurrently from a driver thread pool
    * (the reference runs streams concurrently on one event loop, C3 —
    * `asyncio.gather`, `internal.py:164`). State merge is associative, so
    * concurrency doesn't change the result. */
  def runOnce(spark: SparkSession, pipelines: Seq[Pipeline],
              state: Bookmarks, parallelism: Int = 1,
              /** P2 stream selection: with a catalog, only streams marked
                * `selected` sync (reference: `metadata.selected` readback,
                * `internal.py:97-110`); without one, everything syncs. */
              catalog: Option[Catalog] = None): Bookmarks = {
    val runStart = Timestamp.from(Instant.now())
    val jobs = for {
      p <- pipelines
      job <- p.jobs
      if catalog.forall(_.isSelected(p.system, job.name))
    } yield (p, job)
    val runJob = (pj: (Pipeline, StreamJob)) => {
      val (p, job) = pj
      val key = s"${p.system}.${job.name}"
      val bookmark = state.get(key)
      val batch = job.extract(spark, bookmark)
      val next =
        if (job.advanceToMaxSeen) {
          // Pin the batch before the two actions (sink, max-ts) so both see
          // the SAME rows: for a live/paginated extract, re-execution between
          // actions could otherwise advance the bookmark past rows that were
          // never sunk — silent loss on the next incremental run.
          batch.persist()
          try {
            job.sink(batch)
            Watermark.advanceToMaxSeen(batch, job.tsCol)
              .map(_.toInstant.toString)
              .orElse(bookmark)
              .getOrElse(runStart.toInstant.toString)
          } finally batch.unpersist()
        } else {
          job.sink(batch)
          runStart.toInstant.toString
        }
      key -> next
    }
    val updates =
      if (parallelism <= 1) jobs.map(runJob)
      else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try Await.result(Future.sequence(jobs.map(j => Future(runJob(j)))),
          Duration.Inf)
        finally pool.shutdown()
      }
    state.merged(updates.toMap)
  }

  /** The interval loop (`PIPELINE_INTERVAL_SECONDS` semantics): run, persist
    * state, sleep, repeat. `rounds` bounds the loop for tests; pass
    * Int.MaxValue for a daemon.
    *
    * `maintenance` closes the index-maintenance loop the way the
    * reference's scheduler runs its dbt step every cycle
    * (`scheduler.py:158-225`): after each round's sinks land (and the
    * state is durably advanced), [[Maintenance.runCycle]] audits every
    * declared index and repairs on thresholds — recover, delete-stale,
    * append-missing, deep-merge, compact — so a multi-cycle run ends
    * compacted and fresh with no manual calls (the batch analog of the
    * streaming ingests' `compactEvery` cadence). Runs BETWEEN rounds
    * by construction, honoring the no-concurrent-serving contract. */
  def loop(spark: SparkSession, pipelines: Seq[Pipeline], statePath: Path,
           intervalMillis: Long, rounds: Int,
           afterEachRound: SparkSession => Unit = _ => (),
           maintenance: Seq[MaintainedIndex] = Nil): Bookmarks = {
    var state = Bookmarks.load(statePath)
    var i = 0
    while (i < rounds) {
      state = runOnce(spark, pipelines, state)
      Bookmarks.save(state, statePath) // only after all sinks succeeded
      if (maintenance.nonEmpty) Maintenance.runCycle(spark, maintenance)
      afterEachRound(spark)
      i += 1
      if (i < rounds && intervalMillis > 0) Thread.sleep(intervalMillis)
    }
    state
  }
}
