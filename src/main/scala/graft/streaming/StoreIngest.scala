package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest into the incremental stores — closes the
  * streaming-to-store loop the deployment story implies: a long-running
  * stream maintains the SAME bucketed signature store the batch pipeline
  * reads, by signaturing each micro-batch (O(batch), the
  * [[graft.operators.IncrementalDedup]] contract) and appending it
  * inside `foreachBatch`. Store reads stay exchange-free either way —
  * the append path preserves the bucket spec.
  *
  * Idempotence: bucketed parquet appends are not transactional, so a
  * replayed micro-batch (a checkpoint restart re-delivers the last
  * in-flight batch id) must not double-append. A committed-batch LEDGER
  * table (`<table>_ingest_log`, one batch_id row per committed batch)
  * makes the replay a no-op: the batch body is skipped when its id is
  * already committed. The ledger row lands AFTER the store append, so a
  * crash exactly between the two re-appends one batch on restart —
  * candidate derivation is a DISTINCT pair set, so the duplicate rows
  * perturb no downstream answer (at-least-once store rows, exactly-once
  * results; StreamingSpec pins both the stream≡batch store equality and
  * the replay no-op). Ledger batch ids are scoped to ONE checkpoint
  * lineage: re-pointing a fresh checkpoint at an existing store requires
  * dropping the ledger with it ([[graft.sources.Sinks
  * .dropTableAndStaleLocation]] on both, as the q180 gate does).
  */
object StoreIngest {

  /** The ledger table paired with a store table. */
  def ledgerTable(table: String): String = table + "_ingest_log"

  /** The shared ledgered foreachBatch core: run `appendBatch` for each
    * micro-batch whose id is not yet committed, then commit the id.
    * Every store type plugs its own batch transform + append here.
    */
  private def ledgeredIngest(docs: DataFrame, table: String,
                             checkpointDir: String, trigger: Trigger)
                            (appendBatch: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        val ledger = ledgerTable(table)
        val committed = s.catalog.tableExists(ledger) &&
          !s.table(ledger).filter(col("batch_id") === batchId).isEmpty
        if (!committed) {
          appendBatch(batch.toDF())
          s.createDataFrame(
            java.util.Collections.singletonList(Row(batchId)),
            new org.apache.spark.sql.types.StructType()
              .add("batch_id", "long", nullable = false))
            .write.mode("append").format("parquet").saveAsTable(ledger)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Start a streaming ingest of `docs` (a STREAMING DataFrame of
    * (idCol, textCol) rows) into the MinHash/LSH signature store
    * `table`: each micro-batch runs
    * [[graft.operators.IncrementalDedup.bandedSignaturesPortable]] and
    * appends via [[graft.operators.IncrementalDedup.appendToStore]].
    * Defaults are the q22/q50 constants so the store replays the
    * batch oracle exactly. The default trigger drains what is available
    * and stops (the gate/test shape); a deployment passes a
    * processing-time trigger.
    */
  def ingestDedupStore(docs: DataFrame, idCol: String, textCol: String,
                       table: String, buckets: Int, checkpointDir: String,
                       shingleK: Int = 3, numHashes: Int = 16,
                       bands: Int = 4, seed: Long = 42L,
                       trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    ledgeredIngest(docs, table, checkpointDir, trigger) { batch =>
      graft.operators.IncrementalDedup.appendToStore(
        graft.operators.IncrementalDedup.bandedSignaturesPortable(
          batch, idCol, textCol, shingleK, numHashes, bands, seed),
        table, buckets)
    }

  /** Streaming ingest into the grouped KMV distinct-count store: each
    * micro-batch sketches (groupCol, valueCol) rows and appends the
    * batch's k-minima ([[graft.operators.IncrementalKmv]]). KMV minima
    * are a pure function of the VALUE SET, and the merge is bottom-k of
    * the union, so the served estimates are batch-slicing-invariant AND
    * duplicate-append-safe — a replayed batch cannot perturb any
    * estimate even in the ledger's crash window (stronger than the
    * dedup store's distinct-pair argument).
    */
  def ingestKmvStore(rows: DataFrame, groupCol: String, valueCol: String,
                     table: String, k: Int, buckets: Int,
                     checkpointDir: String,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    ledgeredIngest(rows, table, checkpointDir, trigger) { batch =>
      graft.operators.IncrementalKmv.appendToStore(
        graft.operators.IncrementalKmv.sketchBatch(batch, groupCol, valueCol, k),
        table, groupCol, buckets)
    }

  /** Streaming ingest into the hyperplane-LSH embedding store: each
    * micro-batch bucketizes (idCol, vecCol) rows across the OR-amplified
    * tables and appends ([[graft.operators.IncrementalAnn]]). Defaults
    * are the q30/q51 constants so the accumulated store replays the
    * one-shot LSH oracle exactly; the pair derivation is a DISTINCT set,
    * so the ledger's crash window is answer-invariant (the dedup-store
    * argument).
    */
  def ingestAnnStore(rows: DataFrame, idCol: String, vecCol: String,
                     table: String, buckets: Int, checkpointDir: String,
                     nPlanes: Int = 12, nTables: Int = 2, dim: Int = 64,
                     seed: Long = 42L,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    ledgeredIngest(rows, table, checkpointDir, trigger) { batch =>
      graft.operators.IncrementalAnn.appendToStore(
        graft.operators.IncrementalAnn.bucketedEmbeddings(
          batch, idCol, vecCol, nPlanes, nTables, dim, seed),
        table, buckets)
    }
}
