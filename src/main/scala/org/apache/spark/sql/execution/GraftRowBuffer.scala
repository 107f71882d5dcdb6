package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.expressions.UnsafeRow

/** Bridge into the `private[sql]` spill-capable row buffer — the same
  * library-owned-shim idiom as [[org.apache.spark.sql.GraftSql]]; no Spark
  * internals are modified.
  *
  * [[ExternalAppendOnlyUnsafeRowArray]] is exactly the structure
  * SortMergeJoinExec uses for its duplicate-key match buffer: rows are
  * held on-heap up to `numRowsInMemoryBufferThreshold`, then migrate to a
  * task-memory-managed [[org.apache.spark.util.collection.unsafe.sort.UnsafeExternalSorter]]
  * that spills to disk past `numRowsSpillThreshold` /
  * `sizeInBytesSpillThreshold` instead of OOMing the executor.
  * graft.plans.IntervalJoinExec buffers the current key's right-side rows
  * in one of these so a hot key (millions of events for one user) degrades
  * to disk gracefully — the argument order below mirrors
  * SortMergeJoinScanner's own construction (in-memory row threshold, spill
  * size threshold reused as the in-memory size threshold, spill row
  * threshold, spill size threshold).
  */
class GraftRowBuffer(
    numRowsInMemoryBufferThreshold: Int,
    numRowsSpillThreshold: Int,
    sizeInBytesSpillThreshold: Long) {
  private val arr = new ExternalAppendOnlyUnsafeRowArray(
    numRowsInMemoryBufferThreshold, sizeInBytesSpillThreshold,
    numRowsSpillThreshold, sizeInBytesSpillThreshold)

  /** Copies (or spills) the row — callers may pass a reused buffer. */
  def add(row: UnsafeRow): Unit = arr.add(row)
  def clear(): Unit = arr.clear()
  def length: Int = arr.length
  /** Cumulative bytes spilled to disk over the buffer's lifetime. */
  def spillSizeBytes: Long = arr.spillSize
  /** Iterator from `startIndex`. NOTE: when the buffer has spilled, the
    * returned rows share one reused backing buffer (the spill reader's),
    * and reaching `startIndex` costs a linear skip — the same contract and
    * cost SMJ's match-buffer replay has. Consumers must project/copy a row
    * before advancing.
    */
  def generateIterator(startIndex: Int): Iterator[UnsafeRow] =
    arr.generateIterator(startIndex)
}
