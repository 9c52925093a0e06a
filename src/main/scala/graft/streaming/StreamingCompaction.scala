package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.sstable.{AtomRec, CassType, SSTableFormat}

/** Incremental (streaming) compaction: the A1 merge recast as a
  * merge-associative per-key state machine under mapGroupsWithState —
  * the design SURVEY §2.9 calls for ("design the compaction Aggregator
  * to be merge-associative so it could later run under
  * mapGroupsWithState").
  *
  * Scope: last-writer-wins cells + row-tombstone watermark. Range
  * tombstones are deliberately excluded — the reference documents that
  * RT semantics require batch completeness ("This will not be true if
  * we go to partial incremental processing",
  * `CassSSTableReducer.java:143-146`); an RT atom in the stream throws.
  *
  * State per key is bounded by live column count (cells map), not by
  * input size — wide-row safe like the batch merge.
  */
object StreamingCompaction {

  final case class CellSt(ts: Long, kind: String)
  final case class RowState(deletedAt: Long, cells: Map[String, CellSt])
  final case class RowUpdate(keyHex: String, deletedAt: Long, nLiveColumns: Int)

  /** Merge a batch of atoms into row state — associative and
    * commutative up to timestamp ties (LWW keeps the higher ts; equal
    * ts keeps the incumbent, matching the batch merge's sorted-input
    * behavior for distinct values). */
  def mergeAtoms(st: RowState, atoms: Iterator[AtomRec]): RowState = {
    var deletedAt = st.deletedAt
    var cells = st.cells
    atoms.foreach { a =>
      if (a.rowDeletedAt > deletedAt) deletedAt = a.rowDeletedAt
      a.kind match {
        case SSTableFormat.KindEmptyRow => ()
        case SSTableFormat.KindRangeTombstone =>
          throw new UnsupportedOperationException(
            "range tombstones require batch compaction (reference CassSSTableReducer.java:143-146)")
        case _ =>
          val nameHex = CassType.hex(a.name)
          val ts = a.ts.get
          cells.get(nameHex) match {
            case Some(c) if ts <= c.ts => ()
            case _ => cells = cells.updated(nameHex, CellSt(ts, a.kind))
          }
      }
    }
    RowState(deletedAt, cells)
  }

  def liveColumns(st: RowState): Int = st.cells.count(_._2.ts > st.deletedAt)

  /** Streaming (or batch) incremental compaction: emits the current
    * compacted view of each row key on every update. */
  def compactIncremental(atoms: Dataset[AtomRec]): Dataset[RowUpdate] = {
    val spark = atoms.sparkSession
    import spark.implicits._
    atoms.groupByKey(a => CassType.hex(a.key))
      .mapGroupsWithState[RowState, RowUpdate](GroupStateTimeout.NoTimeout) {
        (keyHex, it, state: GroupState[RowState]) =>
          val st0 = state.getOption.getOrElse(RowState(Long.MinValue, Map.empty))
          val st = mergeAtoms(st0, it)
          state.update(st)
          RowUpdate(keyHex, st.deletedAt, liveColumns(st))
      }
  }
}
