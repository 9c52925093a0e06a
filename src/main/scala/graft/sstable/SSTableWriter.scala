package graft.sstable

import java.io.DataOutputStream

/** SSTable Data.db writer — the M3 write surface, mirroring the
  * reference's two row layouts exactly
  * (`output/SSTableOutputFormat.java:83-112`):
  *
  *  - versions < "ja" (e.g. "ic"): [u16 keyLen][key][i64 rowSize]
  *    [i32 ldt][i64 deletedAt][i32 columnCount][cells]
  *  - versions >= "ja" (e.g. "jb"): [u16 keyLen][key][i32 ldt]
  *    [i64 deletedAt][cells][u16 0 END_OF_ROW]
  *
  * Cell serialization is the exact inverse of [[SSTableScanner]];
  * correctness is proven by the round-trip golden test (write an older
  * version, re-read, byte-compare aeg-JSON — reference
  * AegisthusIntegrationTest.groovy:198-227). */
object SSTableWriter {

  def writeRow(out: DataOutputStream, row: CompactedRow, version: SSTableVersion): Unit = {
    out.writeShort(row.key.length)
    out.write(row.key)
    if (version.hasRowSizeAndColumnCount) {
      var dataSize = 16L // i32 ldt + i64 deletedAt + i32 columnCount
      row.columns.foreach(c => dataSize += cellSize(c))
      out.writeLong(dataSize)
      out.writeInt((row.deletedAt / 1000).toInt)
      out.writeLong(row.deletedAt)
      out.writeInt(row.columns.size)
      row.columns.foreach(writeCell(out, _))
    } else {
      out.writeInt((row.deletedAt / 1000).toInt)
      out.writeLong(row.deletedAt)
      row.columns.foreach(writeCell(out, _))
      out.writeShort(0) // END_OF_ROW
    }
  }

  def cellSize(c: CellOut): Long = c.kind match {
    case SSTableFormat.KindCounter => 2L + c.name.length + 1 + 8 + 8 + 4 + c.value.length
    case SSTableFormat.KindExpiring => 2L + c.name.length + 1 + 4 + 4 + 8 + 4 + c.value.length
    case _ => 2L + c.name.length + 1 + 8 + 4 + c.value.length
  }

  def writeCell(out: DataOutputStream, c: CellOut): Unit = {
    out.writeShort(c.name.length)
    out.write(c.name)
    c.kind match {
      case SSTableFormat.KindCounter =>
        out.writeByte(SSTableFormat.CounterMask)
        out.writeLong(c.tsOfLastDelete.getOrElse(Long.MinValue))
        out.writeLong(c.ts)
        out.writeInt(c.value.length)
        out.write(c.value)
      case SSTableFormat.KindExpiring =>
        out.writeByte(SSTableFormat.ExpirationMask)
        out.writeInt(c.ttl.getOrElse(0))
        out.writeInt(c.localDeletionTime.getOrElse(0))
        out.writeLong(c.ts)
        out.writeInt(c.value.length)
        out.write(c.value)
      case SSTableFormat.KindDeleted =>
        out.writeByte(SSTableFormat.DeletionMask)
        out.writeLong(c.ts)
        out.writeInt(c.value.length)
        out.write(c.value)
      case _ =>
        out.writeByte(0)
        out.writeLong(c.ts)
        out.writeInt(c.value.length)
        out.write(c.value)
    }
  }
}
