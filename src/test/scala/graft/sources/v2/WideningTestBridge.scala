package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Test-only shim over the package-private [[ParquetRowReader]] so specs
  * in `graft` can drive the custom reader's type-widening converters. */
object WideningTestBridge {
  def readAll(file: String, schema: StructType,
              conf: org.apache.hadoop.conf.Configuration): Seq[InternalRow] = {
    val rdr = new ParquetRowReader(file, schema, conf)
    val out = Seq.newBuilder[InternalRow]
    try while (rdr.next()) out += rdr.get().copy()
    finally rdr.close()
    out.result()
  }
}
