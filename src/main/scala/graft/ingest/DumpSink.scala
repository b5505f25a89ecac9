package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types._

import graft.ingest.InsertParser._

/** Statement re-synthesis: DataFrame rows → `INSERT INTO …` statements
  * (the dump sink path — reference `to_query`,
  * `source/postgres.rs:499-546`, with `'` → `''` escaping).
  *
  * Runs as a typed `map` on executors; the output Dataset[String] is
  * what the chunked datastore writer persists.
  */
object DumpSink {

  def toInsertStatements(df: DataFrame, database: String, table: String): Dataset[String] = {
    import df.sparkSession.implicits._
    val schema = df.schema
    val cols = schema.fields.map(_.name).toVector
    df.map { row =>
      val values: Vector[SqlValue] = schema.fields.toVector.zipWithIndex.map {
        case (f, i) =>
          if (row.isNullAt(i)) SqlNull
          else f.dataType match {
            case ByteType => SqlLong(row.getByte(i).toLong)
            case ShortType => SqlLong(row.getShort(i).toLong)
            case IntegerType => SqlLong(row.getInt(i).toLong)
            case LongType => SqlLong(row.getLong(i))
            case FloatType => SqlDouble(row.getFloat(i).toDouble)
            case DoubleType => SqlDouble(row.getDouble(i))
            case _: DecimalType => SqlDecimal(row.getDecimal(i))
            case BooleanType => SqlBool(row.getBoolean(i))
            case _ => SqlString(String.valueOf(row.get(i)))
          }
      }
      toQuery(Insert(database, table, cols, values))
    }
  }
}
