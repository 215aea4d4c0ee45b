package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Serializable wrapper around a Hadoop `Configuration`, so executor-side
  * tasks reuse the driver session's settings (object-store credentials,
  * site config) instead of rebuilding defaults with `new Configuration()`.
  * Same pattern as Spark's own (private) `SerializableConfiguration`;
  * `Configuration` itself is `Writable` but not `Serializable`.
  */
class HadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object HadoopConf {
  /** Capture the session's Hadoop conf for use inside task closures. */
  def apply(spark: SparkSession): HadoopConf =
    new HadoopConf(spark.sparkContext.hadoopConfiguration)
}
