package graft.sources

import org.apache.hadoop.conf.Configuration

/** Java-serializable Hadoop Configuration carrier for DSv2 factories.
  *
  * Reader/writer factories are constructed on the DRIVER (where the
  * session's `spark.hadoop.*` settings — object-store credentials,
  * filesystem tuning — are resolved into a Configuration) and then
  * serialized to executors. A bare `new Configuration()` executor-side
  * only loads classpath defaults, silently dropping every
  * session-supplied setting; this wrapper ships the resolved
  * configuration with the factory instead (same approach as Spark's
  * internal SerializableConfiguration, re-derived here because that
  * class is not public API).
  */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object SerializableHadoopConf {
  /** The active session's resolved Hadoop conf (driver side); falls
    * back to classpath defaults outside a session (tests constructing
    * factories directly). */
  def fromSession(): SerializableHadoopConf =
    new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new Configuration()))
}
