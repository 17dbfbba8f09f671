package graft.util

import org.apache.hadoop.conf.Configuration

import java.io.{ObjectInputStream, ObjectOutputStream}

/** Java-serializable carrier for a Hadoop [[Configuration]] (which is
  * `Writable` but not `Serializable`), so an expression constructed on
  * the driver can ship the driver's `spark.hadoop.*` settings — object
  * store credentials, `fs.<scheme>.impl` bindings — to the executors
  * where it actually evaluates. Without it, an executor-side
  * `new Configuration()` silently drops every session-level filesystem
  * setting ([[graft.functions.BloomRegistry]] was the caller that hit
  * this). The write/readFields round-trip is the standard public
  * pattern for shipping Hadoop conf through Java serialization. */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  require(value != null, "null Configuration")

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
