package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Creation-time parameters of a derived store (ANN codes, BM25
  * postings, MinHash signatures), recorded NEXT TO the store's data the
  * way a table manifest records its partition spec. The shard fan-out
  * is the load-bearing one: a delete's shard arithmetic must reproduce
  * the build's, so the number can never be a session constant — at a
  * true 100 TB corpus the right fan-out is a capacity decision made at
  * store creation (32 shards of a 100 TB corpus are ~3 TB each), and
  * every probe/append/delete path reads the recorded value. A store
  * without the file (legacy) keeps the historical default.
  */
object StoreParams {

  private def path(storeDir: String) = s"$storeDir/_store_params.tsv"

  /** Record `params` (k→int lines, tab-separated). Called once by the
    * store's build step, before any data lands.
    */
  def write(spark: SparkSession, storeDir: String,
      params: Map[String, Int]): Unit = {
    val p = new Path(path(storeDir))
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(p.getParent)
    val out = f.create(p, true)
    try out.write(params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k\t$v" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The recorded parameters; empty for a legacy store (no file). */
  def read(spark: SparkSession, storeDir: String): Map[String, Int] = {
    val p = new Path(path(storeDir))
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Map.empty
    else {
      val in = f.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      text.split('\n').filter(_.nonEmpty).map { line =>
        val Array(k, v) = line.split('\t')
        k -> v.toInt
      }.toMap
    }
  }

  /** One recorded int, with the legacy default. */
  def int(spark: SparkSession, storeDir: String, key: String,
      default: Int): Int = read(spark, storeDir).getOrElse(key, default)
}
