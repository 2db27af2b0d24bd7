package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextOps
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def time[T](n: String)(f: => T): Unit = { val t0 = System.nanoTime(); f; println(s"== $n: ${(System.nanoTime()-t0)/1e9}s") }
    time("warmup")(docs.count())
    time("shingle_set")(docs.select(graft.functions.shingle_set(col("text"),3).as("sh")).selectExpr("sum(size(sh))").collect())
    time("sig32_native")(docs.select(graft.functions.minhash_sig(col("text"),3,32).as("s")).selectExpr("sum(size(s))").collect())
    time("bands_native")(docs.select(posexplode(graft.functions.minhash_bands(col("text"),3,8,4))).count())
    time("simhash_native")(docs.select(graft.functions.simhash64(col("text"))).count())
    time("cands")(Dedup.lshCandidates(docs,"doc_id","text").count())
    time("full")(Dedup.nearDupPairs(docs,"doc_id","text",0.9).count())
    spark.stop()
  }
}
