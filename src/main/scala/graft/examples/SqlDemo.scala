package graft.examples
import org.apache.spark.sql.SparkSession
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions","2")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("embeddings")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("documents")
    println("=== SQL surface: custom expressions ===")
    spark.sql("""
      SELECT e.vec_id,
             round(vec_dot(e.embedding, q.embedding) /
                   (sqrt(vec_dot(e.embedding, e.embedding)) * sqrt(vec_dot(q.embedding, q.embedding))), 4) AS cos
      FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      ORDER BY cos DESC LIMIT 5""").show()
    spark.sql("""
      SELECT doc_id, simhash64(split(lower(text), '\\s+')) AS simhash,
             minhash_sig(shingle_set(text, 3), 4)[0] AS minhash0
      FROM documents ORDER BY doc_id LIMIT 3""").show(false)
    spark.sql("""
      SELECT doc_id, size(tokens(text)) AS n_tokens,
             quality_score(text) AS quality,
             round(char_bigram_entropy(lower(text)).bigram_entropy, 3) AS bigram_h
      FROM documents ORDER BY doc_id LIMIT 3""").show(false)
    spark.sql("""
      SELECT vec_id, nearest_centroid(embedding,
               array(0, 1),
               array(array(1.0, 0.0, 0.0, 0.0), array(0.0, 1.0, 0.0, 0.0)))
               AS cell
      FROM (SELECT vec_id, slice(embedding, 1, 4) AS embedding
            FROM embeddings) ORDER BY vec_id LIMIT 3""").show(false)
    spark.stop()
  }
}
