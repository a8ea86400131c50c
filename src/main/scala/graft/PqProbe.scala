package graft
import org.apache.spark.sql.SparkSession
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(emb("vec_id") < 10)
    val brute = graft.simops.Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((m, k) <- Seq((8, 16), (8, 64), (16, 16), (16, 64), (32, 16))) {
      val pq = graft.simops.Embed.pqTopK(q, emb, "vec_id", "embedding", kNN = 5,
        m = m, k = k, iters = 1, fitSamplePct = 60)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"PQPROBE m=$m k=$k recall=${pq.intersect(brute).size.toDouble / brute.size}%.3f")
    }
    // OPQ variance-balancing permutation vs natural split at fixed
    // m/k. Permutation is orthogonal, so brute-force neighbors are
    // unchanged — any recall delta is purely the allocation. On this
    // near-isotropic synthetic corpus expect ~neutral (the gain
    // tracks per-dim variance anisotropy, see Embed.opqVarPermutation).
    val perm = graft.simops.Embed.opqVarPermutation(emb, "vec_id", "embedding")
    def permF(df: org.apache.spark.sql.DataFrame) =
      graft.simops.Embed.permuted(df, "vec_id", "embedding", perm)
    for ((m, k) <- Seq((8, 16), (16, 16))) {
      val opq = graft.simops.Embed.pqTopK(permF(q), permF(emb),
        "vec_id", "embedding", kNN = 5, m = m, k = k, iters = 1,
        fitSamplePct = 60)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val raw = graft.simops.Embed.pqTopK(q, emb, "vec_id", "embedding",
        kNN = 5, m = m, k = k, iters = 1, fitSamplePct = 60)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"PQPROBE opq m=$m k=$k raw=${raw.intersect(brute).size.toDouble / brute.size}%.3f" +
        f" opq=${opq.intersect(brute).size.toDouble / brute.size}%.3f")
    }
    // residual vs raw encoding at fixed m/k: IVFADC quantizes the
    // within-list residual cell, so recall should rise at the same
    // code budget. nprobe=16/nlist=16 scans every list — isolates the
    // ENCODING effect from list-pruning recall loss.
    for ((m, k) <- Seq((8, 16), (16, 16), (32, 16))) {
      def ivfpq(res: Boolean) = graft.simops.Embed.ivfPqTopK(q, emb,
          "vec_id", "embedding", kNN = 5, nlist = 16, nprobe = 16,
          m = m, k = k, iters = 1, fitSamplePct = 60, residual = res)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val raw = ivfpq(false); val res = ivfpq(true)
      println(f"PQPROBE ivfpq m=$m k=$k raw=${raw.intersect(brute).size.toDouble / brute.size}%.3f" +
        f" residual=${res.intersect(brute).size.toDouble / brute.size}%.3f")
    }
    spark.stop()
  }
}
