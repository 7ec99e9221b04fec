package graft
import graft.ops.SimilarityOps
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.build("8", Map("spark.sql.session.timeZone" -> "UTC"))
    val sf = "/root/testdata/sf0.01"
    val bf = SimilarityOps.knnClassify(s, sf).collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    for (np <- Seq(4, 6, 8)) {
      s.catalog.clearCache()
      val ivf = SimilarityOps.knnClassifyIvf(s, sf, nProbe = np).collect().map(r => (r.getLong(0), r.getInt(2)))
      val agree = ivf.count(r => bf(r._1) == r._2).toDouble / ivf.length
      println(f"AGREEMENT nProbe=$np: $agree%.3f over ${ivf.length} queries")
    }
    s.stop()
  }
}
