package graft

import java.nio.file.{Files, Paths}

/** Dev-side generator of SCALE-INSTANTIATED oracle SQL for the
  * corpus-adaptive dedup/eval queries. Their driver-gate oracles pin
  * the constants the engine derives at the 500-row fixture (k =
  * autoK(500) = 16, planesPerBand = 5, …); at an amplified dir the
  * engine derives different values, so re-checking correctness there
  * needs the SAME SQL generators re-run at the scale-derived
  * constants — which is exactly what this main does, using the very
  * `autoK`/`autoPlanesPerBand` policies the engine applies.
  *
  * Usage (after a `graft.Verify <scaledDir> <outDir> q_…` dump):
  *   runMain graft.ScaleOracles <embeddingsRowCount> <outFile>
  * then point `tools/scale_verify.py` at the dump with the emitted
  * file moved over its `oracle_sql.json`. */
object ScaleOracles {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong // embeddings row count of the target dir
    val outFile = args(1)
    val k = dedup.SemDedup.autoK(n)
    val ck = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    // planted-union constructs (2n rows) vs corpus-index constructs
    val pUnion = dedup.SrpDedup.autoPlanesPerBand(2 * n, 32)
    val pCorpus = dedup.SrpDedup.autoPlanesPerBand(n, 32)
    val d = SparkEntry.Duck
    val sqls = Map(
      "q_semdedup_auto" ->
        d.semdedupVerdictSql(d.kmeansAssignCtes(k), 0.4),
      "q_semdedup_hier" ->
        d.semdedupVerdictSql(d.kmeansAssignHierCtes(k, ck), 0.4),
      "q_semdedup_incr" -> d.semdedupIncrSql(k),
      "q_silhouette" -> d.silhouetteSql(k),
      "q_dedup_embed_lsh" -> d.srpPairs(4, pUnion, 64, 0.9, 10000000L),
      "q_embed_incr" -> d.srpProbePairs(4, pCorpus, 64, 0.9, 10000000L),
      "q_srp_recall" -> d.srpRecallSql(pUnion),
      // the stream twin's band geometry is an explicit parameter
      // (4×5), not derived from data — its gate SQL is already
      // scale-valid; re-emitted for a one-file verify flow
      "q_stream_embed_neardup" ->
        d.srpStreamBatched(4, 4, 5, 64, 0.9, 10000001L))
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = sqls.map { case (kq, v) => s"${q(kq)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(outFile), json)
    System.err.println(s"[scale-oracles] n=$n k=$k coarseK=$ck " +
      s"planesUnion=$pUnion planesCorpus=$pCorpus -> $outFile")
  }
}
