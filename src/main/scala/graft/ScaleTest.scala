package graft

import org.apache.spark.sql.SparkSession

/** Scale-stress harness (round-9 verdict item 1): measures the
  * heaviest queries at sf0.1 AND at a [[ScaleData]]-amplified
  * sf1-equivalent (10× rows, remapped keys), emitting one JSON file
  * with per-query timings, row counts, and the scaled/base ratio —
  * converting the repo's "plans survive 100×" design arguments into
  * recorded measurements.
  *
  * Protocol: pass A times every query at the base dir, pass B at the
  * amplified dir, pass C re-times the base dir; base takes min(A, C)
  * so the scaled pass is never advantaged by later-JIT warmup while
  * the cheap base passes absorb it. Each timing executes the full
  * physical plan (`toRdd.count`, as in [[Bench]]).
  *
  * Reading the ratios: a query whose work is ∝ data should show
  * ratio ≈ factor (linear); iterative graph queries pay factor× per
  * round with unchanged round count, so linear too. Queries marked
  * `capped` select a constant-size slice by construction under the
  * interleaved key remap (see [[ScaleData]]) and are expected near
  * 1× — they are included to prove the amplified dir is a drop-in
  * `sfDir`, not to demonstrate scaling. Streaming entries carry the
  * documented ~1 s/micro-batch startup floor as a constant offset.
  */
object ScaleTest {

  /** Heavy-family queries measured at scale: graph, dedup, ANN/
    * vector, text/tokenizer, SQL/window, streaming-twin. */
  val heavy: Seq[String] = Seq(
    // graph (iterative + join-heavy)
    "q_pagerank", "q_ppr", "q_communities", "q_kcore", "q_triangles",
    "q_link_predict", "q_walks", "q_walk_cooc", "q_hierarchy",
    "q_graph_stats", "q_hits", "q_scc", "q_sssp", "q_sssp_weighted",
    "q_sssp_incr", "q_seed_expansion",
    // r14 additions: weighted incremental repair and the
    // saved-artifact diameter metrics (pre-stage their artifacts on
    // the scaled dir or pass B prices staging), bitset pivot
    // centrality (BFS-cost at k ≤ 64), HyperBall all-nodes
    // centrality (m·V register state, O(radius) passes)
    "q_sssp_weighted_incr", "q_centrality", "q_hyperball",
    "q_graph_diameter",
    // r15: incremental HyperBall repair and BFS delete repair (saved
    // artifacts — pre-stage on the scaled dir, the q_sssp_incr
    // discipline)
    "q_hyperball_incr", "q_sssp_delete", "q_sssp_weighted_delete",
    "q_betweenness", "q_ktruss", "q_trussness",
    // dedup
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_ngram",
    "q_dedup_simhash", "q_dedup_embed", "q_semdedup",
    "q_dedup_clusters", "q_dedup_curve",
    // r10 scale fixes for the fixed-granularity quadratics: adaptive
    // cluster count and SRP-banded near-dup (BASELINE 100×-extension)
    "q_semdedup_auto", "q_semdedup_hier", "q_semdedup_incr",
    "q_dedup_embed_lsh", "q_embed_incr",
    // ANN / vectors
    "q_knn_brute", "q_knn_ivf", "q_sparse_cosine", "q_principal_dir",
    "q_coreset",
    // text / tokenizer
    "q_vocab", "q_bpe_train", "q_wordpiece_train", "q_perplexity",
    "q_perplexity_backoff", "q_quality_filter",
    // r10 additions: cross-domain LM matrix, curation manifest,
    // unigram hard-EM training, learned-cell ANN recall
    "q_domain_xent", "q_mix_manifest", "q_unigram_train",
    "q_ann_recall_probe2",
    // SQL / window / merge
    "q_gap_fill", "q_cdc_apply", "q_upsert", "q_scd2",
    "q_tpch_01", "q_tpch_05", "q_tpch_09", "q_assoc_rules",
    // capped-by-construction probes (constant slice under the
    // interleaved remap; expected ~1x)
    "q_sessionize",
    // streaming twin (micro-batch startup floor is a constant offset)
    "q_stream_dedup")

  /** Queries whose fixture filters select a constant-size slice under
    * the interleaved key remap — expected ~1×, reported as capped:
    * the bounded co-purchase graphs (`l_orderkey < 1500/15000`), the
    * fixed query set of brute-force knn (`vec_id < 5`), and the
    * 20-user sessionize slice. They are included to prove the
    * amplified dir is a drop-in sfDir, not to demonstrate scaling. */
  val capped: Set[String] = Set("q_sessionize", "q_knn_brute",
    "q_graph_stats", "q_triangles", "q_kcore", "q_link_predict",
    "q_walks", "q_walk_cooc", "q_scc", "q_ktruss", "q_trussness",
    "q_ktruss_incr", "q_trussness_incr", "q_ktruss_delete")

  def main(args: Array[String]): Unit = {
    val only = args.toSet
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "target/scale/sf1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
      "SCALETEST_r10.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same AQE posture as Bench: runtime broadcast decisions use
      // measured sizes, so this is the scale-safe knob to raise
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!ScaleData.isAmplified(scaleDir, srcDir, factor)) {
      System.err.println(s"[scale] amplifying $srcDir x$factor -> $scaleDir")
      val t0 = System.nanoTime()
      ScaleData.amplify(spark, srcDir, scaleDir, factor)
      System.err.println(f"[scale] amplified in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } else System.err.println(s"[scale] reusing amplified $scaleDir")

    // warmup both dirs: table touch + one full query (session/codegen
    // init must not bill to the first measured query)
    try {
      Seq(srcDir, scaleDir).foreach { d =>
        Tables.names.foreach(n => Tables(spark, d, n).limit(1).count())
        SparkEntry.queries("q1_agg")(spark, d).count()
      }
    } catch { case e: Throwable =>
      System.err.println(s"[scale] WARMUP FAILED (continuing): ${e.getMessage}")
    }

    // `only` may name ANY SparkEntry query (e.g. the full TPC-H suite
    // at scale), not just the default heavy set; default-run order
    // stays the curated heavy sequence
    val names =
      if (only.isEmpty) heavy
      else (heavy ++ SparkEntry.queries.keys.toSeq.sorted
        .filterNot(heavy.toSet)).filter(only.contains)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    // (seconds, rows) for one full-plan execution
    def timeOnce(name: String, dir: String): Option[(Double, Long)] = {
      val t0 = System.nanoTime()
      val r = try {
        val rows = SparkEntry.queries(name)(spark, dir)
          .queryExecution.toRdd.count()
        Some(((System.nanoTime() - t0) / 1e9, rows))
      } catch { case e: Throwable =>
        errors(name) = s"$dir: " +
          Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.next().take(200)
        None
      }
      spark.catalog.clearCache()
      r
    }

    val baseA = scala.collection.mutable.LinkedHashMap[String, Option[(Double, Long)]]()
    val scaled = scala.collection.mutable.LinkedHashMap[String, Option[(Double, Long)]]()
    val baseC = scala.collection.mutable.LinkedHashMap[String, Option[(Double, Long)]]()
    names.foreach { n =>
      baseA(n) = timeOnce(n, srcDir)
      System.err.println(f"[scale] base-A  $n%-22s ${baseA(n).fold(-1.0)(_._1)}%8.2f s")
    }
    names.foreach { n =>
      scaled(n) = timeOnce(n, scaleDir)
      System.err.println(f"[scale] scaled  $n%-22s ${scaled(n).fold(-1.0)(_._1)}%8.2f s")
    }
    names.foreach { n =>
      baseC(n) = timeOnce(n, srcDir)
      System.err.println(f"[scale] base-C  $n%-22s ${baseC(n).fold(-1.0)(_._1)}%8.2f s")
    }

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val entries = names.map { n =>
      val b = (baseA(n), baseC(n)) match {
        case (Some((a, r)), Some((c, _))) => Some((math.min(a, c), r))
        case (a, c) => a.orElse(c)
      }
      val s = scaled(n)
      val ratio = for ((bs, _) <- b; (ss, _) <- s if bs > 0)
        yield ss / bs
      s""""$n":{"base_s":${b.fold("null")(x => num(x._1))},""" +
        s""""scaled_s":${s.fold("null")(x => num(x._1))},""" +
        s""""ratio":${ratio.fold("null")(num)},""" +
        s""""base_rows":${b.fold("null")(_._2.toString)},""" +
        s""""scaled_rows":${s.fold("null")(_._2.toString)},""" +
        s""""capped":${capped.contains(n)}}"""
    }
    val totalBase = names.flatMap(n => (baseA(n), baseC(n)) match {
      case (Some((a, _)), Some((c, _))) => Some(math.min(a, c))
      case (a, c) => a.orElse(c).map(_._1)
    }).sum
    val totalScaled = names.flatMap(n => scaled(n).map(_._1)).sum
    val errs = errors.map { case (n, m) =>
      s""""$n":"${m.replace("\\", "\\\\").replace("\"", "\\\"")}""""
    }.mkString("{", ",", "}")
    val json =
      s"""{"factor":$factor,"src":"$srcDir","scaled_dir":"$scaleDir",""" +
        s""""total_base_s":${num(totalBase)},"total_scaled_s":${num(totalScaled)},""" +
        s""""errors":$errs,"queries":{${entries.mkString(",")}}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    println(s"scale_total_base=${num(totalBase)}s scale_total_scaled=" +
      s"${num(totalScaled)}s factor=$factor queries=${names.size} " +
      s"errors=${errors.size} file=$outFile")
    println(json)
    errors.foreach { case (n, m) => System.err.println(s"[scale] ERROR $n: $m") }
    spark.stop()
    if (errors.nonEmpty) sys.exit(2)
  }
}
