package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the sf dir given by
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A small warmup query
  * runs first so session/codegen init isn't billed to the first
  * measured query.
  *
  * Repeat protocol (round 7): the suite runs as `repeat` COMPLETE
  * passes and each query reports its MIN across passes. Round 5/6
  * ran the repeats of one query back-to-back, so a minutes-long
  * external load burst poisoned all three repeats of whatever
  * alphabetical block it overlapped (r6: q_semdedup→q_snapshot_diff
  * showed 4–13× with zero code change). Interleaving puts ~a full
  * suite between a query's repeats, so a burst must outlast the whole
  * run to bias a min. Queries under 0.3 s are timed once — at that
  * size JIT/GC noise dominates either way and re-running the many
  * fast queries would triple the wall clock.
  *
  * Plan hygiene: pass 1 also lints every query's physical plan
  * against the reviewed [[graft.plans.PlanLintAllowlist]] (the same
  * list `PlanLintSweepSpec` gates in `sbt test`) and aborts before
  * passes 2+ on any unreviewed finding — the driver's bench run fails
  * fast on a plan regression even when tests are skipped.
  *
  * Storage hygiene: after each pass the count of still-persistent
  * RDDs is logged. `clearCache()` covers DataFrame persists;
  * `localCheckpoint` blocks (PageRank/CC/k-means rounds) are released
  * by the ContextCleaner once unreferenced, so the count should not
  * grow monotonically across passes — growth means a query is pinning
  * checkpoint blocks.
  */
/** Pass-merge semantics for the bench repeat protocol, extracted so
  * the flaky-recovery contract is unit-testable without a bench run:
  * a query's reported time is the min over its SUCCESSFUL passes
  * (None = failure); only a query with zero successes reports as an
  * error, a partially-failed one is annotated flaky with its timing
  * kept (round-9 verdict item 7). */
object BenchProtocol {
  /** Fold one more pass result into the running min-of-successes. */
  def mergeMin(prev: Option[Double], next: Option[Double]): Option[Double] =
    (prev, next) match {
      case (Some(a), Some(b)) => Some(math.min(a, b))
      case (a, b) => a.orElse(b)
    }

  /** (isError, isFlaky) for a query given its final min and failure
    * count. */
  def classify(min: Option[Double], failures: Int): (Boolean, Boolean) =
    (min.isEmpty, min.nonEmpty && failures > 0)
}

object Bench {
  def main(args: Array[String]): Unit = {
    val only = args.toSet // optional query-name filter for iterating
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // runtime (AQE) broadcast decisions use MEASURED stage sizes, so
      // raising this threshold is scale-safe: a pair-verification side
      // that is 24 MB at sf0.1 broadcasts (skipping a multi-GB array
      // shuffle), while the same plan at 100 TB sees a huge measured
      // size and keeps the shuffle join. The STATIC threshold stays at
      // its 10 MB default — estimates lie, measurements don't.
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table + exercise codegen/shuffle machinery.
    // A broken fixture dir must NOT kill the run here — let each query
    // fail into the -1/error path below so the JSON line still names
    // every casualty instead of the driver seeing a bare crash.
    try {
      Tables.names.foreach(n => Tables(spark, sfDir, n).limit(1).count())
      SparkEntry.queries("q1_agg")(spark, sfDir).count()
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] WARMUP FAILED (continuing): ${
          Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.next().take(200)}")
    }
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "3").toInt

    val lintPairs = Set.newBuilder[(String, String)]
    // query name -> last error line + per-query failure counts. A
    // query with ZERO successful passes records -1 as its "time" — a
    // broken query must look BROKEN, not like a 0.07 s win (round 7:
    // 17 analysis-failing queries masqueraded as massive speedups
    // because the failure's elapsed time was logged). A query with ≥1
    // successful pass keeps the min of its SUCCESSFUL passes and is
    // annotated flaky instead — a transient single-repeat hiccup no
    // longer discards all valid timings (round-9 verdict item 7).
    val lastError = scala.collection.mutable.LinkedHashMap[String, String]()
    val failCount = scala.collection.mutable.LinkedHashMap[String, Int]()
    // lint CRASHES live here, not in the error maps: a query that
    // executed and timed fine but whose plan the linter choked on
    // keeps its timing (round-8 ADVICE — a lint-only failure was
    // discarding all valid timings and failing the whole run)
    val lintErrors = scala.collection.mutable.LinkedHashMap[String, String]()
    def timeOnce(name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                 lint: Boolean): Option[Double] = {
      val t0 = System.nanoTime()
      // toRdd.count() executes the FULL physical plan (projections,
      // sorts and all) — df.count() would let Catalyst prune every
      // unused projection and fake the timing of select-only queries
      // QueryGuard: a hung query times out into the normal error path
      // (-1 + errors entry) instead of wedging the whole bench run
      // (round 13: BENCH_r13.json was rc=124 with no JSON line at all)
      val df = try {
        QueryGuard.run(spark, name) {
          val d = fn(spark, sfDir)
          d.queryExecution.toRdd.count()
          Some(d)
        }
      } catch {
        case e: Throwable =>
          lastError(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.next().take(200)
          failCount(name) = failCount.getOrElse(name, 0) + 1
          None
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // lint OUTSIDE the timer, on the already-planned frame; a lint
      // CRASH (unplannable subtree the execution somehow dodged) is
      // reported loudly but separately — the execution timing stands
      if (lint) df.foreach { d =>
        try lintPairs ++= graft.plans.PlanLint.lint(d)
          .map(f => name -> f.rule)
        catch {
          case e: Throwable =>
            lintErrors(name) = "plan-lint: " +
              Option(e.getMessage).getOrElse(e.getClass.getName)
                .linesIterator.next().take(200)
        }
      }
      // queries persist() shared subtrees and never unpersist (the
      // caller owns lifetime); drop them so storage from 50 earlier
      // queries doesn't squeeze this one's execution memory
      spark.catalog.clearCache()
      df.map(_ => sec)
    }

    // iterative queries (PageRank/CC/k-means rounds holding
    // localCheckpoint blocks) run LAST in each pass: their checkpoint
    // blocks + JIT churn measurably bleed into whatever runs next when
    // they sit mid-pass (round-8 adjudication of the q_pagerank
    // interleaved-vs-solo gap, BASELINE.md), so the alphabetical order
    // is kept within each group but the block-pinning group trails
    val iterative = Set("q_pagerank", "q_dedup_clusters", "q_clusters_incr",
      "q_entity_resolution", "q_er_survivorship", "q_kmeans_update",
      "q_hierarchy", "q_dedup_curve",
      // r9 additions that iterate with localCheckpoint blocks: LPA
      // rounds, BT MM rounds, BPE merge rounds, image CC clusters
      "q_communities", "q_btl_rank", "q_bpe_train", "q_bpe_encode",
      "q_wordpiece_train", "q_wordpiece_encode", "q_wordpiece_infer",
      "q_image_clusters", "q_ppr", "q_walks", "q_walk_cooc",
      // r9 session 4: h-index coreness + power-iteration rounds
      // localCheckpoint too
      "q_kcore", "q_principal_dir",
      // r10: HITS hub/authority rounds localCheckpoint per half-step;
      // SCC color/mark fixed points checkpoint per round
      "q_hits", "q_scc",
      // r11: coreset localCheckpoints per selection round; condense
      // reads the saved SCC labeling (fold-back join) but stages the
      // peel loop when the artifact is cold — keep it behind q_scc
      // in the trailing group per the house rule
      "q_scc_condense", "q_coreset",
      // r11: BFS frontier rounds checkpoint per hop; weighted
      // Bellman-Ford rounds and the seed-coverage audit likewise
      "q_sssp", "q_sssp_weighted", "q_sssp_incr", "q_seed_expansion",
      // r14: the weighted incremental checkpoints per repair round;
      // centrality's bitset BFS and HyperBall's register merges
      // checkpoint per hop/radius; q_graph_diameter stages the
      // HyperBall loop when its saved nf artifact is cold (the
      // q_scc_condense precedent)
      "q_sssp_weighted_incr", "q_centrality", "q_hyperball",
      "q_graph_diameter",
      // r15: the incremental register repair checkpoints per radius
      // and stages the full propagation when its artifact is cold;
      // the delete repair checkpoints per sweep/re-derive round
      "q_hyperball_incr", "q_sssp_delete", "q_sssp_weighted_delete",
      // betweenness runs two tagged passes with per-hop/per-level
      // checkpoints — iterative like its centrality siblings; the
      // k-truss peel checkpoints per round
      "q_betweenness", "q_ktruss", "q_trussness",
      // r16: the m=64 production-accuracy HyperBall tier checkpoints
      // per radius like q_hyperball; PQ training holds a persisted
      // subvector frame across Lloyd rounds with per-round
      // checkpoints like q_kmeans_update; the warm-start resume
      // stages the saved-schedule artifact when cold and checkpoints
      // its result like q_pagerank
      "q_hyperball64", "q_pq_train", "q_pagerank_incr",
      // r16: the truss repairs checkpoint per expansion/peel round
      // and stage their saved artifacts when cold
      "q_ktruss_incr", "q_trussness_incr", "q_ktruss_delete",
      "q_pagerank_delete",
      // r16: the PQ index append stages its saved code table when cold
      "q_pq_incr",
      // r17: trained IVFADC holds the persisted residual-subvector
      // frame across its Lloyd round like q_pq_train; the graph warm
      // starts stage their saved artifacts when cold and checkpoint
      // per round like their r16 PageRank siblings
      "q_pq_ivfadc", "q_kcore_incr", "q_kcore_delete", "q_hits_incr",
      "q_communities_incr", "q_hits_delete", "q_communities_delete",
      "q_trussness_delete", "q_pagerank_weighted", "q_ppr_incr",
      // r18: the clusterable-mixture IVFADC twin holds the same
      // persisted residual frame + Lloyd round as q_pq_ivfadc; the
      // rank-family completions stage artifacts when cold and
      // checkpoint per round like their r16/r17 siblings
      "q_pq_ivfadc_mix", "q_ppr_delete", "q_pagerank_weighted_incr",
      "q_pagerank_weighted_delete",
      // r18: the planner gates run whichever truss route the counts
      // pick — repair and cold peel both checkpoint per round and
      // stage artifacts when cold; the SQ8/BQ index appends stage
      // their code/word/range artifacts when cold like q_pq_incr
      "q_ktruss_auto_ins", "q_ktruss_auto_del",
      "q_vec_sq_incr", "q_vec_bq_incr",
      // r18: the trickle repair checkpoints per expansion hop and
      // region round, and stages its converged artifact when cold;
      // the mixture ByCell funnels checkpoint the literal-heavy
      // mixture projection up front
      "q_kcore_trickle", "q_vec_sq_ivf", "q_vec_bq_ivf",
      "q_ann_mrl_ivf",
      // r18: the weighted-personalized rank members stage artifacts
      // when cold and checkpoint like their family siblings
      "q_ppr_weighted", "q_ppr_weighted_incr", "q_ppr_weighted_delete")
    // within the trailing group, q_pagerank goes FIRST: it is the one
    // query measurably sensitive to iterative predecessors (r8/r9
    // adjudication in BASELINE.md — running it after the other seven
    // cost ~1.8 s with a byte-identical plan), so the known victim
    // gets the group's cleanest slot
    val names = SparkEntry.queries.toSeq
      .sortBy { case (name, _) =>
        (iterative.contains(name),
          if (name == "q_pagerank") "" else name)
      }
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
    // min over SUCCESSFUL passes only; None = no success yet
    val mins = scala.collection.mutable.LinkedHashMap[String, Option[Double]]()
    val runs = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    for (pass <- 1 to repeat) {
      names.foreach { case (name, fn) =>
        // fast queries are timed on pass 1 only; a not-yet-successful
        // query IS retried on later passes (flaky recovery)
        if (pass == 1 || mins(name).forall(_ >= 0.3)) {
          val sec = timeOnce(name, fn, lint = pass == 1)
          mins(name) =
            if (pass == 1) sec else BenchProtocol.mergeMin(mins(name), sec)
          runs(name) += 1
        }
      }
      // prompt the ContextCleaner so unreferenced localCheckpoint blocks
      // are released before the storage reading
      System.gc()
      val cached = spark.sparkContext.getPersistentRDDs.size
      System.err.println(s"[bench] pass $pass/$repeat done; persistent RDDs: $cached")
      if (pass == 1) {
        val unallowed = lintPairs.result() -- graft.plans.PlanLintAllowlist.allowed
        System.err.println(s"[bench] plan-lint: ${unallowed.size} unallowed")
        if (unallowed.nonEmpty) {
          System.err.println("[bench] PLAN REGRESSION — unreviewed lint findings:\n  " +
            unallowed.toSeq.sorted.mkString("\n  "))
          spark.stop()
          sys.exit(1)
        }
      }
    }
    // errors = zero successful passes; flaky = some passes failed but
    // ≥1 succeeded (timing kept, failure count annotated)
    val errors = lastError.filter { case (n, _) =>
      BenchProtocol.classify(mins.get(n).flatten, failCount(n))._1 }
    val flaky = failCount.filter { case (n, c) =>
      BenchProtocol.classify(mins.get(n).flatten, c)._2 }
    mins.foreach { case (name, sec) =>
      System.err.println(f"[bench] $name%-22s ${sec.getOrElse(-1.0)}%9.2f s (${runs(name)} run(s)${
        failCount.get(name).map(f => s", $f FAILED").getOrElse("")})")
    }
    errors.foreach { case (name, msg) =>
      System.err.println(s"[bench] ERROR $name: $msg")
    }
    flaky.foreach { case (name, n) =>
      System.err.println(s"[bench] FLAKY $name: $n failed pass(es), " +
        s"kept min of ${runs(name) - n} success(es): ${lastError(name)}")
    }
    lintErrors.foreach { case (name, msg) =>
      System.err.println(s"[bench] LINT-ERROR $name: $msg")
    }
    val results = mins.toSeq.map { case (n, s) => (n, s.getOrElse(-1.0)) }
    // 3 decimals: the line must stay short — the harness captures only
    // the TAIL of stdout, and a 100-query dict with nanosecond digits
    // pushed the leading total out of the captured window in round 4.
    // explicit ROOT locale: the f"" interpolator uses the default
    // locale, which on a comma-decimal JVM would emit invalid JSON
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    // errored queries carry -1 in "queries"; the total sums only real
    // timings so one broken query can't zero out or inflate the figure
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val totalS = num(total)
    val errs = errors.keys.map("\"" + _ + "\"").mkString("[", ",", "]")
    val flakies = flaky.map { case (n, c) => "\"" + n + "\":" + c }
      .mkString("{", ",", "}")
    val lintErrs = lintErrors.keys.map("\"" + _ + "\"").mkString("[", ",", "]")
    // trailing DUPLICATE metric/value/unit keys: the harness may keep
    // only the tail of a long stdout line, and JSON last-wins on
    // duplicate keys — so a head-truncated capture that still has the
    // closing braces parses to the same total (round-8 ADVICE)
    val line =
      s"""{"metric":"total","value":$totalS,"unit":"sec","errors":$errs,"flaky":$flakies,"lint_errors":$lintErrs,"queries":$qs,"sf":"$sfDir","metric":"total","value":$totalS,"unit":"sec"}"""
    println(s"total=${totalS}s queries=${results.size} errors=${errors.size}" +
      s" flaky=${flaky.size} lint_errors=${lintErrors.size} file=bench_out.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_out.json write failed: ${e.getMessage}")
    }
    println(line)
    // compact summary printed LAST: the driver captures only the TAIL
    // of stdout, and in rounds 11–12 the giant per-query line above
    // scrolled past the 4KB window when printed last — so the final
    // line is a short, self-contained JSON record (same metric/value/
    // unit/sf contract, top-10 slowest instead of the full map) that
    // always fits; bench_out.json keeps the audit-proof full map
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$totalS,"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"n_flaky":${flaky.size},"n_lint_errors":${lintErrors.size},"slowest":$slowest,"full":"bench_out.json","sf":"$sfDir"}""")
    spark.stop()
    // broken queries must fail the run loudly (driver + local loops
    // both see rc≠0), with the JSON line already emitted above; a
    // lint-only crash is a distinct nonzero code — timings are valid
    // but the linter needs fixing
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries FAILED")
      sys.exit(2)
    }
    if (lintErrors.nonEmpty) {
      System.err.println(s"[bench] ${lintErrors.size} queries had lint crashes")
      sys.exit(3)
    }
  }
}
