package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}

/** Config-loadable extensions entry point:
  * `spark.sql.extensions=graft.plans.GraftExtensions` applies every
  * graft planner extension at session build time (instantiated
  * reflectively by Spark, hence the zero-arg top-level class). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    NativeAsofJoin.inject(ext)
}

/** Native as-of join as a WHOLE-OPERATOR Catalyst extension — the
  * preference-order-(c) path from the build plan: a custom
  * `LogicalPlan` node, a planner `Strategy`, and a `SparkPlan` that
  * executes the operator, injectable via `SparkSessionExtensions`.
  *
  * Spark has no native ASOF JOIN (the naive inequality-join encoding
  * degenerates to a broadcast-nested-loop over every pair);
  * [[graft.operators.AsofJoin]] is the compose-from-built-ins form
  * (union + last-over-window). This node instead executes the
  * textbook merge: both sides hash-partitioned on the key and sorted
  * by (key, ts) — distribution and ordering are REQUIREMENTS the
  * planner satisfies with its own exchanges and sorts, so AQE, reused
  * shuffles, and all upstream optimizations still apply — then a
  * single forward pass per partition pairs each left row with the
  * latest right row at-or-before its timestamp. One shuffle per side,
  * zero pair explosion, O(|L|+|R|) per partition: exactly the plan
  * you'd want at 100 TB.
  *
  * Differences vs the union+window form (both intended): unmatched
  * left rows keep ALL right columns null (window form back-fills each
  * payload column independently), and the right row is matched as a
  * ROW, never column-by-column.
  */
object NativeAsofJoin {

  /** Logical node: left output plus the (nullable) right output. */
  case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
                      leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                      leftTs: Expression, rightTs: Expression)
    extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: one physical choice, the merge exec. */
  object AsofJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsofJoin(l, r, lk, rk, lt, rt) =>
        AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** `SparkSessionExtensions` hook — enable with
    * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
    * at session build time; [[install]] is the runtime equivalent for
    * an existing session. */
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)

  /** Idempotently register the strategy on a live session. */
  def install(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(AsofJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsofJoinStrategy
  }

  /** For each left row, append the latest right row with
    * `right(rightTsCol) <= left(leftTsCol)` in the same key group
    * (null-padded when none). Key columns must share names across
    * sides; ts columns must be integer/long/timestamp-valued and
    * non-null. Right-side columns keep their names — disambiguate
    * before joining, as with any join. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTsCol: String, rightTsCol: String): DataFrame =
    asofJoin(left, right, keys, keys, leftTsCol, rightTsCol)

  /** Variant with differently-named key columns per side (also the way
    * to keep output names unambiguous — right columns keep their
    * names). */
  def asofJoin(left: DataFrame, right: DataFrame, leftKeyCols: Seq[String],
               rightKeyCols: Seq[String], leftTsCol: String,
               rightTsCol: String): DataFrame = {
    install(left.sparkSession)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def res(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${p.output.map(_.name).mkString(", ")}]"))
    Bridge.ofRows(left.sparkSession,
      AsofJoin(lp, rp, leftKeyCols.map(res(lp, _)),
        rightKeyCols.map(res(rp, _)),
        res(lp, leftTsCol), res(rp, rightTsCol)))
  }

  /** Physical merge. Children arrive co-partitioned on the key and
    * sorted by (key, ts) — EnsureRequirements inserts the exchanges
    * and sorts. Per partition: advance the right iterator while its
    * (key, ts) is at-or-before the current left row, remembering the
    * last right row seen for the current key; that row (or nulls) is
    * the match. Only the single remembered row is ever buffered. */
  case class AsofJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                          leftTs: Expression, rightTs: Expression,
                          left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val out = output
      val lKeyExprs = leftKeys
      val rKeyExprs = rightKeys
      val lTsExpr = leftTs
      val rTsExpr = rightTs
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyGet = UnsafeProjection.create(lKeyExprs, lOut)
        val rKeyGet = UnsafeProjection.create(rKeyExprs, rOut)
        val lTsGet = BindReferences.bindReference(lTsExpr, lOut)
        val rTsGet = BindReferences.bindReference(rTsExpr, rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(
          lKeyExprs.map(_.dataType))
        val nullRight = new GenericInternalRow(rOut.size)
        val joined = new JoinedRow
        val resultProj = UnsafeProjection.create(out, out)
        def tsOf(v: Any): Long = v match {
          case l: java.lang.Long => l
          case i: java.lang.Integer => i.longValue()
          case other => throw new IllegalArgumentException(
            s"as-of ts must be integer/long/timestamp-valued, got $other")
        }
        new Iterator[InternalRow] {
          // rows/keys are COPIED when buffered: upstream iterators
          // reuse their row objects
          private var rHead: InternalRow = _
          private var rHeadKey: InternalRow = _
          private var cand: InternalRow = _
          private var candKey: InternalRow = _
          private def advanceRight(): Unit =
            if (rIter.hasNext) {
              rHead = rIter.next().copy()
              rHeadKey = rKeyGet(rHead).copy()
            } else { rHead = null; rHeadKey = null }
          advanceRight()
          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val l = lIter.next()
            val lKey = lKeyGet(l)
            val lTsV = lTsGet.eval(l)
            if (lTsV != null) {
              val lt = tsOf(lTsV)
              var go = true
              while (go && rHead != null) {
                val c = keyOrd.compare(rHeadKey, lKey)
                if (c < 0 || (c == 0 && {
                  val rv = rTsGet.eval(rHead); rv != null && tsOf(rv) <= lt
                })) {
                  if (c == 0) { cand = rHead; candKey = rHeadKey }
                  advanceRight()
                } else go = false
              }
            }
            val matched = cand != null && keyOrd.compare(candKey, lKey) == 0
            resultProj(joined(l, if (matched) cand else nullRight))
          }
        }
      }
    }
  }
}
