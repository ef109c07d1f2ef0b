package graft

import org.apache.spark.sql.functions._

import graft.expr.Expr
import graft.expr.Expr._

class ExprIrSpec extends SparkSpec {
  import spark.implicits._

  test("comparison parser round-trips the bounded grammar") {
    assert(parseComparison("l_quantity > 30") ==
      Right(Binary(BinOp.Gt, Col("l_quantity"), LInt(30))))
    assert(parseComparison("flag = 'R'") ==
      Right(Binary(BinOp.Eq, Col("flag"), LStr("R"))))
    assert(parseComparison("x <= 1.5").isRight)
    assert(parseComparison("not a comparison ||").isLeft)
  }

  test("lowered IR evaluates like native Columns") {
    val df = Seq((1L, 10.0, "R"), (2L, 50.0, "N"), (3L, 30.0, null))
      .toDF("id", "qty", "flag")
    val e = Binary(BinOp.And,
      Binary(BinOp.Gt, Col("qty"), LFloat(20.0)),
      Unary(UnaryOp.IsNotNull, Col("flag")))
    val got = df.filter(Expr.lower(e)).select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L))
  }

  test("volatility gate rejects non-deterministic and unknown functions") {
    def call(n: String) = Call(FunctionNamespace, n, FunctionVersion, Seq(Col("x")))
    assert(admit(call("rand")).isLeft)
    assert(admit(call("now")).isLeft)
    assert(admit(call("uuid")).isLeft)
    assert(admit(call("no_such_fn")).isLeft)
    assert(admit(call("upper")).isRight)
    // registry drift refused
    assert(admit(Call("other.ns", "upper", "1.0", Seq(Col("x")))).isLeft)
  }

  test("plan hash is stable and literal-bit-exact") {
    val a = Binary(BinOp.Gt, Col("x"), LFloat(0.1))
    val b = Binary(BinOp.Gt, Col("x"), LFloat(0.1))
    val c = Binary(BinOp.Gt, Col("x"), LFloat(1.0 / 10.0)) // same double, different spelling
    val d = Binary(BinOp.Gt, Col("x"), LFloat(0.2))
    assert(planHash(a) == planHash(b))
    assert(planHash(a) == planHash(c))
    assert(planHash(a) != planHash(d))
  }

  test("relational admission accepts Projection(Filter(Scan)) only") {
    graft.core.Tables.registerAll(spark, sf())
    assert(graft.expr.Admission.admit(spark,
      "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 30").isRight)
    assert(graft.expr.Admission.admit(spark,
      "SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1").isLeft)
    assert(graft.expr.Admission.admit(spark,
      "SELECT * FROM lineitem JOIN orders ON l_orderkey = o_orderkey").isLeft)
    assert(graft.expr.Admission.admit(spark,
      "SELECT * FROM lineitem ORDER BY l_orderkey").isLeft)
    assert(graft.expr.Admission.admit(spark,
      "SELECT DISTINCT l_returnflag FROM lineitem").isLeft)
  }
}
