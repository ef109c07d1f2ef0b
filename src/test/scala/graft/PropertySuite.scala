package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.contract.{Namecase, Verdict}
import graft.core.{CanonicalJson, Position}

/** Property suite (cdf: SURVEY §5.2 property/fuzz — verdict-lattice
  * laws, position round-trips/algebra, normalization idempotence,
  * canonical-JSON stability — by generation, not enumeration). */
object PropertySuite extends Properties("graft") {

  private val verdictGen = Gen.oneOf(Verdict.all)

  property("verdict join: commutative, associative, idempotent, monotone") =
    forAll(verdictGen, verdictGen, verdictGen) { (a, b, c) =>
      Verdict.join(a, b) == Verdict.join(b, a) &&
        Verdict.join(Verdict.join(a, b), c) == Verdict.join(a, Verdict.join(b, c)) &&
        Verdict.join(a, a) == a &&
        Verdict.join(a, b).rank >= a.rank
    }

  private val nameGen = Gen.chooseNum(0, 80).flatMap(n =>
    Gen.stringOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '-', '_', '.', 'É', 'ß', '漢'))))

  property("namecase-v1: idempotent, bounded, charset-clean") =
    forAll(nameGen) { s =>
      val n = Namecase.normalize(s)
      Namecase.normalize(n) == n &&
        n.length <= Namecase.MaxLen &&
        n.matches("[a-z0-9_]+") && !n.head.isDigit
    }

  private val cursorGen = for {
    f <- Gen.identifier.suchThat(_.nonEmpty)
    v <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
  } yield Position.Cursor(f.take(20), v)

  property("cursor positions: JSON round-trip; merge = max, comm/assoc/idem") =
    forAll(cursorGen, Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)) { (p, v2) =>
      val q = Position.Cursor(p.field, v2)
      val roundTrip = Position.fromJson(CanonicalJson.render(p.toJson)) == p
      val merged = Position.merge(p, q).asInstanceOf[Position.Cursor]
      roundTrip &&
        merged.value == math.max(p.value, q.value) &&
        Position.merge(p, q) == Position.merge(q, p) &&
        Position.merge(p, p) == p
    }

  private val jsonGen: Gen[CanonicalJson.J] = {
    import CanonicalJson._
    val leaf: Gen[J] = Gen.oneOf(
      Gen.alphaNumStr.map(JStr(_)),
      Gen.chooseNum(-1000000L, 1000000L).map(JInt(_)),
      Gen.oneOf(true, false).map(JBool(_)),
      Gen.const(JNull))
    for {
      n <- Gen.chooseNum(0, 6)
      keys <- Gen.listOfN(n, Gen.identifier.map(_.take(8))).map(_.distinct)
      vals <- Gen.listOfN(keys.length, leaf)
    } yield JObj(keys.zip(vals))
  }

  property("canonical json: key order never changes identity") =
    forAll(jsonGen) { j =>
      j match {
        case obj: CanonicalJson.JObj =>
          val shuffled = CanonicalJson.JObj(obj.v.reverse)
          CanonicalJson.hash(obj) == CanonicalJson.hash(shuffled)
        case _ => true
      }
    }

  property("topk aggregator: merge order never changes the result (partial-agg correctness)") = {
    import graft.functions.{Scored, TopKAgg, TopKBuf}
    val agg = new TopKAgg(3)
    val scoredGen = Gen.zip(Gen.chooseNum(0.0, 100.0), Gen.chooseNum(0L, 50L))
      .map { case (v, i) => Scored(v, i) }
    forAll(Gen.listOf(scoredGen), Gen.listOf(scoredGen)) { (xs, ys) =>
      val all = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
      val split = agg.merge(
        xs.foldLeft(agg.zero)(agg.reduce),
        ys.foldLeft(agg.zero)(agg.reduce))
      val flipped = agg.merge(
        ys.foldLeft(agg.zero)(agg.reduce),
        xs.foldLeft(agg.zero)(agg.reduce))
      agg.finish(all) == agg.finish(split) &&
        agg.finish(split) == agg.finish(flipped) &&
        agg.finish(all).length <= 3
    }
  }

  property("settlement packing: order preserved, txns never split, ceilings respected") = {
    import graft.streaming.Settlement._
    val txnsGen = Gen.listOf(Gen.zip(Gen.chooseNum(1, 20), Gen.chooseNum(1L, 2000L)))
      .map(_.zipWithIndex.map { case ((ops, bytes), i) => Txn(i.toLong, ops, bytes) })
    forAll(txnsGen, Gen.chooseNum(5, 50), Gen.chooseNum(500L, 5000L)) { (txns, maxOps, maxBytes) =>
      val p = Policy(maxOps, maxBytes)
      validate(txns, pack(txns, p), p)
    }
  }

  property("file-manifest merge: union by path, latest wins, idempotent") =
    forAll(Gen.listOf(Gen.zip(Gen.oneOf("a", "b", "c", "d"),
        Gen.chooseNum(0L, 1000L), Gen.chooseNum(0L, 1000L)))) { entries =>
      val fs = entries.map { case (p, s, m) => Position.FileEntry(p, s, m) }
      val m1 = Position.FileManifest(fs.take(fs.length / 2))
      val m2 = Position.FileManifest(fs.drop(fs.length / 2))
      val merged = Position.merge(m1, m2).asInstanceOf[Position.FileManifest]
      val paths = (m1.files.map(_.path) ++ m2.files.map(_.path)).toSet
      merged.files.map(_.path).toSet == paths &&
        merged.files.map(_.path) == merged.files.map(_.path).sorted &&
        Position.merge(merged, merged) == merged
    }
}
