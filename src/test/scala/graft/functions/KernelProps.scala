package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure JVM kernels behind the codegen'd
  * expressions — fast (no Spark jobs), 100 cases each. */
object KernelProps extends Properties("kernels") {

  private val token: Gen[String] = for {
    n <- Gen.choose(1, 10)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  private val tokens: Gen[List[String]] = Gen.choose(0, 40)
    .flatMap(n => Gen.listOfN(n, token))

  private def arr(ts: Seq[String]): GenericArrayData =
    new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])

  property("simhash is token-order invariant") = Prop.forAll(tokens) { ts =>
    SimHash64.simhashStrings(ts) == SimHash64.simhashStrings(scala.util.Random.shuffle(ts))
  }

  property("simhash matches the ArrayData kernel") = Prop.forAll(tokens) { ts =>
    SimHash64.simhashStrings(ts) == SimHash64.simhash(arr(ts))
  }

  property("shingle hashes are sorted, distinct, and counted right") =
    Prop.forAll(tokens, Gen.choose(2, 4)) { (ts, n) =>
      val out = ShingleHashes.hashes(arr(ts), n)
      val longs = (0 until out.numElements()).map(out.getLong)
      val expectedMax = math.max(ts.length - n + 1, 1)
      (longs == longs.sorted && longs.distinct == longs &&
        longs.nonEmpty && longs.length <= expectedMax)
    }

  property("identical texts share all shingles; disjoint vocabularies none") =
    Prop.forAll(tokens.suchThat(_.length >= 4)) { ts =>
      val a = ShingleHashes.hashes(arr(ts), 3)
      val b = ShingleHashes.hashes(arr(ts), 3)
      val disjoint = ShingleHashes.hashes(arr(ts.map(_ + "~x")), 3)
      val sa = (0 until a.numElements()).map(a.getLong).toSet
      val sb = (0 until b.numElements()).map(b.getLong).toSet
      val sd = (0 until disjoint.numElements()).map(disjoint.getLong).toSet
      sa == sb && sa.intersect(sd).isEmpty
    }

  property("minhash signature entries are mins over per-shingle hashes") =
    Prop.forAll(tokens.suchThat(_.nonEmpty), Gen.choose(1, 8)) { (ts, k) =>
      val sh = ShingleHashes.hashes(arr(ts), 3)
      val sig = MinHashFromHashes.sig(sh, k)
      val shingleLongs = (0 until sh.numElements()).map(sh.getLong)
      (0 until k).forall { j =>
        val expect = shingleLongs.map(h =>
          org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h, j)).min
        sig.getLong(j) == expect
      }
    }

  property("minhash similarity estimates containment: equal sets agree everywhere") =
    Prop.forAll(tokens.suchThat(_.length >= 3)) { ts =>
      val sh = ShingleHashes.hashes(arr(ts), 3)
      val a = MinHashFromHashes.sig(sh, 16)
      val b = MinHashFromHashes.sig(sh, 16)
      (0 until 16).forall(j => a.getLong(j) == b.getLong(j))
    }
}
